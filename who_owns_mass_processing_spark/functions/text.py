"""Text canonicalization + shingling + text-analysis columns — all Catalyst
built-ins (JVM side, codegen'd; zero Python in the hot path).

Reference analog: the std_* cascade (std_uppercase R/standardizers.R:191-205,
std_squish :218-227, std_remove_special :229-287, std_replace_blank
:343-379) that canonicalizes owner names before blocking; here the payload
is captions/documents.  The char-3-gram tokenization mirrors
quanteda::tokens(what="character") + tokens_ngrams(n=3) at
R/deduplicaters.R:318-327 — expressed as sequence/transform array ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens that mean "no value" in the reference (std_replace_blank,
# R/standardizers.R:343-379); applied to captions for parity of semantics.
BLANK_RE = r"^(NONE|N/A|NA|UNKNOWN|SAME|NULL|)$"

STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "for",
    "with", "at", "by", "from", "as", "it", "this", "that",
]


def normalize_text(col: Column) -> Column:
    """lower -> non-alnum runs to single space -> trim.

    MUST stay in sync with synth.normalize_text (python mirror used by the
    golden oracle) — tested for equality in tests/test_text.py.
    """
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def null_if_blank(col: Column) -> Column:
    """Reference std_replace_blank: placeholder tokens -> NULL so they never
    become (hot) blocking keys (R/standardizers.R:343-379)."""
    return F.when(F.upper(F.trim(col)).rlike(BLANK_RE), F.lit(None)).otherwise(col)


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct char k-shingles of the *normalized* text, as array<string>.

    Pure builtins: sequence + transform + substring + array_distinct.
    Short strings (len <= k) yield a single whole-string shingle, matching
    synth.shingle_set.
    """
    t = normalize_text(col)
    n = F.length(t)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)),
    )
    return F.when(n <= F.lit(0), F.array().cast("array<string>")).otherwise(
        F.array_distinct(shingles)
    )


def jaccard_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard of two string arrays (built-ins; used by the verify
    stage — reference analog: textstat_simil exact cosine verify,
    R/deduplicaters.R:342-346)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union <= 0, F.lit(1.0)).otherwise(inter.cast("double") / union.cast("double"))


def token_count(col: Column) -> Column:
    """Whitespace token count (text-analysis surface)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_tokens(col: Column) -> Column:
    return F.filter(F.split(normalize_text(col), " "), lambda w: F.length(w) > 0)


def stopword_ratio(col: Column) -> Column:
    toks = word_tokens(col)
    stops = F.filter(toks, lambda w: w.isin(*STOPWORDS))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(stops).cast("double") / F.size(toks).cast("double")
    )


def quality_score(col: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: length band + alnum density +
    mean word length band. Deterministic and SQL-mirrorable (oracle)."""
    n = F.length(col)
    alnum = F.length(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    density = F.when(n == 0, F.lit(0.0)).otherwise(alnum.cast("double") / n.cast("double"))
    toks = word_tokens(col)
    mean_len = F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)).cast("double")
        / F.size(toks).cast("double")
    )
    len_band = F.when(n < 20, F.lit(0.2)).when(n < 100, F.lit(0.6)).otherwise(F.lit(1.0))
    wl_band = F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_band * 0.4 + density * 0.4 + wl_band * 0.2), 6)


def fingerprint_md5(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key).
    Reference analog: dedupe_naive's identical-standardized-name key
    (R/deduplicaters.R:208-223)."""
    return F.md5(normalize_text(col))


def lang_id(col: Column) -> Column:
    """Tiny n-gram/stopword language heuristic -> 2-letter code or 'und'.

    A deliberately simple, SQL-mirrorable scorer: counts hits of per-language
    marker words; ties broken by fixed language order (en,de,fr,es,pt).
    """
    markers = {
        "en": ["the", "and", "of", "with"],
        "de": ["der", "und", "die", "nicht"],
        "fr": ["le", "la", "et", "les"],
        "es": ["el", "los", "las", "una"],
        "pt": ["o", "os", "uma", "nao"],
    }
    toks = word_tokens(col)

    def hits(words: list[str]) -> Column:
        return F.size(F.filter(toks, lambda w: w.isin(*words)))

    scores = [(lang, hits(ws)) for lang, ws in markers.items()]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    out = F.lit("und")
    for lang, s in reversed(scores):  # reversed => earlier langs win ties
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out

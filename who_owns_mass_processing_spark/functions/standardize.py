"""Vocabulary crosswalks, flag lexicons, and string->struct extraction.

The bulk of the reference is ordered token-standardization rule ladders
(R/standardizers.R:443-474 directions, :476-538 street types, :802-873
institution types), boolean flag lexicons that gate which dedup tier a
row gets (std_flag_inst / std_flag_trust, R/standardizers.R:1952-2004),
an anagram "fuzzify" blocking key (std_fuzzify_string, :105-132), and a
string->typed-struct address-range parser (proc_address_to_range,
R/processors.R:44-111).  This module re-expresses those *operator
shapes* as pure-Catalyst column functions:

  * apply_rule_ladder  ordered regexp_replace chain — order is
                       load-bearing, exactly like the reference's named
                       pattern vectors (rule i sees rule i-1's output);
  * flag_matches       word-boundary lexicon flag (one compiled rlike);
  * flag_trust_tiers   the layered trust/trustees case-when ladder;
  * extract_range_struct  one string -> struct(start, end, body, even);
  * fuzzify_key        deterministic anagram blocking key.

All regexes here are RE2-compatible (no lookarounds/backrefs) so the
same rules run verbatim in the DuckDB oracles; the reference's
lookbehind guards are re-expressed with \\b word boundaries.

Scale: everything is a scalar expression inside whole-stage codegen —
no UDFs, no shuffles; a 100 TB standardization pass is a pure map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# rule ladders (ordered!)
# ---------------------------------------------------------------------------

# Cardinal-direction crosswalk (ref R/standardizers.R:443-474).
DIRECTIONS: list[tuple[str, str]] = [
    (r"\bN\b", "NORTH"),
    (r"\bNW\b", "NORTHWEST"),
    (r"\bNE\b", "NORTHEAST"),
    (r"\bS\b", "SOUTH"),
    (r"\bSW\b", "SOUTHWEST"),
    (r"\bSE\b", "SOUTHEAST"),
    (r"\bE\b", "EAST"),
    (r"\bW\b", "WEST"),
    (r"\bGT\b", "GREAT"),
    (r"\bMT\b", "MOUNT"),
    (r"\b(CENTRE|CTR)\b", "CENTER"),
    (r"\bSQ$", "SQUARE"),
    (r"\bVLLY\b", "VALLEY"),
]

# Street-type crosswalk (ref R/standardizers.R:476-538).  Order matters:
# e.g. "ST" -> STREET must run before generic suffix rules, and the
# number-suffix joins ("1 ST" -> "1ST") come first in the reference.
STREET_TYPES: list[tuple[str, str]] = [
    (r"\b(ST|STREE|STREET)\b", "STREET"),
    (r"\bAVE?\b", "AVENUE"),
    (r"\bLA?N\b", "LANE"),
    (r"\bBLV?R?D?\b", "BOULEVARD"),
    (r"\bPKWY\b", "PARKWAY"),
    (r"\bEXT\b", "EXTENSION"),
    (r"\bPR?K\b", "PARK"),
    (r"\bDRV?\b", "DRIVE"),
    (r"\bPT\b", "POINT"),
    (r"\bRDG\b", "RIDGE"),
    (r"\bTRL?\b", "TRAIL"),
    (r"\bRD\b", "ROAD"),
    (r"\bTERR?\b", "TERRACE"),
    (r"\bPLC?E?\b", "PLACE"),
    (r"\bWY\b", "WAY"),
    (r"\b(CI?RC?|CI)\b", "CIRCLE"),
    (r"\bSQR?\b", "SQUARE"),
    (r"\bHG?WY?\b", "HIGHWAY"),
    (r"\bCT\b", "COURT"),
    (r"\bPL?Z\b", "PLAZA"),
]

# Institution-type crosswalk (ref R/standardizers.R:802-873), generic
# subset — the two-step LTD chain below is deliberately order-dependent
# (LIMITED -> LTD, then LTD LIABILITY COMPANY -> LLC), mirroring the
# reference's sequence.
INST_TYPES: list[tuple[str, str]] = [
    (r"\bCORP(ORATION)?\b", "CORPORATION"),
    (r"\bINC(ORPORATED)?\b", "INC"),
    (r"\bPROPS?\b", "PROPERTIES"),
    (r"\bL L C\b", "LLC"),
    (r"\bLIMITED\b", "LTD"),
    (r"\bLTD LIABILITY (COMPANY|CORPORATION)\b", "LLC"),
    (r"\bLTD (LIABILITY )?PARTNERSHIP\b", "LLP"),
    (r"\bMGMT\b", "MANAGEMENT"),
    (r"\bCO(MPANY)?\b", "COMPANY"),
    (r"\bGRP\b", "GROUP"),
    (r"\bRLTY\b", "REALTY"),
    (r"\bASSOC?\b", "ASSOCIATION"),
    (r"\bDEPT\b", "DEPARTMENT"),
    (r"\bTR\b", "TRUST"),
    (r"\bTRS\b", "TRUSTEES"),
]


def apply_rule_ladder(col: Column, rules: list[tuple[str, str]]) -> Column:
    """Ordered regexp_replace chain — rule i runs on rule i-1's output
    (the reference's std_replace_generic contract, R/standardizers.R:19-45).
    Pure codegen'd expressions; zero shuffles."""
    out = col
    for pattern, replacement in rules:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def crosswalk_tokens(col: Column, mapping: dict[str, str]) -> Column:
    """Token-level canonical-form map: split on spaces, map each token
    through `mapping` (broadcast as a literal map expression), rejoin.
    For plain token->token crosswalks this is cheaper and safer than a
    regex ladder (no pattern interactions); the reference uses regex
    ladders because its keys are patterns — use apply_rule_ladder there.
    """
    if not mapping:
        return col
    kv = []
    for k, v in mapping.items():
        kv.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*kv)
    toks = F.split(col, " ")
    mapped = F.transform(toks, lambda t: F.coalesce(m[t], t))
    return F.array_join(mapped, " ")


# Spacing/special-character normalization (ref std_spacing_characters,
# R/standardizers.R:417-439; std_remove_special :229-287).
SPACING_CHARS: list[tuple[str, str]] = [
    (r" ?& ?", " AND "),
    (r" ?- ?", "-"),
    (r" ?, ?", ","),
    (r"[\.']", ""),
    (r"/", " "),
    (r"  +", " "),
]

_BLANKS_RE = r"^(NONE|N/?A|UNKNOWN|SAME|NULL|-+)?$"


def blank_to_null(col: Column) -> Column:
    """Placeholder-blank NULLing (ref std_replace_blank,
    R/standardizers.R:343-379): 'NONE', 'N/A', 'UNKNOWN', 'SAME', empty
    and dash-only strings become NULL so they can never act as blocking
    keys — the reference's original hot-key kill, mirrored by the
    engine's stop-band drop."""
    return F.when(F.upper(F.trim(col)).rlike(_BLANKS_RE), None).otherwise(col)


# ---------------------------------------------------------------------------
# flag lexicons
# ---------------------------------------------------------------------------

def flag_matches(col: Column, lexicon: list[str]) -> Column:
    """TRUE when any lexicon term appears as a whole word (ref
    std_flag_inst, R/standardizers.R:1952-1974: one alternation compiled
    from the SEARCH list)."""
    if not lexicon:
        return F.lit(False)
    pattern = r"\b(" + "|".join(lexicon) + r")\b"
    return col.rlike(pattern)


def flag_trust_tiers(col: Column, definite: list[str] | None = None) -> tuple[Column, Column]:
    """(trust, trustees) boolean pair — the reference's layered ladder
    (std_flag_trust, R/standardizers.R:1976-2004): TRUST-the-entity wins
    over TRUSTEES-the-role, and university/college/institute boards are
    excluded from both.  RE2-safe re-expression of the original
    "TRUST(?!EES)" lookahead: a TRUST token that is not TRUSTEES.
    """
    academic = col.rlike(r"\b(UNIVERSITY|COLLEGE|INSTITUTE)\b")
    trust_word = col.rlike(r"\bTRUST\b")  # \b stops before the EES suffix
    trustees_of = col.rlike(r"^TRUSTEES OF ") & ~academic
    definite_hit = flag_matches(col, definite or [])
    trust = trust_word | trustees_of | definite_hit
    trustees = col.rlike(r"\bTRUSTEES\b") & ~academic & ~trust
    return trust, trustees


# ---------------------------------------------------------------------------
# string -> struct extraction
# ---------------------------------------------------------------------------

_RANGE_RE = r"^([0-9]+(?:\.[0-9]+)?)(?:[ -]([0-9]+(?:\.[0-9]+)?))? (.+)$"


def extract_range_struct(col: Column) -> Column:
    """Parse '12-16 MAIN STREET' -> struct(start, end, body, even)
    (ref proc_address_to_range, R/processors.R:44-111: leading numeric
    range split off the body; end clamped to >= start; even = parity of
    floor(start)).  Non-matching strings yield all-NULL struct fields
    (even=false), exactly like the reference's NA default.
    """
    start_s = F.regexp_extract(col, _RANGE_RE, 1)
    end_s = F.regexp_extract(col, _RANGE_RE, 2)
    body_s = F.regexp_extract(col, _RANGE_RE, 3)
    matched = start_s != ""
    start = F.when(matched, start_s.cast("double"))
    end_init = F.when(end_s != "", end_s.cast("double"))
    end = F.when(
        matched,
        F.when(end_init.isNull() | (end_init > start), F.coalesce(end_init, start)).otherwise(
            start
        ),
    )
    body = F.when(matched, F.trim(body_s))
    even = F.coalesce((F.floor(start) % 2 == 0), F.lit(False))
    return F.struct(
        start.alias("start"), end.alias("end"), body.alias("body"), even.alias("even")
    )


# ---------------------------------------------------------------------------
# anagram blocking key
# ---------------------------------------------------------------------------

def fuzzify_key(col: Column) -> Column:
    """Deterministic anagram blocking key: first char + sorted distinct
    inner chars + last char (ref std_fuzzify_string, R/standardizers.R:
    105-132, which builds an anagram-matching regex; an equi-joinable
    KEY is the Spark-native shape — two strings that are anagrams
    sharing first/last characters collide).  NULL/empty -> NULL (never
    a blocking key, mirroring the reference's blank-name NULLing)."""
    n = F.length(col)
    inner = F.substring(col, 2, n - 2)
    inner_sorted = F.array_join(
        F.array_sort(F.array_distinct(F.split(inner, ""))), ""
    )
    key = F.concat(F.substring(col, 1, 1), inner_sorted, F.substring(col, -1, 1))
    return F.when(col.isNull() | (n < 2), None).otherwise(key)


def standardize_name(col: Column) -> Column:
    """The composed name-standardization chain (reference std_name /
    std_address pipeline shape, R/standardizers.R:19-45 + rule sets):
    uppercase -> strip punctuation -> collapse whitespace -> ordered
    crosswalk ladders (directions, street types, institution types) ->
    blank NULLing.  Pure codegen'd expressions, zero shuffles — this is
    the pass that runs on every name/caption before blocking, so it must
    cost one projection."""
    out = F.upper(col)
    out = F.regexp_replace(out, r"[^A-Z0-9 ]", " ")
    out = F.regexp_replace(out, r" +", " ")
    out = F.trim(out)
    for rules in (DIRECTIONS, STREET_TYPES, INST_TYPES):
        out = apply_rule_ladder(out, rules)
    return blank_to_null(out)

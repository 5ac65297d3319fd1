"""Spark text functions vs their python mirrors (golden-oracle parity)."""
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.functions import text as T
from who_owns_mass_processing_spark.synth import jaccard, normalize_text, shingle_set

SAMPLES = [
    "Hello, World!",
    "  multiple   spaces\tand\ttabs  ",
    "UPPER lower 123 mIxEd",
    "punct!@#$%^&*()everywhere",
    "",
    "a",
    "ab",
    "abc",
    "résumé naïve café",  # non-ascii folds to spaces
    "the quick brown fox",
]


def _spark_norm(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    return [r[0] for r in df.select(T.normalize_text(F.col("t"))).collect()]


def test_normalize_parity(spark):
    got = _spark_norm(spark, SAMPLES)
    want = [normalize_text(s) for s in SAMPLES]
    assert got == want


def test_shingles_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": SAMPLES}))
    rows = df.select(T.char_shingles(F.col("t"), 3).alias("s")).collect()
    for s, row in zip(SAMPLES, rows):
        assert frozenset(row[0]) == shingle_set(s, 3), s


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_normalize_parity_property(spark, texts):
    got = _spark_norm(spark, texts)
    want = [normalize_text(s) for s in texts]
    assert got == want


def test_jaccard_arrays(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), (["x"], ["x"]), ([], [])],
        "a array<string>, b array<string>",
    )
    vals = [r[0] for r in df.select(T.jaccard_arrays(F.col("a"), F.col("b"))).collect()]
    assert abs(vals[0] - 0.5) < 1e-9
    assert vals[1] == 1.0
    assert vals[2] == 1.0  # both empty => identical


def test_jaccard_matches_python(spark):
    pairs = [("hello world", "hello there world"), ("abc", "abd"), ("same", "same")]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["x", "y"]))
    got = [
        r[0]
        for r in df.select(
            T.jaccard_arrays(T.char_shingles(F.col("x"), 3), T.char_shingles(F.col("y"), 3))
        ).collect()
    ]
    want = [jaccard(shingle_set(x, 3), shingle_set(y, 3)) for x, y in pairs]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9


def test_null_if_blank(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["NONE", "n/a", "UNKNOWN", "real value", "", "SAME"]})
    )
    vals = [r[0] for r in df.select(T.null_if_blank(F.col("t"))).collect()]
    assert vals == [None, None, None, "real value", None, None]


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["one two three", "", "  x  "]}))
    counts = [r[0] for r in df.select(T.token_count(F.col("t"))).collect()]
    assert counts == [3, 0, 1]
    quals = [r[0] for r in df.select(T.quality_score(F.col("t"))).collect()]
    assert all(0.0 <= q <= 1.0 for q in quals)


def test_bpe_token_count_known_values(spark):
    cases = {
        "hello world": 2,
        "don't stop": 3,          # don + 't + stop
        "abc123 x-y": 5,          # abc + 123 + x + - + y
        "": 0,
        "   ": 0,
        "a  b": 2,
    }
    df = spark.createDataFrame(pd.DataFrame({"t": list(cases)}))
    got = {
        r.t: r.n
        for r in df.select("t", T.bpe_token_count(F.col("t")).alias("n")).collect()
    }
    assert got == cases


def test_winnow_shared_run_guarantee(spark):
    """Winnowing contract: two docs sharing a run of >= w+k-1 chars
    (after normalization) share >= 1 fingerprint; and every fingerprint
    is a k-gram of the doc."""
    k, w = 5, 4
    shared = "zqxjvkwpfy"  # len 10 >= w+k-1=8, unusual chars
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "t": [f"left part {shared} tail one", f"other begin {shared} end", "unrelated text entirely"],
    })
    df = spark.createDataFrame(rows)
    out = df.select(
        "doc_id", T.winnow_fingerprints(F.col("t"), k=k, w=w).alias("fp")
    ).collect()
    fps = {r.doc_id: set(r.fp) for r in out}
    assert fps[1] & fps[2], "shared run must contribute a common fingerprint"
    from who_owns_mass_processing_spark.synth import normalize_text as pynorm
    for r in out:
        t = pynorm(rows.set_index("doc_id").t[r.doc_id])
        grams = {t[i:i + k] for i in range(max(len(t) - k + 1, 1))}
        assert set(r.fp) <= grams
    # short doc -> empty fingerprint set
    short = spark.createDataFrame(pd.DataFrame({"t": ["ab"]}))
    assert short.select(T.winnow_fingerprints(F.col("t")).alias("f")).first().f == []


def test_repetition_metrics_known_values(spark):
    cases = [
        ("a b a b a b", 4 / 6, None),       # "a b" x3, "b a" x2 of 5 bigrams
        ("unique words only here", 0.0, 0.0),
        ("", 0.0, 0.0),
        ("spam spam spam spam", 0.75, 1.0),  # all bigrams identical
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": [c[0] for c in cases]}))
    got = df.select(
        "t",
        T.dup_token_fraction(F.col("t")).alias("d"),
        T.top_bigram_fraction(F.col("t")).alias("b"),
    ).collect()
    by_t = {r.t: r for r in got}
    assert abs(by_t["a b a b a b"].d - round(4 / 6, 6)) < 1e-9
    assert abs(by_t["a b a b a b"].b - 0.6) < 1e-9  # "a b" 3 of 5
    assert by_t["unique words only here"].d == 0.0
    # all-distinct bigrams: modal bigram is any one of the 3 -> 1/3
    assert abs(by_t["unique words only here"].b - round(1 / 3, 6)) < 1e-9
    assert by_t[""].d == 0.0 and by_t[""].b == 0.0
    assert by_t["spam spam spam spam"].d == 0.75
    assert by_t["spam spam spam spam"].b == 1.0


def test_top_bigram_fraction_long_doc_bounded_time(spark):
    """VERDICT r4 #2 gate: the sorted-run rewrite must handle a
    100k-token document (all bigrams distinct — the worst case for the
    old O(distinct^2) form, ~10^10 comparisons) in bounded time, and a
    known-modal long doc must still produce the exact fraction."""
    import time

    import pandas as pd

    n = 100_000
    distinct = " ".join(f"t{i}" for i in range(n))
    # 100k tokens where one bigram ("x y") appears 1000 times
    looped = " ".join(
        ("x y" if i % 100 == 0 else f"u{i} v{i}") for i in range(n // 2)
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "t": [distinct, looped]})
    )
    t0 = time.time()
    got = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", T.top_bigram_fraction(F.col("t")).alias("b")
        ).collect()
    }
    elapsed = time.time() - t0
    assert elapsed < 60, f"long-doc top_bigram_fraction took {elapsed:.1f}s"
    assert abs(got[1] - round(1 / (n - 1), 6)) < 1e-9
    # python mirror for the looped doc
    from collections import Counter

    toks = looped.split()
    bgs = Counter(
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    )
    expect = round(max(bgs.values()) / (len(toks) - 1), 6)
    assert abs(got[2] - expect) < 1e-9


def test_winnow_udf_matches_expression_twin(spark):
    """The vectorized winnow UDF (uint64 gram packing + numpy sliding
    min) must be bit-identical to the Catalyst expression twin — the
    engine-portability contract (the DuckDB oracle mirrors the
    expression form)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for k, w in ((5, 4), (8, 8), (3, 4), (8, 2)):
        diff = (
            d.select(
                T.winnow_fingerprints(F.col("text"), k=k, w=w).alias("new"),
                T.winnow_fingerprints_expr(F.col("text"), k=k, w=w).alias("old"),
            )
            .where(F.col("new") != F.col("old"))
            .count()
        )
        assert diff == 0, (k, w)

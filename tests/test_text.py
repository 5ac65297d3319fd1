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

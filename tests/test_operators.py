"""Relational operator semantics: reference-parity behaviors."""
import pandas as pd
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.operators import canonical as C
from who_owns_mass_processing_spark.operators import ids as I
from who_owns_mass_processing_spark.operators import joins as J


def test_group_mode_tie_break(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": [1, 1, 1, 1], "v": ["b", "a", "b", "a"]})
    )
    out = C.group_mode(df, "g", "v").toPandas()
    assert out.iloc[0]["modal_v"] == "a"  # tie -> lexicographically smallest


def test_group_fill(spark):
    df = spark.createDataFrame(
        [(1, None), (1, "x"), (2, None)], "g int, v string"
    )
    out = C.group_fill(df, ["g"], ["v"]).toPandas()
    assert set(out[out.g == 1].v) == {"x"}
    assert out[out.g == 2].v.isna().all()


def test_uniqueness_flag(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 1, 2]}))
    out = C.uniqueness_flag(df, ["k"], "uniq").toPandas()
    assert set(out[out.k == 1].uniq) == {False}
    assert set(out[out.k == 2].uniq) == {True}


def test_first_match_left_join_null_keys_never_match(spark):
    """Reference na_matches='never' (R/deduplicaters.R:81): NULL keys do
    not join — Spark equi-join default, pinned here."""
    left = spark.createDataFrame([(1, "a"), (None, "b")], "k int, lv string")
    right = spark.createDataFrame([(1, "r1"), (None, "rNULL")], "k int, rv string")
    out = J.first_match_left_join(left, right, ["k"]).toPandas()
    assert out[out.lv == "a"].rv.iloc[0] == "r1"
    assert out[out.lv == "b"].rv.isna().all()


def test_first_match_never_multiplies_rows(spark):
    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k int, rv string")
    out = J.first_match_left_join(left, right, ["k"], order_by=[F.asc("rv")]).toPandas()
    assert len(out) == 1 and out.rv.iloc[0] == "x"


def test_range_join_plans_hash_not_nested_loop(spark):
    left = spark.createDataFrame([(1, 5, 6), (1, 0, 100)], "k int, s int, e int")
    right = spark.createDataFrame([(1, 4, 10)], "k int, s2 int, e2 int")
    out = J.range_join(left, right, ["k"], "s", "e", "s2", "e2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert out.count() == 1  # only [5,6] inside [4,10]


def test_fuzzy_join_best_match(spark):
    left = spark.createDataFrame(pd.DataFrame({"n": ["BOSTON"]}))
    right = spark.createDataFrame(pd.DataFrame({"m": ["BOSTONN", "BOSTN", "BASTAN"]}))
    out = J.fuzzy_join(left, right, "n", "m", max_dist=2).toPandas()
    assert len(out) == 1
    assert out.m.iloc[0] == "BOSTN"  # dist 1, tie-break asc


def test_dense_group_ids_partition_invariant(spark):
    pdf = pd.DataFrame({"k": ["b", "a", "b", "c", "a"]})
    out1 = I.dense_group_ids(spark.createDataFrame(pdf), ["k"]).toPandas()
    out2 = I.dense_group_ids(spark.createDataFrame(pdf).repartition(5), ["k"]).toPandas()
    m1 = dict(zip(out1.k, out1.group_id))
    m2 = dict(zip(out2.k, out2.group_id))
    assert m1 == m2 == {"a": 1, "b": 2, "c": 3}


def test_stable_row_ids(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["c", "a", "b"]})).repartition(3)
    out = I.stable_row_ids(df, ["k"]).toPandas().sort_values("id")
    assert out.k.tolist() == ["a", "b", "c"]


def test_string_set_agg_deterministic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": [1, 1, 1], "v": ["z", "a", "z"]})
    ).repartition(3)
    out = C.string_set_agg(df, "g", "v", "vals").toPandas()
    assert out.vals.iloc[0] == "a,z"


def test_cascade_lookup_priority_and_fill(spark):
    """C10 cascade: earlier layers win, later layers fill, different join
    keys per step, pre-existing values take precedence over all layers."""
    from pyspark.sql import functions as F

    from who_owns_mass_processing_spark.operators.canonical import cascade_lookup

    base = spark.createDataFrame(
        [(1, "k1", "s1", None), (2, "k2", "s1", None), (3, "k3", "s2", "KEEP")],
        ["id", "key", "seg", "val"],
    )
    lk1 = spark.createDataFrame([("k1", "first")], ["key", "val"])
    lk2 = spark.createDataFrame([("k1", "second"), ("k2", "second")], ["key", "val"])
    lk3 = spark.createDataFrame([("s1", "seg1"), ("s2", "seg2")], ["seg", "val"])
    out = cascade_lookup(
        base, [(lk1, ["key"]), (lk2, ["key"]), (lk3, ["seg"])], "val"
    )
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "first", 2: "second", 3: "KEEP"}

"""C7 second network round, vintage pick, append sink, atomic overwrite."""
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.operators.network import network_round
from who_owns_mass_processing_spark.operators.canonical import vintage_pick
from who_owns_mass_processing_spark.pipeline.checkpoint import StageCatalog


def test_network_round_bipartite_chain(spark):
    # companies c1,c2 share officer group o1; c2,c3 share o2 -> one network
    rows = pd.DataFrame(
        {
            "row_id": [1, 2, 3, 4, 5],
            "company_group": ["c1", "c2", "c2", "c3", "c9"],
            "officer_group": ["o1", "o1", "o2", "o2", None],
        }
    )
    out = network_round(
        spark.createDataFrame(rows), ["company_group", "officer_group"]
    ).toPandas().set_index("row_id")
    nets = out.network_id
    assert nets[1] == nets[2] == nets[3] == nets[4]  # chained through o1/o2
    assert nets[5] != nets[1]  # c9 never co-occurs -> own network
    assert nets[5] is not None  # singleton group still gets a network


def test_network_round_matches_tier_union(spark):
    # group-id round must agree with CC over the union of per-tier edges
    # when every row has both ids (golden equivalence on a small fixture)
    from who_owns_mass_processing_spark.operators.connected_components import (
        components_py,
    )

    rows = pd.DataFrame(
        {
            "rid": list(range(8)),
            "g1": ["a", "a", "b", "b", "c", "d", "d", "e"],
            "g2": ["x", "y", "y", "z", "z", "w", "w", "v"],
        }
    )
    out = network_round(spark.createDataFrame(rows), ["g1", "g2"]).toPandas()
    # driver mirror: bipartite edges over typed ids
    edges = [(f"g1={r.g1}", f"g2={r.g2}") for r in rows.itertuples()]
    comp = components_py(edges)
    expected = {r.rid: comp[f"g1={r.g1}"] for r in rows.itertuples()}
    got = dict(zip(out.rid, out.network_id))
    # same partition (label choice may differ -> compare as partitions)
    def parts(m):
        inv = {}
        for k, v in m.items():
            inv.setdefault(v, set()).add(k)
        return {frozenset(s) for s in inv.values()}

    assert parts(got) == parts(expected)


def test_vintage_pick_latest_wins(spark):
    snaps = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "snap": [0, 1, 0, 2, 0],
            "v": ["old", "new", "old", "newest", "only"],
        }
    )
    out = vintage_pick(spark.createDataFrame(snaps), ["k"], "snap").toPandas()
    got = dict(zip(out.k, out.v))
    assert got == {1: "new", 2: "newest", 3: "only"}


def test_catalog_append_accumulates(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path), "fp1")
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    df2 = spark.createDataFrame(pd.DataFrame({"x": [3]}))
    cat.append("t", df1)
    out = cat.append("t", df2)
    assert sorted(r.x for r in out.collect()) == [1, 2, 3]
    assert cat._manifest["stages"]["t"]["rows"] == 3
    # resume: a fresh catalog reads the appended table without recompute
    cat2 = StageCatalog(spark, str(tmp_path), "fp1")
    assert cat2.is_complete("t")
    assert sorted(r.x for r in cat2.read("t").collect()) == [1, 2, 3]


def test_catalog_overwrite_is_atomic(spark, tmp_path, monkeypatch):
    """Kill mid-overwrite must never leave a manifest entry pointing at
    partial data (ADVICE round 1)."""
    cat = StageCatalog(spark, str(tmp_path), "fp1")
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    cat.write("t", df1)

    # simulate a kill right after the old dir is destroyed: os.replace raises
    import who_owns_mass_processing_spark.pipeline.checkpoint as cp

    real_replace = os.replace

    def boom(src, dst):
        # only the stage-dir swap dies; the manifest save (also os.replace)
        # must keep working, as it would in a real kill-at-swap scenario
        if str(dst).endswith("/t"):
            raise RuntimeError("killed mid-swap")
        return real_replace(src, dst)

    monkeypatch.setattr(cp.os, "replace", boom)
    df2 = spark.createDataFrame(pd.DataFrame({"x": [9]}))
    with pytest.raises(RuntimeError):
        cat.write("t", df2)
    monkeypatch.setattr(cp.os, "replace", real_replace)

    # resume: stage must be marked INCOMPLETE (recompute), never complete+partial
    cat2 = StageCatalog(spark, str(tmp_path), "fp1")
    assert not cat2.is_complete("t")
    out = cat2.read_or_compute("t", lambda: df2)
    assert [r.x for r in out.collect()] == [9]

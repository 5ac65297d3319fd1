"""Pair-listing vs edge (connectivity) dedup variants must agree on
components; rep-level LSH must equal member-level semantics."""
import pandas as pd

from who_owns_mass_processing_spark.config import DedupeConfig
from who_owns_mass_processing_spark.operators.connected_components import components_py
from who_owns_mass_processing_spark.operators.dedupe import (
    exact_fingerprint_edges,
    exact_fingerprint_pairs,
    lsh_near_dup_edges,
    lsh_near_dup_pairs,
    minhash_signatures,
)

CFG = DedupeConfig(stop_band_min=10**6)  # tiny fixture: no drops


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG!"),  # normalizes == 1
        (5, "completely different text about spark engines"),
        (6, "completely different text about spark engines"), # exact dup of 5
        (7, "unrelated singleton document right here"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_pairs_and_edges_same_components(spark):
    df = _docs(spark)
    pairs, _ = lsh_near_dup_pairs(df, "doc_id", "text", CFG)
    edges, _ = lsh_near_dup_edges(df, "doc_id", "text", CFG)
    nodes = [r[0] for r in df.select("doc_id").collect()]
    cp = components_py([(r.a, r.b) for r in pairs.collect()], nodes)
    ce = components_py([(r.a, r.b) for r in edges.collect()], nodes)
    assert cp == ce
    assert cp[1] == cp[2] == cp[3] == cp[4]
    assert cp[5] == cp[6] != cp[1]
    assert cp[7] not in (cp[1], cp[5])


def test_pair_listing_includes_within_group_pairs(spark):
    df = _docs(spark)
    pairs, _ = lsh_near_dup_pairs(df, "doc_id", "text", CFG)
    got = {(r.a, r.b): r.jaccard for r in pairs.collect()}
    # exact group {1,2,4}: all three pairs listed at jaccard 1.0
    for p in [(1, 2), (1, 4), (2, 4)]:
        assert got.get(p) == 1.0, (p, got)
    # edges variant lists only star edges for the group
    edges, _ = lsh_near_dup_edges(df, "doc_id", "text", CFG)
    ge = {(r.a, r.b) for r in edges.collect()}
    assert (1, 2) in ge and (1, 4) in ge and (2, 4) not in ge


def test_exact_tier_pairs_vs_edges(spark):
    df = _docs(spark)
    sigs = minhash_signatures(df, "doc_id", "text", CFG)
    pairs = exact_fingerprint_pairs(sigs, "doc_id").toPandas()
    edges = exact_fingerprint_edges(sigs, "doc_id").toPandas()
    assert len(pairs) == 4   # C(3,2)=3 for {1,2,4} + 1 for {5,6}
    assert len(edges) == 3   # star: 2 for {1,2,4} + 1 for {5,6}

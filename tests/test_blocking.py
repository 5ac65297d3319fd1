"""Skew control: salting must not change the candidate set; stop bands
must drop and be logged."""
import pandas as pd
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.operators.blocking import candidate_pairs


def _bands_df(spark, n_hot=30, n_cold=6):
    rows = [("hot", 0, 7777) for _ in range(n_hot)]
    rows = [(f"h{i}", 0, 7777) for i in range(n_hot)]
    rows += [(f"c{i}", 1, 1000 + i // 2) for i in range(n_cold)]  # buckets of 2
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "band_id", "band_hash"])
    )


def test_salting_preserves_pair_set(spark):
    df = _bands_df(spark)
    pairs_unsalted, _ = candidate_pairs(df, "id", cap=1000, hard_cap=10**6)
    pairs_salted, metrics = candidate_pairs(df, "id", cap=5, hard_cap=10**6)
    a = set(map(tuple, pairs_unsalted.toPandas().values))
    b = set(map(tuple, pairs_salted.toPandas().values))
    assert a == b
    m = {r.bucket_class: r for r in metrics.collect()}
    assert "salted" in m and m["salted"].buckets == 1


def test_hot_bucket_pair_count_exact(spark):
    df = _bands_df(spark, n_hot=30, n_cold=0)
    pairs, _ = candidate_pairs(df, "id", cap=4, hard_cap=10**6)
    assert pairs.count() == 30 * 29 // 2


def test_stop_band_dropped_and_logged(spark):
    df = _bands_df(spark, n_hot=50, n_cold=4)
    pairs, metrics = candidate_pairs(df, "id", cap=5, hard_cap=40)
    ids = pairs.select("a").union(pairs.select("b")).distinct().toPandas().iloc[:, 0]
    assert not any(str(i).startswith("h") for i in ids)  # stop band contributed nothing
    m = {r.bucket_class: r for r in metrics.collect()}
    assert m["dropped_stop_band"].rows == 50


def test_cross_band_dedup(spark):
    # same pair found in two bands -> emitted once
    rows = [("x", 0, 1), ("y", 0, 1), ("x", 1, 2), ("y", 1, 2)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "band_id", "band_hash"]))
    pairs, _ = candidate_pairs(df, "id")
    assert pairs.count() == 1


def test_surrogate_ids_bit_identical_pairs(spark):
    """VERDICT r4 #1 gate: routing blocking through 8-byte surrogate ids
    (with_surrogate_ids -> candidate_pairs -> decode_pair_ids) must
    yield the EXACT pair set of running candidate_pairs on the original
    string ids, with (a, b) normalized in original-id order."""
    from who_owns_mass_processing_spark.operators.blocking import (
        decode_pair_ids,
        with_surrogate_ids,
    )

    rows = []
    # several buckets, one hot enough to salt under a small cap
    for b in range(4):
        for i in range(3 + 7 * b):
            rows.append((f"doc_{b}_{i:03d}", 0, b))
    base = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "band_id", "band_hash"])
    )
    direct, _ = candidate_pairs(base, "id", cap=5, hard_cap=10**6)
    want = set(map(tuple, direct.toPandas().values))

    docs = base.select("id").distinct()
    enc = with_surrogate_ids(docs)
    bands_sid = base.join(enc, "id").select("_sid", "band_id", "band_hash")
    sid_pairs, _ = candidate_pairs(bands_sid, "_sid", cap=5, hard_cap=10**6)
    got_df = decode_pair_ids(sid_pairs, enc.select("_sid", "id"), "id")
    got = set(map(tuple, got_df.toPandas().values))
    assert got == want
    # ordered decode preserves direction instead of normalizing
    ordered = decode_pair_ids(
        sid_pairs, enc.select("_sid", "id"), "id", ordered=True
    )
    norm = {tuple(sorted(t)) for t in map(tuple, ordered.toPandas().values)}
    assert norm == {tuple(sorted(t)) for t in want}


def test_mapside_verify_matches_join_path(spark):
    """The broadcast map-side verify (numpy gates + exact intersect +
    Spark-identical rounding) must emit exactly the join path's rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.minhash import band_explode
    from who_owns_mass_processing_spark.operators import verify as V
    from who_owns_mass_processing_spark.operators.blocking import (
        candidate_pairs,
        with_surrogate_ids,
    )
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures

    cfg = DedupeConfig(bands=32)
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(d, "doc_id", "text", cfg)
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    rep_sigs = with_surrogate_ids(
        sigs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    n = rep_sigs.count()
    bands = band_explode(rep_sigs, "minhash", "_sid", cfg.bands, cfg.rows_per_band)
    cands, _ = candidate_pairs(
        bands, "_sid", cap=cfg.band_bucket_cap, hard_cap=cfg.stop_band_threshold(n)
    )
    cands = cands.localCheckpoint(eager=True)
    feats = rep_sigs.select("_sid", "codes", "minhash")
    kwargs = dict(minhash_col="minhash", num_perm=cfg.num_perm)
    slow = V.verify_jaccard(cands, feats, "_sid", "codes", cfg.jaccard_threshold, **kwargs)
    fast = V.verify_jaccard(
        cands, feats, "_sid", "codes", cfg.jaccard_threshold, features_rows=n, **kwargs
    )
    assert "MapInArrow" in fast._jdf.queryExecution().executedPlan().toString()
    assert slow.exceptAll(fast).count() == 0
    assert fast.exceptAll(slow).count() == 0
    assert fast.count() > 0


def test_hamming_value_emitted_and_salting_invariant(spark):
    """r6 wave-3 gate: hamming_pairs emits the fused popcount distance
    with every pair (no feature re-join), and the emitted (a, b, hamming)
    set is identical across the unsalted, salted, and (est-driven)
    interpreted/vectorized generator paths — cross-band duplicates must
    collapse to the single deterministic value."""
    import numpy as np

    from who_owns_mass_processing_spark.operators.blocking import hamming_pairs

    rng = np.random.default_rng(11)
    hashes = rng.integers(0, 2**62, size=40, dtype=np.int64)
    # 3 near-dup clones of hash[0] within radius 2, plus two bands so the
    # same close pair appears in two buckets (cross-band duplicate)
    hashes[1] = hashes[0] ^ 0b11
    hashes[2] = hashes[0] ^ 0b1
    rows = []
    for band in (0, 1):
        for i, h in enumerate(hashes):
            rows.append((int(i), band, int(h) & 0xFFFF, int(h)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "band_id", "band_hash", "h"])
    )
    expect = None
    for cap in (1000, 3):  # unsalted vs salted (clone bucket splits)
        pairs, _ = hamming_pairs(df, "id", "h", radius=2, cap=cap, hard_cap=10**6)
        got = sorted(map(tuple, pairs.toPandas().values))
        assert all(hm <= 2 for _, _, hm in got)
        # values match a direct popcount recompute
        hs = {i: int(h) for i, h in enumerate(hashes)}
        for a, b, hm in got:
            assert hm == bin(hs[int(a)] ^ hs[int(b)]).count("1")
        if expect is None:
            expect = got
        else:
            assert got == expect

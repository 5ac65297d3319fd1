"""LSH band blocking -> candidate pairs, with explicit skew control.

The heart of the engine.  Reference analog chain:
  * blocking by standardized name / bounded address
    (dedupe_naive R/deduplicaters.R:208-223, dedupe_cosine_bounded
    :446-539) -> here: (band_id, band_hash) bucket keys;
  * the reference kills its hottest key by NULLing blank names
    (std_replace_blank R/standardizers.R:343-379) -> here: stop-band
    dropping + salted intra-bucket pair generation, all logged to the
    metrics table (north_rule: "salted keys and AQE handling hot-band
    skew").

Scale design (the part that must survive 100 TB):
  * Pair generation is a *self-equi-join on the bucket key*, not a
    crossJoin: Catalyst plans a shuffled hash join partitioned by
    (band_id, band_hash); AQE splits any residual skewed partition.
  * A bucket of size n yields n(n-1)/2 pairs — quadratic blowup is the
    real 100 TB killer, so buckets above `cap` are salted: rows get
    salt s in [0, m), pairs form within-salt plus across-salt (i<j), via
    joining on salt pairs — bounding any single join task.  Buckets above
    `hard_cap` (degenerate stop-bands, e.g. near-constant captions) are
    dropped and *counted* in metrics, mirroring the reference's blank-name
    NULLing.
  * Candidate dedup across bands keeps only min(band) per pair via
    groupBy(a, b) — the canonical LSH dedup shuffle, partial-aggregated
    map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sizes(bands_df: DataFrame) -> DataFrame:
    return bands_df.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_n"))


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str,
    cap: int = 2000,
    hard_cap: int = 50000,
) -> tuple[DataFrame, DataFrame]:
    """(band_id, band_hash, id) -> distinct candidate pairs (a < b).

    Returns (pairs, skew_metrics).  pairs has columns (a, b).
    skew_metrics has one row per band bucket class: kept / salted /
    dropped with row and bucket counts (feeds the metrics table).
    """
    cap = min(cap, hard_cap)  # stop threshold may undercut the salt cap
    sizes = bucket_sizes(bands_df)
    tagged = bands_df.join(sizes, ["band_id", "band_hash"])

    kept = tagged.where(F.col("bucket_n") <= cap)
    salted_src = tagged.where((F.col("bucket_n") > cap) & (F.col("bucket_n") <= hard_cap))
    dropped = tagged.where(F.col("bucket_n") > hard_cap)

    # --- normal buckets: self-join on the bucket key ----------------------
    left = kept.select("band_id", "band_hash", F.col(id_col).alias("a"))
    right = kept.select("band_id", "band_hash", F.col(id_col).alias("b"))
    pairs_normal = left.join(right, ["band_id", "band_hash"]).where(F.col("a") < F.col("b"))

    # --- salted buckets: bound per-task fan-out ---------------------------
    # salt s = xxhash64(id) mod m, m = ceil(bucket_n / cap); pairs form for
    # every salt pair (sa <= sb) — the salt-pair table is tiny and broadcast.
    m = F.ceil(F.col("bucket_n") / F.lit(cap)).cast("int")
    salted = salted_src.withColumn("m", m).withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("m")).cast("int")
    )
    sl = salted.select("band_id", "band_hash", "m", "salt", F.col(id_col).alias("a"))
    sr = salted.select(
        "band_id", "band_hash", F.col("salt").alias("salt_b"), F.col(id_col).alias("b")
    )
    # join key includes salt_b choices: explode left row to its (salt..m-1)
    # partners so each unordered salt pair is produced exactly once.
    sl_exp = sl.withColumn(
        "salt_b", F.explode(F.sequence(F.col("salt"), F.col("m") - 1))
    )
    # same-salt bucket: order by id (a < b); cross-salt (salt < salt_b):
    # every (x in salt, y in salt_b) pair appears exactly once — normalize
    # to unordered (least, greatest) so id order never loses pairs.
    pairs_salted = (
        sl_exp.join(sr, ["band_id", "band_hash", "salt_b"])
        .where(
            ((F.col("salt") == F.col("salt_b")) & (F.col("a") < F.col("b")))
            | (F.col("salt") < F.col("salt_b"))
        )
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
    )

    pairs = (
        pairs_normal.select("a", "b")
        .unionByName(pairs_salted.select("a", "b"))
        .groupBy("a", "b")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )

    metrics = (
        sizes.select(
            F.when(F.col("bucket_n") > hard_cap, F.lit("dropped_stop_band"))
            .when(F.col("bucket_n") > cap, F.lit("salted"))
            .otherwise(F.lit("kept"))
            .alias("bucket_class"),
            "bucket_n",
        )
        .groupBy("bucket_class")
        .agg(
            F.count("*").alias("buckets"),
            F.sum("bucket_n").alias("rows"),
            F.max("bucket_n").alias("max_bucket"),
        )
    )
    _ = dropped  # dropped rows contribute no pairs by design (stop bands)
    return pairs, metrics

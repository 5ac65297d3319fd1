"""Exact verification of banded candidate pairs (block-then-verify).

Reference analog: the reference *blocks* by name/address then keeps only
pairs whose TF-IDF cosine clears min_simil (0.85 inst / 0.95 individual,
R/deduplicaters.R:342-346, config.R:28-29).  Here:

  caption tier  exact Jaccard over char-shingle arrays (builtins:
                array_intersect — no Python) >= cfg.jaccard_threshold;
  image tier    popcount Hamming over pHash (builtin bit_count)
                <= cfg.hamming_radius, plus for *lossy* formats a PSNR
                >= 40 dB decoded-pixel check (pandas UDF) — the two-tier
                strict/loose rule mirroring the reference's 0.85/0.95.

Scale notes: the verify join re-attaches per-id features by shuffling on
id — bytes are re-joined ONLY for the lossy-pair PSNR subset (tiny), the
Jaccard verify carries shingle arrays not raw text, and every join is a
plain equi-join AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.functions.images import psnr_pair_udf
from who_owns_mass_processing_spark.functions.text import jaccard_arrays


def verify_jaccard(
    pairs: DataFrame,
    features: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    minhash_col: str | None = None,
    num_perm: int | None = None,
    gate_sigmas: float = 6.5,
) -> DataFrame:
    """pairs(a,b) x features(id, shingles) -> (a, b, jaccard) passing rows.

    When `minhash_col`/`num_perm` are given, an ESTIMATE GATE runs before
    the exact shingle intersect: the fraction of equal minhash positions
    is Binomial(num_perm, J)/num_perm, so gating at
    threshold - gate_sigmas * sqrt(threshold(1-threshold)/num_perm)
    drops a true pair at J == threshold with probability Phi(-gate_sigmas)
    (~4e-11 at the 6.5-sigma default, 128 perms) while eliminating the
    bulk of sub-threshold candidates before they pay the O(|codes|)
    intersect (position compare is O(num_perm) on fixed-width longs).
    Survivors always get the exact verify, so emitted rows are exact
    either way; the gate only changes *cost*, with the stated recall
    bound.  Measured at sf0.1 docs (tiny-vocab adversarial corpus):
    2.33M candidates -> 0.90M survivors, verify 10s -> 7s at local[32];
    at web-corpus similarity profiles (background J << threshold) the
    survivor cut is >90%."""
    # EXACT size-ratio pre-filter, evaluated BEFORE any per-element
    # expression: |A∩B| <= min(|A|,|B|) and |A∪B| >= max, so
    # J <= min/max — a pair failing min/max >= threshold can never
    # verify.  The epsilon covers the output's round(J, 6) boundary
    # (round(0.7999995, 6) == 0.8 passes the final filter) plus float
    # slop: the filter may only ADMIT extra pairs, never reject a true
    # one.  The scalar compare short-circuits the O(num_perm) estimate
    # (and the O(|codes|) intersect) for size-mismatched candidates —
    # measured 4.2 s -> 1.5 s on the 2.33M-candidate gate stage at
    # sf0.1 and a ~12% cut of exact-verify survivors.
    ratio_floor = F.lit(float(threshold) - 1e-6)

    def _ratio_ok(na, nb):
        return F.least(na, nb).cast("double") >= ratio_floor * F.greatest(na, nb).cast("double")

    if minhash_col is not None and num_perm:
        gate = threshold - gate_sigmas * (threshold * (1 - threshold) / num_perm) ** 0.5
        ma = features.select(
            F.col(id_col).alias("a"), F.col(minhash_col).alias("_ma"),
            F.size(shingle_col).alias("_na"),
        )
        mb = features.select(
            F.col(id_col).alias("b"), F.col(minhash_col).alias("_mb"),
            F.size(shingle_col).alias("_nb"),
        )
        est = F.size(
            F.filter(F.zip_with(F.col("_ma"), F.col("_mb"), lambda x, y: x == y), lambda t: t)
        ) / F.lit(float(num_perm))
        pairs = (
            pairs.join(ma, "a")
            .join(mb, "b")
            .where(_ratio_ok(F.col("_na"), F.col("_nb")) & (est >= F.lit(gate)))
            .select("a", "b")
        )
        size_gated = True
    else:
        size_gated = False
    fa = features.select(F.col(id_col).alias("a"), F.col(shingle_col).alias("_sa"))
    fb = features.select(F.col(id_col).alias("b"), F.col(shingle_col).alias("_sb"))
    out = pairs.join(fa, "a").join(fb, "b")
    if not size_gated:
        out = out.where(_ratio_ok(F.size("_sa"), F.size("_sb")))
    return (
        out.select("a", "b", F.round(jaccard_arrays(F.col("_sa"), F.col("_sb")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def verify_hamming(
    pairs: DataFrame,
    features: DataFrame,
    id_col: str,
    hash_col: str,
    radius: int,
) -> DataFrame:
    """pairs(a,b) x features(id, hash64) -> (a, b, hamming) within radius.
    Pure JVM: bit_count(xor)."""
    fa = features.select(F.col(id_col).alias("a"), F.col(hash_col).alias("_ha"))
    fb = features.select(F.col(id_col).alias("b"), F.col(hash_col).alias("_hb"))
    return (
        pairs.join(fa, "a")
        .join(fb, "b")
        .select(
            "a",
            "b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
    )


def verify_psnr(
    pairs: DataFrame,
    blobs: DataFrame,
    id_col: str,
    bytes_col: str,
    fmt_col: str,
    min_db: float,
) -> DataFrame:
    """Lossy-tier pixel verify: pairs where either side is a lossy format
    must clear PSNR >= min_db on decoded pixels; lossless-only pairs pass
    through (their Hamming check suffices — exact pixels).

    Returns (a, b, psnr, lossy) for ALL input pairs that pass.
    """
    # fetch ONLY the needed blobs: the candidate-pair id set is tiny
    # relative to the corpus, so a broadcast semi-join prunes the blob
    # scan instead of shuffling every image's bytes through the join
    needed = (
        pairs.select(F.col("a").alias(id_col))
        .unionByName(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    blobs = blobs.join(F.broadcast(needed), id_col, "left_semi")
    fa = blobs.select(
        F.col(id_col).alias("a"), F.col(bytes_col).alias("_ba"), F.col(fmt_col).alias("_fa")
    )
    fb = blobs.select(
        F.col(id_col).alias("b"), F.col(bytes_col).alias("_bb"), F.col(fmt_col).alias("_fb")
    )
    lossy = F.col("_fa").isin("jpeg", "qjp") | F.col("_fb").isin("jpeg", "qjp")
    joined = pairs.join(fa, "a").join(fb, "b").withColumn("lossy", lossy)
    udf = psnr_pair_udf()
    scored = joined.withColumn(
        "psnr", F.when(F.col("lossy"), udf(F.col("_ba"), F.col("_bb"))).otherwise(F.lit(999.0))
    )
    return scored.where(F.col("psnr") >= min_db).select("a", "b", "psnr", "lossy")

"""Embedding-vector similarity — pure Catalyst builtins (zip_with /
aggregate), plus a random-hyperplane LSH bucketer for the ANN scale path.

Part of the training-data-pipeline surface (embedding-cosine near-dup /
similarity search).  Brute-force cosine is the small-scale baseline and
the DuckDB-oracle-checkable query; the hyperplane-LSH variant is the
10^12-scale path (bucket equi-join blocking, same shape as the MinHash
band join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product (deterministic order —
    matches the DuckDB oracle's list_sum over the same order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_pairs(df: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """Brute-force all-pairs cosine >= threshold (a < b). O(n^2) baseline —
    only for oracle-scale data; use `hyperplane_buckets` blocking at scale."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    joined = a.join(b, F.col("a") < F.col("b"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        joined.select("a", "b", F.round(sim, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def hyperplane_planes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit_i = <vec, plane_i> >= 0 (builtins only;
    the plane matrix rides along as literals — broadcast-sized)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def ann_topk_bruteforce(
    df: DataFrame, queries: DataFrame, id_col: str, vec_col: str, qid_col: str, qvec_col: str, k: int
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast the query side — the
    canonical shape: small query set x huge corpus)."""
    from pyspark.sql import Window

    joined = df.crossJoin(F.broadcast(queries))
    sim = cosine(F.col(vec_col), F.col(qvec_col))
    w = (
        Window.partitionBy(qid_col)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
    )
    return (
        joined.select(qid_col, id_col, F.round(sim, 6).alias("cos_sim"))
        .where(F.col(qid_col) != F.col(id_col))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

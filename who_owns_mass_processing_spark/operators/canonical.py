"""Canonical cluster representatives + dedup-adjacent aggregations.

Reference analogs:
  * group mode / modal name ("dedupe_text_mode", R/deduplicaters.R:290-311,
    metacorps :1033-1075) -> `group_mode`;
  * singleton fallback ids (R/deduplicaters.R:367-377) -> `with_singletons`;
  * string-set aggregation (positions collapse, R/deduplicaters.R:845-847)
    -> `string_set_agg`;
  * group-wise NULL fill (tidyr::fill downup, R/deduplicaters.R:137,147...)
    -> `group_fill` (order-free: any non-null in group wins — the
    reference's row order inside groups is incidental, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_mode(
    df: DataFrame, group_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """Most frequent value per group; ties broken by value asc (determinism).
    Two-shuffle shape: count per (group, value), then window top-1 per
    group — never a driver-side collect."""
    out_col = out_col or f"modal_{value_col}"
    counts = df.groupBy(group_col, value_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("_n"), F.asc(value_col))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(group_col, F.col(value_col).alias(out_col))
    )


def cluster_exemplars(assignments: DataFrame, records: DataFrame, id_col: str,
                      caption_col: str, cluster_col: str = "component") -> DataFrame:
    """clusters table: (cluster_id, size, exemplar_id=min id, modal caption).
    Reference analog: metacorps id + modal name (R/deduplicaters.R:1033-1075)."""
    joined = assignments.join(
        records.select(F.col(id_col).alias("node"), F.col(caption_col).alias("_cap")), "node"
    )
    base = joined.groupBy(cluster_col).agg(
        F.count("*").alias("size"), F.min("node").alias("exemplar_id")
    )
    modal = group_mode(joined, cluster_col, "_cap", "modal_caption")
    return base.join(modal, cluster_col).withColumnRenamed(cluster_col, "cluster_id")


def with_singletons(
    records: DataFrame, id_col: str, assignments: DataFrame, cluster_col: str = "component"
) -> DataFrame:
    """Every record gets a cluster: unmatched rows become their own
    singleton cluster (id = own record id) — C4 fallback semantics."""
    return (
        records.select(F.col(id_col).alias("node"))
        .join(assignments, "node", "left")
        .select("node", F.coalesce(cluster_col, "node").alias(cluster_col))
    )


def string_set_agg(df: DataFrame, group_col: str, value_col: str, out_col: str) -> DataFrame:
    """Sorted-distinct comma-collapse (A5): deterministic across partitions."""
    return df.groupBy(group_col).agg(
        F.concat_ws(",", F.sort_array(F.collect_set(value_col))).alias(out_col)
    )


def group_fill(df: DataFrame, group_cols: list[str], fill_cols: list[str]) -> DataFrame:
    """Order-free group-wise NULL fill (A6): any non-null value in the
    group fills the NULLs (max over the group window — single shuffle)."""
    w = Window.partitionBy(*group_cols)
    out = df
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.max(c).over(w)))
    return out


def uniqueness_flag(df: DataFrame, group_cols: list[str], out_col: str) -> DataFrame:
    """A7: true iff the grouping key appears exactly once."""
    w = Window.partitionBy(*group_cols)
    return df.withColumn(out_col, F.count("*").over(w) == 1)


def top1_per_group(df: DataFrame, group_cols: list[str], order_by: list[Column]) -> DataFrame:
    """A9/O1/O3: deterministic per-group top-1 via row_number (never a
    global sort)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1).drop("_rk")


def vintage_pick(df: DataFrame, key_cols: list[str], vintage_col: str) -> DataFrame:
    """S2/O3 vintage resolution over a multi-snapshot union: the row with
    the HIGHEST vintage per key wins (reference loaders keep the latest
    assessment/parcel vintage per entity, R/loaders.R:3-88).  Determinism:
    ties broken by the remaining columns ascending."""
    others = [c for c in df.columns if c not in key_cols and c != vintage_col]
    order = [F.desc(vintage_col)] + [F.asc(c) for c in others]
    return top1_per_group(df, key_cols, order)


def cascade_lookup(
    df: DataFrame,
    lookups: list[tuple[DataFrame, list[str]]],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Cascading fill-in joins: C10 — the reference's 6-step address
    cascade (dedupe_unique_addresses, R/deduplicaters.R:10-56,59-206)
    resolves every row against a sequence of reference layers, each
    filling only what the previous steps left NULL.

    `lookups` is an ordered list of (lookup_df, join_keys); each
    lookup_df must carry `value_col` plus its join keys.  Earlier
    entries win; later entries fill remaining NULLs.  Every step is a
    plain left equi-join (AQE broadcasts dimension-sized layers), so
    the cascade is N sequential map-side joins at scale, never a
    shuffle of the base table when the layers are broadcastable.
    """
    out_col = out_col or value_col
    result = df
    acc: Column | None = F.col(out_col) if out_col in df.columns else None
    for i, (lk, keys) in enumerate(lookups):
        step = f"_cascade_{i}"
        # deterministic per-key reduction: a layer holding conflicting
        # values for one key resolves to min(value) on every run (a
        # dropDuplicates here would keep an arbitrary partition's row)
        renamed = lk.groupBy(*[F.col(k) for k in keys]).agg(
            F.min(value_col).alias(step)
        )
        result = result.join(renamed, keys, "left")
        acc = F.col(step) if acc is None else F.coalesce(acc, F.col(step))
    result = result.withColumn(out_col, acc)
    return result.drop(*[f"_cascade_{i}" for i in range(len(lookups))])

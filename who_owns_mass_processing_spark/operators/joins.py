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


def _bigram_block_keys(c: Column, max_dist: int) -> Column:
    """Multi-key blocking with a RECALL GUARANTEE for levenshtein <= d:

    * strings of length >= 2d+2: distinct char bigrams.  A string of
      length n has n-1 bigram positions and one edit alters at most two
      of them (an indel shifts positions but preserves suffix bigram
      *content*), so two strings within distance d share at least
      (n-1) - 2d >= 1 distinct bigram — including first-character typos,
      which the round-1 first-char blocking silently missed.
    * strings of length <= 3d+1: additionally (or, below 2d+2, only)
      length-window keys L{len-d}..L{len} on BOTH sides — two strings
      collide iff their lengths differ by <= d, which levenshtein <= d
      implies.  The overlap band [2d+2, 3d+1] emits BOTH key classes so
      a boundary-straddling pair (e.g. 6-char vs 5-char at d=2) still
      collides.  Sub-(3d+1) strings are a small finite set, so the
      quasi-cross-join within a length window is bounded.
    """
    n = F.length(c)
    empty = F.array().cast("array<string>")
    bigrams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n - 1), lambda i: c.substr(i, F.lit(2)))
    )
    len_keys = F.transform(
        F.sequence(F.greatest(n - max_dist, F.lit(0)), n),
        lambda length: F.concat(F.lit("#L"), length.cast("string")),
    )
    return F.concat(
        F.when(n >= 2 * max_dist + 2, bigrams).otherwise(empty),
        F.when(n <= 3 * max_dist + 1, len_keys).otherwise(empty),
    )


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

    Default blocking is multi-key char-bigram / length-window
    (`_bigram_block_keys`) with guaranteed recall at levenshtein <=
    max_dist; candidates are generated over DISTINCT values (dup rows
    never multiply the candidate join) and verified with builtin
    levenshtein.  A custom single-key `block_fn(col) -> Column` replaces
    it when a domain key is stronger (e.g. fuzzify_key anagram blocking
    from functions.standardize).  keep="best" keeps the minimum-distance
    match per left row (slice_min parity, ref R/standardizers.R:
    1629-1653), tie-broken by right value asc.
    """
    lv = left.select(F.col(left_col)).where(F.col(left_col).isNotNull()).distinct()
    rv = right.select(F.col(right_col)).where(F.col(right_col).isNotNull()).distinct()
    if block_fn is not None:
        lk = lv.withColumn("_bk", block_fn(F.col(left_col)))
        rk = rv.withColumn("_bk", block_fn(F.col(right_col)))
    else:
        lk = lv.withColumn("_bk", F.explode(_bigram_block_keys(F.col(left_col), max_dist)))
        rk = rv.withColumn("_bk", F.explode(_bigram_block_keys(F.col(right_col), max_dist)))
    cand = (
        lk.join(rk, "_bk")
        .select(left_col, right_col)
        .groupBy(left_col, right_col)  # collapse multi-key duplicates map-side
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    verified = cand.withColumn(
        "dist", F.levenshtein(F.col(left_col), F.col(right_col))
    ).where(F.col("dist") <= max_dist)
    joined = left.join(verified, left_col).join(right, right_col)
    if keep == "best":
        w = Window.partitionBy(left_col).orderBy(F.asc("dist"), F.asc(right_col))
        joined = joined.withColumn("_rk", F.row_number().over(w)).where(
            F.col("_rk") == 1
        ).drop("_rk")
    return joined

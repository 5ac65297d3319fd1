"""Per-cluster over-merge diagnostics — the audit rollup a human (or a
gating job) reviews when a mega-cluster appears.

Reference analog: the diagnostic summarizers the reference ships for
manual over-inclusion review (R/summarizers.R:57-92 —
`innetwork_company_count` per officer/network, `company_count` per
metacorp network; README.md:117 "for diagnosing cases of
over-inclusion"; DICTIONARY.md:88-118 documents the audit fields).
The engine analog surfaces, per cluster:

  * size                      — member count;
  * n_distinct_<col>          — distinct-value counts of caller-chosen
                                record columns (the reference's
                                distinct-company count per network);
  * n_edges / per-tier counts — how many verified pairs, from which
                                tier, hold the cluster together (a
                                size-1000 cluster held by 999 caption
                                edges and 0 image edges is a red flag);
  * min_intra_sim             — the WEAKEST verified similarity inside
                                the cluster: transitive chains merge
                                clusters through their weakest link, so
                                this is the over-merge smoking gun;
  * edge_density              — n_edges / C(size, 2); near-zero density
                                on a large cluster means a long chain,
                                not a clique of near-duplicates.

Scale shape: two single-shuffle groupBys (members keyed by cluster,
edges keyed by the a-side cluster — both endpoints of an edge share a
cluster by CC construction) and one broadcast-friendly left join.  No
window over the full corpus, no pair re-listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_diagnostics(
    assignments: DataFrame,
    records: DataFrame,
    edges: DataFrame,
    id_col: str,
    cluster_col: str = "cluster_id",
    distinct_counts: dict[str, str] | None = None,
    sim_col: str | None = None,
    sim_out: str = "min_intra_sim",
    tier_values: tuple[str, ...] = (),
) -> DataFrame:
    """assignments: (id_col, cluster_col); records: id_col + audit
    columns; edges: (a, b[, tier][, sim_col]) — the verified pair list
    that produced the clusters.

    distinct_counts maps output column name -> records column to count
    distinctly per cluster.  tier_values, when given, adds one
    n_edges_<tier> column per listed tier (explicit list: no
    distinct-scan pivot).  Singleton clusters appear with n_edges 0 and
    NULL min_intra_sim."""
    distinct_counts = distinct_counts or {}

    member_aggs = [F.count("*").alias("size")] + [
        F.countDistinct(src).alias(out) for out, src in distinct_counts.items()
    ]
    base = (
        assignments.join(
            records.select(F.col(id_col), *{*distinct_counts.values()}), id_col
        )
        .groupBy(cluster_col)
        .agg(*member_aggs)
    )

    e = edges.join(
        assignments.select(F.col(id_col).alias("a"), cluster_col), "a"
    )
    edge_aggs = [F.count("*").alias("n_edges")]
    if sim_col:
        edge_aggs.append(F.min(sim_col).alias(sim_out))
    for t in tier_values:
        edge_aggs.append(
            F.sum(F.when(F.col("tier") == t, 1).otherwise(0)).alias(f"n_edges_{t}")
        )
    per_edge = e.groupBy(cluster_col).agg(*edge_aggs)

    out = base.join(per_edge, cluster_col, "left")
    fill = {"n_edges": 0, **{f"n_edges_{t}": 0 for t in tier_values}}
    out = out.fillna(fill)
    return out.withColumn(
        "edge_density",
        F.when(
            F.col("size") > 1,
            F.round(F.col("n_edges") / (F.col("size") * (F.col("size") - 1) / 2), 6),
        ),
    )

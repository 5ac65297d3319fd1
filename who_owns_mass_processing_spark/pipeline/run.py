"""The flagship end-to-end pipeline over the `images` table.

Stage DAG (each stage a checkpointed table — SURVEY.md §3 target
lifecycle; reference analog: the load -> proc -> dedupe staged run with
materialization barriers, R/runner.R:1-41):

  ingest          project (image_id, fmt, caption, phash); `bytes` is NOT
                  carried forward (scale rule: payload never shuffles)
  signatures      caption fingerprint + shingle codes + MinHash (one
                  Arrow pass) + pHash
  caption_pairs   LSH bands -> salted candidates -> exact Jaccard >= tau
  image_pairs     pHash byte-bands -> candidates -> bit_count Hamming <= r
                  -> PSNR >= 40 dB decoded-pixel verify for lossy pairs
                  (re-joins `bytes` for only that pair subset)
  edges           caption tier UNION image tier  (dedupe_network analog,
                  R/deduplicaters.R:248-288: two similarity keys fused)
  assignments     connected components + singleton fallback
  clusters        exemplar = min image_id, modal caption, size
  metrics         band-skew classes + per-stage row counts (lineage)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.config import DedupeConfig
from who_owns_mass_processing_spark.operators.blocking import hamming_pairs
from who_owns_mass_processing_spark.operators.canonical import cluster_exemplars, with_singletons
from who_owns_mass_processing_spark.operators.connected_components import connected_components
from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures
from who_owns_mass_processing_spark.operators.verify import verify_psnr
from who_owns_mass_processing_spark.pipeline.checkpoint import StageCatalog


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    workdir: str,
    cfg: DedupeConfig | None = None,
    refresh: bool = False,
    second_round: bool = False,
) -> dict[str, DataFrame]:
    cfg = cfg or DedupeConfig()
    cat = StageCatalog(spark, workdir, cfg.fingerprint())

    # `refresh` forces the root stages; every downstream stage declares
    # its upstream stages so a recompute CASCADES (a cached downstream
    # table derived from now-stale input must not be reused — the config
    # fingerprint cannot see input-data changes)
    def roc(stage, fn, upstream=(), partition_by=None):
        return cat.read_or_compute(
            stage, fn, partition_by=partition_by, refresh=refresh, upstream=upstream
        )

    # --- ingest: strip payload immediately; byte fingerprint for the
    # exact-image tier rides along (32 B vs 100 KB payload) -----------------
    def _ingest() -> DataFrame:
        return images.select(
            "image_id", "fmt", "caption", "phash",
            F.sha2(F.col("bytes"), 256).alias("byte_fp"),
        )

    ingested = roc("ingest", _ingest)

    # --- signatures ---------------------------------------------------------
    def _signatures() -> DataFrame:
        sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
        return sigs.join(ingested.select("image_id", "phash", "fmt"), "image_id")

    # (submitted below: signatures only feeds the caption tier, so it
    # runs at the head of the caption THREAD instead of serializing the
    # whole tier phase behind it — guide §2.6)

    # row count from the stage manifest: a resumed run spends ZERO jobs
    # re-counting (write() recorded it)
    n_rows = cat.rows("ingest")
    stop_cap = cfg.stop_band_threshold(n_rows)

    # --- caption tier ---------------------------------------------------------
    def _caption_pairs(sigs: DataFrame) -> DataFrame:
        from who_owns_mass_processing_spark.operators.dedupe import (
            exact_fingerprint_edges,
            rep_pairs_from_sigs,
        )

        # LSH over distinct-fingerprint representatives only (identical
        # captions never enter banding — their mega-buckets are pure
        # fan-out), plus linear star edges for the exact-dup families.
        # No dedup aggregation on the union: rep pairs join two DIFFERENT
        # fingerprints, star edges share one — disjoint and internally
        # unique (the lsh_near_dup_pairs §2.4 argument).
        rep_pairs, skew = rep_pairs_from_sigs(sigs, "image_id", cfg, corpus_rows=n_rows)
        cat.write("caption_band_skew", skew)
        exact = exact_fingerprint_edges(sigs, "image_id")
        return (
            rep_pairs.select("a", "b", "jaccard")
            .unionByName(exact)
            .withColumn("tier", F.lit("caption"))
        )

    # (submitted below, concurrently with the image tier — guide §2.6:
    # the caption and image tiers share no inputs beyond the already-
    # materialized signatures/ingest stages, so their stage jobs overlap
    # and the image tier's tasks back-fill the caption tier's tail)

    # --- image tier -----------------------------------------------------------
    # Byte-identical images (exact web dups, the dominant dup class) are
    # connected by LINEAR star edges on sha256(bytes) and only one
    # representative per byte group enters pHash blocking + PSNR: byte
    # identity implies pixel identity, so rep-level Hamming/PSNR verdicts
    # are exact for every member (same components, ~0 payload decode for
    # dup families).
    def _image_exact_edges() -> DataFrame:
        mins = ingested.groupBy("byte_fp").agg(F.min("image_id").alias("a"))
        return (
            ingested.join(mins, "byte_fp")
            .where(F.col("image_id") != F.col("a"))
            .select("a", F.col("image_id").alias("b"))
            .withColumn("tier", F.lit("image_exact"))
        )

    # (submitted below, concurrently with the caption tier)

    def _image_pairs() -> DataFrame:
        from who_owns_mass_processing_spark.functions.images import phash_combo_bands
        from who_owns_mass_processing_spark.operators.blocking import (
            decode_pair_ids,
            with_surrogate_ids,
        )

        byte_reps = ingested.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
        # banding + Hamming verify ride the 8-byte surrogate id (VERDICT
        # r4 #1: band/cell/pair rows carried the string image_id — the
        # block phase's dominant shuffle bytes); the checkpoint inside
        # with_surrogate_ids also stops the semi-join recomputing per
        # consumer (bands, verify, decode)
        reps = with_surrogate_ids(
            ingested.join(byte_reps, ["image_id", "byte_fp"], "left_semi")
            .select("image_id", "phash")
        )
        bands = phash_combo_bands(
            reps, "phash", "_sid",
            n_bands=cfg.phash_bands, radius=cfg.hamming_radius,
        )
        # Hamming check fused into pair generation: failing candidates are
        # never materialized (the multi-index background-collision volume
        # otherwise dwarfs the true-pair count)
        cands, skew = hamming_pairs(
            bands, "_sid", "phash", cfg.hamming_radius,
            cap=cfg.band_bucket_cap, hard_cap=stop_cap,
        )
        cat.write("image_band_skew", skew)
        # cands carries the fused Hamming distance — no verify_hamming
        # feature re-joins (guide §2.4; value emitted by hamming_pairs)
        ham = decode_pair_ids(cands, reps.select("_sid", "image_id"), "image_id")
        # pin the verified pair list: verify_psnr references it for the
        # lossy tagging, the blob-id set, AND the passthrough branch, and
        # the final output joins it again — without a lineage cut each
        # reference re-ran the whole banding+pair-gen chain inside the
        # stage write (the plan ends in a projection, so ReuseExchange
        # never dedups it).  Bounded: verified pairs only.
        ham = ham.localCheckpoint(eager=True)
        # lossy pairs additionally need the decoded-pixel PSNR gate; the
        # bytes join touches only candidate pairs that already passed Hamming
        psnr_ok = verify_psnr(
            ham.select("a", "b"),
            images.select("image_id", "bytes", "fmt"),
            "image_id",
            "bytes",
            "fmt",
            cfg.psnr_min_db,
        )
        return (
            ham.join(psnr_ok.select("a", "b", "psnr"), ["a", "b"])
            .withColumn("tier", F.lit("image"))
        )

    from concurrent.futures import ThreadPoolExecutor

    # the caption THREAD runs signatures then caption_pairs (signatures
    # feeds nothing else, so it must not serialize the image tiers
    # behind it); the payload-scanning partition metrics rollup depends
    # only on the input, so its scan overlaps the tier phase instead of
    # running in the tail (guide §2.6 back-fill)
    def _caption_tier() -> tuple[DataFrame, DataFrame]:
        s = roc("signatures", _signatures, upstream=("ingest",))
        cp = roc("caption_pairs", lambda: _caption_pairs(s), ("signatures", "ingest"))
        return s, cp

    def _partition_metrics() -> DataFrame:
        """Per-partition input metrics (north_rule: per-partition lineage
        + metrics): rows + payload bytes per input unit — builtins only;
        decode-failure accounting lives in functions.images.
        decode_stats_map for the audit path.

        For file-backed inputs the unit is the SOURCE FILE
        (`_metadata.file_path` — durable lineage that survives re-reads);
        for non-file inputs it falls back to the scan partition id."""
        try:
            keyed = images.select(
                F.col("_metadata.file_path").alias("src_file"),
                F.length("bytes").alias("_sz"),
            )
            key = "src_file"
        except Exception:  # non-file source: no _metadata column
            keyed = images.select(
                F.spark_partition_id().cast("string").alias("src_file"),
                F.length("bytes").alias("_sz"),
            )
            key = "src_file"
        return keyed.groupBy(key).agg(
            F.count("*").alias("rows"), F.sum("_sz").alias("payload_bytes")
        )

    def _partition_metrics_tiered() -> DataFrame:
        # stage name is VERSIONED: the output schema changed in round 2
        # (partition_id int -> src_file string); an unversioned name
        # would silently resume the old-schema checkpoint (see the
        # _partition_metrics docstring below)
        cat.supersede("partition_metrics")
        return roc("partition_metrics_v2", _partition_metrics)

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_cap = pool.submit(_caption_tier)
        f_iee = pool.submit(roc, "image_exact_edges", _image_exact_edges, ("ingest",))
        f_imp = pool.submit(roc, "image_pairs", _image_pairs, ("ingest",))
        f_pm = pool.submit(_partition_metrics_tiered)
        sigs, caption_pairs = f_cap.result()
        image_exact_edges = f_iee.result()
        image_pairs = f_imp.result()
        partition_metrics = f_pm.result()

    # --- edges + clustering ---------------------------------------------------
    def _edges() -> DataFrame:
        return (
            caption_pairs.select("a", "b", "tier")
            .unionByName(image_pairs.select("a", "b", "tier"))
            .unionByName(image_exact_edges.select("a", "b", "tier"))
        )

    edges = roc(
        "edges", _edges, upstream=("caption_pairs", "image_pairs", "image_exact_edges")
    )

    def _assignments() -> DataFrame:
        cc = connected_components(
            edges.select("a", "b").distinct(),
            max_iterations=cfg.cc_max_iterations,
            checkpoint_every=cfg.cc_checkpoint_every,
            dedup_edges=False,  # caller distincts the (a, b) union above
        )
        return with_singletons(ingested, "image_id", cc).withColumnRenamed(
            "node", "image_id"
        ).withColumnRenamed("component", "cluster_id")

    assignments = roc("assignments", _assignments, upstream=("edges", "ingest"))

    def _clusters() -> DataFrame:
        return cluster_exemplars(
            assignments.withColumnRenamed("image_id", "node").withColumnRenamed(
                "cluster_id", "component"
            ),
            ingested,
            "image_id",
            "caption",
        )

    # (submitted below, concurrently with the diagnostics rollup)

    # --- per-cluster over-merge diagnostics -----------------------------------
    # Reference analog: the over-inclusion audit summarizers
    # (R/summarizers.R:57-92, README.md:117, DICTIONARY.md:88-118).
    # Tier similarities are mapped onto one [0,1] scale so min_intra_sim
    # is comparable across tiers: caption = exact Jaccard, image =
    # 1 - hamming/64, image_exact = 1.0 (byte identity).
    def _cluster_diagnostics() -> DataFrame:
        from who_owns_mass_processing_spark.operators.diagnostics import (
            cluster_diagnostics,
        )

        sim_edges = (
            caption_pairs.select("a", "b", "tier", F.col("jaccard").alias("sim"))
            .unionByName(
                image_pairs.select(
                    "a", "b", "tier",
                    (F.lit(1.0) - F.col("hamming") / F.lit(64.0)).alias("sim"),
                )
            )
            .unionByName(
                image_exact_edges.select("a", "b", "tier", F.lit(1.0).alias("sim"))
            )
        )
        return cluster_diagnostics(
            assignments,
            ingested,
            sim_edges,
            id_col="image_id",
            cluster_col="cluster_id",
            distinct_counts={"n_formats": "fmt", "n_distinct_images": "byte_fp"},
            sim_col="sim",
            tier_values=("caption", "image", "image_exact"),
        )

    # clusters and the diagnostics rollup both consume only materialized
    # stages — overlap their jobs (guide §2.6)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_clusters = pool.submit(roc, "clusters", _clusters, ("assignments", "ingest"))
        f_diag = pool.submit(
            roc,
            "cluster_diagnostics",
            _cluster_diagnostics,
            ("assignments", "caption_pairs", "image_pairs", "image_exact_edges", "ingest"),
        )
        clusters = f_clusters.result()
        cluster_diag = f_diag.result()

    # --- optional C7 second network round --------------------------------------
    # Reference analog: community detection over GROUP ids rather than row
    # ids (dedupe_network over (company_group, officer group),
    # R/deduplicaters.R:860-930).  Each tier is clustered on its own,
    # then connected components run over the bipartite graph of
    # (caption_cluster_id, image_cluster_id) — mathematically this
    # fuses the same components as the tier-union CC above (pinned by
    # tests/test_pipeline.py), but it is the reference's staged shape
    # and the group graph is orders of magnitude smaller than the row
    # graph at scale.
    networks = None
    if second_round:
        from who_owns_mass_processing_spark.operators.network import network_round

        def _networks() -> DataFrame:
            # the two per-tier CC fixpoints are independent driver-sync
            # loops over disjoint edge sets — run them from two driver
            # threads so their (small, barrier-heavy) iteration jobs
            # interleave on the idle cores (guide §2.6)
            def _cap_cc() -> DataFrame:
                return with_singletons(
                    ingested, "image_id",
                    connected_components(
                        caption_pairs.select("a", "b").distinct(),
                        max_iterations=cfg.cc_max_iterations,
                        checkpoint_every=cfg.cc_checkpoint_every,
                        dedup_edges=False,  # distincted above
                    ),
                ).select(
                    F.col("node").alias("image_id"),
                    F.col("component").alias("caption_cluster"),
                )

            def _img_cc() -> DataFrame:
                img_edges = (
                    image_pairs.select("a", "b")
                    .unionByName(image_exact_edges.select("a", "b"))
                    .distinct()
                )
                return with_singletons(
                    ingested, "image_id",
                    connected_components(
                        img_edges,
                        max_iterations=cfg.cc_max_iterations,
                        checkpoint_every=cfg.cc_checkpoint_every,
                        dedup_edges=False,  # distincted above
                    ),
                ).select(
                    F.col("node").alias("image_id"),
                    F.col("component").alias("image_cluster"),
                )

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as cc_pool:
                f_cap_cc = cc_pool.submit(_cap_cc)
                f_img_cc = cc_pool.submit(_img_cc)
                rows = f_cap_cc.result().join(f_img_cc.result(), "image_id")
            # pin the (image_id, caption_cluster, image_cluster) rows:
            # network_round references its input four times (edge part,
            # two node parts, final attach) and each reference would
            # re-run the two singleton joins + this join (bounded: one
            # narrow row per image)
            rows = rows.localCheckpoint(eager=True)
            return network_round(rows, ["caption_cluster", "image_cluster"])

        networks = roc(
            "networks",
            _networks,
            upstream=("caption_pairs", "image_pairs", "image_exact_edges", "ingest"),
        )

    # --- metrics + lineage ------------------------------------------------------
    # (partition_metrics was computed in the tier pool above — its
    # payload scan depends only on the input and overlaps the tiers)


    def _metrics() -> DataFrame:
        # counts come from the stage manifests (recorded at write time)
        # — zero extra jobs whether resumed or fresh.  Built as a pure
        # JVM VALUES relation: createDataFrame of driver-local rows
        # parallelizes into defaultParallelism python-arrow slices, and
        # evaluating/writing that plan costs seconds of per-slice python
        # round-trips for a 4-row table (measured 2.6 s of the pipeline
        # bench); the VALUES form is a LocalTableScan, ~0.2 s.
        rows = [
            (s, cat.rows(s))
            for s in ("caption_pairs", "image_pairs", "edges", "clusters")
        ]
        vals = ", ".join(f"('{s}', {int(n)}L)" for s, n in rows)
        return spark.sql(f"SELECT stage, rows FROM VALUES {vals} AS t(stage, rows)")

    metrics = roc(
        "metrics", _metrics, upstream=("caption_pairs", "image_pairs", "edges", "clusters")
    )
    lineage = spark.createDataFrame(cat.lineage())

    out = {
        "ingest": ingested,
        "signatures": sigs,
        "caption_pairs": caption_pairs,
        "image_pairs": image_pairs,
        "edges": edges,
        "assignments": assignments,
        "clusters": clusters,
        "cluster_diagnostics": cluster_diag,
        "metrics": metrics,
        "partition_metrics": partition_metrics,
        "lineage": lineage,
    }
    if networks is not None:
        out["networks"] = networks
    return out

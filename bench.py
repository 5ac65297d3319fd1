#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), plus the
flagship images near-dup pipeline on a deterministic synthetic images
table (cached under /tmp, seed-fixed — no external data).

Timing excludes SparkSession startup; each query is materialized with a
noop-format write (computes every column, no sink cost).

Output:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "images_per_sec": T, "cpus": C}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dedup_cc_assignments",
    "minhash_lsh_pairs",
    "exact_dedup",
    "simhash_pairs",
    "summary_metrics",
    "join_agg_topk",
    "embedding_topk",
    "embedding_ann_lsh",
    "substring_dup_spans",
    "substring_dedup_cut",
    "winnow_fingerprint",
    # winnow_pairs is driver-verified at sf0.01 but excluded here: the
    # synthetic corpus is adversarially self-similar (93% of all doc
    # pairs share >= 2 winnow fingerprints at sf0.1), so its pair
    # listing is inherently ~all-pairs on this fixture — a corpus
    # property, not an operator property.
    "repetition_metrics",
    "text_metrics",
    "cluster_diagnostics",
    "windowed_event_counts",
]

BENCH_IMAGES_BASE = int(os.environ.get("BENCH_IMAGES_BASE", "2000"))


def ensure_bench_images(n_base: int, seed: int = 42) -> str:
    cache = f"/tmp/spark_graft_bench_images_n{n_base}_s{seed}"
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        from who_owns_mass_processing_spark.synth import write_images_parquet

        shutil.rmtree(cache, ignore_errors=True)
        write_images_parquet(cache, n_base=n_base, seed=seed)
        open(marker, "w").write("ok")
    return os.path.join(cache, "images.parquet")


def ensure_bench_images_parallel(n_base: int, seed: int = 42, workers: int = 24) -> str:
    """Large-corpus variant (scaling bench): multi-process deterministic
    generation into a multi-file parquet DIRECTORY (Spark-native layout —
    the scan parallelizes across files, which is also why the scaling
    worker reads it directly instead of caching it)."""
    cache = f"/tmp/spark_graft_bench_images_par_n{n_base}_s{seed}"
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        from who_owns_mass_processing_spark.synth import write_images_parquet_parallel

        shutil.rmtree(cache, ignore_errors=True)
        write_images_parquet_parallel(cache, n_base=n_base, seed=seed, workers=workers)
        open(marker, "w").write("ok")
    return os.path.join(cache, "images.parquet")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    import __spark_entry__ as entry_mod
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.pipeline.run import run_pipeline
    from who_owns_mass_processing_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # one discarded warm-up (same rationale as tools/scaling_bench.py:
    # python-worker spawn + whole-stage-codegen compile are one-time
    # session costs; per-query figures should measure the queries) —
    # a small pandas-UDF query plus a join/agg query cover both paths
    materialize(qs["text_metrics"](spark, sf_dir))
    # join/agg warm-up prefers the smallest sibling sf dir (cheapest), but
    # must not assume any fixture beyond sf_dir itself exists on this host
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    materialize(qs["minhash_lsh_pairs"](spark, warm_dir if os.path.isdir(warm_dir) else sf_dir))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # flagship images pipeline (fresh workdir every run: no resume credit)
    images_path = ensure_bench_images(BENCH_IMAGES_BASE)
    workdir = f"/tmp/spark_graft_bench_stages_{os.getpid()}"
    shutil.rmtree(workdir, ignore_errors=True)
    images = spark.read.parquet(images_path)
    n_images = images.count()
    t0 = time.time()
    out = run_pipeline(spark, images, workdir, DedupeConfig())
    materialize(out["assignments"])
    pipeline_sec = round(time.time() - t0, 3)
    timings["images_pipeline"] = pipeline_sec
    # C7 second network round: resumes the checkpointed pipeline, so this
    # times ONLY the group-graph CC stage increment (VERDICT r3 #7)
    t0 = time.time()
    out2 = run_pipeline(spark, images, workdir, DedupeConfig(), second_round=True)
    materialize(out2["networks"])
    timings["images_second_round"] = round(time.time() - t0, 3)
    shutil.rmtree(workdir, ignore_errors=True)

    # winnow_pairs / containment_pairs_lsh over the SAME cached caption
    # corpus (VERDICT r4 #6).  The sf0.1 documents fixture is
    # adversarially self-similar (see HEADLINE note above), so these two
    # are benched where their output is tier-shaped, with
    # caption-appropriate parameters: k=8/w=8/min_shared=3 (5-char grams
    # with min_shared=2 aren't discriminative over short 500-word-vocab
    # captions), and max_size_ratio=1.5 (captions are all 5-18 tokens;
    # ratio 4 maps the Jaccard floor to 0.28 and the banding goes
    # degenerate).  Both timings include the operators' stage overhead
    # (surrogate-id checkpoint, banding, salted pair-gen, exact verify).
    from who_owns_mass_processing_spark.config import DedupeConfig as _Cfg
    from who_owns_mass_processing_spark.operators import dedupe as _D

    captions = spark.read.parquet(images_path).select("image_id", "caption")
    t0 = time.time()
    wp, _ = _D.winnow_pairs(captions, "image_id", "caption", k=8, w=8, min_shared=3)
    materialize(wp)
    timings["caption_winnow_pairs"] = round(time.time() - t0, 3)
    t0 = time.time()
    cp, _ = _D.containment_pairs_lsh(
        captions, "image_id", "caption", _Cfg(), threshold=0.9, max_size_ratio=1.5
    )
    materialize(cp)
    timings["caption_containment_pairs"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "images_per_sec": round(n_images / pipeline_sec, 2),
                "n_images": n_images,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()

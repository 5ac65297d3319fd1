#!/usr/bin/env python
"""Instrumented mirror of the scaling-bench WORKER: per-substage wall
times + Spark REST stage metrics (UI enabled), to attribute the flat
block+verify time at 8 vs 32 cores.

Usage: profile_block2.py <cores> [n_base] [reps]
Reads the SAME parallel corpus as tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage_dump(port=4040):
    try:
        apps = json.load(urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications", timeout=5))
        app = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete",
            timeout=10))
        return [
            {
                "id": s["stageId"],
                "attempt": s["attemptId"],
                "tasks": s["numCompleteTasks"],
                "run_ms": s["executorRunTime"],
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "dur_ms": s.get("executorDeserializeTime", 0),
                "wall_ms": (
                    None
                    if not s.get("firstTaskLaunchedTime") or not s.get("completionTime")
                    else s["completionTime"]
                ),
                "sread_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "swrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": s["name"][:70],
            }
            for s in stages
        ]
    except Exception as e:  # pragma: no cover
        return [{"err": str(e)}]


def main() -> None:
    cores = int(sys.argv[1])
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import ensure_bench_images_parallel
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.images import (
        image_meta_udf,
        phash_combo_bands,
    )
    from who_owns_mass_processing_spark.operators.blocking import candidate_pairs
    from who_owns_mass_processing_spark.operators.dedupe import (
        exact_fingerprint_edges,
        minhash_signatures,
        rep_pairs_from_sigs,
    )
    from who_owns_mass_processing_spark.operators.verify import (
        verify_hamming,
        verify_psnr,
    )

    cfg = DedupeConfig()
    spark = (
        SparkSession.builder.appName("profile_block2")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_GRAFT_OFFHEAP", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100 "
            "-XX:G1HeapRegionSize=32m",
        )
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_bench_images_parallel(n_base)
    images = spark.read.parquet(path)
    n = images.count()

    def one_run(t):
        def mark(name, t0):
            t[name] = round(time.time() - t0, 2)
            print(f"  {name}: {t[name]}s", flush=True)

        t0 = time.time()
        meta = image_meta_udf()
        ingested = images.select(
            "image_id", "fmt", "caption",
            meta(F.col("bytes")).alias("m"),
            F.sha2(F.col("bytes"), 256).alias("byte_fp"),
        ).select("image_id", "fmt", "caption", F.col("m.phash").alias("phash"), "byte_fp")
        ingested = ingested.localCheckpoint(eager=True)
        mark("sig_decode", t0)
        t0 = time.time()
        sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
        sigs = sigs.join(ingested.select("image_id", "phash", "byte_fp"), "image_id")
        sigs = sigs.localCheckpoint(eager=True)
        mark("sig_minhash", t0)

        stop = cfg.stop_band_threshold(n)

        # --- caption chain, decomposed ---
        t0 = time.time()
        reps_c = sigs.groupBy("fingerprint").agg(F.min("image_id").alias("image_id"))
        rep_sigs = sigs.join(reps_c, ["image_id", "fingerprint"], "left_semi").localCheckpoint(eager=True)
        mark("cap_rep_sigs", t0)

        t0 = time.time()
        from who_owns_mass_processing_spark.functions.minhash import band_explode
        bands = band_explode(rep_sigs, "minhash", "image_id", cfg.bands, cfg.rows_per_band)
        cands, _m = candidate_pairs(bands, "image_id", cap=cfg.band_bucket_cap, hard_cap=stop)
        mark("cap_cells_ckpt", t0)  # census+cells eager inside candidate_pairs

        t0 = time.time()
        cands = cands.localCheckpoint(eager=True)
        mark("cap_pairs", t0)

        t0 = time.time()
        from who_owns_mass_processing_spark.operators.verify import verify_jaccard
        ver = verify_jaccard(cands, rep_sigs.select("image_id", "codes"),
                             "image_id", "codes", cfg.jaccard_threshold)
        ver = ver.localCheckpoint(eager=True)
        mark("cap_verify", t0)

        t0 = time.time()
        exact_edges = exact_fingerprint_edges(sigs, "image_id").select("a", "b")
        exact_edges = exact_edges.localCheckpoint(eager=True)
        mark("exact_edges", t0)

        # --- image chain ---
        t0 = time.time()
        byte_reps = sigs.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
        reps_df = sigs.join(byte_reps, ["image_id", "byte_fp"], "left_semi").localCheckpoint(eager=True)
        mark("byte_reps", t0)

        t0 = time.time()
        from who_owns_mass_processing_spark.operators.blocking import hamming_pairs
        img_bands = phash_combo_bands(reps_df, "phash", "image_id",
                                      cfg.phash_bands, cfg.hamming_radius)
        img_ham, _ = hamming_pairs(img_bands, "image_id", "phash",
                                   cfg.hamming_radius, cfg.band_bucket_cap, stop)
        img_ham = img_ham.localCheckpoint(eager=True)
        mark("img_pairs_fused", t0)

        t0 = time.time()
        img_ok = verify_psnr(img_ham.select("a", "b"), images.select("image_id", "bytes", "fmt"),
                             "image_id", "bytes", "fmt", cfg.psnr_min_db)
        img_ok = img_ok.localCheckpoint(eager=True)
        mark("img_psnr", t0)

        t0 = time.time()
        byte_star = sigs.join(byte_reps.withColumnRenamed("image_id", "a"), "byte_fp").where(
            F.col("image_id") != F.col("a")).select("a", F.col("image_id").alias("b"))
        edges = (ver.select("a", "b")
                 .unionByName(exact_edges)
                 .unionByName(img_ok.select("a", "b"))
                 .unionByName(byte_star).distinct().localCheckpoint(eager=True))
        ne = edges.count()
        mark("edges_union", t0)
        t["edges"] = ne
        t["total"] = round(sum(v for k, v in t.items() if k != "edges"), 2)
        return t

    import gc

    def cleanup():
        # free the previous run's localCheckpoint blocks: drop python refs,
        # force py4j handle release, then JVM GC so the block manager
        # evicts before the next rep measures
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    print("== warm-up ==", flush=True)
    one_run({})
    cleanup()
    allreps = []
    for r in range(reps):
        print(f"== rep {r} ==", flush=True)
        allreps.append(one_run({}))
        cleanup()
    print(json.dumps({"cores": cores, "n": n, "reps": allreps}))
    dump = stage_dump()
    with open(f"/tmp/stages_{cores}.json", "w") as f:
        json.dump(dump, f, indent=1)
    print(f"stage dump -> /tmp/stages_{cores}.json ({len(dump)} stages)")


if __name__ == "__main__":
    main()

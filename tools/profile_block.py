#!/usr/bin/env python
"""Per-substage profiler for the block+verify path (scaling diagnosis).

Runs the scaling-bench job with a noop-write materialization after each
substage so each timing isolates one plan fragment.  Usage:

    python tools/profile_block.py <cores> [shuffle_partitions] [n_base]

Prints one JSON line with per-substage seconds; compare local[8] vs
local[32] to find the anti-scaling stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else cores
    n_base = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("SCALING_IMAGES_BASE", "20000"))

    from pyspark.sql import functions as F

    from bench import ensure_bench_images
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.images import (
        image_meta_udf,
        phash_combo_bands,
    )
    from who_owns_mass_processing_spark.operators.blocking import candidate_pairs
    from who_owns_mass_processing_spark.operators.connected_components import (
        connected_components,
    )
    from who_owns_mass_processing_spark.operators.dedupe import (
        exact_fingerprint_edges,
        minhash_signatures,
        rep_pairs_from_sigs,
    )
    from who_owns_mass_processing_spark.operators.verify import (
        verify_hamming,
        verify_psnr,
    )
    from who_owns_mass_processing_spark.session import get_spark

    cfg = DedupeConfig()
    spark = get_spark(cores=cores, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_bench_images(n_base)
    images = spark.read.parquet(path).repartition(cores).localCheckpoint(eager=True)
    n = images.count()

    timings: dict[str, float] = {}

    def mark(name: str, df, t0: float):
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)

    # warm-up (identical to scaling bench)
    warm = spark.createDataFrame(
        images.select("image_id", "bytes", "caption").limit(64).collect()
    ).localCheckpoint(eager=True)
    _warm_meta = image_meta_udf()
    warm.select(_warm_meta(F.col("bytes"))).write.format("noop").mode("overwrite").save()
    minhash_signatures(warm, "image_id", "caption", cfg).write.format(
        "noop").mode("overwrite").save()

    t0 = time.time()
    meta = image_meta_udf()
    ingested = images.select(
        "image_id", "fmt", "caption",
        meta(F.col("bytes")).alias("m"),
        F.sha2(F.col("bytes"), 256).alias("byte_fp"),
    ).select("image_id", "fmt", "caption", F.col("m.phash").alias("phash"), "byte_fp")
    ingested = ingested.localCheckpoint(eager=True)
    sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
    sigs = sigs.join(ingested.select("image_id", "phash", "byte_fp"), "image_id")
    sigs = sigs.localCheckpoint(eager=True)
    timings["sig"] = round(time.time() - t0, 2)
    print(f"sig: {timings['sig']}s", flush=True)

    stop = cfg.stop_band_threshold(n)

    t0 = time.time()
    cap_rep_pairs, _ = rep_pairs_from_sigs(sigs, "image_id", cfg)
    cap_rep_pairs = cap_rep_pairs.localCheckpoint(eager=True)
    timings["cap_rep_pairs"] = round(time.time() - t0, 2)
    print(f"cap_rep_pairs: {timings['cap_rep_pairs']}s", flush=True)

    t0 = time.time()
    exact_edges = exact_fingerprint_edges(sigs, "image_id").select("a", "b")
    mark("exact_edges", exact_edges, t0)

    t0 = time.time()
    byte_reps = sigs.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
    reps = sigs.join(byte_reps, ["image_id", "byte_fp"], "left_semi").localCheckpoint(eager=True)
    timings["byte_reps"] = round(time.time() - t0, 2)
    print(f"byte_reps: {timings['byte_reps']}s", flush=True)

    t0 = time.time()
    img_bands = phash_combo_bands(reps, "phash", "image_id", cfg.phash_bands, cfg.hamming_radius)
    img_cands, _ = candidate_pairs(img_bands, "image_id", cfg.band_bucket_cap, stop)
    img_cands = img_cands.localCheckpoint(eager=True)
    timings["img_cands"] = round(time.time() - t0, 2)
    print(f"img_cands: {timings['img_cands']}s", flush=True)

    t0 = time.time()
    img_ham = verify_hamming(img_cands, reps.select("image_id", "phash"),
                             "image_id", "phash", cfg.hamming_radius)
    img_ham = img_ham.localCheckpoint(eager=True)
    timings["verify_hamming"] = round(time.time() - t0, 2)
    print(f"verify_hamming: {timings['verify_hamming']}s", flush=True)

    t0 = time.time()
    img_ok = verify_psnr(img_ham.select("a", "b"), images.select("image_id", "bytes", "fmt"),
                         "image_id", "bytes", "fmt", cfg.psnr_min_db)
    img_ok = img_ok.localCheckpoint(eager=True)
    timings["verify_psnr"] = round(time.time() - t0, 2)
    print(f"verify_psnr: {timings['verify_psnr']}s", flush=True)

    t0 = time.time()
    byte_star = sigs.join(byte_reps.withColumnRenamed("image_id", "a"), "byte_fp").where(
        F.col("image_id") != F.col("a")).select("a", F.col("image_id").alias("b"))
    edges = (cap_rep_pairs.select("a", "b")
             .unionByName(exact_edges)
             .unionByName(img_ok.select("a", "b"))
             .unionByName(byte_star).distinct().localCheckpoint(eager=True))
    n_edges = edges.count()
    timings["edges_union"] = round(time.time() - t0, 2)
    print(f"edges_union: {timings['edges_union']}s", flush=True)

    t0 = time.time()
    cc = connected_components(edges)
    cc.write.format("noop").mode("overwrite").save()
    timings["cc"] = round(time.time() - t0, 2)
    print(f"cc: {timings['cc']}s", flush=True)

    print(json.dumps({"cores": cores, "shuffle": shuffle, "n_images": n,
                      "edges": n_edges, "timings": timings,
                      "total": round(sum(timings.values()), 2)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Steady-state scaling probe: the full block+verify job, run `reps`
times in one session (run 0 = cold, discarded), per-stage timings each
rep.  Usage: profile_scaling.py <cores> [shuffle] [reps] [n_base]"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else cores
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_base = int(sys.argv[4]) if len(sys.argv) > 4 else 200000

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

    def one_run():
        t = {}
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
        t["sig"] = round(time.time() - t0, 2)

        t0 = time.time()
        stop = cfg.stop_band_threshold(n)
        cap_rep_pairs, _ = rep_pairs_from_sigs(sigs, "image_id", cfg)
        cap_edges = cap_rep_pairs.select("a", "b").unionByName(
            exact_fingerprint_edges(sigs, "image_id").select("a", "b"))
        byte_reps = sigs.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
        reps_df = sigs.join(byte_reps, ["image_id", "byte_fp"], "left_semi")
        img_bands = phash_combo_bands(reps_df, "phash", "image_id",
                                      cfg.phash_bands, cfg.hamming_radius)
        img_cands, _ = candidate_pairs(img_bands, "image_id", cfg.band_bucket_cap, stop)
        img_ham = verify_hamming(img_cands, reps_df.select("image_id", "phash"),
                                 "image_id", "phash", cfg.hamming_radius)
        img_ok = verify_psnr(img_ham.select("a", "b"),
                             images.select("image_id", "bytes", "fmt"),
                             "image_id", "bytes", "fmt", cfg.psnr_min_db)
        byte_star = sigs.join(byte_reps.withColumnRenamed("image_id", "a"), "byte_fp").where(
            F.col("image_id") != F.col("a")).select("a", F.col("image_id").alias("b"))
        edges = (cap_edges.unionByName(img_ok.select("a", "b"))
                 .unionByName(byte_star).distinct().localCheckpoint(eager=True))
        n_edges = edges.count()
        t["block"] = round(time.time() - t0, 2)

        t0 = time.time()
        cc = connected_components(edges)
        cc.write.format("noop").mode("overwrite").save()
        t["cc"] = round(time.time() - t0, 2)
        t["edges"] = n_edges
        t["core_ips"] = round(n / (t["sig"] + t["block"]), 2)
        return t

    runs = []
    for r in range(reps):
        res = one_run()
        runs.append(res)
        print(f"run{r}: {json.dumps(res)}", flush=True)
    print(json.dumps({"cores": cores, "shuffle": shuffle, "n": n, "runs": runs}))


if __name__ == "__main__":
    main()

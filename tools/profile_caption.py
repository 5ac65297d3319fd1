#!/usr/bin/env python
"""Dissect the caption rep-pairs stage. Usage: profile_caption.py <cores> [shuffle]"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * cores
    n_base = int(sys.argv[3]) if len(sys.argv) > 3 else 200000

    from pyspark.sql import functions as F

    from bench import ensure_bench_images
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.minhash import band_explode
    from who_owns_mass_processing_spark.operators.blocking import bucket_sizes, candidate_pairs
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures
    from who_owns_mass_processing_spark.operators.verify import verify_jaccard
    from who_owns_mass_processing_spark.session import get_spark

    cfg = DedupeConfig()
    spark = get_spark(cores=cores, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_bench_images(n_base)
    images = spark.read.parquet(path).repartition(cores).localCheckpoint(eager=True)
    n = images.count()

    sigs = minhash_signatures(images, "image_id", "caption", cfg).localCheckpoint(eager=True)
    _ = sigs.count()

    for rep in range(2):
        t = {}
        t0 = time.time()
        reps = sigs.groupBy("fingerprint").agg(F.min("image_id").alias("image_id"))
        rep_sigs = sigs.join(reps, ["image_id", "fingerprint"], "left_semi").localCheckpoint(eager=True)
        n_reps = rep_sigs.count()
        t["rep_sigs"] = round(time.time() - t0, 2)

        t0 = time.time()
        bands = band_explode(rep_sigs, "minhash", "image_id", cfg.bands, cfg.rows_per_band)
        bands = bands.localCheckpoint(eager=True)
        n_bands = bands.count()
        t["band_explode"] = round(time.time() - t0, 2)

        t0 = time.time()
        sizes = bucket_sizes(bands).localCheckpoint(eager=True)
        t["census"] = round(time.time() - t0, 2)

        t0 = time.time()
        cands, _m = candidate_pairs(
            bands, "image_id", cap=cfg.band_bucket_cap,
            hard_cap=cfg.stop_band_threshold(n_reps),
        )
        cands = cands.localCheckpoint(eager=True)
        n_cands = cands.count()
        t["cand_pairs"] = round(time.time() - t0, 2)

        t0 = time.time()
        ver = verify_jaccard(cands, rep_sigs.select("image_id", "codes"),
                             "image_id", "codes", cfg.jaccard_threshold)
        n_ver = ver.count()
        t["verify"] = round(time.time() - t0, 2)
        print(json.dumps({"rep": rep, "cores": cores, "shuffle": shuffle,
                          "n": n, "n_reps": n_reps, "n_bands": n_bands,
                          "n_cands": n_cands, "n_verified": n_ver, "t": t,
                          "total": round(sum(t.values()), 2)}), flush=True)


if __name__ == "__main__":
    main()

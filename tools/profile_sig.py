#!/usr/bin/env python
"""Signature-stage variance probe: N reps of decode+minhash at one
parallelism level.  Usage: profile_sig.py <cores> [reps] [n_base]"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_base = int(sys.argv[3]) if len(sys.argv) > 3 else 200000

    from pyspark.sql import functions as F

    from bench import ensure_bench_images
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.images import image_meta_udf
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures
    from who_owns_mass_processing_spark.session import get_spark

    cfg = DedupeConfig()
    spark = get_spark(cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_bench_images(n_base)
    images = spark.read.parquet(path).repartition(cores).localCheckpoint(eager=True)
    n = images.count()

    meta = image_meta_udf()
    decode_times, mh_times = [], []
    for r in range(reps):
        t0 = time.time()
        ingested = images.select(
            "image_id", "fmt", "caption",
            meta(F.col("bytes")).alias("m"),
            F.sha2(F.col("bytes"), 256).alias("byte_fp"),
        ).select("image_id", "fmt", "caption", F.col("m.phash").alias("phash"), "byte_fp")
        ingested = ingested.localCheckpoint(eager=True)
        t1 = time.time()
        decode_times.append(round(t1 - t0, 2))
        sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
        sigs = sigs.join(ingested.select("image_id", "phash", "byte_fp"), "image_id")
        sigs.write.format("noop").mode("overwrite").save()
        mh_times.append(round(time.time() - t1, 2))
        print(f"rep{r}: decode={decode_times[-1]} minhash={mh_times[-1]}", flush=True)
    print(json.dumps({"cores": cores, "n": n, "decode": decode_times, "minhash": mh_times}))


if __name__ == "__main__":
    main()

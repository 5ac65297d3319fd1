#!/usr/bin/env python
"""Micro: one groupBy over the band table, materialized two ways, at a
given (cores, shuffle).  Usage: profile_microshuffle.py <cores> <shuffle>"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores, shuffle = int(sys.argv[1]), int(sys.argv[2])
    from pyspark.sql import functions as F

    from bench import ensure_bench_images
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.minhash import band_explode
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures
    from who_owns_mass_processing_spark.session import get_spark

    cfg = DedupeConfig()
    spark = get_spark(cores=cores, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    images = spark.read.parquet(ensure_bench_images(200000)).select(
        "image_id", "caption").repartition(cores).localCheckpoint(eager=True)
    sigs = minhash_signatures(images, "image_id", "caption", cfg).localCheckpoint(eager=True)
    sigs.count()
    bands = band_explode(sigs, "minhash", "image_id", cfg.bands, cfg.rows_per_band)
    bands = bands.localCheckpoint(eager=True)
    bands.count()

    out = {"cores": cores, "shuffle": shuffle}
    for rep in range(3):
        t0 = time.time()
        bands.groupBy("band_id", "band_hash").count().write.format("noop").mode(
            "overwrite").save()
        out[f"gb_noop_{rep}"] = round(time.time() - t0, 2)
    for rep in range(3):
        t0 = time.time()
        ck = bands.groupBy("band_id", "band_hash").count().localCheckpoint(eager=True)
        out[f"gb_ckpt_{rep}"] = round(time.time() - t0, 2)
        del ck
    print(json.dumps(out))


if __name__ == "__main__":
    main()

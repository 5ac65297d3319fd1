"""Multimodal plumbing: binary-column UDF surface (decode, metadata,
per-partition stats via mapInPandas) — real Spark plumbing, pure-numpy
codecs (no image libs in this runtime; QJP is the marked fake lossy)."""
import pandas as pd
from pyspark.sql import functions as F

from who_owns_mass_processing_spark.functions.images import (
    decode_stats_map,
    image_meta_udf,
    psnr_pair_udf,
)


def test_image_meta_struct(spark, synth_small):
    images = spark.read.parquet(synth_small["images"]).limit(20)
    meta = image_meta_udf()
    out = images.select("image_id", meta(F.col("bytes")).alias("m")).select(
        "image_id", "m.phash", "m.w", "m.h"
    )
    pdf = out.toPandas()
    assert len(pdf) == 20
    assert (pdf.w > 0).all() and (pdf.h > 0).all()


def test_decode_stats_map_partition_metrics(spark, synth_small):
    images = spark.read.parquet(synth_small["images"]).repartition(4)
    schema = "rows long, bytes long, decode_failures long, host string"
    stats = images.select("bytes").mapInPandas(decode_stats_map, schema).toPandas()
    assert stats.rows.sum() == images.count()
    assert (stats.decode_failures == 0).all()
    assert stats.bytes.sum() > 0


def test_decode_stats_counts_failures(spark):
    rows = [(b"\x00garbage",), (b"also not an image",)]
    df = spark.createDataFrame(rows, "bytes binary")
    schema = "rows long, bytes long, decode_failures long, host string"
    stats = df.mapInPandas(decode_stats_map, schema).toPandas()
    assert stats.decode_failures.sum() == 2


def test_psnr_pair_udf_tiers(spark, synth_small):
    """Exact pair -> 999 (inf); lossy re-encode -> finite >= 40; garbage -> 0."""
    import numpy as np

    from who_owns_mass_processing_spark import codecs

    px = np.random.default_rng(1).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    png = codecs.png_encode(px)
    qjp = codecs.qjp_encode(px, 80)
    df = spark.createDataFrame(
        [(png, png), (png, qjp), (png, b"junk")], "a binary, b binary"
    )
    udf = psnr_pair_udf()
    vals = [r[0] for r in df.select(udf(F.col("a"), F.col("b"))).collect()]
    assert vals[0] == 999.0
    assert 40.0 <= vals[1] < 999.0
    assert vals[2] == 0.0

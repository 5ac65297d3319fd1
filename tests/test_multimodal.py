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


def test_thumbnail_map(spark, synth_small):
    from who_owns_mass_processing_spark.functions.images import (
        THUMBNAIL_SCHEMA,
        thumbnail_map,
    )

    images = spark.read.parquet(synth_small["images"]).limit(10)
    out = images.select("image_id", "bytes").mapInPandas(
        thumbnail_map(size=8), THUMBNAIL_SCHEMA
    )
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.thumb) == 64
        assert r.w > 0 and r.h > 0
        assert all(0.0 <= v <= 255.0 for v in r.thumb)
    # determinism
    again = out.collect()
    assert sorted(r.image_id for r in rows) == sorted(r.image_id for r in again)


def test_frame_sample_map(spark):
    import numpy as np

    from who_owns_mass_processing_spark import codecs as C
    from who_owns_mass_processing_spark.functions.images import (
        FRAME_SAMPLE_SCHEMA,
        frame_sample_map,
    )

    rng = np.random.default_rng(3)
    def vid(n):
        return C.qvd_encode(
            [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8) for _ in range(n)]
        )

    df = spark.createDataFrame(
        [("v0", bytearray(vid(5))), ("v1", bytearray(vid(1)))],
        "video_id string, bytes binary",
    )
    out = df.mapInPandas(frame_sample_map(every_k=2), FRAME_SAMPLE_SCHEMA).collect()
    got = {(r.video_id, r.frame_idx) for r in out}
    # every_k=2 over 5 frames -> 0,2,4 ; over 1 frame -> 0
    assert got == {("v0", 0), ("v0", 2), ("v0", 4), ("v1", 0)}
    for r in out:
        assert r.w == 16 and r.h == 16


def test_frame_sample_rejects_non_video(spark):
    import pytest as _pytest

    from who_owns_mass_processing_spark.functions.images import (
        FRAME_SAMPLE_SCHEMA,
        frame_sample_map,
    )

    df = spark.createDataFrame(
        [("x", bytearray(b"not a video"))], "video_id string, bytes binary"
    )
    with _pytest.raises(Exception):  # NotImplementedError inside the worker
        df.mapInPandas(frame_sample_map(), FRAME_SAMPLE_SCHEMA).collect()

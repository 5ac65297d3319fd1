"""Structured Streaming signature ingest: availableNow batch drain +
incremental pickup of new files (checkpointed offsets)."""
import os
import shutil

import pytest


@pytest.fixture()
def stream_dirs(tmp_path, synth_small):
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(synth_small["images"], src / "part-0.parquet")
    return {
        "in": str(src),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_stream_signatures_drains_and_resumes(spark, stream_dirs, synth_small, tmp_path):
    from who_owns_mass_processing_spark.streaming.ingest import stream_signatures
    from who_owns_mass_processing_spark.synth import write_images_parquet

    q = stream_signatures(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    assert q.awaitTermination(300), "stream did not drain in time"
    out = spark.read.parquet(stream_dirs["out"])
    n_first = out.count()
    assert n_first == spark.read.parquet(synth_small["images"]).count()
    assert set(out.columns) == {
        "image_id", "fmt", "fingerprint", "codes", "minhash", "phash",
    }

    # drop a new file; availableNow again processes ONLY the new file
    # (ids are formulaic per generator run — prefix them so the two
    # files don't collide)
    extra = tmp_path / "extra"
    write_images_parquet(str(extra), n_base=20, seed=99)
    import pandas as pd

    pdf = pd.read_parquet(str(extra / "images.parquet"))
    pdf["image_id"] = "x" + pdf["image_id"]
    pdf.to_parquet(os.path.join(stream_dirs["in"], "part-1.parquet"), index=False)
    q2 = stream_signatures(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    assert q2.awaitTermination(300)
    out2 = spark.read.parquet(stream_dirs["out"])
    n_extra = spark.read.parquet(str(extra / "images.parquet")).count()
    assert out2.count() == n_first + n_extra
    # signatures from the streaming path match the batch signature function
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures

    batch = minhash_signatures(
        spark.read.parquet(synth_small["images"]), "image_id", "caption", DedupeConfig()
    ).select("image_id", "minhash")
    joined = out2.select("image_id", "minhash").withColumnRenamed("minhash", "m2").join(
        batch, "image_id"
    )
    from pyspark.sql import functions as F

    mismatch = joined.where(F.col("m2") != F.col("minhash")).count()
    assert mismatch == 0


def test_stream_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: first row per key survives, duplicates in
    LATER microbatches are dropped by the state store (cross-batch)."""
    import pandas as pd

    from who_owns_mass_processing_spark.streaming.ingest import stream_first_seen

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}).to_parquet(src / "f0.parquet", index=False)
    pd.DataFrame({"k": ["b", "c"], "v": [3, 4]}).to_parquet(src / "f1.parquet", index=False)

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_first_seen(stream, "k")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got.key) == ["a", "b", "c"]  # second 'b' deduped

    # a later drain with a duplicate key emits nothing new for it
    pd.DataFrame({"k": ["a", "d"], "v": [9, 9]}).to_parquet(src / "f2.parquet", index=False)
    q2 = (
        stream_first_seen(stream, "k")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)
    got2 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got2.key) == ["a", "b", "c", "d"]

"""Zip-archive source (S5): images delivered as zip files.

Reference analog: the reference pulls statewide assessor zips and
unpacks them before loading (R/loaders.R download+unzip steps).  Spark
has no zip datasource, so the shape here is the canonical one:

    binaryFile scan (one row per archive, payload = whole file)
      -> mapInPandas: zipfile walk, one output row per matching entry
      -> (archive, entry, size, bytes) rows feeding the normal ingest

Scale notes (explicit, because archives are the one input Spark cannot
split): parallelism is ONE TASK PER ARCHIVE — a 10^12-image corpus must
arrive as many archives (the practical case: per-shard uploads), and a
single giant zip is a documented anti-pattern.  Entry payloads are
yielded in bounded batches so a 10 GB archive never materializes as one
pandas frame.  The fetch-from-URL step of the reference is environment
I/O, not engine semantics: point `path` at a downloaded mirror
directory (file:// only in this sandbox — no external data).
"""

from __future__ import annotations

import fnmatch
import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ZIP_ENTRY_SCHEMA = "archive string, entry string, size long, bytes binary"


def zip_entries_map(pattern: str | None = None, batch_rows: int = 64):
    """mapInPandas worker: archive payload rows -> entry rows."""

    def _map(frames):
        buf: dict[str, list] = {"archive": [], "entry": [], "size": [], "bytes": []}

        def flush():
            out = pd.DataFrame(buf).astype({"size": "int64"})
            for k in buf:
                buf[k] = []
            return out

        for pdf in frames:
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if pattern and not fnmatch.fnmatch(info.filename, pattern):
                            continue
                        buf["archive"].append(path)
                        buf["entry"].append(info.filename)
                        buf["size"].append(info.file_size)
                        buf["bytes"].append(zf.read(info))
                        if len(buf["archive"]) >= batch_rows:
                            yield flush()
        if buf["archive"]:
            yield flush()

    return _map


def read_zip_entries(
    spark: SparkSession, path: str, pattern: str | None = None, batch_rows: int = 64
) -> DataFrame:
    """All (non-directory) entries of every zip under `path` (glob ok).

    `pattern` is an fnmatch glob over entry names (e.g. ``*.png``).
    """
    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.zip").load(path)
    return raw.select("path", "content").mapInPandas(
        zip_entries_map(pattern, batch_rows), ZIP_ENTRY_SCHEMA
    )

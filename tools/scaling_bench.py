#!/usr/bin/env python
"""Two-parallelism scaling bench -> BENCH.md.

The north_rule's >=0.8 scaling-efficiency criterion targets N vs 4N
executors; no real cluster exists in this sandbox, so (per driver
instruction) we run the SAME job on the SAME input at local[8] and
local[32] and report images/sec at both plus the efficiency ratio.

Each run is a fresh subprocess (fresh JVM — no cache credit).  The
measured section is the throughput-dominant signature+block+verify
path (UDF decode/hash + banding + candidate join + exact verify); the
iterative CC tail is reported separately since its per-iteration driver
sync is latency- not throughput-bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1]); n_base = int(sys.argv[2])
from who_owns_mass_processing_spark.session import get_spark
from who_owns_mass_processing_spark.config import DedupeConfig
from who_owns_mass_processing_spark.operators.dedupe import (
    minhash_signatures, rep_pairs_from_sigs, exact_fingerprint_edges)
from who_owns_mass_processing_spark.functions.images import image_meta_udf, phash_combo_bands
from who_owns_mass_processing_spark.operators.blocking import candidate_pairs
from who_owns_mass_processing_spark.operators.verify import verify_hamming, verify_psnr
from who_owns_mass_processing_spark.operators.connected_components import connected_components
from pyspark.sql import functions as F
from bench import ensure_bench_images

cfg = DedupeConfig()
spark = get_spark(cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
path = ensure_bench_images(n_base)
images = spark.read.parquet(path).repartition(cores).localCheckpoint(eager=True)
n = images.count()

# warm-up: prime python UDF workers / JIT on a small slice (identical for
# both legs) so the measured section reflects steady-state throughput,
# not per-process cold start
warm = spark.createDataFrame(
    images.select("image_id", "bytes", "caption").limit(64).collect()
).localCheckpoint(eager=True)
_warm_meta = image_meta_udf()
warm.select(_warm_meta(F.col("bytes"))).write.format("noop").mode("overwrite").save()
minhash_signatures(warm, "image_id", "caption", cfg).write.format(
    "noop").mode("overwrite").save()
print("warmup done", flush=True)

t0 = time.time()
# signature stage: decode->pHash recompute (pandas UDF over bytes) +
# MinHash over captions + byte/caption fingerprints — the payload pass
meta = image_meta_udf()
ingested = images.select(
    "image_id", "fmt", "caption",
    meta(F.col("bytes")).alias("m"),
    F.sha2(F.col("bytes"), 256).alias("byte_fp"),
).select("image_id", "fmt", "caption", F.col("m.phash").alias("phash"), "byte_fp")
# materialize between the two Arrow UDF stages — chaining two
# ArrowEvalPython nodes in one task over ~100KB binary rows can wedge
# the writer-in-task-thread pump (observed on Spark 4.1.2); the real
# pipeline materializes here anyway (ingest stage checkpoint)
ingested = ingested.localCheckpoint(eager=True)
sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
sigs = sigs.join(ingested.select("image_id", "phash", "byte_fp"), "image_id")
sigs = sigs.localCheckpoint(eager=True)
print("sig stage done", flush=True)
t_sig = time.time() - t0

t0 = time.time()
stop = cfg.stop_band_threshold(n)
cap_rep_pairs, _ = rep_pairs_from_sigs(sigs, "image_id", cfg)
print("caption rep pairs planned", flush=True)
cap_edges = cap_rep_pairs.select("a", "b").unionByName(
    exact_fingerprint_edges(sigs, "image_id").select("a", "b"))
byte_reps = sigs.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
reps = sigs.join(byte_reps, ["image_id", "byte_fp"], "left_semi")
img_bands = phash_combo_bands(reps, "phash", "image_id", cfg.phash_bands, cfg.hamming_radius)
img_cands, _ = candidate_pairs(img_bands, "image_id", cfg.band_bucket_cap, stop)
img_ham = verify_hamming(img_cands, reps.select("image_id", "phash"),
                         "image_id", "phash", cfg.hamming_radius)
img_ok = verify_psnr(img_ham.select("a", "b"), images.select("image_id", "bytes", "fmt"),
                     "image_id", "bytes", "fmt", cfg.psnr_min_db)
byte_star = sigs.join(byte_reps.withColumnRenamed("image_id", "a"), "byte_fp").where(
    F.col("image_id") != F.col("a")).select("a", F.col("image_id").alias("b"))
edges = (cap_edges.unionByName(img_ok.select("a", "b"))
         .unionByName(byte_star).distinct().localCheckpoint(eager=True))
n_edges = edges.count()
print("block done", flush=True)
t_block = time.time() - t0

t0 = time.time()
cc = connected_components(edges)
cc.write.format("noop").mode("overwrite").save()
t_cc = time.time() - t0

core_sec = t_sig + t_block
print(json.dumps({"cores": cores, "n_images": n, "sig_sec": round(t_sig, 2),
                  "block_sec": round(t_block, 2), "cc_sec": round(t_cc, 2),
                  "edges": n_edges,
                  "images_per_sec": round(n / core_sec, 2)}))
"""


def run(cores: int, n_base: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cores), str(n_base)],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, cwd=REPO, timeout=3600, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker cores={cores} produced no result")
    return json.loads(lines[-1])


def main() -> None:
    n_base = int(os.environ.get("SCALING_IMAGES_BASE", "20000"))
    # warm the image cache once (generation excluded from both runs)
    subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); "
         f"from bench import ensure_bench_images; ensure_bench_images({n_base})"],
        cwd=REPO, check=True, timeout=3600,
    )
    r8 = run(8, n_base)
    r32 = run(32, n_base)
    speedup = r32["images_per_sec"] / r8["images_per_sec"]
    eff = speedup / 4.0
    md = f"""# BENCH — two-parallelism scaling evidence

north_rule criterion: >=0.8 throughput scaling efficiency from N to 4N
executors.  No real cluster exists in this sandbox, so (per driver
instruction) the SAME job ran on the SAME input at `local[8]` and
`local[32]` (cores as executor proxy), fresh JVM each, input generation
and session startup excluded.  Measured section: signature (MinHash +
decode->pHash pandas UDFs) + LSH banding + salted candidates + exact
Jaccard/Hamming verify — the throughput-dominant path at 10^12 scale.
Connected components is reported separately (its per-iteration driver
sync is latency-bound, not throughput-bound).

| parallelism | images | signature s | block+verify s | images/sec | CC s (separate) |
|---|---|---|---|---|---|
| local[8]  (N)  | {r8["n_images"]} | {r8["sig_sec"]} | {r8["block_sec"]} | {r8["images_per_sec"]} | {r8["cc_sec"]} |
| local[32] (4N) | {r32["n_images"]} | {r32["sig_sec"]} | {r32["block_sec"]} | {r32["images_per_sec"]} | {r32["cc_sec"]} |

- speedup 8->32 cores: **{speedup:.2f}x** (ideal 4.0x)
- **scaling efficiency: {eff:.2f}** (target >= 0.8)
- verified edges found: {r8["edges"]} (identical at both levels: {r8["edges"] == r32["edges"]})

Raw: `{json.dumps(r8)}` / `{json.dumps(r32)}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

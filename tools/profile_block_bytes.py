#!/usr/bin/env python
"""A/B evidence for VERDICT r4 #1: shuffle-write bytes and wall time of
the LSH block phase with STRING ids vs 8-byte SURROGATE ids, on the
same corpus, in the same JVM, alternating reps (str, sid, str, sid...)
so both modes sample adjacent host windows.

What is measured (per rep, per mode) — the two banding tiers of the
image job, end-to-end from the signature tables to decoded string-id
pairs, so the surrogate mode PAYS its encode (with_surrogate_ids) and
decode (decode_pair_ids) inside the window:

  * caption tier: band_explode over the 128-perm MinHash signature ->
    candidate_pairs (salted cells, pair dedup);
  * image tier: phash_combo_bands (C(8,2) band-pair keys) ->
    hamming_pairs (popcount gate fused in the cell lambda).

Verify joins (Jaccard / PSNR) are EXCLUDED: they are mode-invariant
consumers of the decoded pairs, and the r4 verdict's claim is about
band/cell/pair rows specifically.  Pair-set equality across modes is
asserted per rep via count + an order-normalized xxhash64 checksum
(the exact bit-identity gate lives in tests/test_blocking.py).

Shuffle bytes come from session.shuffle_write_bytes (AppStatusStore
cumulative shuffle-write), snapshotted around each measured section.

Id width matters: the synthetic corpus mints 13-char ids, while real
web corpora key images by URL (40-80+ bytes) — the regime the 100-TB
claim addresses.  `id_mode=url` re-keys the signature tables with a
deterministic 57-byte URL-shaped id derived from the native one, so
the same A/B runs at a realistic id width (pair semantics unchanged —
the mapping is bijective).

Usage: python tools/profile_block_bytes.py [cores] [n_base] [reps] [id_mode]
id_mode: native (default) | url | url_nocomp.  url_nocomp additionally
disables shuffle/spill compression: lz4 erases most of a constant-prefix
URL on the wire, so compressed write bytes understate the row-width
difference — uncompressed bytes are what sort buffers, spill working
sets, and cell hash tables scale with at 100 TB.  Writes/updates the
BLOCKBYTES section in BENCH.md (one sub-section per id_mode) and prints
JSON.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _marks(id_mode: str) -> tuple[str, str]:
    # one section per id_mode so the url run doesn't clobber the native one
    return (
        f"<!-- BLOCKBYTES:{id_mode}:BEGIN -->",
        f"<!-- BLOCKBYTES:{id_mode}:END -->",
    )


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    id_mode = sys.argv[4] if len(sys.argv) > 4 else "native"
    assert id_mode in ("native", "url", "url_nocomp"), id_mode
    if id_mode == "url_nocomp":
        # compression OFF isolates UNCOMPRESSED row width — lz4 erases
        # most of a constant-prefix URL on the wire, but sort buffers,
        # spill working sets, and groupBy hash tables scale with the
        # uncompressed row, which is what binds at 100 TB
        prior = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").strip()
        nocomp = "spark.shuffle.compress=false;spark.shuffle.spill.compress=false"
        os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
            f"{prior};{nocomp}" if prior else nocomp
        )

    from pyspark.sql import functions as F

    from bench import ensure_bench_images_parallel
    from who_owns_mass_processing_spark.config import DedupeConfig
    from who_owns_mass_processing_spark.functions.images import (
        image_meta_udf,
        phash_combo_bands,
    )
    from who_owns_mass_processing_spark.functions.minhash import band_explode
    from who_owns_mass_processing_spark.operators.blocking import (
        candidate_pairs,
        decode_pair_ids,
        hamming_pairs,
        with_surrogate_ids,
    )
    from who_owns_mass_processing_spark.operators.dedupe import minhash_signatures
    from who_owns_mass_processing_spark.session import get_spark, shuffle_write_bytes

    cfg = DedupeConfig()
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_bench_images_parallel(n_base)
    images = spark.read.parquet(path)
    n = images.count()

    # ---- prep (mode-invariant, excluded from the measured windows):
    # same signature tables the scaling WORKER builds
    meta = image_meta_udf()
    ingested = (
        images.select(
            "image_id",
            "caption",
            meta(F.col("bytes")).alias("m"),
            F.sha2(F.col("bytes"), 256).alias("byte_fp"),
        )
        .select("image_id", "caption", F.col("m.phash").alias("phash"), "byte_fp")
        .localCheckpoint(eager=True)
    )
    sigs = minhash_signatures(ingested, "image_id", "caption", cfg)
    sigs = sigs.join(ingested.select("image_id", "phash", "byte_fp"), "image_id")
    sigs = sigs.localCheckpoint(eager=True)
    def rekey(df):
        # bijective URL-shaped rekey (57 bytes): the id width real web
        # corpora carry through blocking when keyed by image URL
        if not id_mode.startswith("url"):
            return df
        return df.withColumn(
            "image_id",
            F.concat(
                F.lit("https://img-cdn.example.org/crawl/2026-08/"),
                F.col("image_id"),
                F.lit("_full.jpg"),
            ),
        )

    cap_reps = rekey(
        sigs.join(
            sigs.groupBy("fingerprint").agg(F.min("image_id").alias("image_id")),
            ["image_id", "fingerprint"],
            "left_semi",
        ).select("image_id", "minhash")
    ).localCheckpoint(eager=True)
    byte_reps = sigs.groupBy("byte_fp").agg(F.min("image_id").alias("image_id"))
    img_reps = rekey(
        sigs.join(byte_reps, ["image_id", "byte_fp"], "left_semi").select(
            "image_id", "phash"
        )
    ).localCheckpoint(eager=True)
    stop = cfg.stop_band_threshold(n)

    def checksum(pairs_df):
        # order-normalized pair-set fingerprint: same value <=> same set
        # (up to 64-bit collisions; the exact gate is the pytest)
        row = pairs_df.select(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(least(a, b), greatest(a, b)))").alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    def caption_tier(mode: str):
        if mode == "sid":
            enc = with_surrogate_ids(cap_reps)
            bands = band_explode(enc, "minhash", "_sid", cfg.bands, cfg.rows_per_band)
            cands, _ = candidate_pairs(
                bands, "_sid", cap=cfg.band_bucket_cap, hard_cap=stop
            )
            return checksum(
                decode_pair_ids(cands, enc.select("_sid", "image_id"), "image_id")
            )
        bands = band_explode(cap_reps, "minhash", "image_id", cfg.bands, cfg.rows_per_band)
        cands, _ = candidate_pairs(
            bands, "image_id", cap=cfg.band_bucket_cap, hard_cap=stop
        )
        return checksum(cands)

    def image_tier(mode: str):
        if mode == "sid":
            enc = with_surrogate_ids(img_reps)
            bands = phash_combo_bands(
                enc, "phash", "_sid", cfg.phash_bands, cfg.hamming_radius
            )
            pairs, _ = hamming_pairs(
                bands, "_sid", "phash", cfg.hamming_radius, cfg.band_bucket_cap, stop
            )
            return checksum(
                decode_pair_ids(
                    pairs.select("a", "b"), enc.select("_sid", "image_id"), "image_id"
                )
            )
        bands = phash_combo_bands(
            img_reps, "phash", "image_id", cfg.phash_bands, cfg.hamming_radius
        )
        pairs, _ = hamming_pairs(
            bands, "image_id", "phash", cfg.hamming_radius, cfg.band_bucket_cap, stop
        )
        return checksum(pairs.select("a", "b"))

    def cleanup():
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    tiers = {"caption": caption_tier, "image": image_tier}
    # warm-up: full pass in both modes, discarded (JIT/codegen/python
    # worker spawn)
    for mode in ("str", "sid"):
        for fn in tiers.values():
            fn(mode)
    cleanup()

    runs: dict[str, dict[str, list[dict]]] = {
        t: {"str": [], "sid": []} for t in tiers
    }
    sums: dict[str, dict[str, set]] = {t: {"str": set(), "sid": set()} for t in tiers}
    for r in range(reps):
        for mode in ("str", "sid"):
            for tier, fn in tiers.items():
                t0 = time.time()
                sw0 = shuffle_write_bytes(spark)
                n_pairs, h = fn(mode)
                rec = {
                    "sec": round(time.time() - t0, 2),
                    "shuffle_mb": round((shuffle_write_bytes(spark) - sw0) / 1e6, 1),
                    "pairs": n_pairs,
                }
                runs[tier][mode].append(rec)
                sums[tier][mode].add((n_pairs, h))
                cleanup()
            print(f"rep{r} {mode}: " + json.dumps({t: runs[t][mode][-1] for t in tiers}),
                  flush=True)

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    out: dict = {"cores": cores, "n_images": n, "reps": reps, "tiers": {}}
    for tier in tiers:
        a, b = runs[tier]["str"], runs[tier]["sid"]
        same = sums[tier]["str"] == sums[tier]["sid"] and len(sums[tier]["str"]) == 1
        out["tiers"][tier] = {
            "pairs": a[0]["pairs"],
            "pair_sets_identical": same,
            "str_sec": med([x["sec"] for x in a]),
            "sid_sec": med([x["sec"] for x in b]),
            "str_shuffle_mb": med([x["shuffle_mb"] for x in a]),
            "sid_shuffle_mb": med([x["shuffle_mb"] for x in b]),
            "detail": {"str": a, "sid": b},
        }
        t = out["tiers"][tier]
        t["bytes_ratio"] = (
            round(t["str_shuffle_mb"] / t["sid_shuffle_mb"], 2)
            if t["sid_shuffle_mb"]
            else None
        )
        t["time_ratio"] = (
            round(t["str_sec"] / t["sid_sec"], 2) if t["sid_sec"] else None
        )
    out["id_mode"] = id_mode
    print(json.dumps(out))
    write_bench_section(out)
    spark.stop()


def render_section(out: dict) -> str:
    mode = out.get("id_mode", "native")
    id_desc = {
        "native": "native 13-char synthetic ids",
        "url": "57-byte URL-shaped ids (web-corpus width, bijective rekey)",
        "url_nocomp": (
            "57-byte URL-shaped ids, shuffle compression OFF "
            "(uncompressed row width — what sort/spill memory scales with)"
        ),
    }[mode]
    md = f"""## Block-phase shuffle bytes: string ids vs 8-byte surrogates — {id_desc} (r5, VERDICT r4 #1)

Same corpus ({out["n_images"]} images), same JVM (`local[{out["cores"]}]`),
modes alternating str,sid per rep ({out["reps"]} reps each, median
reported), measured end-to-end from the signature tables to STRING-id
pairs — the surrogate mode pays its encode (`with_surrogate_ids`) and
decode (`decode_pair_ids`) inside the window.  Shuffle-write bytes from
the AppStatusStore, snapshotted around each section.

| tier | pairs | str MB | sid MB | bytes ratio | str s | sid s | time ratio | pair sets identical |
|---|---|---|---|---|---|---|---|---|
"""
    for tier, t in out["tiers"].items():
        md += (
            f"| {tier} | {t['pairs']} | {t['str_shuffle_mb']} | {t['sid_shuffle_mb']} "
            f"| **{t['bytes_ratio']}x** | {t['str_sec']} | {t['sid_sec']} "
            f"| {t['time_ratio']}x | {t['pair_sets_identical']} |\n"
        )
    md += """
- raw per-rep detail: `""" + json.dumps(
        {k: v["detail"] for k, v in out["tiers"].items()}
    ) + "`\n"
    return md


def write_bench_section(out: dict) -> None:
    mark_begin, mark_end = _marks(out.get("id_mode", "native"))
    path = os.path.join(REPO, "BENCH.md")
    text = open(path).read()
    section = mark_begin + "\n" + render_section(out) + mark_end
    if mark_begin in text and mark_end in text:
        text = text.split(mark_begin)[0] + section + text.split(mark_end)[1]
    else:
        anchor = "<!-- SUPPLEMENT-R4-FROZEN ("
        if anchor in text:
            pre, post = text.split(anchor, 1)
            text = pre + section + "\n\n" + anchor + post
        else:
            text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()

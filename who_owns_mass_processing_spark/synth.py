"""Deterministic synthetic `images` table + golden dup-pair oracle.

Implements FIXTURES.md F1 (images), F2 (golden_pairs / golden_assignments)
and F3 (reference-shaped owner-name fixture).  Everything is seeded numpy —
no wall clock, no external data — so every run, at every parallelism level,
produces byte-identical inputs (the determinism the recall gate needs).

Duplicate families injected (F2 ground truth):
  exact      identical bytes + identical caption, new image_id
  lossy      same pixels re-encoded with the fake lossy codec q75-95 (PSNR>=40dB)
  noised     base pixels + seeded noise, PSNR kept >= 40 dB, re-encoded PNG
  paraphrase same image, caption token-edited to a target shingle-Jaccard tier
  hardneg    distinct image, caption Jaccard in [0.5, 0.8) — must NOT merge

Reference analog: the reference's dev-subset knobs (MUNI_IDS /
COMPANY_TEST_COUNT, reference config.R:19,25-26) are its small-scale test
inputs; this module is ours.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from who_owns_mass_processing_spark import codecs
from who_owns_mass_processing_spark.config import DedupeConfig

VOCAB_SIZE = 500
STOP_CAPTION = "stock photo image of a thing"


def _vocab(rng: np.random.Generator) -> list[str]:
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    words = set()
    while len(words) < VOCAB_SIZE:
        n = rng.integers(2, 5)
        w = "".join(
            consonants[rng.integers(0, len(consonants))] + vowels[rng.integers(0, len(vowels))]
            for _ in range(n)
        )
        words.add(w)
    return sorted(words)


def normalize_text(s: str) -> str:
    """Shared caption normalization (mirrored by the Spark builtins in
    functions/text.py — keep in sync; tested for equality)."""
    import re

    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def shingle_set(s: str, k: int = 3) -> frozenset[str]:
    t = normalize_text(s)
    if len(t) <= k:
        return frozenset([t]) if t else frozenset()
    return frozenset(t[i : i + k] for i in range(len(t) - k + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _base_pixels(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth random image: low-freq 8x8 field upsampled + mild noise, so
    pHash carries real structure (pure white-noise images hash unstably)."""
    low = rng.integers(0, 256, size=(8, 8, 3)).astype(np.float64)
    reps = size // 8
    img = np.repeat(np.repeat(low, reps, axis=0), reps, axis=1)
    img += rng.normal(0, 4, img.shape)
    return img.clip(0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator, vocab: list[str]) -> str:
    n = int(rng.integers(5, 19))
    idx = rng.integers(0, len(vocab), size=n)
    return " ".join(vocab[i] for i in idx)


def _paraphrase(rng: np.random.Generator, vocab: list[str], caption: str, edits: int) -> str:
    toks = caption.split()
    for _ in range(edits):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(toks)))
        if op == 0 and len(toks) > 3:
            toks.pop(pos)
        elif op == 1:
            toks[pos] = vocab[int(rng.integers(0, len(vocab)))]
        else:
            toks.insert(pos, vocab[int(rng.integers(0, len(vocab)))])
    return " ".join(toks)


def generate_images(
    n_base: int = 200,
    seed: int = 42,
    dup_fraction: float = 0.4,
    cfg: DedupeConfig | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Build (images, golden_pairs, golden_assignments) pandas frames.

    golden_pairs holds every injected relationship with its measured
    exact Jaccard and PSNR; `is_dup` applies the engine's acceptance rule
    (caption tier OR image tier) at config thresholds — the recall gate
    counts only is_dup pairs (FIXTURES.md F2).
    """
    cfg = cfg or DedupeConfig()
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    rows: list[dict] = []
    pairs: list[dict] = []
    next_id = 0

    def emit(pixels: np.ndarray, caption: str, fmt: str, quality: int = 85) -> tuple[str, np.ndarray]:
        nonlocal next_id
        image_id = f"img{next_id:010d}"
        next_id += 1
        if fmt == "png":
            data = codecs.png_encode(pixels)
            decoded = pixels
        else:
            data = codecs.qjp_encode(pixels, quality)
            decoded = codecs.qjp_decode(data)
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": int(pixels.shape[1]),
                "h": int(pixels.shape[0]),
                "fmt": fmt,
                "caption": caption,
                "phash": codecs.phash64(decoded),
            }
        )
        return image_id, decoded

    def record_pair(a: str, b: str, kind: str, pa: np.ndarray, pb: np.ndarray, ca: str, cb: str):
        j = jaccard(shingle_set(ca, cfg.shingle_k), shingle_set(cb, cfg.shingle_k))
        p = codecs.psnr(pa, pb)
        ham = codecs.hamming64(codecs.phash64(pa), codecs.phash64(pb))
        caption_dup = j >= cfg.jaccard_threshold
        image_dup = ham <= cfg.hamming_radius and (p >= cfg.psnr_min_db or p == float("inf"))
        pairs.append(
            {
                "a": a,
                "b": b,
                "kind": kind,
                "jaccard": round(j, 6),
                "psnr": 999.0 if p == float("inf") else round(p, 3),
                "hamming": ham,
                "is_dup": bool(caption_dup or image_dup),
            }
        )

    sizes = [32, 48, 64, 96, 128]
    for i in range(n_base):
        size = sizes[int(rng.integers(0, len(sizes)))]
        pixels = _base_pixels(rng, size)
        stop = rng.random() < 0.05
        caption = STOP_CAPTION if stop else _caption(rng, vocab)
        fmt = "png" if rng.random() < 0.5 else "jpeg"
        base_id, base_decoded = emit(pixels, caption, fmt)

        if rng.random() >= dup_fraction:
            continue
        fam = rng.integers(0, 5)
        if fam == 0:  # exact: same bytes re-emitted
            dup_id, dup_decoded = emit(base_decoded if fmt == "png" else pixels, caption, fmt)
            record_pair(base_id, dup_id, "exact", base_decoded, dup_decoded, caption, caption)
        elif fam == 1:  # lossy re-encode
            q = int(rng.integers(75, 96))
            dup_id, dup_decoded = emit(base_decoded, caption, "jpeg", q)
            record_pair(base_id, dup_id, "lossy", base_decoded, dup_decoded, caption, caption)
        elif fam == 2:  # noised
            noise = rng.normal(0, 2.0, base_decoded.shape)
            noised = (base_decoded.astype(np.float64) + noise).clip(0, 255).astype(np.uint8)
            dup_id, dup_decoded = emit(noised, caption, "png")
            record_pair(base_id, dup_id, "noised", base_decoded, dup_decoded, caption, caption)
        elif fam == 3:  # caption paraphrase tiers
            edits = int(rng.integers(1, 4))
            cap2 = _paraphrase(rng, vocab, caption, edits)
            dup_id, dup_decoded = emit(base_decoded, cap2, "png")
            record_pair(base_id, dup_id, "paraphrase", base_decoded, dup_decoded, caption, cap2)
        else:  # hard negative: different image, related caption
            other = _base_pixels(rng, size)
            cap2 = _paraphrase(rng, vocab, caption, max(3, len(caption.split()) // 2))
            dup_id, dup_decoded = emit(other, cap2, "png")
            record_pair(base_id, dup_id, "hardneg", base_decoded, dup_decoded, caption, cap2)

    images = pd.DataFrame(rows)
    golden_pairs = pd.DataFrame(
        pairs,
        columns=["a", "b", "kind", "jaccard", "psnr", "hamming", "is_dup"],
    )

    # golden assignments: union-find over is_dup pairs
    parent: dict[str, str] = {r["image_id"]: r["image_id"] for r in rows}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        if p["is_dup"]:
            ra, rb = find(p["a"]), find(p["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # NOTE: captions shared between *different* bases (stop captions) also
    # merge under the engine's caption tier; fold those in like the engine.
    by_caption: dict[frozenset, str] = {}
    for r in rows:
        key = shingle_set(r["caption"], cfg.shingle_k)
        if key in by_caption:
            ra, rb = find(by_caption[key]), find(r["image_id"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        else:
            by_caption[key] = r["image_id"]
    golden_assignments = pd.DataFrame(
        {
            "image_id": [r["image_id"] for r in rows],
            "cluster_id": [find(r["image_id"]) for r in rows],
        }
    )
    return images, golden_pairs, golden_assignments


def generate_owners(n: int = 500, seed: int = 7) -> pd.DataFrame:
    """F3: reference-shaped string-entity fixture (owners grain, reference
    R/processors.R:646-673): names with typo/abbreviation variants, an
    `inst` flag picking the 0.85 vs 0.95 threshold tier (reference
    config.R:28-29), and an addr_id bounding key (R/deduplicaters.R:446-462)."""
    rng = np.random.default_rng(seed)
    stems = ["OAKVALE", "RIVERSIDE", "GRANITE", "BEACON", "HARBOR", "MAPLE", "SUMMIT", "ELMWOOD"]
    kinds = ["PROPERTIES LLC", "REALTY TRUST", "HOLDINGS INC", "PARTNERS LP"]
    abbrev = {"PROPERTIES": "PROP", "REALTY": "RLTY", "HOLDINGS": "HLDG", "PARTNERS": "PTNRS"}
    rows = []
    for i in range(n):
        base = f"{stems[int(rng.integers(0, len(stems)))]} {kinds[int(rng.integers(0, len(kinds)))]}"
        name = base
        r = rng.random()
        if r < 0.25:  # abbreviation variant
            for full, ab in abbrev.items():
                name = name.replace(full, ab)
        elif r < 0.4:  # typo variant
            pos = int(rng.integers(0, len(name)))
            name = name[:pos] + name[pos + 1 :]
        rows.append(
            {
                "id": i,
                "name": name,
                "inst": bool("LLC" in base or "INC" in base or "TRUST" in base),
                "addr_id": int(rng.integers(0, n // 10 + 1)),
            }
        )
    return pd.DataFrame(rows)


def _gen_chunk(args: tuple) -> tuple:
    """Worker for the parallel generator: one deterministic chunk with its
    own seed and a disjoint image_id namespace (chunk prefix)."""
    chunk_idx, n_base, seed, out_dir = args
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    images, pairs, assigns = generate_images(n_base=n_base, seed=seed + chunk_idx)
    prefix = f"c{chunk_idx:04d}_"
    images = images.assign(image_id=prefix + images["image_id"])
    pairs = pairs.assign(a=prefix + pairs["a"], b=prefix + pairs["b"])
    assigns = assigns.assign(
        image_id=prefix + assigns["image_id"], cluster_id=prefix + assigns["cluster_id"]
    )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    ip = os.path.join(out_dir, "images.parquet", f"part-{chunk_idx:04d}.parquet")
    # Small row groups for the bytes-heavy table: a scan task buffers one
    # whole row-group column chunk on heap, so row-group size bounds
    # per-task scan memory.  Default pyarrow groups made ~150 MB chunks;
    # at 32 concurrent scan tasks that is ~5 GB of transient buffers and
    # the executor OOMs (measured on the 1.4M corpus).  1024 rows x
    # ~15 KB ~= 15 MB keeps 32-task scan memory under ~1 GB — the same
    # rule a 100-TB ingest must apply when writing image shards.
    pq.write_table(
        pa.Table.from_pandas(images, schema=schema, preserve_index=False),
        ip, row_group_size=1024,
    )
    gp = os.path.join(out_dir, "golden_pairs.parquet", f"part-{chunk_idx:04d}.parquet")
    pq.write_table(pa.Table.from_pandas(pairs, preserve_index=False), gp)
    ga = os.path.join(out_dir, "golden_assignments.parquet", f"part-{chunk_idx:04d}.parquet")
    pq.write_table(pa.Table.from_pandas(assigns, preserve_index=False), ga)
    return (chunk_idx, len(images))


def write_images_parquet_parallel(
    path: str, n_base: int, seed: int = 42, workers: int = 24, chunk_base: int = 10000
) -> tuple[str, str, str]:
    """Deterministic multi-process generator for large corpora: chunks of
    `chunk_base` bases, each seeded seed+chunk_idx with a disjoint id
    prefix; output is a parquet DIRECTORY per table (Spark-native
    multi-file layout).  NOTE: chunk ids live in separate namespaces, so
    cross-chunk caption collisions (stop captions) still merge via the
    engine's caption tier — golden assignments remain per-chunk and the
    recall gate uses golden_pairs (which never cross chunks)."""
    import multiprocessing as mp
    import os

    os.makedirs(os.path.join(path, "images.parquet"), exist_ok=True)
    os.makedirs(os.path.join(path, "golden_pairs.parquet"), exist_ok=True)
    os.makedirs(os.path.join(path, "golden_assignments.parquet"), exist_ok=True)
    n_chunks = (n_base + chunk_base - 1) // chunk_base
    tasks = [(i, min(chunk_base, n_base - i * chunk_base), seed, path) for i in range(n_chunks)]
    with mp.Pool(workers) as pool:
        pool.map(_gen_chunk, tasks)
    return (
        os.path.join(path, "images.parquet"),
        os.path.join(path, "golden_pairs.parquet"),
        os.path.join(path, "golden_assignments.parquet"),
    )


def write_images_parquet(path: str, n_base: int, seed: int = 42) -> tuple[str, str, str]:
    """Materialize the three F1/F2 tables under `path` (parquet)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    images, pairs, assigns = generate_images(n_base=n_base, seed=seed)
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    ip = os.path.join(path, "images.parquet")
    # row_group_size: see _gen_chunk — bounds per-scan-task heap.
    pq.write_table(
        pa.Table.from_pandas(images, schema=schema, preserve_index=False),
        ip, row_group_size=1024,
    )
    gp = os.path.join(path, "golden_pairs.parquet")
    pq.write_table(pa.Table.from_pandas(pairs, preserve_index=False), gp)
    ga = os.path.join(path, "golden_assignments.parquet")
    pq.write_table(pa.Table.from_pandas(assigns, preserve_index=False), ga)
    return ip, gp, ga

"""Memory-bandwidth scaling probe: does aggregate DRAM bandwidth grow
8->32 workers on this host?

Why this exists (BENCH.md forensics): the image pipeline's scan-heavy
phases (payload scan + Arrow transfer in `sig`, shuffle in `block`)
measure well below the pure-CPU ceiling at local[32] vs local[8].  The
pure-CPU probe (`scaling_bench.machine_ceiling`) bounds what arithmetic
can scale; THIS probe bounds what *streaming through memory* can scale.
If aggregate copy bandwidth at 32 workers is ~= at 8 workers, the
single-box 8->32 comparison structurally cannot show >= 0.8 efficiency
for bandwidth-bound phases — whereas a real N->4N *cluster* multiplies
sockets and memory channels along with cores, so the criterion remains
meaningful there.  (STREAM-triad-style argument; McCalpin 1995.)

Each worker is a separate PROCESS (no GIL) that repeatedly memcpys a
buffer several times larger than LLC, for a fixed wall window; we sum
bytes moved across workers.  numpy `copyto` compiles to a vectorized
memcpy — this is the same access pattern as a parquet column scan or a
shuffle spill read.

Usage: python tools/membw_probe.py [--sizes 1,8,32] [--mb 512]
Prints one JSON line: {"mb_per_worker":..., "levels": {"1": GBps, ...},
"scaling_8_to_32": ratio, "verdict": "..."}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _worker(mb: int, seconds: float, q: mp.Queue) -> None:
    import numpy as np

    src = np.random.default_rng(0).integers(0, 255, mb << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    # warm both buffers into RAM (first touch)
    np.copyto(dst, src)
    moved = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        moved += 2 * src.nbytes  # one read + one write stream
    q.put((moved, time.perf_counter() - t0))


def measure(workers: int, mb: int, seconds: float) -> float:
    """Aggregate GB/s across `workers` concurrent memcpy processes."""
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(mb, seconds, q)) for _ in range(workers)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(m / t for m, t in results) / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,8,32")
    ap.add_argument("--mb", type=int, default=512, help="buffer MB per worker")
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    levels = {}
    for n in sizes:
        levels[str(n)] = round(measure(n, args.mb, args.seconds), 2)
    out = {"mb_per_worker": args.mb, "levels_gbps": levels}
    if "8" in levels and "32" in levels:
        ratio = levels["32"] / levels["8"] if levels["8"] else None
        out["scaling_8_to_32"] = round(ratio, 3) if ratio else None
        out["verdict"] = (
            "bandwidth saturated: 32 workers move <=%.2fx the bytes of 8 — "
            "streaming phases cannot scale past this on one box" % ratio
            if ratio is not None and ratio < 2.0
            else "bandwidth still scaling at 32 workers"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Winnow-pairs scaling datapoint (VERDICT r4 #6): the SAME
winnowing block->verify job at two parallelism levels, substring-tier
style.  winnow_pairs' single-band gram blocking is the most
skew-exposed new path — every selected fingerprint is one blocking key,
so a boilerplate gram shared by 10^5 docs is a hot bucket that the
salted-cell machinery must flatten.

Protocol: identical to the below-saturation supplement
(tools/scaling_supplement.py) — alternating fresh one-at-a-time JVMs
LO,HI,LO,HI..., one discarded warm-up + one measured rep per unit,
medians across units, with the in-window pure-CPU ceiling measured per
run.  Default LO=2 HI=8 (below memory-bandwidth saturation on this VM;
see BENCH.md supplement rationale).

Corpus: a deterministic Spark-generated corpus shaped for a
character-gram operator (see the worker comment): high-entropy 2M-word
vocab so grams are near-unique, 1-in-100 planted near-copies sharing a
~30-word prefix, and a bounded boilerplate component (1-in-100 docs
prepend one of 200 shared headers) to exercise the salted-cell path.
Winnow k=8 w=8 guarantees >= 1 shared fingerprint for any shared run
>= 15 chars, so planted pairs are all recalled and the pair count is
stable across parallelism levels.

Usage: WINNOW_RUNS=2 WINNOW_REPS=2 WINNOW_DOCS_BASE=40000 \
  python tools/scaling_winnow.py
Writes the WINNOW section into BENCH.md (markers), resumable state in
/tmp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import REPO, machine_ceiling, run_worker  # noqa: E402

LO = int(os.environ.get("WINNOW_LO", "2"))
HI = int(os.environ.get("WINNOW_HI", "8"))
STATE_PATH = os.environ.get("WINNOW_STATE", "/tmp/spark_graft_scaling_winnow_r5.json")
MARK_BEGIN = "<!-- WINNOW:BEGIN -->"
MARK_END = "<!-- WINNOW:END -->"

WINNOW_WORKER = r"""
import gc, json, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); reps = int(sys.argv[3])
from pyspark.sql import functions as F
from who_owns_mass_processing_spark.session import get_spark, shuffle_write_bytes
from who_owns_mass_processing_spark.operators.dedupe import winnow_pairs

spark = get_spark(cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

# deterministic corpus shaped for a CHARACTER-gram operator: the
# substring tier's 5000-word vocab is pathological for k=8 grams (p99
# bucket ~170 docs at 20k rows -> 48M candidates measured), because an
# 8-char gram mostly covers one word.  Winnow's corpus draws words from
# a 2M vocab (grams near-unique), keeps the 1-in-100 planted near-copy
# pairs (docs (100k, 100k+1) share their first 30 words), and adds a
# BOUNDED boilerplate component — 1 in 100 docs (pmod 100 == 2)
# prepends one of 200 shared 10-word headers — so the salted-cell
# machinery sees genuinely hot fingerprints without the quadratic
# blow-up a real deployment would stop-band away.
base_expr = F.when(F.pmod(F.col("id"), F.lit(100)) == 1, F.col("id") - 1).otherwise(F.col("id"))
ws = F.transform(F.sequence(F.lit(0), F.lit(29)),
                 lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(base_expr, i), F.lit(2000000))))
wo = F.transform(F.sequence(F.lit(30), F.lit(39)),
                 lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000000))))
bp = F.transform(F.sequence(F.lit(0), F.lit(9)),
                 lambda i: F.concat(F.lit("b"), F.pmod(F.floor(F.col("id") / 100), F.lit(200)) * 100 + i))
body = F.concat_ws(" ", F.concat(ws, wo))
text = F.when(F.pmod(F.col("id"), F.lit(100)) == 2,
              F.concat(F.concat_ws(" ", bp), F.lit(" "), body)).otherwise(body)
docs = spark.range(n_docs, numPartitions=2 * cores).select(
    F.col("id").alias("doc_id"), text.alias("text"))
docs = docs.localCheckpoint(eager=True)  # generation excluded from timing
n = docs.count()

def one_run():
    t = {}
    t0 = time.time()
    sw0 = shuffle_write_bytes(spark)
    pairs, _ = winnow_pairs(docs, "doc_id", "text", k=8, w=8, min_shared=3)
    t["n_pairs"] = pairs.count()
    t["pairs"] = time.time() - t0
    t["shuffle_mb"] = (shuffle_write_bytes(spark) - sw0) / 1e6
    return t

def cleanup():
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)

cold = one_run()
print("cold " + json.dumps({k: round(v, 2) for k, v in cold.items()}), flush=True)
cleanup()
runs = []
for r in range(reps):
    res = one_run()
    runs.append(res)
    cleanup()
    print(f"rep{r} " + json.dumps({k: round(v, 2) for k, v in res.items()}), flush=True)

med = lambda key: sorted(r[key] for r in runs)[len(runs) // 2]
print(json.dumps({
    "cores": cores, "n_docs": n, "n_pairs": runs[0]["n_pairs"],
    "cold_sec": round(cold["pairs"], 2),
    "pairs_sec": round(med("pairs"), 2),
    "shuffle_mb": round(med("shuffle_mb"), 1),
    "docs_per_sec": round(n / med("pairs"), 2),
    "reps": [{k: round(v, 2) for k, v in r.items()} for r in runs],
}))
"""


def _load_state() -> dict:
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as f:
            return json.load(f)
    return {"lo": LO, "hi": HI, "runs": []}


def _save_state(state: dict) -> None:
    tmp = STATE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=2)
    os.replace(tmp, STATE_PATH)


def run_alternating(n_docs: int, reps: int) -> tuple[dict, dict]:
    units: dict[int, list[dict]] = {LO: [], HI: []}
    for r in range(reps):
        for c in (LO, HI):
            print(f"  unit rep{r} local[{c}] ...", flush=True)
            t0 = time.time()
            u = run_worker(WINNOW_WORKER, c, n_docs, 1)
            units[c].append(u)
            print(
                f"  unit rep{r} local[{c}]: pairs={u['pairs_sec']}s "
                f"n_pairs={u['n_pairs']} wall={time.time() - t0:.0f}s",
                flush=True,
            )

    def agg(us: list[dict]) -> dict:
        med = lambda key: sorted(u[key] for u in us)[len(us) // 2]
        return {
            "cores": us[0]["cores"], "n_docs": us[0]["n_docs"],
            "n_pairs": us[0]["n_pairs"], "cold_sec": med("cold_sec"),
            "pairs_sec": med("pairs_sec"), "shuffle_mb": med("shuffle_mb"),
            "docs_per_sec": round(us[0]["n_docs"] / med("pairs_sec"), 2),
            "reps": [u["reps"][0] for u in us],
        }

    return agg(units[LO]), agg(units[HI])


def _run_block(run: dict) -> tuple[float, float, float | None]:
    speedup = run["rhi"]["docs_per_sec"] / run["rlo"]["docs_per_sec"]
    eff = speedup / (HI / LO)
    ceil = run["ceiling"].get("ceiling")
    norm = eff / ceil if ceil else None
    return speedup, eff, norm


def render_section(state: dict) -> str:
    runs = state["runs"]
    if not runs:
        return ""
    effs = sorted(_run_block(r)[1] for r in runs)
    med_eff = effs[len(effs) // 2]
    norms = sorted(n for n in (_run_block(r)[2] for r in runs) if n is not None)
    med_norm_s = f"{norms[len(norms) // 2]:.2f}" if norms else "n/a"
    n_docs = runs[0]["rlo"]["n_docs"]
    pairs_same = all(
        r["rlo"]["n_pairs"] == r["rhi"]["n_pairs"] == runs[0]["rlo"]["n_pairs"]
        for r in runs
    )
    md = f"""## Winnow-pairs scaling (single-band gram blocking, r5)

`winnow_pairs` (k=8, w=8, min_shared=3) over the substring tier's
deterministic {n_docs}-doc corpus at local[{LO}] vs local[{HI}] — the
alternating fresh-JVM below-saturation protocol (see supplement
rationale above).  This is the most skew-exposed new path: every
selected fingerprint is a single-band blocking key, flattened by the
same salted-cell census as every other tier.

| run | cpu ceiling {LO}->{HI} | speedup | raw eff | normalized | pairs s ({LO} / {HI}) | shuffle MB ({LO} / {HI}) |
|---|---|---|---|---|---|---|
"""
    for i, r in enumerate(runs):
        sp, eff, norm = _run_block(r)
        ceil_s = (
            f"{r['ceiling']['ceiling']:.3f}" if r["ceiling"].get("ceiling") else "n/a"
        )
        norm_s = f"**{norm:.2f}**" if norm is not None else "n/a"
        md += (
            f"| {i + 1} | {ceil_s} | {sp:.2f}x | **{eff:.2f}** | {norm_s} "
            f"| {r['rlo']['pairs_sec']} / {r['rhi']['pairs_sec']} "
            f"| {r['rlo']['shuffle_mb']} / {r['rhi']['shuffle_mb']} |\n"
        )
    md += f"""
- median raw efficiency {LO}->{HI}: **{med_eff:.2f}**; median normalized {med_norm_s}
- verified pairs: {runs[0]["rlo"]["n_pairs"]} — identical at every level of every run
  ({pairs_same})
- raw per-run: `{json.dumps([{k: {kk: vv for kk, vv in r[k].items() if kk != "reps"} if isinstance(r[k], dict) else r[k] for k in ("ceiling", "rlo", "rhi")} for r in runs])}`

"""
    return md


def write_bench_section(state: dict) -> None:
    path = os.path.join(REPO, "BENCH.md")
    text = open(path).read()
    section = MARK_BEGIN + "\n" + render_section(state) + MARK_END
    if MARK_BEGIN in text:
        text = text.split(MARK_BEGIN)[0] + section + text.split(MARK_END)[1]
    else:
        anchor = "<!-- SUPPLEMENT:BEGIN -->"
        if anchor in text:
            pre, post = text.split(anchor, 1)
            text = pre + section + "\n\n" + anchor + post
        else:
            text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)


def main() -> None:
    n_docs = int(os.environ.get("WINNOW_DOCS_BASE", "40000"))
    reps = int(os.environ.get("WINNOW_REPS", "2"))
    n_runs = int(os.environ.get("WINNOW_RUNS", "2"))
    state = _load_state()
    while len(state["runs"]) < n_runs:
        i = len(state["runs"]) + 1
        print(f"=== winnow run {i}/{n_runs} (local[{LO}] vs local[{HI}])", flush=True)
        ceil = machine_ceiling(lo=LO, hi=HI)
        rlo, rhi = run_alternating(n_docs, reps)
        state["runs"].append({"ceiling": ceil, "rlo": rlo, "rhi": rhi})
        _save_state(state)
        write_bench_section(state)
        sp, eff, norm = _run_block(state["runs"][-1])
        print(
            f"winnow run {i} done: speedup={sp:.2f} raw={eff:.2f} "
            f"norm={norm if norm is None else round(norm, 2)}",
            flush=True,
        )
    write_bench_section(state)
    print("winnow scaling complete")


if __name__ == "__main__":
    main()

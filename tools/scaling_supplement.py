#!/usr/bin/env python
"""Below-saturation scaling supplement: the SAME image job at local[2]
vs local[8] (still N -> 4N cores, per the driver instruction "running
the same job at two parallelism levels (e.g. local[8] and local[32],
or N and 4N cores)").

Why this exists (BENCH.md round-4 findings): the primary 8->32 campaign
is bounded by this single VM's memory system — aggregate memcpy scales
only 0.69 from 8 to 32 workers and first-touch page faults are serviced
by the Firecracker host — so bandwidth-bound phases structurally cannot
show >= 0.8 at 8->32 on one box, whereas a real N->4N *executor*
scale-up multiplies sockets, memory channels, and page cache along with
cores.  At 2->8 workers the memory system is NOT yet the binding
resource (each run measures its own memcpy 2->8 ratio in-window to
prove it), so the same job's 2->8 efficiency isolates what the PLAN
scales like when the hardware actually delivers 4x — the regime the
north rule's criterion describes.

Protocol is identical to the primary campaign's alternating mode
(tools/scaling_bench.py run_alternating): units run 2,8,2,8,... where
each unit is a fresh one-at-a-time JVM doing one discarded warm-up plus
one measured rep; per level the reported figure is the median across
units.  Each full run carries BOTH in-window ceilings: the pure-CPU
probe at (2,8) processes and the memcpy probe at (2,8) workers.

The corpus is smaller than the primary campaign's (default base
200_000 -> ~140k images) purely for wall-clock: a local[2] rep over the
700k corpus is ~20 min, and the supplement needs 6 units x 2 runs.
Same generator, same seed discipline, same measured section.

State is resumable (SUPP_STATE, default /tmp/..._supp_r4.json); the
BENCH.md section between the SUPPLEMENT markers is rewritten after
every completed run.

Usage: SUPP_RUNS=3 SUPP_REPS=3 python tools/scaling_supplement.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from membw_probe import measure as membw_measure  # noqa: E402
from scaling_bench import (  # noqa: E402
    REPO,
    WORKER,
    machine_ceiling,
    run_worker,
)

LO = int(os.environ.get("SUPP_LO", "2"))
HI = int(os.environ.get("SUPP_HI", "8"))
STATE_PATH = os.environ.get(
    "SUPP_STATE", "/tmp/spark_graft_scaling_supp_r4.json"
)
MARK_BEGIN = "<!-- SUPPLEMENT:BEGIN -->"
MARK_END = "<!-- SUPPLEMENT:END -->"


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


def run_alternating(n_base: int, reps: int) -> tuple[dict, dict]:
    units: dict[int, list[dict]] = {LO: [], HI: []}
    for r in range(reps):
        for c in (LO, HI):
            print(f"  unit rep{r} local[{c}] ...", flush=True)
            t0 = time.time()
            u = run_worker(WORKER, c, n_base, 1)
            units[c].append(u)
            print(
                f"  unit rep{r} local[{c}]: sig={u['sig_sec']} "
                f"block={u['block_sec']} cold={u['cold_sec']} "
                f"wall={time.time() - t0:.0f}s",
                flush=True,
            )

    def agg(us: list[dict]) -> dict:
        med = lambda key: sorted(u[key] for u in us)[len(us) // 2]
        core_sec = med("sig_sec") + med("block_sec")
        out = {
            "cores": us[0]["cores"], "n_images": us[0]["n_images"],
            "edges": us[0]["edges"], "cold_sec": med("cold_sec"),
            "sig_sec": med("sig_sec"), "block_sec": med("block_sec"),
            "cc_sec": med("cc_sec"),
            "images_per_sec": round(us[0]["n_images"] / core_sec, 2),
            "reps": [u["reps"][0] for u in us],
        }
        # present from round 5 on (shuffle_write_bytes instrumentation);
        # guard so a resumed pre-r5 SUPP_STATE still aggregates
        if all("block_shuffle_mb" in u for u in us):
            out["block_shuffle_mb"] = med("block_shuffle_mb")
        return out

    return agg(units[LO]), agg(units[HI])


def _run_block(run: dict) -> tuple[float, float, float | None]:
    speedup = run["rhi"]["images_per_sec"] / run["rlo"]["images_per_sec"]
    eff = speedup / (HI / LO)
    ceil = run["ceiling"].get("ceiling")
    norm = eff / ceil if ceil else None
    return speedup, eff, norm


def render_section(state: dict) -> str:
    runs = state["runs"]
    if not runs:
        return ""
    effs = sorted(e for e in (_run_block(r)[1] for r in runs))
    med_eff = effs[len(effs) // 2]
    norms = sorted(n for n in (_run_block(r)[2] for r in runs) if n is not None)
    med_norm = norms[len(norms) // 2] if norms else None
    n_ok_raw = sum(1 for e in effs if e >= 0.8)
    n_img = runs[0]["rlo"]["n_images"]
    edges_same = all(
        r["rlo"]["edges"] == r["rhi"]["edges"] == runs[0]["rlo"]["edges"]
        for r in runs
    )

    # memcpy ratios collected into a LIST first — min()/max() over an
    # empty generator raises (ADVICE r4: a resumed pre-membw SUPP_STATE
    # or lo_bw==0 would crash the whole section rewrite); prose degrades
    # to n/a exactly like the table rows do.
    bw_ratios = [
        r["membw"]["ratio"] for r in runs if r.get("membw", {}).get("ratio")
    ]
    if bw_ratios:
        bw_span = f"{min(bw_ratios):.2f}-{max(bw_ratios):.2f}"
        bw_sentence = (
            f"The memcpy probe, however, measures {bw_span} even at\n"
            f"{LO}->{HI}: this VM's memory system never delivers {HI // LO}x "
            "bandwidth at ANY\nwidth, so the bandwidth-bound block phase "
            "remains host-capped here too"
        )
    else:
        bw_sentence = (
            "No memcpy probe ratio is available for these runs, so the "
            "bandwidth\nceiling is not quantified in-window"
        )
    # per-run block-phase efficiency vs the same-window memcpy ratio —
    # the claim is WORDED FROM THE DATA (ADVICE r4: the old template
    # hardcoded 'at or above', which run 2's own numbers contradicted)
    be_over_bw = []
    for r in runs:
        bw = r.get("membw", {}).get("ratio")
        blo, bhi = r["rlo"]["block_sec"], r["rhi"]["block_sec"]
        if bw and bhi:
            be_over_bw.append((blo / bhi) / (HI / LO) / bw)
    if be_over_bw:
        ratios_s = " / ".join(f"{x:.2f}" for x in be_over_bw)
        rel = (
            "at or above" if min(be_over_bw) >= 1.0
            else "at or near" if min(be_over_bw) >= 0.7
            else "sometimes well below"
        )
        block_clause = (
            f"(its per-run efficiency lands {rel} the same-window memcpy "
            f"ratio:\nblock-eff/memcpy {ratios_s}; see the phase "
            "decomposition in the verdict section)"
        )
    else:
        block_clause = "(no in-window memcpy ratio to compare against)"

    md = f"""## Below-saturation supplement: local[{LO}] vs local[{HI}] (N -> 4N)

The 8->32 comparison above is capped by this single VM's memory system
(memcpy 8->32 = 0.69; first-touch collapse), a ceiling a real N->4N
*executor* scale-up does not have — more executors bring more memory
channels and page cache, not just cores.  To measure what the PLAN
scales like when the hardware actually delivers ~4x, the SAME job ran
over the SAME {n_img}-image input at local[{LO}] and local[{HI}] — still an
N->4N core ratio per the driver instruction — using the identical
alternating fresh-JVM protocol (warm-up + 1 measured rep per unit,
median of {len(runs[0]["rlo"]["reps"])} units per level per run).  Each run measures BOTH
in-window ceilings at ({LO},{HI}): the pure-CPU probe and the memcpy probe.
The CPU probe reads ~1.0 at this width — the host genuinely delivers
{HI // LO}x CPU — so the CPU-bound phases' raw numbers need no
normalization.  {bw_sentence}
{block_clause}.

| run | cpu ceiling {LO}->{HI} | memcpy {LO}->{HI} | speedup | raw eff | normalized |
|---|---|---|---|---|---|
"""
    for i, r in enumerate(runs):
        sp, eff, norm = _run_block(r)
        ceil_s = (
            f"{r['ceiling']['ceiling']:.3f}"
            if r["ceiling"].get("ceiling") else "n/a"
        )
        bw = r.get("membw", {})
        bw_s = f"{bw['ratio']:.2f}" if bw.get("ratio") else "n/a"
        norm_s = f"**{norm:.2f}**" if norm is not None else "n/a"
        md += f"| {i + 1} | {ceil_s} | {bw_s} | {sp:.2f}x | **{eff:.2f}** | {norm_s} |\n"

    med_norm_s = f"{med_norm:.2f}" if med_norm is not None else "n/a"
    md += f"""
- **median RAW efficiency {LO}->{HI}: {med_eff:.2f}** ({n_ok_raw}/{len(runs)} runs >= 0.8 raw);
  median normalized {med_norm_s}
- verified edges: {runs[0]["rlo"]["edges"]} — identical at every level of every
  run ({edges_same})

"""
    for i, r in enumerate(runs):
        rlo, rhi = r["rlo"], r["rhi"]
        sp, eff, norm = _run_block(r)
        norm_s = f"{norm:.2f}" if norm is not None else "n/a"
        def _mb(u: dict) -> str:
            v = u.get("block_shuffle_mb")
            return f"{v:.1f}" if v is not None else "n/a"

        md += f"""### Supplement run {i + 1}

| parallelism | images | signature s | block+verify s | block shuffle-write MB | images/sec | cold-run s | CC s |
|---|---|---|---|---|---|---|---|
| local[{LO}] (N)  | {rlo["n_images"]} | {rlo["sig_sec"]} | {rlo["block_sec"]} | {_mb(rlo)} | {rlo["images_per_sec"]} | {rlo["cold_sec"]} | {rlo["cc_sec"]} |
| local[{HI}] (4N) | {rhi["n_images"]} | {rhi["sig_sec"]} | {rhi["block_sec"]} | {_mb(rhi)} | {rhi["images_per_sec"]} | {rhi["cold_sec"]} | {rhi["cc_sec"]} |

- speedup **{sp:.2f}x**, raw **{eff:.2f}**, normalized {norm_s}
- per-rep block spread: local[{LO}] {[x["block"] for x in rlo["reps"]]} s,
  local[{HI}] {[x["block"] for x in rhi["reps"]]} s
- raw: `{json.dumps({k: v for k, v in rlo.items() if k != "reps"})}` /
  `{json.dumps({k: v for k, v in rhi.items() if k != "reps"})}` /
  ceilings `{json.dumps(r["ceiling"])}` memcpy `{json.dumps(r.get("membw", {}))}`

"""
    return md


def write_bench_section(state: dict) -> None:
    path = os.path.join(REPO, "BENCH.md")
    text = open(path).read()
    section = MARK_BEGIN + "\n" + render_section(state) + MARK_END
    if MARK_BEGIN in text:
        pre = text.split(MARK_BEGIN)[0]
        post = text.split(MARK_END)[1]
        text = pre + section + post
    else:
        # insert before the verdict section if present, else append
        anchor = "## Verdict vs the north rule"
        if anchor in text:
            pre, post = text.split(anchor, 1)
            text = pre + section + "\n\n" + anchor + post
        else:
            text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)


def main() -> None:
    n_base = int(os.environ.get("SUPP_IMAGES_BASE", "200000"))
    reps = int(os.environ.get("SUPP_REPS", "3"))
    n_runs = int(os.environ.get("SUPP_RUNS", "3"))
    state = _load_state()

    import subprocess

    subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); "
         f"from bench import ensure_bench_images_parallel; "
         f"ensure_bench_images_parallel({n_base})"],
        cwd=REPO, check=True, timeout=7200,
    )
    while len(state["runs"]) < n_runs:
        i = len(state["runs"]) + 1
        print(f"=== supplement run {i}/{n_runs} (local[{LO}] vs local[{HI}])",
              flush=True)
        ceil = machine_ceiling(lo=LO, hi=HI)
        lo_bw = membw_measure(LO, 64, 4.0)
        hi_bw = membw_measure(HI, 64, 4.0)
        membw = {
            f"gbps_{LO}": round(lo_bw, 1), f"gbps_{HI}": round(hi_bw, 1),
            "ratio": round(hi_bw / lo_bw / (HI / LO), 3) if lo_bw else None,
        }
        rlo, rhi = run_alternating(n_base, reps)
        state["runs"].append(
            {"ceiling": ceil, "membw": membw, "rlo": rlo, "rhi": rhi}
        )
        _save_state(state)
        write_bench_section(state)
        sp, eff, norm = _run_block(state["runs"][-1])
        print(f"supplement run {i} done: speedup={sp:.2f} raw={eff:.2f} "
              f"norm={norm if norm is None else round(norm, 2)}", flush=True)

    write_bench_section(state)
    print("supplement complete")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink, captures .explain("formatted") to
plans/r06/<query>_<tag>.txt, and prints per-query seconds as JSON.

This file is SEPARATE from the frozen bench.py (driver contract): it
exists so optimization evidence (plan shapes, isolated timings) can be
collected without touching the measured harness.

Usage:
  python bench_extra.py [--tag before|after] [--plans] [--reps N] [q1 q2 ...]

With no query names, runs the full HEADLINE list from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    want_plans = False
    reps = 1
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--plans":
            want_plans = True
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry_mod
    from bench import HEADLINE, materialize
    from who_owns_mass_processing_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    if not names:
        names = list(HEADLINE)

    # warm-up mirrors bench.py (python workers + codegen)
    materialize(qs["text_metrics"](spark, sf_dir))
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    materialize(qs["minhash_lsh_pairs"](spark, warm_dir if os.path.isdir(warm_dir) else sf_dir))

    os.makedirs(PLANS_DIR, exist_ok=True)
    timings: dict[str, list[float]] = {}
    for name in names:
        if want_plans:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        timings[name] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            timings[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()

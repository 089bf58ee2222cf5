"""Larger-SF scaling spot-bench (VERDICT r14 #4): the headline bench at
sf0.1 sits at the ~0.2-0.5 s per-query job-scheduling floor, so its
8-core/32-core ratios measure fixed overhead, not parallel code.  This
tool times the heaviest headline queries at a LARGER scale factor at two
core counts and prints ONE JSON line with the per-query low/high-core
ratios — evidence that the operators actually parallelize.

It is deliberately a SEPARATE artifact from bench.py (the headline
contract is untouched): same noop-sink methodology, same
$SPARK_GRAFT_SF_DIR override (default /tmp/sf2.5, built by
``python tools/gen_scale.py 25 /tmp/sf2.5``), core counts from
$SPARK_GRAFT_SCALE_CPUS (default "32,8").  Each core count runs in its
own subprocess so every measurement gets a fresh JVM at exactly
local[N].

Usage:
    python tools/gen_scale.py 25 /tmp/sf2.5     # once
    python tools/bench_scaling.py               # prints the JSON line

Inner mode (one core count, invoked via subprocess):
    python tools/bench_scaling.py --inner <cpus> <sf_dir> <q1,q2,...>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The heaviest headline queries by driver-measured share (BENCH_r14),
# spanning the suite's axes: the Pregel graph loop, the Bloom
# decontamination probe, the ExactSubstr gram pipeline, exact-decimal
# TPC-H aggregation, and the 5-dimension broadcast star join.
DEFAULT_QUERIES = [
    "graph_pagerank_distributed",
    "decontaminate_bloom",
    "dedup_duplicate_spans",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
]


def inner(cpus: int, sf_dir: str, names: list[str]) -> int:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from bench import BENCH_OVERRIDES, _force  # noqa: E402
    from processo_etl_spark import plans, session  # noqa: E402

    spark = session.get_spark(app_name=f"bench_scaling_{cpus}")
    queries = plans.all_queries()
    # Warm-up at sf0.001 (JVM/codegen bring-up, the bench convention).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        _force(fn(spark, warm_dir))
    spark.catalog.clearCache()
    out: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:  # cold pass primes the shared caches
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        spark.sparkContext.setJobDescription(f"scaling_cold:{name}")
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)
    for name in names:  # steady pass = the reported number
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"cpus": cpus, "steady": out, "cold": cold}))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        return inner(int(sys.argv[2]), sys.argv[3], sys.argv[4].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf2.5")
    cpu_list = [
        int(c)
        for c in os.environ.get("SPARK_GRAFT_SCALE_CPUS", "32,8").split(",")
    ]
    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT_QUERIES
    )
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    runs: dict[int, dict] = {}
    for cpus in cpu_list:
        p = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--inner",
                str(cpus),
                sf_dir,
                ",".join(names),
            ],
            capture_output=True,
            text=True,
            env=dict(os.environ, SPARK_GRAFT_CPUS=str(cpus)),
        )
        line = [
            ln for ln in p.stdout.splitlines() if ln.startswith("{")
        ][-1]
        runs[cpus] = json.loads(line)
    hi, lo = max(cpu_list), min(cpu_list)
    ratios = {
        n: round(runs[lo]["steady"][n] / runs[hi]["steady"][n], 2)
        for n in names
        if runs[hi]["steady"].get(n)
    }
    art = {
        "metric": "scaling_spot_wall",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus_high": hi,
        "cpus_low": lo,
        "queries_high": runs[hi]["steady"],
        "queries_low": runs[lo]["steady"],
        "queries_cold_high": runs[hi]["cold"],
        "ratio_low_over_high": ratios,
        "unit": "sec",
    }
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Steady-pass execution metrics for every headline query in one
session: jobs, stages, tasks, shuffle/input bytes from the UI REST API
(host-independent plan-shape evidence), plus the (noisy) wall second.

Usage: python tools/metrics_all.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_OVERRIDES, HEADLINE, _force  # noqa: E402
from processo_etl_spark import plans, session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = session.get_spark(
        app_name="metrics_all", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId

    def snapshot():
        with urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.loads(r.read())
        with urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app_id}/jobs"
        ) as r:
            jobs = json.loads(r.read())
        return {
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "n_tasks": sum(s["numCompleteTasks"] for s in stages),
            "shuffle_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages) / 1048576, 2
            ),
            "input_mb": round(
                sum(s["inputBytes"] for s in stages) / 1048576, 2
            ),
        }

    queries = plans.all_queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        _force(fn(spark, warm_dir))
    spark.catalog.clearCache()
    for name in HEADLINE:  # cold pass primes caches
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        _force(fn(spark, sf_dir))

    out = {}
    for name in HEADLINE:
        fn = BENCH_OVERRIDES.get(name) or queries[name]
        time.sleep(0.3)
        before = snapshot()
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        wall = round(time.perf_counter() - t0, 3)
        time.sleep(0.3)
        after = snapshot()
        out[name] = {k: round(after[k] - before[k], 2) for k in before}
        out[name]["wall_s"] = wall
    txt = json.dumps(out, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(txt + "\n")
    print(txt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Host-independent execution metrics for one headline query: number of
jobs, stages, tasks, and total shuffle/input bytes, read from the Spark
UI REST API after a warmed noop-sink run.  Wall-clock on this container
swings 5x with external steal bursts; these counts do not.

Usage: python tools/metrics_one.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_OVERRIDES, _force  # noqa: E402
from processo_etl_spark import plans, session  # noqa: E402


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def snapshot(app_id: str) -> dict:
    stages = rest(f"applications/{app_id}/stages?status=complete")
    jobs = rest(f"applications/{app_id}/jobs")
    return {
        "n_jobs": len(jobs),
        "n_stages": len(stages),
        "n_tasks": sum(s["numCompleteTasks"] for s in stages),
        "shuffle_read_mb": round(
            sum(s["shuffleReadBytes"] for s in stages) / 1048576, 2
        ),
        "shuffle_write_mb": round(
            sum(s["shuffleWriteBytes"] for s in stages) / 1048576, 2
        ),
        "input_mb": round(sum(s["inputBytes"] for s in stages) / 1048576, 2),
    }


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = session.get_spark(
        app_name=f"metrics_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId
    queries = plans.all_queries()
    fn = BENCH_OVERRIDES.get(name) or queries[name]

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    _force(fn(spark, warm_dir))
    spark.catalog.clearCache()
    # One cold pass at target sf primes every persisted relation the
    # steady pass will reuse, so the steady-state metrics match what
    # bench.py's timed steady pass actually executes.
    _force(fn(spark, sf_dir))
    time.sleep(1)
    before = snapshot(app_id)
    t0 = time.perf_counter()
    _force(fn(spark, sf_dir))
    wall = round(time.perf_counter() - t0, 3)
    time.sleep(1)
    after = snapshot(app_id)
    delta = {k: round(after[k] - before[k], 2) for k in before}
    delta["query"] = name
    delta["steady_wall_s"] = wall
    print(json.dumps(delta))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

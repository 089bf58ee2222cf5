"""Time a single headline query N times at sf_dir (bench methodology:
sf0.001 warm-up, then N timed noop-sink runs; prints every sample plus
the min — the steal-burst-robust statistic on this host).

Usage: python tools/time_one.py <query> [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_OVERRIDES, _force  # noqa: E402
from processo_etl_spark import plans, session  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = session.get_spark(app_name=f"time_one_{name}")
    queries = plans.all_queries()
    fn = BENCH_OVERRIDES.get(name) or queries[name]

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    _force(fn(spark, warm_dir))
    spark.catalog.clearCache()

    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: samples={samples} min={min(samples)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

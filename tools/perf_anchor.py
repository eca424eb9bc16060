"""Standalone perf anchor: run named contract queries in an N-rep loop
(BASELINE.md protocol — the bench host throttles CPU quota 2-4x under
sustained load, so regressions are confirmed by quiet standalone loops,
never single bench lines).

    python tools/perf_anchor.py q5_region_revenue q3_top_orders
    SPARK_GRAFT_SF_DIR=... PERF_REPS=4 python tools/perf_anchor.py ...

Prints per-query: all rep times, min, and median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main(names: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PERF_REPS", "4"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)
    spark = get_spark("perf-anchor", cpus=cpus)
    qs = entry_mod.queries()
    # same warmup as bench.py
    spark.range(1000).count()
    qs["profile_region"](spark, sf_dir).count()
    spark.range(100).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    for name in names:
        qs[name](spark, sf_dir).count()  # untimed compile run
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(time.time() - t0)
        print(
            f"{name}: reps={[round(t, 3) for t in times]} "
            f"min={min(times):.3f} median={statistics.median(times):.3f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

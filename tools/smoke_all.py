"""Rows-only smoke of the FULL contract at an arbitrary SF dir —
catches scale-dependent execution errors (ANSI overflow, memory,
codegen limits) that the oracle-checked SFs are too small to reach.

    SPARK_DRIVER_MEMORY=3g python tools/smoke_all.py /root/repo/.scratch/sf1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main(sf_dir: str) -> int:
    spark = get_spark("smoke-all", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = entry_mod.queries()
    fails: list[tuple[str, str]] = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"[{i + 1}/{len(qs)}] {name}: {n} rows ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — smoke must finish
            fails.append((name, str(ex)[:200]))
            print(f"[{i + 1}/{len(qs)}] {name}: FAIL {str(ex)[:160]}", flush=True)
    print(f"FAILURES: {len(fails)} {[n for n, _ in fails]}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"))

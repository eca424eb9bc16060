"""Run a named subset of __spark_entry__ contract queries against their
DuckDB oracles (same strict compare as tools/drive_contract.py).

    python tools/drive_subset.py q3_top_orders q5_region_revenue
    DRIVE_SF_DIR=/root/testdata/sf0.1 python tools/drive_subset.py ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ai_data_pipeline_spark.catalog import TABLES  # noqa: E402
from ai_data_pipeline_spark.session import get_spark  # noqa: E402
from tools.drive_contract import SF, check_query  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main(names: list[str]) -> int:
    spark = get_spark("drive-subset", cpus=8)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            status = check_query(spark, con, queries, oracles, name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(
                f"[{i + 1}/{len(names)}] {name}: ERROR {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
            continue
        if "MISMATCH" in status:
            fails.append(name)
        print(
            f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"FAILURES: {len(fails)} {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

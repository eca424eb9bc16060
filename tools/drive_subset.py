"""Run a named subset of __spark_entry__ contract queries against their
DuckDB oracles (same compare as tools/drive_contract.py).

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
from tools.drive_contract import norm  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")


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
            sdf = queries[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(
                [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=repr
            )
            if name in oracles:
                res = con.execute(oracles[name])
                dcols_raw = [d[0] for d in res.description]
                dcols = sorted(dcols_raw)
                idx = [dcols_raw.index(c) for c in dcols]
                drows = sorted(
                    [tuple(norm(row[j]) for j in idx) for row in res.fetchall()],
                    key=repr,
                )
                ok = scols == dcols and len(srows) == len(drows) and srows == drows
                huge = [
                    c
                    for c, t, *_ in con.execute(
                        f"DESCRIBE {oracles[name]}"
                    ).fetchall()
                    if "HUGEINT" in t.upper()
                ]
                if huge:
                    ok = False
                status = (
                    "OK"
                    if ok
                    else (
                        f"MISMATCH huge={huge} cols(s/d)={scols}/{dcols} "
                        f"rows={len(srows)}/{len(drows)}"
                    )
                )
            else:
                status = f"rows_only({len(srows)})"
            if "MISMATCH" in status:
                fails.append(name)
            print(
                f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(
                f"[{i + 1}/{len(names)}] {name}: ERROR {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    print(f"FAILURES: {len(fails)} {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

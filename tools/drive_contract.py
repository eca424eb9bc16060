"""Driver-mimic: run every __spark_entry__ contract query against its
DuckDB oracle and report per-query status + a final FAILURES count.

    python tools/drive_contract.py                          # sf0.01 (driver gate SF)
    DRIVE_SF_DIR=/root/testdata/sf0.1 python tools/drive_contract.py

Mirrors the round driver's t2 check (sorted column names, row count,
order-insensitive exact values) plus a HUGEINT guard: DuckDB exports
HUGEINT via arrow as float64, which mismatches Spark's int64 in the
driver's value hash even when fetchall() equality passes — so any
oracle emitting a HUGEINT column is counted as a failure here.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ai_data_pipeline_spark.catalog import TABLES  # noqa: E402
from ai_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm(v.item())
    except ImportError:
        pass
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main() -> int:
    spark = get_spark("drive-contract", cpus=8)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )

    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows, {len(df.columns)} cols", flush=True)

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for i, name in enumerate(queries):
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
                f"[{i + 1}/{len(queries)}] {name}: {status} ({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(
                f"[{i + 1}/{len(queries)}] {name}: ERROR {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    print(f"FAILURES: {len(fails)} {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

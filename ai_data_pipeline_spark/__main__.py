"""CLI entry point: ``python -m ai_data_pipeline_spark``.

The reference declares (but never ships) a CLI — pyproject.toml:63-64
points ``ai-pipeline = ai_pipeline.cli:app`` at a nonexistent
``ai_pipeline.cli`` module. This closes that declared surface the
Spark-native way: profile any readable table straight from the shell.

    python -m ai_data_pipeline_spark profile /path/to/table.parquet
    python -m ai_data_pipeline_spark profile data.csv --format csv --summary
    python -m ai_data_pipeline_spark profile big/ --approx -o profile.parquet

``--approx`` selects the HLL distinct tier (the 100 TB posture);
``-o`` writes the profile relation as parquet instead of printing it.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ai_data_pipeline_spark",
        description="PySpark-native column profiler / semantic classifier",
    )
    sub = p.add_subparsers(dest="command", required=True)
    prof = sub.add_parser("profile", help="profile every column of a table")
    prof.add_argument("path", help="table path (parquet file/dir, csv, json)")
    prof.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "csv", "json", "orc"],
        help="input format (default: parquet)",
    )
    prof.add_argument(
        "--approx",
        action="store_true",
        help="approx_count_distinct (HLL) instead of exact distinct — "
        "the no-Expand plan for very large tables",
    )
    prof.add_argument(
        "--summary",
        action="store_true",
        help="emit the per-type summary rollup instead of per-column rows",
    )
    prof.add_argument(
        "-o",
        "--output",
        default=None,
        help="write the profile as parquet here instead of printing",
    )
    prof.add_argument(
        "--cpus", type=int, default=None, help="local[N] parallelism"
    )
    job = sub.add_parser(
        "job",
        help="profile-and-save: profile a table, persist the profile + "
        "summary as parquet and emit Data Vault DDL (the reference's "
        "upload -> classify -> persist lifecycle, .env.example:8-29)",
    )
    job.add_argument("path", help="table path (parquet file/dir, csv, json)")
    job.add_argument("outdir", help="output directory for the job artifacts")
    job.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "csv", "json", "orc"],
        help="input format (default: parquet)",
    )
    job.add_argument("--approx", action="store_true", help="HLL distinct tier")
    job.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    sub.add_parser("list", help="list every contract query by name")
    runp = sub.add_parser(
        "run",
        help="run a contract query against a testdata directory and print "
        "(or save) the result",
    )
    runp.add_argument("query", help="query name (see `list`)")
    runp.add_argument(
        "sf_dir",
        nargs="?",
        default=None,
        help="scale-factor directory holding the parquet tables "
        "(default: $SPARK_GRAFT_SF_DIR)",
    )
    runp.add_argument(
        "-o", "--output", default=None, help="write result parquet here"
    )
    runp.add_argument(
        "-n", type=int, default=20, help="rows to print (default 20)"
    )
    runp.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p


def _contract_queries():
    import importlib
    import os
    import sys as _sys

    # __spark_entry__ lives at the repo root, next to this package
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in _sys.path:
        _sys.path.insert(0, root)
    return importlib.import_module("__spark_entry__").queries()


def _read(spark, fmt: str, path: str):
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(path)


def _run_job(spark, args) -> int:
    """upload → classify → persist: profile parquet + summary parquet +
    generated Data Vault DDL under one output directory."""
    import os

    from ai_data_pipeline_spark.operators.vault import profile_to_dv_ddl
    from ai_data_pipeline_spark.profiling.profiler import (
        profile_summary,
        profile_table,
    )

    df = _read(spark, args.format, args.path)
    prof = profile_table(df, exact_distinct=not args.approx)
    os.makedirs(args.outdir, exist_ok=True)
    prof.write.mode("overwrite").parquet(os.path.join(args.outdir, "profile.parquet"))
    profile_summary(prof).write.mode("overwrite").parquet(
        os.path.join(args.outdir, "summary.parquet")
    )
    table_name = (
        os.path.basename(args.path.rstrip("/")).rsplit(".", 1)[0] or "table"
    )
    ddl = profile_to_dv_ddl(prof.collect(), table_name)  # metadata-sized
    ddl_path = os.path.join(args.outdir, "vault_ddl.sql")
    with open(ddl_path, "w") as fh:
        fh.write(";\n".join(ddl) + ";\n")
    print(f"job artifacts written to {args.outdir} (profile.parquet, summary.parquet, vault_ddl.sql)")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.command == "list":
        for name in _contract_queries():
            print(name)
        return 0
    from ai_data_pipeline_spark.profiling.profiler import (
        profile_summary,
        profile_table,
    )
    from ai_data_pipeline_spark.session import get_spark

    spark = get_spark("adp-cli", cpus=args.cpus)
    try:
        if args.command == "job":
            return _run_job(spark, args)
        if args.command == "run":
            import os

            qs = _contract_queries()
            if args.query not in qs:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR")
            if not sf_dir:
                print(
                    "no sf_dir given and $SPARK_GRAFT_SF_DIR unset — pass the "
                    "directory holding the parquet tables",
                    file=sys.stderr,
                )
                return 2
            if not os.path.isdir(sf_dir):
                print(f"sf_dir {sf_dir!r} does not exist", file=sys.stderr)
                return 2
            result = qs[args.query](spark, sf_dir)
            if args.output:
                result.write.mode("overwrite").parquet(args.output)
                print(f"result written to {args.output}")
            else:
                result.show(n=args.n, truncate=False)
            return 0
        df = _read(spark, args.format, args.path)
        prof = profile_table(df, exact_distinct=not args.approx)
        if args.summary:
            prof = profile_summary(prof)
        if args.output:
            prof.write.mode("overwrite").parquet(args.output)
            print(f"profile written to {args.output}")
        else:
            prof.show(n=1000, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

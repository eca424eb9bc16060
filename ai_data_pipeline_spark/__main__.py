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
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from ai_data_pipeline_spark.profiling.profiler import (
        profile_summary,
        profile_table,
    )
    from ai_data_pipeline_spark.session import get_spark

    spark = get_spark("adp-cli", cpus=args.cpus)
    try:
        reader = spark.read
        if args.format == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.format(args.format).load(args.path)
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

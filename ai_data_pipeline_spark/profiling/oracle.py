"""DuckDB oracle SQL generator for the profiler.

Emits ANSI SQL that reproduces profiler.profile_table exactly: the same
stats-row contract, then the SAME cascade expression strings
(cascade.py) — only the stats layer differs by dialect (regexp function,
rendering, array aggregation).
"""

from __future__ import annotations

from ai_data_pipeline_spark.profiling import cascade, patterns as P
from ai_data_pipeline_spark.profiling.profiler import SAMPLE_N, SAMPLE_TRUNC


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_render(col: str, kind: str) -> str | None:
    if kind == "string":
        return col
    if kind in ("int", "long", "double", "boolean"):
        return f"CAST({col} AS VARCHAR)"
    if kind == "timestamp":
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    if kind == "date":
        return f"strftime({col}, '%Y-%m-%d')"
    return None


def _col_stats_sql(table: str, col: str, kind: str) -> str:
    rend = duck_render(col, kind)
    scalar = rend is not None
    sel = [
        f"{_sq(col)} AS column_name",
        f"{_sq(kind if kind in ('vector', 'binary') else 'scalar')} AS kind",
        "count(*) AS n_total",
        f"count({col}) AS n_nonnull",
        f"count(DISTINCT {col}) AS n_distinct",
    ]
    for pname, rx in ((n, x) for _, n, x in P.PATTERNS):
        if scalar:
            sel.append(
                f"count(*) FILTER (WHERE regexp_matches(render, {_sq(rx)})) AS h_{pname}"
            )
        else:
            sel.append(f"CAST(NULL AS BIGINT) AS h_{pname}")
    if scalar:
        sel.append(
            "coalesce(array_to_string(list_slice(list_sort("
            f"array_agg(DISTINCT substr(render, 1, {SAMPLE_TRUNC})) "
            f"FILTER (WHERE render IS NOT NULL)), 1, {SAMPLE_N}), ','), '') AS sample_values"
        )
    else:
        sel.append("'' AS sample_values")
    sel += [
        f"{P.name_has(col, P.ID_NAME_PARTS)} AS f_idname",
        f"{'id' in col.lower()} AS f_id_in_name",
        f"{P.name_has(col, ('id', 'key'))} AS f_pkname",
        f"{P.name_has(col, P.BK_NAME_PARTS)} AS f_bkname",
        f"{_sq(P.name_pii(col))} AS f_name_pii",
        f"{_sq(P.snake_case(col))} AS f_suggested",
    ]
    src = f"(SELECT {col}, {rend} AS render FROM {table}) __t" if scalar else table
    return "SELECT " + ", ".join(sel) + f" FROM {src}"


def profile_oracle_sql(table: str, columns: list[tuple[str, str]]) -> str:
    stats_union = "\nUNION ALL\n".join(
        _col_stats_sql(table, c, k) for c, k in columns
    )
    l1 = cascade.layer1_exprs()
    l1_sel = ", ".join(f"{sql} AS {name}" for name, sql in l1.items())
    l2 = cascade.layer2_exprs(None)
    l2_sel = ", ".join(f"{sql} AS {name}" for name, sql in l2.items())
    return (
        f"WITH stats AS (\n{stats_union}\n), "
        f"l1 AS (SELECT *, {l1_sel} FROM stats)\n"
        f"SELECT {l2_sel} FROM l1"
    )


def profile_summary_oracle_sql(table: str, columns: list[tuple[str, str]]) -> str:
    inner = profile_oracle_sql(table, columns)
    return (
        f"SELECT data_type, count(*) AS n_columns, "
        f"round(avg(confidence), 6) AS avg_confidence "
        f"FROM (\n{inner}\n) GROUP BY data_type"
    )

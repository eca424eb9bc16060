"""User-defined function surface: UDAF + UDTF (completing the UD(A/T)F
category SURVEY.md §2.8 lists as absent in the reference).

The repo's rule stands: built-in expressions everywhere the semantics
allow; this module exists to prove the *extension points* work and stay
oracle-checkable when the function itself is engine-portable:

- UDAF: a grouped-aggregate pandas UDF (Arrow-batched; executes as a
  real partial-less aggregate over each group). The body is
  integer-exact (sum of squares of integer-valued quantities), so the
  DuckDB oracle is plain SQL — proving custom aggregates don't have to
  abandon the correctness gate.
- UDTF: a Python user-defined *table* function applied per row via
  LATERAL join — the escape hatch for one-row-to-many-rows logic that
  `explode` of a builtin can't express. The demo emits (pos, token,
  is_long) triples; deterministic, so the oracle is unnest-with-
  subscripts SQL.

Scale notes: the UDAF ships one Arrow batch per group-partition (state
is a scalar per group); the UDTF is a map-side row expander — no
shuffle beyond the downstream aggregation. Both stay off the
row-at-a-time Python UDF path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef


def _make_udafs():
    # created lazily: decorating at import time would parse the return
    # type against an active SparkSession that need not exist yet.
    # (Grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg() — Spark's INVALID_PANDAS_UDF_PLACEMENT — so the row count
    # is a second pandas UDAF.)
    @pandas_udf("long")
    def _sum_sq(v: pd.Series) -> int:
        # quantities are integer-valued doubles (1..50): int64 math is exact
        x = v.astype("int64")
        return int((x * x).sum())

    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return int(len(v))

    return _sum_sq, _n


def udaf_sum_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    sum_sq, n = _make_udafs()
    return l.groupBy("l_returnflag").agg(
        sum_sq("l_quantity").alias("sum_sq_qty"),
        n("l_quantity").alias("n"),
    )


UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_sq_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

LONG_TOKEN_LEN = 6


class _TokenizeUdtf:
    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            if tok:
                yield i + 1, tok, len(tok) >= LONG_TOKEN_LEN


def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token table via LATERAL UDTF, aggregated down so the
    result is compact: token count + long-token count + first long
    token position per doc."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_src")
    spark.udtf.register(
        "adp_tokenize", udtf(_TokenizeUdtf, returnType="pos int, token string, is_long boolean")
    )
    return spark.sql(
        """
        SELECT d.doc_id,
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN t.is_long THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
               min(CASE WHEN t.is_long THEN t.pos END) AS first_long_pos
        FROM docs_udtf_src d, LATERAL adp_tokenize(d.text) t
        GROUP BY d.doc_id
        """
    )


UDTF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(SUM(CASE WHEN length(token) >= {LONG_TOKEN_LEN} THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
       MIN(CASE WHEN length(token) >= {LONG_TOKEN_LEN} THEN pos END) AS first_long_pos
FROM toks WHERE token <> ''
GROUP BY doc_id
"""


def _arrow_doc_stats(batches):
    """Zero-copy Arrow batch transform: pyarrow.compute kernels only —
    no pandas conversion, no per-row Python. The vectorized-C++ path
    for hot transforms whose semantics builtins can't express."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        doc_id = batch.column("doc_id")
        text = batch.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                doc_id,
                pc.cast(pc.utf8_length(text), pa.int32()),
                pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int32()),
                pc.cast(pc.count_substring(text, " "), pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_bytes", "n_spaces"],
        )


def udf_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the third Python execution surface (after pandas UDAF
    and UDTF) — RecordBatch in, RecordBatch out, zero pandas overhead.
    Deterministic string/byte stats, so the oracle is plain SQL."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_doc_stats, schema="doc_id long, n_chars int, n_bytes int, n_spaces long"
    )


ARROW_STATS_ORACLE = """
SELECT doc_id,
       length(text) AS n_chars,
       octet_length(encode(text)) AS n_bytes,
       length(text) - length(replace(text, ' ', '')) AS n_spaces
FROM documents
"""


QUERY_DEFS = [
    QueryDef("udaf_sum_sq", udaf_sum_sq, UDAF_ORACLE),
    QueryDef("udtf_tokenize", udtf_tokenize, UDTF_ORACLE),
    QueryDef("udf_arrow_stats", udf_arrow_stats, ARROW_STATS_ORACLE),
]

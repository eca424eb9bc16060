"""Multimodal column support: opaque binary payloads with typed metadata,
decoded / feature-extracted via Arrow-batched pandas (north-star
extension).

Design (the part that matters at 100 TB):
- media are ``BinaryType`` columns + metadata struct; they flow through
  Spark untouched (no JVM<->Python crossing) until a decode stage;
- decode/feature-extract runs in ``mapInPandas`` — per-partition Arrow
  batches, vectorized pandas/numpy inside, schema declared up front;
- the image/audio codec libraries are NOT in this container, so
  ``decode_image`` is a clearly-marked stub (NotImplementedError); the
  deterministic byte-level feature path below exercises the exact same
  plumbing (binary in → fixed-schema features out) and is oracle-checked
  byte-for-byte against DuckDB blob functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

FEATURE_SCHEMA = "doc_id long, source string, n_bytes long, first_byte int, last_byte int, byte_sum long"


def decode_image(payload: bytes, target_size: tuple[int, int] = (224, 224)):
    """STUB: real image decode+resize requires PIL/opencv (not in this
    container). The Spark-side contract (binary in, float features out via
    mapInPandas) is exercised by byte_features below."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "byte_features exercises the same mapInPandas plumbing"
    )


def _byte_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: vectorized over each batch, no
    per-row Python in the driver, schema fixed by FEATURE_SCHEMA."""
    for pdf in it:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": payloads.map(len),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                "byte_sum": payloads.map(lambda b: int(sum(b))),
            }
        )


def byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the multimodal path:
    documents.text encoded to a binary column stands in for media bytes;
    features aggregate per source."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode("text", "UTF-8").alias("payload")
    )
    feats = d.mapInPandas(_byte_feature_batches, schema=FEATURE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("sum_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.max("last_byte").alias("max_last_byte"),
        F.sum("byte_sum").alias("sum_byte_sum"),
    )


# DuckDB mirror: hex-string view of the same utf-8 bytes (substring on
# BLOB is unsupported, so all byte access goes through hex(encode(text))).
_D = "(instr('0123456789ABCDEF', {c}) - 1)"


def _hexpair_to_int(h: str, pos: str) -> str:
    d1 = _D.format(c=f"substr({h}, {pos}, 1)")
    d2 = _D.format(c=f"substr({h}, ({pos})+1, 1)")
    return f"(16*{d1} + {d2})"


BYTE_FEATURES_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, source, hex(encode(text)) AS h FROM documents
), feats AS (
  SELECT doc_id, source,
    length(h) // 2 AS n_bytes,
    CASE WHEN length(h) = 0 THEN -1 ELSE {_hexpair_to_int('h', '1')} END AS first_byte,
    CASE WHEN length(h) = 0 THEN -1
         ELSE {_hexpair_to_int('h', 'length(h)-1')} END AS last_byte,
    coalesce(list_sum([{_hexpair_to_int('h', 'i')} for i in range(1, length(h)+1, 2)]), 0) AS byte_sum
  FROM hx
)
SELECT source, count(*) AS n_docs, sum(n_bytes) AS sum_bytes,
       min(first_byte) AS min_first_byte, max(last_byte) AS max_last_byte,
       sum(byte_sum) AS sum_byte_sum
FROM feats GROUP BY source
"""


QUERY_DEFS = [
    QueryDef("multimodal_byte_features", byte_features, BYTE_FEATURES_ORACLE),
]

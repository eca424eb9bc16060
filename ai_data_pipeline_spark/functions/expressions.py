"""Column-returning expression builders shared by the operator modules.

These are plain compositions of `pyspark.sql.functions` — they stay
inside whole-stage codegen (no UDFs) and keep one definition of the
cross-engine-exact arithmetic used by every oracle-checked query.

Cross-engine exactness (see operators/relational.py docstring for the
full argument): monetary/metric sums go through
``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`` — the per-row double
is identical in Spark and DuckDB, decimal summation is exact and
order-independent (double summation is not, and partial-aggregation
order differs between engines), and the final double cast is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column, scale: int = 4) -> Column:
    """Exact, order-independent cross-engine sum of a few-decimal double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum divided by count."""
    return dec_sum(col, scale) / F.count(F.lit(1))


def epoch_us(col: Column) -> Column:
    """Microseconds since epoch as a long — the engine's canonical
    event-time representation (integer arithmetic is exact and
    identical across engines; DuckDB counterpart: ``epoch_us(ts)``)."""
    return F.unix_micros(col)


def time_bucket_start(ts: Column, bucket_seconds: int) -> Column:
    """Hypertable-style time bucket: floor of event time to a fixed-width
    bucket, returned as epoch seconds (long). Pure integer arithmetic —
    exact in both engines and usable as an equi-join/group key, which is
    what turns range predicates into shuffle-friendly hash keys."""
    sec = F.unix_timestamp(ts)
    return sec - sec % bucket_seconds


def topk_per_key(df, keys: list, order_cols: list, k: int):
    """Two-level tournament top-k per key: level 1 ranks locally within
    (keys, input partition) — fully parallel, and because order_cols is
    a TOTAL order, selection is associative (every global winner wins
    its local heat) — level 2 ranks only the ≤ k×partitions survivors.
    The naive single window would funnel all rows for a key through one
    reducer: with |keys| ≪ cluster width (queries, priorities, market
    segments) that is the low-cardinality-partition skew this helper
    removes. Results are identical at any partitioning
    (tests/test_operator_properties.py pins the invariance). Adds
    column ``rk`` (1-based global rank within key).

    CALLER CONTRACT: ``order_cols`` MUST be a total order within each
    key (append a unique tie-breaker such as the row's id as the last
    order column). On ties the associativity argument above fails and
    results become silently partitioning-dependent — every current
    caller (ann_cosine_topk, ann_knn_classify, q_topk_per_group,
    q_stratified_sample) passes a unique id as its final order key."""
    from pyspark.sql import Window as W

    local = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrk",
            F.row_number().over(W.partitionBy(*keys, "_pid").orderBy(*order_cols)),
        )
        .filter(F.col("_lrk") <= k)
        .drop("_pid", "_lrk")
    )
    w = W.partitionBy(*keys).orderBy(*order_cols)
    return local.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)

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

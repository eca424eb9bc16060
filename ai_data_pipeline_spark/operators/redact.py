"""PII redaction: the enforcement counterpart to the reference's PII
*detection* (pattern_classifier.py:211-234 flags columns; a training
pipeline must also scrub values). Masks emails, phone numbers, and long
id digit-runs inside free text with `[EMAIL]` / `[PHONE]` / `[ID]`.

The testdata corpus contains no PII (verified), so the query
synthesizes a deterministic contact string per customer from its key —
the redaction expressions themselves are generic `regexp_replace`
chains over any string column. Patterns use only portable regex syntax
(character classes + bounded quantifiers — no lookaround), so Java
regex (Spark) and RE2 (DuckDB) agree; replacement order is
email → phone → id so the narrower patterns never eat a wider match's
prefix. Scale: pure per-row projection — no shuffle, stays in
whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RX = r"\+?\d[\d-]{6,}\d"
ID_RX = r"\d{6,}"


def redact_pii(col: Column) -> Column:
    """Generic masking chain — usable on any string column."""
    out = F.regexp_replace(col, EMAIL_RX, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RX, "[PHONE]")
    return F.regexp_replace(out, ID_RX, "[ID]")


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.lit("Contact: "),
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> tel +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" ref "),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
    )
    masked = redact_pii(contact)
    return c.select(
        "c_custkey",
        contact.alias("contact"),
        masked.alias("masked"),
        F.regexp_count(contact, F.lit(EMAIL_RX)).alias("n_emails"),
        F.regexp_count(contact, F.lit(PHONE_RX)).alias("n_phones"),
        F.regexp_count(masked, F.lit(r"\d{6,}")).alias("digits_left"),
    )


PII_REDACT_ORACLE = rf"""
WITH src AS (
  SELECT c_custkey,
         'Contact: ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR)
         || '@example.com> tel +1-555-'
         || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         || ' ref ' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS contact
  FROM customer
), masked AS (
  SELECT c_custkey, contact,
         regexp_replace(
           regexp_replace(
             regexp_replace(contact, '{EMAIL_RX}', '[EMAIL]', 'g'),
             '{PHONE_RX}', '[PHONE]', 'g'),
           '{ID_RX}', '[ID]', 'g') AS masked
  FROM src
)
SELECT c_custkey, contact, masked,
       len(regexp_extract_all(contact, '{EMAIL_RX}')) AS n_emails,
       len(regexp_extract_all(contact, '{PHONE_RX}')) AS n_phones,
       len(regexp_extract_all(masked, '\d{{6,}}')) AS digits_left
FROM masked
"""


QUERY_DEFS = [
    QueryDef("pii_redact", pii_redact, PII_REDACT_ORACLE),
]

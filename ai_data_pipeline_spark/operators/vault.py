"""Data Vault 2.0 generation + FK inference.

The reference *declares* both capabilities but ships no code: Data Vault
2.0 generation is named in README.md:2 / pyproject.toml:9 with an empty
``core/generators/`` package, and ``ColumnProfile.is_foreign_key`` /
``references`` (base.py:49-50) are never computed. We implement them
Spark-first (SURVEY.md §7.1 M5):

- FK inference: name-suffix candidate pairs checked by value containment
  — ``orphans = count(child left-anti-join parent)``; a candidate with
  zero orphans is declared an FK. No broadcast hints: AQE broadcasts
  dim-sized parents and shuffle-anti-joins fact-sized ones.
- Hubs: distinct business keys + sha256 hash key (deterministic across
  engines: both emit lowercase hex).
- Links: unit-of-work between hubs (customer↔orders), hashed composite.
- Satellites: descriptive attributes + hashdiff for change tracking.

At 100 TB: hub/sat generation is a keyed distinct + projection — one
shuffle on the business key; links reuse the FK join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

# (child_table, child_col, parent_table, parent_col) candidates from the
# name-suffix heuristic over the catalog (…key ↔ …key).
FK_CANDIDATES = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment check per candidate: orphan count via left-anti join."""
    rows = []
    for child_t, child_c, parent_t, parent_c in FK_CANDIDATES:
        child = load_table(spark, sf_dir, child_t).select(
            F.col(child_c).alias("k")
        ).filter(F.col("k").isNotNull())
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(parent_c).alias("k")
        ).distinct()
        # no broadcast hint: parent key sets are dim-sized for some
        # candidates but FACT-sized for others (l_orderkey -> orders at
        # 100 TB); AQE broadcasts the small ones and keeps a shuffled
        # anti-join for the big ones — the correct plan in both cases
        orphans = child.join(parent, "k", "left_anti").count()
        n_child = child.count()
        rows.append((child_t, child_c, parent_t, parent_c, n_child, orphans, orphans == 0))
    return spark.createDataFrame(
        rows,
        schema=(
            "child_table string, child_col string, parent_table string, "
            "parent_col string, n_child_rows bigint, n_orphans bigint, "
            "is_foreign_key boolean"
        ),
    )


def _fk_oracle() -> str:
    branches = []
    for child_t, child_c, parent_t, parent_c in FK_CANDIDATES:
        branches.append(
            f"SELECT '{child_t}' AS child_table, '{child_c}' AS child_col, "
            f"'{parent_t}' AS parent_table, '{parent_c}' AS parent_col, "
            f"(SELECT count(*) FROM {child_t} WHERE {child_c} IS NOT NULL) AS n_child_rows, "
            f"(SELECT count(*) FROM {child_t} WHERE {child_c} IS NOT NULL AND "
            f"{child_c} NOT IN (SELECT {parent_c} FROM {parent_t} WHERE {parent_c} IS NOT NULL)) AS n_orphans, "
            f"(SELECT count(*) FROM {child_t} WHERE {child_c} IS NOT NULL AND "
            f"{child_c} NOT IN (SELECT {parent_c} FROM {parent_t} WHERE {parent_c} IS NOT NULL)) = 0 AS is_foreign_key"
        )
    return "\nUNION ALL\n".join(branches)


# (table, determinant, dependent) within-table FD candidates — the
# pairs a profiler's candidate generator emits over low-cardinality
# and key columns (TANE-style level-1 lattice; the PK-determinant row
# is the control that must hold by construction).
FD_CANDIDATES = [
    ("customer", "c_nationkey", "c_mktsegment"),
    ("customer", "c_mktsegment", "c_nationkey"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderstatus", "o_orderpriority"),
]


def fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery — the within-table counterpart
    of fk_inference (the reference's schema-mining intent,
    pattern_classifier PK/BK detection, extended to A→B dependencies):
    for each candidate pair, EXACT violation accounting — determinant
    keys, distinct (A,B) pairs, keys with more than one dependent
    value, worst fan-out, the holds flag, and the FD strength
    (single-valued keys per million). Strength, not just the boolean,
    is the useful artifact: a 0.999-strength "FD" is a data-quality
    lead (near-dependency with a handful of violating keys to
    inspect), invisible to an exact-only check.

    Scale: ONE scan per table, not per candidate — each table's
    candidates stack via inline(array(named_struct…)) (values
    string-cast: injective for these column types, so distinct counts
    are unchanged), then one count-distinct aggregate keyed on
    (candidate, determinant-value) and one candidate-keyed rollup.
    Both aggregates are two-phase map-side combined; the only shuffle
    carries (candidate, key, n_b) rows. No joins anywhere."""
    by_table: dict[str, list[tuple[str, str]]] = {}
    for t, a, b in FD_CANDIDATES:
        by_table.setdefault(t, []).append((a, b))
    outs = []
    for t, pairs in by_table.items():
        structs = ", ".join(
            f"named_struct('det', '{a}', 'dep', '{b}',"
            f" 'a', cast({a} as string), 'b', cast({b} as string))"
            for a, b in pairs
        )
        stacked = load_table(spark, sf_dir, t).select(
            F.expr(f"inline(array({structs}))")
        )
        per_key = stacked.groupBy("det", "dep", "a").agg(
            F.countDistinct("b").alias("n_b")
        )
        outs.append(
            per_key.groupBy("det", "dep")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("n_b").alias("n_pairs"),
                F.sum((F.col("n_b") > 1).cast("long")).alias(
                    "n_violating_keys"
                ),
                F.max("n_b").alias("max_fanout"),
            )
            .select(
                F.lit(t).alias("table_name"),
                F.col("det").alias("determinant"),
                F.col("dep").alias("dependent"),
                "n_keys",
                "n_pairs",
                "n_violating_keys",
                "max_fanout",
                (F.col("n_violating_keys") == 0).cast("int").alias("fd_holds"),
                F.expr(
                    "((n_keys - n_violating_keys) * 1000000) div n_keys"
                ).alias("strength_ppm"),
            )
        )
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    return out


def _fd_oracle() -> str:
    branches = []
    for t, a, b in FD_CANDIDATES:
        branches.append(f"""
SELECT '{t}' AS table_name, '{a}' AS determinant, '{b}' AS dependent,
       count(*) AS n_keys,
       CAST(sum(n_b) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(max(n_b) AS BIGINT) AS max_fanout,
       CAST(sum(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) = 0 AS INT) AS fd_holds,
       ((count(*) - CAST(sum(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT))
        * 1000000) // count(*) AS strength_ppm
FROM (SELECT {a} AS a, count(DISTINCT {b}) AS n_b FROM {t} GROUP BY 1)""")
    return "\nUNION ALL\n".join(branches)


def _hash_key(*cols) -> F.Column:
    """Data Vault hash key: sha256 of '||'-joined business key parts."""
    return F.sha2(F.concat_ws("||", *[F.col(c).cast("string") for c in cols]), 256)


def dv_hub_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        _hash_key("c_custkey").alias("hub_customer_hk"),
        F.col("c_custkey").alias("customer_bk"),
    ).distinct()


DV_HUB_ORACLE = """
SELECT DISTINCT sha256(CAST(c_custkey AS VARCHAR)) AS hub_customer_hk,
       c_custkey AS customer_bk
FROM customer
"""


def dv_link_customer_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        _hash_key("o_custkey", "o_orderkey").alias("link_customer_order_hk"),
        _hash_key("o_custkey").alias("hub_customer_hk"),
        _hash_key("o_orderkey").alias("hub_order_hk"),
    ).distinct()


DV_LINK_ORACLE = """
SELECT DISTINCT
  sha256(CAST(o_custkey AS VARCHAR) || '||' || CAST(o_orderkey AS VARCHAR)) AS link_customer_order_hk,
  sha256(CAST(o_custkey AS VARCHAR)) AS hub_customer_hk,
  sha256(CAST(o_orderkey AS VARCHAR)) AS hub_order_hk
FROM orders
"""


def dv_sat_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Satellite: descriptive attributes + hashdiff over them."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        _hash_key("c_custkey").alias("hub_customer_hk"),
        F.sha2(
            F.concat_ws(
                "||",
                F.col("c_name"),
                F.col("c_nationkey").cast("string"),
                F.col("c_acctbal").cast("string"),
                F.col("c_mktsegment"),
            ),
            256,
        ).alias("hashdiff"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )


DV_SAT_ORACLE = """
SELECT sha256(CAST(c_custkey AS VARCHAR)) AS hub_customer_hk,
  sha256(c_name || '||' || CAST(c_nationkey AS VARCHAR) || '||' ||
         CAST(c_acctbal AS VARCHAR) || '||' || c_mktsegment) AS hashdiff,
  c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer
"""


def dv_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit the Data Vault DDL for the inferred model as rows — the
    generator's user-facing artifact (schema derived from the catalog)."""
    ddl = [
        (
            "hub_customer",
            "CREATE TABLE hub_customer (hub_customer_hk CHAR(64) PRIMARY KEY, "
            "customer_bk BIGINT NOT NULL, load_dts TIMESTAMP, record_source STRING)",
        ),
        (
            "link_customer_order",
            "CREATE TABLE link_customer_order (link_customer_order_hk CHAR(64) PRIMARY KEY, "
            "hub_customer_hk CHAR(64), hub_order_hk CHAR(64), load_dts TIMESTAMP, "
            "record_source STRING)",
        ),
        (
            "sat_customer",
            "CREATE TABLE sat_customer (hub_customer_hk CHAR(64), hashdiff CHAR(64), "
            "c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING, "
            "load_dts TIMESTAMP, record_source STRING)",
        ),
    ]
    return spark.createDataFrame(ddl, schema="object_name string, ddl string")


def _dv_ddl_oracle() -> str:
    # literal VALUES mirror of the generated DDL rows
    ddl = [
        (
            "hub_customer",
            "CREATE TABLE hub_customer (hub_customer_hk CHAR(64) PRIMARY KEY, "
            "customer_bk BIGINT NOT NULL, load_dts TIMESTAMP, record_source STRING)",
        ),
        (
            "link_customer_order",
            "CREATE TABLE link_customer_order (link_customer_order_hk CHAR(64) PRIMARY KEY, "
            "hub_customer_hk CHAR(64), hub_order_hk CHAR(64), load_dts TIMESTAMP, "
            "record_source STRING)",
        ),
        (
            "sat_customer",
            "CREATE TABLE sat_customer (hub_customer_hk CHAR(64), hashdiff CHAR(64), "
            "c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING, "
            "load_dts TIMESTAMP, record_source STRING)",
        ),
    ]
    values = ", ".join(
        "('" + n + "', '" + d.replace("'", "''") + "')" for n, d in ddl
    )
    return f"SELECT * FROM (VALUES {values}) t(object_name, ddl)"


# Semantic data_type → warehouse column type for generated DV DDL.
_DV_TYPE = {"numeric": "DOUBLE", "date": "TIMESTAMP", "boolean": "BOOLEAN"}


def profile_to_dv_ddl(profile_rows, table_name: str) -> list[str]:
    """Data Vault 2.0 DDL generated from a profile relation — the
    reference's declared-but-empty generator intent (README.md:2
    "Data Vault 2.0 Generation", pyproject.toml:9, core/generators/
    zero bytes; SURVEY.md §2.8): hub keyed on the detected primary-key
    column, satellite carrying the descriptive remainder with a
    hashdiff, suggested (snake_case) names throughout. Driver-side pure
    function over the metadata-sized profile (one row per column)."""
    rows = sorted(profile_rows, key=lambda r: r["column_name"])
    pk = next((r for r in rows if r["is_primary_key"]), None)
    ddl: list[str] = []
    if pk is not None:
        bk_type = _DV_TYPE.get(pk["data_type"], "STRING")
        ddl.append(
            f"CREATE TABLE hub_{table_name} (hub_{table_name}_hk CHAR(64) "
            f"PRIMARY KEY, {pk['suggested_name']}_bk {bk_type} NOT NULL, "
            "load_dts TIMESTAMP, record_source STRING)"
        )
    desc = [r for r in rows if pk is None or r["column_name"] != pk["column_name"]]
    cols = ", ".join(
        f"{r['suggested_name']} {_DV_TYPE.get(r['data_type'], 'STRING')}"
        for r in desc
    )
    key_col = (
        f"hub_{table_name}_hk CHAR(64)" if pk is not None else "row_hk CHAR(64)"
    )
    ddl.append(
        f"CREATE TABLE sat_{table_name} ({key_col}, hashdiff CHAR(64), "
        f"{cols}, load_dts TIMESTAMP, record_source STRING)"
    )
    return ddl


QUERY_DEFS = [
    QueryDef("fk_inference", fk_inference, _fk_oracle()),
    QueryDef("fd_discovery", fd_discovery, _fd_oracle()),
    QueryDef("dv_hub_customer", dv_hub_customer, DV_HUB_ORACLE),
    QueryDef("dv_link_customer_order", dv_link_customer_order, DV_LINK_ORACLE),
    QueryDef("dv_sat_customer", dv_sat_customer, DV_SAT_ORACLE),
    QueryDef("dv_ddl", dv_ddl, _dv_ddl_oracle()),
]

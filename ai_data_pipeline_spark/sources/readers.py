"""Sources & sinks.

Reference parity: CSV upload ingestion is the reference's only concrete
source intent (tests/conftest.py:64-73 ``temp_csv_file`` fixture,
UPLOAD_DIR/.env.example:24-25 — SURVEY.md §2.1 op02); nothing else is
implemented there (empty ``database/`` package). Spark-side we provide
schema-explicit CSV/JSON/parquet readers and partitioned parquet sinks.

Production posture: never ``inferSchema`` on big data (full extra pass);
the catalog's declared schema drives the read. Writes partition by a
date-like column so downstream scans prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ai_data_pipeline_spark.catalog import TABLES, load_table
from ai_data_pipeline_spark.registry import QueryDef

_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A unique scratch directory under one process-scoped root that is
    removed at interpreter exit — roundtrip operators (compaction,
    schema evolution, streaming sinks) run on every bench/harness
    invocation, and per-call mkdtemp with no cleanup accumulates
    unbounded /tmp usage across repeated runs."""
    global _SCRATCH_ROOT
    import atexit
    import shutil
    import tempfile
    import uuid
    import os

    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="adp_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    d = os.path.join(_SCRATCH_ROOT, f"{prefix}{uuid.uuid4().hex[:12]}")
    os.makedirs(d)
    return d


_KIND_TO_SPARK = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
}


def schema_for(table: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(c, _KIND_TO_SPARK.get(kind, T.StringType()))
            for c, kind in TABLES[table]
            if kind in _KIND_TO_SPARK
        ]
    )


def read_csv(spark: SparkSession, path: str, table: str | None = None) -> DataFrame:
    """CSV ingest (op02). With a known table, the declared schema is
    applied (no inference pass); otherwise header+inference for ad-hoc
    uploads (the reference's upload flow)."""
    if table is not None:
        return spark.read.csv(path, header=True, schema=schema_for(table))
    return spark.read.csv(path, header=True, inferSchema=True)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink; partitioned layout for pruning at scale."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def csv_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op02 correctness: customer → CSV → read with declared schema →
    aggregate checksums must equal the parquet originals (oracle runs on
    the parquet view)."""
    src = load_table(spark, sf_dir, "customer")
    tmp = scratch_dir("csv_")
    src.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    back = read_csv(spark, tmp, "customer")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").alias("sum_key"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("sum_bal"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.countDistinct("c_name").alias("n_names"),
    )


CSV_ROUNDTRIP_ORACLE = """
SELECT count(*) AS n_rows, CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
       count(DISTINCT c_mktsegment) AS n_segments,
       count(DISTINCT c_name) AS n_names
FROM customer
"""


def jsonl_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source correctness: orders → JSON lines → read with the
    declared schema → aggregate checksums must equal the parquet
    originals, including the timestamp column (ISO-8601 round-trip,
    UTC session timezone)."""
    src = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir("jsonl_")
    src.coalesce(1).write.mode("overwrite").json(tmp)
    back = read_json(spark, tmp, schema_for("orders"))
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_key"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.sum(F.unix_timestamp("o_orderdate")).alias("sum_date_epoch"),
    )


JSONL_ROUNDTRIP_ORACLE = """
SELECT count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       count(DISTINCT o_orderstatus) AS n_status,
       CAST(sum(CAST(epoch(o_orderdate) AS BIGINT)) AS BIGINT) AS sum_date_epoch
FROM orders
"""


def orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink correctness: lineitem → ORC → read back →
    aggregate checksums must equal the parquet originals. ORC keeps the
    Spark schema (including timestamps) natively, so no declared-schema
    re-read is needed — format fidelity is the thing under test."""
    src = load_table(spark, sf_dir, "lineitem")
    tmp = scratch_dir("orc_")
    src.write.mode("overwrite").orc(tmp)
    back = spark.read.orc(tmp)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("sum_key"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        F.countDistinct("l_returnflag").alias("n_flags"),
        F.sum(F.unix_timestamp("l_shipdate")).alias("sum_ship_epoch"),
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       count(DISTINCT l_returnflag) AS n_flags,
       CAST(sum(CAST(epoch(l_shipdate) AS BIGINT)) AS BIGINT) AS sum_ship_epoch
FROM lineitem
"""


PART_DATE_LO, PART_DATE_HI = "2024-01-10", "2024-01-12"
TS_CHECKSUM_PRIME = 1_000_000_007  # modular ts checksum: per-row residue
# < 2^30, summed in DECIMAL(38,0) — exact at any corpus size


def partitioned_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB layout contract end-to-end: events written partitioned
    by ingest date (`.../event_date=YYYY-MM-DD/...`), read back with a
    date-band filter that must resolve as directory pruning (asserted in
    tests/test_plans.py), then checksummed. The oracle applies the same
    band to the raw table — equality proves the partitioned layout loses
    nothing and the pruned read returns exactly the band."""
    src = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    tmp = scratch_dir("part_")
    write_parquet(src, tmp, partition_by=["event_date"])
    # schema-explicit read-back: a zero-row ingest date writes an empty
    # partitioned sink, and schema INFERENCE on an empty layout fails
    # (UNABLE_TO_INFER_SCHEMA) — the production contract is that the
    # reader declares the schema it expects, so empty days read as
    # empty relations, not errors
    back = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string, event_date string"
        )
        .parquet(tmp)
        .filter(
            F.col("event_date").cast("string").between(PART_DATE_LO, PART_DATE_HI)
        )
    )
    # ts checksum is modular: raw epoch-micros (~1.7e15 each) overflow a
    # long sum beyond ~5000 rows, so sum the mod-prime residues in
    # decimal (exact at any row count) and reduce once more at the end —
    # scale-safe where sum(unix_micros) is not (caught at sf0.1).
    p = F.lit(TS_CHECKSUM_PRIME)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_id"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.pmod(F.sum(F.pmod(F.unix_micros("ts"), p).cast("decimal(38,0)")), p.cast("decimal(38,0)"))
        .cast("long")
        .alias("ts_checksum"),
    )


PARTITIONED_ROUNDTRIP_ORACLE = f"""
SELECT count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS sum_id,
       count(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(sum(epoch_us(ts) % {TS_CHECKSUM_PRIME}) % {TS_CHECKSUM_PRIME} AS BIGINT)
         AS ts_checksum
FROM events
WHERE strftime(ts, '%Y-%m-%d') BETWEEN '{PART_DATE_LO}' AND '{PART_DATE_HI}'
"""


COMPACT_SMALL_FILES = 64  # fragmented-ingest stand-in
COMPACT_TARGET_FILES = 4  # post-compaction file count


def compaction_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lake-maintenance job streaming ingest
    makes necessary (a 100 TB table ingested in minute-batches fragments
    into millions of KB-files whose open/seek overhead dominates scans).
    Events are written fragmented into COMPACT_SMALL_FILES parquet
    files, compacted by rewriting into COMPACT_TARGET_FILES, and read
    back; the result row carries data checksums plus four file-count
    PROOF FLAGS computed from the observed layouts. The flags assert
    only what the engine contract guarantees at EVERY scale factor —
    frag ≤ COMPACT_SMALL_FILES, compact ≤ COMPACT_TARGET_FILES,
    compact ≤ frag, and (compact < frag OR frag ≤ target) — rather
    than exact counts: round-robin `repartition(n)` may land two rows
    in one partition when rows < n, so an exact-count oracle would
    reject a valid engine at tiny SFs (ADVICE r7). The strict flag is
    provable: if frag > target then compact = min(target, read
    partitions) ≤ target < frag. Checksum equality proves the rewrite
    lost nothing; flag = 1 rows prove it really compacted.

    Scale: compaction is one shuffle-free coalesce per partition group;
    at 100 TB it runs per date-partition with `maxRecordsPerFile`
    sizing, same plan shape."""
    src = load_table(spark, sf_dir, "events")
    frag = scratch_dir("frag_") + "/t"
    compact = scratch_dir("compact_") + "/t"
    src.repartition(COMPACT_SMALL_FILES).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(COMPACT_TARGET_FILES).write.mode(
        "overwrite"
    ).parquet(compact)

    def _n_files(path: str) -> int:
        import glob
        import os

        return len(glob.glob(os.path.join(path, "part-*.parquet")))

    back = spark.read.parquet(compact)
    p = F.lit(TS_CHECKSUM_PRIME)
    n_frag, n_comp = _n_files(frag), _n_files(compact)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_id"),
        F.pmod(
            F.sum(F.pmod(F.unix_micros("ts"), p).cast("decimal(38,0)")),
            p.cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("ts_checksum"),
        F.lit(int(1 <= n_frag <= COMPACT_SMALL_FILES)).alias("frag_within_cap"),
        F.lit(int(1 <= n_comp <= COMPACT_TARGET_FILES)).alias("compact_within_cap"),
        F.lit(int(n_comp <= n_frag)).alias("files_nonincreasing"),
        F.lit(int(n_comp < n_frag or n_frag <= COMPACT_TARGET_FILES)).alias(
            "strictly_compacted"
        ),
    )


COMPACTION_ORACLE = f"""
SELECT count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(epoch_us(ts) % {TS_CHECKSUM_PRIME}) % {TS_CHECKSUM_PRIME} AS BIGINT)
         AS ts_checksum,
       -- file-layout claims are engine-contract bounds (see docstring),
       -- so every flag is identically 1 for a correct engine at any SF
       1 AS frag_within_cap,
       1 AS compact_within_cap,
       1 AS files_nonincreasing,
       1 AS strictly_compacted
FROM events
"""


def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read — the lakehouse contract that lets a
    pipeline add columns without rewriting history: batch 1 of orders
    lands with (key, price), batch 2 adds a `priority` column;
    `mergeSchema` unifies them on read, with batch-1 rows carrying NULL
    for the late column. The aggregate pins row counts per batch, the
    null count of the evolved column, and value checksums — proving
    the union is lossless and the late column nulls exactly where the
    writer predates it. Scale: schema merge is a footer-metadata
    operation (per-file schemas union at planning time), so this costs
    nothing extra at 100 TB — which is why additive evolution is THE
    sanctioned way to widen a petabyte table."""
    o = load_table(spark, sf_dir, "orders")
    b1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    b2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").alias("priority")
    )
    tmp = scratch_dir("evo_") + "/t"
    b1.write.mode("overwrite").parquet(tmp + "/batch=1")
    b2.write.mode("overwrite").parquet(tmp + "/batch=2")
    back = spark.read.option("mergeSchema", "true").parquet(tmp)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("batch") == 1).cast("long")).alias("n_batch1"),
        F.sum(F.col("priority").isNull().cast("long")).alias("n_null_priority"),
        F.countDistinct("priority").alias("n_priorities"),
        F.sum("o_orderkey").alias("sum_key"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SCHEMA_EVOLUTION_ORACLE = """
WITH unioned AS (
  SELECT o_orderkey, o_totalprice, NULL AS priority, 1 AS batch
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority, 2
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN batch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_batch1,
       CAST(sum(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_priority,
       count(DISTINCT priority) AS n_priorities,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM unioned
"""


CORRUPT_MOD = 97  # custkeys divisible by this get a malformed acctbal


def csv_corrupt_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record-tolerant CSV ingest — the robustness half of the
    reference's upload flow (op02): rows whose c_custkey %
    CORRUPT_MOD == 0 are written with a non-numeric c_acctbal, the
    read runs PERMISSIVE with columnNameOfCorruptRecord, and the query
    routes records into good/quarantine channels in one pass. The
    outputs prove three PERMISSIVE semantics at once: bad rows are
    counted not dropped (n_bad), their PARSEABLE fields are still
    recovered (sum_key_bad — c_custkey parses even when c_acctbal does
    not), and good-row aggregates are unaffected by the poison lines
    (sum_bal_good equals the oracle's clean-subset sum).

    Scale: the quarantine channel is a conditional aggregate over the
    same single scan — no second read, no driver involvement; at
    100 TB the same plan writes `_corrupt IS NOT NULL` rows to a
    quarantine sink with foreachBatch/partitioned write instead of
    counting them."""
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    bad = F.col("c_custkey") % CORRUPT_MOD == 0
    line = F.concat_ws(
        ",",
        F.col("c_custkey").cast("string"),
        F.col("c_mktsegment"),
        F.when(bad, F.lit("#corrupt")).otherwise(
            F.col("c_acctbal").cast("string")
        ),
    )
    tmp = scratch_dir("csvbad_")
    src.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(tmp)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(tmp)
    )
    is_bad = F.col("_corrupt").isNotNull()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(is_bad.cast("long")).alias("n_bad"),
        F.sum((~is_bad).cast("long")).alias("n_good"),
        F.sum(
            F.when(~is_bad, F.col("c_acctbal").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("sum_bal_good"),
        F.sum(F.when(is_bad, F.col("c_custkey"))).alias("sum_key_bad"),
    )


CSV_CORRUPT_ORACLE = f"""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN c_custkey % {CORRUPT_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad,
       CAST(sum(CASE WHEN c_custkey % {CORRUPT_MOD} <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN c_custkey % {CORRUPT_MOD} <> 0
                THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE)
         AS sum_bal_good,
       CAST(sum(CASE WHEN c_custkey % {CORRUPT_MOD} = 0 THEN c_custkey END)
            AS BIGINT) AS sum_key_bad
FROM customer
"""


QUERY_DEFS = [
    QueryDef("csv_roundtrip_customer", csv_roundtrip_customer, CSV_ROUNDTRIP_ORACLE),
    QueryDef("csv_corrupt_ingest", csv_corrupt_ingest, CSV_CORRUPT_ORACLE),
    QueryDef(
        "compaction_roundtrip_events",
        compaction_roundtrip_events,
        COMPACTION_ORACLE,
    ),
    QueryDef(
        "schema_evolution_roundtrip",
        schema_evolution_roundtrip,
        SCHEMA_EVOLUTION_ORACLE,
    ),
    QueryDef("jsonl_roundtrip_orders", jsonl_roundtrip_orders, JSONL_ROUNDTRIP_ORACLE),
    QueryDef("orc_roundtrip_lineitem", orc_roundtrip_lineitem, ORC_ROUNDTRIP_ORACLE),
    QueryDef(
        "partitioned_roundtrip_events",
        partitioned_roundtrip_events,
        PARTITIONED_ROUNDTRIP_ORACLE,
    ),
]

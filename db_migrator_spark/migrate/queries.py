"""Migration pipeline surfaced as driver-contract queries.

Each query runs the real migration data path — schema scan -> type-registry
resolution -> ``map_schema`` -> cast plan + rename projection — and returns
the in-flight DataFrame just before the sink write, so the DuckDB oracle can
check the *transform* semantics (the write itself is covered by
tests/test_migrator.py).

The cast plan follows the reference's default registry: MSSQL float -> MySQL
float (4-byte REAL, reference type_registry.rs:48), nvarchar -> longtext,
bigint -> bigint. Lossy float narrowing is reference parity, not an accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.parquet_source import ParquetExtractor
from .migrator import DatabaseMigrator
from .schema_mapper import map_schema
from .type_registry import TypeRegistry


def _migration_select(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    extractor = ParquetExtractor(spark, sf_dir)
    source_schema = extractor.get_table_schema(table)
    registry = TypeRegistry.with_defaults()
    target_schema = map_schema(registry, table, source_schema, format_names=True)
    df = extractor.read_table(table)
    return DatabaseMigrator._apply_cast_plan(df, source_schema, target_schema)


def migrate_customer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+T2+T3 path on `customer`: registry defaults narrow double->float
    (MSSQL float -> MySQL float), strings pass through, keys stay integral."""
    return _migration_select(spark, sf_dir, "customer")


def migrate_orders_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same path on `orders` (timestamp_ntz passthrough for datetime2)."""
    return _migration_select(spark, sf_dir, "orders")


def q_fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-migration referential-integrity audit: orphan counts for every
    FK edge the fixture schema declares (order->customer, lineitem->order,
    customer->nation). Each edge is one left-anti join shuffle-keyed on
    the FK (dimension side broadcasts where small); the result is the
    validation report a migrator runs before enabling constraints —
    the reference's constraint phase (table_migrator.rs:96-114) assumes
    the data already satisfies them, this query proves it."""
    from pyspark.sql import functions as F

    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(fk_name: str, child: DataFrame, key, parent: DataFrame, pkey) -> DataFrame:
        return (
            child.join(parent, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(fk_name).alias("fk_name"), "n_orphans")
        )

    return (
        orphans("customer->nation", cust, "c_nationkey", F.broadcast(nation), "n_nationkey")
        .unionByName(orphans("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"))
        .unionByName(orphans("orders->customer", orders, "o_custkey", cust, "c_custkey"))
        .orderBy("fk_name")
    )


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint of ``customer``: per-row md5
    signature (rendered columns, doubles routed through DECIMAL so both
    engines print identical strings) summed in the decimal domain. THE
    source/target comparison primitive for a migration: run on both
    sides, compare two scalars instead of 10^11 rows. Embarrassingly
    parallel — per-row hash in the scan, one partial-agg exchange."""
    from pyspark.sql import functions as F

    from ..io import load_table

    cust = load_table(spark, sf_dir, "customer")
    row_str = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        "c_name",
        F.col("c_nationkey").cast("string"),
        F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
        "c_mktsegment",
    )
    sig = F.conv(F.substring(F.md5(row_str.cast("binary")), 1, 8), 16, 10).cast("bigint")
    return cust.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # decimal-domain sum: a bigint sum overflows at ~2e9 rows
        # (2^63 / 2^32); DuckDB's BIGINT sum would go HUGEINT anyway.
        F.sum(sig.cast("decimal(38,0)")).cast("string").alias("checksum"),
    )


def q_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``DataFrame.observe``: named metrics
    (row count, decimal-exact quantity total, null audit) collected as a
    side effect of a pass the job runs anyway — the Spark-native version
    of the reference's per-table row accounting
    (/root/reference/src/migrate/table_migrator.rs:96-113, its
    ``rows_inserted`` counters), with zero extra scans. Here the pass is
    a noop-sink write (the standard "drive a scan for its metrics"
    idiom); in a real migration it is the JDBC write itself. The observed
    values come back as a 1-row frame so the driver can oracle-check them
    like any query result.
    """
    from pyspark.sql import Observation, functions as F

    from ..io import load_table

    # project to the observed columns BEFORE the pass: the noop sink
    # materializes whatever reaches it, so without this the scan reads
    # all 11 lineitem columns for a 2-column metrics pass
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(25,2)")).alias("sum_qty"),
        F.count(F.when(F.col("l_returnflag").isNull(), 1)).alias("null_flags"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], float(m["sum_qty"]), m["null_flags"])],
        "n_rows long, sum_qty double, null_flags long",
    )


QUERIES = {
    "migrate_customer_pipeline": migrate_customer_pipeline,
    "migrate_orders_pipeline": migrate_orders_pipeline,
    "q_fk_orphan_check": q_fk_orphan_check,
    "q_table_checksum": q_table_checksum,
    "q_observed_metrics": q_observed_metrics,
}

ORACLES = {
    "q_observed_metrics": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(CASE WHEN l_returnflag IS NULL THEN 1 END) AS BIGINT)
                   AS null_flags
        FROM lineitem
    """,
    "q_fk_orphan_check": """
        SELECT 'customer->nation' AS fk_name,
               CAST(COUNT(*) AS BIGINT) AS n_orphans
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        UNION ALL
        SELECT 'lineitem->orders',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orders->customer',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        ORDER BY fk_name
    """,
    "q_table_checksum": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                   concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
                             CAST(c_nationkey AS VARCHAR),
                             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
                             c_mktsegment)), 1, 8))::BIGINT AS DECIMAL(38,0)))
                   AS VARCHAR) AS checksum
        FROM customer
    """,
    "migrate_customer_pipeline": """
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS REAL) AS c_acctbal,
               c_mktsegment
        FROM customer
    """,
    "migrate_orders_pipeline": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS REAL) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders
    """,
}


def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition order-insensitive fingerprints of ``orders`` (by
    order YEAR — the natural migration chunk): row count + the decimal
    -domain sum of per-row md5 signatures for each partition, plus the
    '*' total row. The INCREMENTAL validation primitive
    ``q_table_checksum`` lacks: after re-migrating one partition, only
    that partition's two scalars need re-comparing — the diff localizes
    to the chunk, not the table. Same embarrassingly-parallel shape:
    per-row hash in the scan, one map-side-combined groupBy(year)."""
    from pyspark.sql import functions as F

    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        "o_orderpriority",
    )
    sig = F.conv(
        F.substring(F.md5(row_str.cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    per_year = (
        orders.select(
            F.year(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("part"),
            sig.alias("sig"),
        )
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("sig").cast("decimal(38,0)"))
            .cast("string")
            .alias("checksum"),
        )
    )
    total = per_year.agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(F.col("checksum").cast("decimal(38,0)"))
        .cast("string")
        .alias("checksum"),
    ).select(F.lit("*").alias("part"), "n_rows", "checksum")
    return per_year.unionByName(total).orderBy("part")


QUERIES["q_partition_checksums"] = q_partition_checksums

ORACLES["q_partition_checksums"] = """
    WITH sigs AS (
        SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE))
                    AS VARCHAR) AS part,
               ('0x' || substr(md5(
                   concat_ws('|', CAST(o_orderkey AS VARCHAR),
                             CAST(o_custkey AS VARCHAR), o_orderstatus,
                             CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                  AS VARCHAR),
                             CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                             o_orderpriority)), 1, 8))::BIGINT AS sig
        FROM orders),
    per_year AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(sig AS DECIMAL(38,0))) AS VARCHAR) AS checksum
        FROM sigs GROUP BY part)
    SELECT part, n_rows, checksum FROM per_year
    UNION ALL
    SELECT '*', CAST(SUM(n_rows) AS BIGINT),
           CAST(SUM(CAST(checksum AS DECIMAL(38,0))) AS VARCHAR)
    FROM per_year
    ORDER BY part
"""

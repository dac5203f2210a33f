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


QUERIES = {
    "migrate_customer_pipeline": migrate_customer_pipeline,
    "migrate_orders_pipeline": migrate_orders_pipeline,
}

ORACLES = {
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

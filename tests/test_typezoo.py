"""TypeZoo end-to-end: all 29 MSSQL source types through the full
migration pipeline (FIXTURES.md §A.4), asserting the rendered DDL matches
the reference's default mappings exactly."""

import json
import os

import pytest

from db_migrator_spark.migrate.migrator import DatabaseMigrator, MigrationOptions
from db_migrator_spark.sinks.parquet_sink import ParquetInserter
from db_migrator_spark.sources.parquet_source import ParquetExtractor

# (column, mssql type, len/prec/scale sidecar fields, spark source type,
#  expected MySQL DDL type) — expected values from FIXTURES.md A.4 /
# reference type_registry.rs:19-103.
ZOO = [
    ("c_bit", "bit", {}, "boolean", "tinyint"),
    ("c_tinyint", "tinyint", {}, "smallint", "tinyint"),
    ("c_smallint", "smallint", {}, "smallint", "smallint"),
    ("c_int", "int", {}, "int", "int"),
    ("c_bigint", "bigint", {}, "bigint", "bigint"),
    ("c_decimal", "decimal", {"numeric_precision": 10, "numeric_scale": 2}, "decimal(10,2)", "decimal(10, 2)"),
    ("c_numeric", "numeric", {"numeric_precision": 18, "numeric_scale": 0}, "decimal(18,0)", "decimal(18, 0)"),
    ("c_money", "money", {"numeric_precision": 19, "numeric_scale": 4}, "decimal(19,4)", "decimal(19, 4)"),
    ("c_smallmoney", "smallmoney", {"numeric_precision": 10, "numeric_scale": 4}, "decimal(10,4)", "decimal(10, 4)"),
    ("c_float", "float", {}, "double", "float"),
    ("c_real", "real", {}, "float", "real"),
    ("c_char", "char", {"character_maximum_length": 10}, "string", "char(10)"),
    ("c_nchar", "nchar", {"character_maximum_length": 10}, "string", "char(10)"),
    ("c_varchar", "varchar", {"character_maximum_length": 255}, "string", "varchar(255)"),
    ("c_varchar_max", "varchar", {"character_maximum_length": -1}, "string", "longtext"),
    ("c_nvarchar", "nvarchar", {}, "string", "longtext"),
    ("c_text", "text", {}, "string", "text"),
    ("c_ntext", "ntext", {}, "string", "longtext"),
    ("c_binary", "binary", {"character_maximum_length": 16}, "binary", "binary(16)"),
    ("c_varbinary", "varbinary", {"character_maximum_length": 255}, "binary", "varbinary(255)"),
    ("c_varbinary_max", "varbinary", {"character_maximum_length": -1}, "binary", "longblob"),
    ("c_image", "image", {}, "binary", "longblob"),
    ("c_date", "date", {}, "date", "date"),
    ("c_datetime", "datetime", {}, "timestamp_ntz", "datetime"),
    ("c_datetime2", "datetime2", {}, "timestamp_ntz", "datetime"),
    ("c_smalldatetime", "smalldatetime", {}, "timestamp_ntz", "datetime"),
    ("c_datetimeoffset", "datetimeoffset", {}, "timestamp", "datetime"),
    ("c_time", "time", {}, "string", "time"),
    ("c_rowversion", "timestamp", {}, "bigint", "bigint unsigned"),
    ("c_uniqueidentifier", "uniqueidentifier", {"character_maximum_length": 36}, "string", "char(36)"),
    ("c_xml", "xml", {}, "string", "longtext"),
]


def test_typezoo_end_to_end(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    os.makedirs(src)

    # one-row source frame with a column per MSSQL type's Spark analog
    import pyspark.sql.functions as F

    base = spark.range(1)
    cols = []
    sample = {
        "boolean": F.lit(True),
        "smallint": F.lit(1).cast("smallint"),
        "int": F.lit(1),
        "bigint": F.lit(1).cast("bigint"),
        "double": F.lit(1.5),
        "float": F.lit(1.5).cast("float"),
        "string": F.lit("x"),
        "binary": F.lit(b"ab"),
        "date": F.lit("2023-01-01").cast("date"),
        "timestamp_ntz": F.lit("2023-01-01 14:30:45").cast("timestamp_ntz"),
        "timestamp": F.lit("2023-01-01 14:30:45").cast("timestamp"),
    }
    for name, _, _, spark_t, _ in ZOO:
        v = (
            F.lit(1.5).cast(spark_t)
            if spark_t.startswith("decimal")
            else sample[spark_t]
        )
        cols.append(v.alias(name))
    base.select(*cols).coalesce(1).write.parquet(os.path.join(src, "TypeZoo.parquet"))

    sidecar = {
        "table_name": "TypeZoo",
        "columns": [
            {"column_name": name, "data_type": ms, "is_nullable": True, "constraint": "", **extra}
            for name, ms, extra, _, _ in ZOO
        ],
    }
    with open(os.path.join(src, "TypeZoo.constraints.json"), "w") as f:
        f.write(json.dumps(sidecar))

    extractor = ParquetExtractor(spark, src)
    inserter = ParquetInserter(spark, tgt)
    results = DatabaseMigrator(
        extractor, inserter, options=MigrationOptions(format_names=False, all_tables=True)
    ).run()
    assert results[0].rows_migrated == 1

    create = next(d for d in inserter.executed_ddl if d.startswith("CREATE TABLE"))
    for name, _, _, _, want_ddl in ZOO:
        assert f"`{name}` {want_ddl} " in create, (name, want_ddl, create)


def test_unsupported_type_hard_errors(spark, tmp_path):
    """GeoTable fixture: an unsupported source type aborts, never skips."""
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    os.makedirs(src)
    spark.range(1).selectExpr("'blob' AS shape").coalesce(1).write.parquet(
        os.path.join(src, "GeoTable.parquet")
    )
    with open(os.path.join(src, "GeoTable.constraints.json"), "w") as f:
        f.write(json.dumps({
            "table_name": "GeoTable",
            "columns": [{"column_name": "shape", "data_type": "geometry",
                         "is_nullable": True, "constraint": ""}],
        }))
    from db_migrator_spark.migrate.migrator import MigrationRunError

    with pytest.raises(MigrationRunError, match="geometry"):
        DatabaseMigrator(
            ParquetExtractor(spark, src), ParquetInserter(spark, tgt),
            options=MigrationOptions(format_names=False, all_tables=True),
        ).run()

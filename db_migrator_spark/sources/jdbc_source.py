"""Live MSSQL source over Spark's JDBC reader.

Pushes the same INFORMATION_SCHEMA metadata SQL to the server that the
reference does (catalog scan ``extractor.rs:29-31``; column+constraint scan
with correlated constraint subquery ``extractor.rs:54-83``) via the JDBC
``dbtable = "( ... ) q"`` pushdown form, and reads table data with a
partitioned scan — intra-table parallelism the reference lacks (it streams
each table over one connection, ``extractor.rs:96-128``).

Untestable in this container (no SQL Server, no JDBC driver jar); the query
text and option assembly are unit-tested, and the seam matches
``sources.base.Extractor`` so the orchestrator is oblivious.

Scale: ``partition_column/num_partitions`` splits the source read across
executors; pick a clustered integer PK and size ``num_partitions`` to
cluster cores. ``fetchsize`` keeps per-connection memory flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..common.schema import ColumnSchema

CATALOG_SQL = (
    "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES WHERE TABLE_TYPE = 'BASE TABLE'"
)

# One row per column; the correlated subquery resolves at most one constraint
# string per column from the four constraint catalogs (same shape the
# reference pushes down, extractor.rs:54-83).
SCHEMA_SQL_TEMPLATE = """
SELECT c.COLUMN_NAME,
       c.DATA_TYPE,
       c.CHARACTER_MAXIMUM_LENGTH,
       c.NUMERIC_PRECISION,
       c.NUMERIC_SCALE,
       c.IS_NULLABLE,
       (SELECT TOP 1
               CASE
                   WHEN tc.CONSTRAINT_TYPE = 'PRIMARY KEY' THEN 'PRIMARY KEY'
                   WHEN tc.CONSTRAINT_TYPE = 'FOREIGN KEY' THEN
                        'FOREIGN KEY,' + ccu2.TABLE_NAME + ',' + ccu2.COLUMN_NAME
                   WHEN tc.CONSTRAINT_TYPE = 'UNIQUE' THEN 'UNIQUE'
                   WHEN cc.CHECK_CLAUSE IS NOT NULL THEN 'CHECK (' + cc.CHECK_CLAUSE + ')'
               END
        FROM INFORMATION_SCHEMA.CONSTRAINT_COLUMN_USAGE ccu
        JOIN INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc
          ON ccu.CONSTRAINT_NAME = tc.CONSTRAINT_NAME
        LEFT JOIN INFORMATION_SCHEMA.CHECK_CONSTRAINTS cc
          ON tc.CONSTRAINT_NAME = cc.CONSTRAINT_NAME
        LEFT JOIN INFORMATION_SCHEMA.REFERENTIAL_CONSTRAINTS rc
          ON tc.CONSTRAINT_NAME = rc.CONSTRAINT_NAME
        LEFT JOIN INFORMATION_SCHEMA.CONSTRAINT_COLUMN_USAGE ccu2
          ON rc.UNIQUE_CONSTRAINT_NAME = ccu2.CONSTRAINT_NAME
        WHERE ccu.TABLE_NAME = c.TABLE_NAME
          AND ccu.COLUMN_NAME = c.COLUMN_NAME) AS CONSTRAINT_INFO
FROM INFORMATION_SCHEMA.COLUMNS c
WHERE c.TABLE_NAME = '{table}'
ORDER BY c.ORDINAL_POSITION
"""


class MssqlJdbcExtractor:
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        user: str,
        password: str,
        *,
        fetchsize: int = 10_000,
        num_partitions: int = 8,
        partition_columns: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.user = user
        self.password = password
        self.fetchsize = fetchsize
        self.num_partitions = num_partitions
        self.partition_columns = partition_columns or {}

    def _reader(self, dbtable: str):
        return (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("user", self.user)
            .option("password", self.password)
            .option("dbtable", dbtable)
            .option("fetchsize", str(self.fetchsize))
        )

    def fetch_tables(self) -> list[str]:
        df = self._reader(f"({CATALOG_SQL}) q").load()
        return [r[0] for r in df.collect()]

    def get_table_schema(self, table: str) -> list[ColumnSchema]:
        safe = table.replace("'", "''")
        df = self._reader(f"({SCHEMA_SQL_TEMPLATE.format(table=safe)}) q").load()
        return [
            ColumnSchema.from_information_schema_row(
                r["COLUMN_NAME"],
                r["DATA_TYPE"],
                r["CHARACTER_MAXIMUM_LENGTH"],
                r["NUMERIC_PRECISION"],
                r["NUMERIC_SCALE"],
                r["IS_NULLABLE"],
                r["CONSTRAINT_INFO"],
            )
            for r in df.collect()
        ]

    def read_table(self, table: str) -> DataFrame:
        safe_table = table.replace("]", "]]")
        reader = self._reader(f"[{safe_table}]")
        pcol = self.partition_columns.get(table)
        if pcol:
            # Bounds queried once; Spark issues num_partitions range-sliced
            # SELECTs in parallel. Identifiers escaped like the main read —
            # catalog metadata is data, not trusted SQL text.
            safe_pcol = pcol.replace("]", "]]")
            bounds = self._reader(
                f"(SELECT MIN([{safe_pcol}]) lo, MAX([{safe_pcol}]) hi FROM [{safe_table}]) q"
            ).load().collect()[0]
            if bounds["lo"] is not None:
                reader = (
                    reader.option("partitionColumn", pcol)
                    .option("lowerBound", str(bounds["lo"]))
                    .option("upperBound", str(bounds["hi"]))
                    .option("numPartitions", str(self.num_partitions))
                )
        return reader.load()

"""Source (MSSQL) type system — 29 types, exact string round-trip.

Mirrors ``/root/reference/src/common/mssql_type.rs:4-107``. MSSQL
``timestamp`` is the deprecated alias of ``rowversion`` — an 8-byte row
modification counter, not a time value — so it parses to ``ROWVERSION`` but
renders back as ``"timestamp"``.

``SPARK_TYPE`` gives the in-flight Spark representation for each source
type (SURVEY.md §1.2): data moving through the engine stays natively typed
(DecimalType is exact, TimestampType is UTC-normalized), unlike the
reference which renders every value to a SQL literal string in flight.
"""

from __future__ import annotations

from enum import Enum


class MssqlType(Enum):
    BIT = "bit"
    TINYINT = "tinyint"
    SMALLINT = "smallint"
    INT = "int"
    BIGINT = "bigint"
    DECIMAL = "decimal"
    NUMERIC = "numeric"
    MONEY = "money"
    SMALLMONEY = "smallmoney"
    FLOAT = "float"
    REAL = "real"
    CHAR = "char"
    NCHAR = "nchar"
    VARCHAR = "varchar"
    NVARCHAR = "nvarchar"
    TEXT = "text"
    NTEXT = "ntext"
    BINARY = "binary"
    VARBINARY = "varbinary"
    IMAGE = "image"
    DATE = "date"
    DATETIME = "datetime"
    DATETIME2 = "datetime2"
    SMALLDATETIME = "smalldatetime"
    DATETIMEOFFSET = "datetimeoffset"
    TIME = "time"
    UNIQUEIDENTIFIER = "uniqueidentifier"
    ROWVERSION = "timestamp"  # metadata reports rowversion as "timestamp"
    XML = "xml"

    @classmethod
    def parse(cls, s: str) -> "MssqlType | None":
        try:
            return cls(s.lower())
        except ValueError:
            return None

    def as_str(self) -> str:
        return self.value


class UnsupportedSourceType(ValueError):
    """Unknown source types are a hard error, not a skip
    (reference: ``src/common/schema.rs:25-30``)."""

    def __init__(self, type_name: str, column: str):
        self.type_name = type_name
        self.column = column
        super().__init__(
            f"Unsupported MSSQL type '{type_name}' on column '{column}'. "
            "Supported types: " + ", ".join(t.value for t in MssqlType)
        )


def parse_or_raise(type_name: str, column: str) -> MssqlType:
    t = MssqlType.parse(type_name)
    if t is None:
        raise UnsupportedSourceType(type_name, column)
    return t


# In-flight Spark SQL type (simpleString form) per source type.
SPARK_TYPE: dict[MssqlType, str] = {
    MssqlType.BIT: "boolean",
    MssqlType.TINYINT: "smallint",  # MSSQL tinyint is unsigned 0-255
    MssqlType.SMALLINT: "smallint",
    MssqlType.INT: "int",
    MssqlType.BIGINT: "bigint",
    MssqlType.DECIMAL: "decimal",  # precision/scale filled per column
    MssqlType.NUMERIC: "decimal",
    MssqlType.MONEY: "decimal(19,4)",
    MssqlType.SMALLMONEY: "decimal(10,4)",
    MssqlType.FLOAT: "double",  # MSSQL float is 8-byte
    MssqlType.REAL: "float",
    MssqlType.CHAR: "string",
    MssqlType.NCHAR: "string",
    MssqlType.VARCHAR: "string",
    MssqlType.NVARCHAR: "string",
    MssqlType.TEXT: "string",
    MssqlType.NTEXT: "string",
    MssqlType.BINARY: "binary",
    MssqlType.VARBINARY: "binary",
    MssqlType.IMAGE: "binary",
    MssqlType.DATE: "date",
    MssqlType.DATETIME: "timestamp_ntz",
    MssqlType.DATETIME2: "timestamp_ntz",
    MssqlType.SMALLDATETIME: "timestamp_ntz",
    MssqlType.DATETIMEOFFSET: "timestamp",  # UTC-normalized, offset stripped
    MssqlType.TIME: "string",  # Spark has no TimeType; 'HH:MM:SS.fff' text
    MssqlType.UNIQUEIDENTIFIER: "string",
    MssqlType.ROWVERSION: "bigint",
    MssqlType.XML: "string",
}

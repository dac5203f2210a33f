"""Target (MySQL) type system: 18 base types + concrete rendered type.

Mirrors ``/root/reference/src/common/mysql_type.rs``: capability predicates
(``accepts_length``/``accepts_precision``/``accepts_unsigned``), per-type
length caps (char/binary 255, varchar/varbinary 65535), and DDL rendering
that ignores inapplicable parameters.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class MySqlBaseType(Enum):
    TINYINT = "tinyint"
    SMALLINT = "smallint"
    INT = "int"
    BIGINT = "bigint"
    DECIMAL = "decimal"
    FLOAT = "float"
    REAL = "real"
    CHAR = "char"
    VARCHAR = "varchar"
    TEXT = "text"
    LONGTEXT = "longtext"
    BINARY = "binary"
    VARBINARY = "varbinary"
    LONGBLOB = "longblob"
    DATETIME = "datetime"
    TIMESTAMP = "timestamp"
    DATE = "date"
    TIME = "time"

    @classmethod
    def parse(cls, s: str) -> "MySqlBaseType | None":
        try:
            return cls(s.lower())
        except ValueError:
            return None

    def as_str(self) -> str:
        return self.value

    def accepts_length(self) -> bool:
        return self in (
            MySqlBaseType.VARCHAR,
            MySqlBaseType.CHAR,
            MySqlBaseType.BINARY,
            MySqlBaseType.VARBINARY,
        )

    def accepts_precision(self) -> bool:
        return self in (MySqlBaseType.DECIMAL, MySqlBaseType.FLOAT, MySqlBaseType.REAL)

    def accepts_unsigned(self) -> bool:
        return self in (
            MySqlBaseType.TINYINT,
            MySqlBaseType.SMALLINT,
            MySqlBaseType.INT,
            MySqlBaseType.BIGINT,
            MySqlBaseType.DECIMAL,
            MySqlBaseType.FLOAT,
            MySqlBaseType.REAL,
        )

    def max_length(self) -> int | None:
        return {
            MySqlBaseType.CHAR: 255,
            MySqlBaseType.VARCHAR: 65535,
            MySqlBaseType.BINARY: 255,
            MySqlBaseType.VARBINARY: 65535,
        }.get(self)


@dataclass(frozen=True)
class MySqlType:
    """A concrete target type; renders itself to DDL via ``to_sql()``
    (reference: ``src/common/mysql_type.rs:124-153``)."""

    base_type: MySqlBaseType
    length: int | None = None
    precision: int | None = None
    scale: int | None = None
    unsigned: bool = False
    zerofill: bool = False

    def to_sql(self) -> str:
        s = self.base_type.as_str()
        if self.base_type.accepts_length() and self.length is not None:
            s += f"({self.length})"
        elif self.base_type.accepts_precision() and self.precision is not None:
            if self.scale is not None:
                s += f"({self.precision}, {self.scale})"
            else:
                s += f"({self.precision})"
        if self.base_type.accepts_unsigned():
            if self.unsigned:
                s += " unsigned"
            if self.zerofill:
                s += " zerofill"
        return s

    def __str__(self) -> str:  # pragma: no cover
        return self.to_sql()

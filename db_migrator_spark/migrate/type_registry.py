"""Type-mapping registry: built-in defaults + user overrides.

Default table and 3-level resolution precedence (column override >
type-wide override > built-in default) mirror
``/root/reference/src/migrate/type_registry.rs:19-143``, including
case-insensitive ``"Table.Column"`` matching and unused-override tracking
for post-run typo reporting.
"""

from __future__ import annotations

from ..common.mssql_types import MssqlType
from ..common.mysql_types import MySqlBaseType as My
from ..common.type_mapping import TypeMappingEntry, numeric, simple, with_length

_DEFAULTS: dict[MssqlType, TypeMappingEntry] = {
    # Integer types
    MssqlType.BIT: simple(My.TINYINT),
    MssqlType.TINYINT: simple(My.TINYINT),
    MssqlType.SMALLINT: simple(My.SMALLINT),
    MssqlType.INT: simple(My.INT),
    MssqlType.BIGINT: simple(My.BIGINT),
    # Exact numerics
    MssqlType.DECIMAL: numeric(My.DECIMAL, 10, 2),
    MssqlType.NUMERIC: numeric(My.DECIMAL, 18, 0),
    MssqlType.MONEY: numeric(My.DECIMAL, 19, 4),
    MssqlType.SMALLMONEY: numeric(My.DECIMAL, 10, 2),
    # Approximate numerics
    MssqlType.FLOAT: simple(My.FLOAT),
    MssqlType.REAL: simple(My.REAL),
    # Character types
    MssqlType.CHAR: with_length(My.CHAR, 1),
    MssqlType.NCHAR: with_length(My.CHAR, 1),
    MssqlType.VARCHAR: with_length(My.VARCHAR, 255),
    MssqlType.NVARCHAR: simple(My.LONGTEXT),
    MssqlType.TEXT: simple(My.TEXT),
    MssqlType.NTEXT: simple(My.LONGTEXT),
    # Binary types
    MssqlType.BINARY: with_length(My.BINARY, 1),
    MssqlType.VARBINARY: with_length(My.VARBINARY, 255),
    MssqlType.IMAGE: simple(My.LONGBLOB),
    # Date/time types
    MssqlType.DATE: simple(My.DATE),
    MssqlType.DATETIME: simple(My.DATETIME),
    MssqlType.DATETIME2: simple(My.DATETIME),
    MssqlType.SMALLDATETIME: simple(My.DATETIME),
    MssqlType.DATETIMEOFFSET: simple(My.DATETIME),
    MssqlType.TIME: simple(My.TIME),
    # rowversion is a modification counter; bigint unsigned preserves value order
    MssqlType.ROWVERSION: simple(My.BIGINT, unsigned=True),
    # Special types
    MssqlType.UNIQUEIDENTIFIER: with_length(My.CHAR, 36),
    MssqlType.XML: simple(My.LONGTEXT),
}


class TypeRegistry:
    def __init__(self) -> None:
        self._defaults = dict(_DEFAULTS)
        self._overrides: dict[MssqlType, TypeMappingEntry] = {}
        self._column_overrides: dict[str, TypeMappingEntry] = {}
        self._used_column_overrides: set[str] = set()

    @classmethod
    def with_defaults(cls) -> "TypeRegistry":
        return cls()

    def get(self, mssql_type: MssqlType) -> TypeMappingEntry:
        return self._overrides.get(mssql_type) or self._defaults[mssql_type]

    def resolve(self, table_name: str, column_name: str, mssql_type: MssqlType) -> TypeMappingEntry:
        """Column override > type override > default; source-name matching is
        case-insensitive. Matched column overrides are recorded so unused
        (typo'd/stale) ones can be reported after the run."""
        key = f"{table_name}.{column_name}".lower()
        entry = self._column_overrides.get(key)
        if entry is not None:
            self._used_column_overrides.add(key)
            return entry
        return self.get(mssql_type)

    def unused_column_overrides(self) -> list[str]:
        return sorted(k for k in self._column_overrides if k not in self._used_column_overrides)

    def set_override(self, mssql_type: MssqlType, entry: TypeMappingEntry) -> None:
        self._overrides[mssql_type] = entry

    def set_column_override(self, table_column: str, entry: TypeMappingEntry) -> None:
        self._column_overrides[table_column.lower()] = entry

    def with_user_overrides(self, overrides) -> "TypeRegistry":
        """Apply a parsed ``UserOverrides`` (see ``db_migrator_spark.mappings``)."""
        for t, entry in overrides.type_overrides.items():
            self.set_override(t, entry)
        for key, entry in overrides.column_overrides.items():
            self.set_column_override(key, entry)
        return self

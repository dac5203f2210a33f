"""Source / target column schema models + Spark StructType bridge.

Mirrors ``ColumnSchema`` (``/root/reference/src/common/schema.rs:8-17``) and
``TargetColumn`` (``src/common/target_schema.rs:5-11``). Constraints and
length/precision travel as ``StructField.metadata`` — Spark's only schema
side-channel — so the whole source schema survives a round trip through a
DataFrame (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .constraints import Constraint, constraint_to_wire, parse_constraint
from .mssql_types import MssqlType, parse_or_raise
from .mysql_types import MySqlType


@dataclass
class ColumnSchema:
    """One source column as reported by INFORMATION_SCHEMA.COLUMNS."""

    column_name: str
    data_type: MssqlType
    character_maximum_length: int | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None
    is_nullable: bool = True
    constraint: Constraint | None = None

    @classmethod
    def from_information_schema_row(
        cls,
        column_name: str,
        data_type: str,
        character_maximum_length: int | None,
        numeric_precision: int | None,
        numeric_scale: int | None,
        is_nullable: str | bool,
        constraint: str | None,
    ) -> "ColumnSchema":
        """Parse one metadata row (reference: ``src/common/schema.rs:20-56``).
        Unknown source types raise (hard error, not a skip)."""
        nullable = is_nullable if isinstance(is_nullable, bool) else is_nullable.upper() == "YES"
        return cls(
            column_name=column_name,
            data_type=parse_or_raise(data_type, column_name),
            character_maximum_length=character_maximum_length,
            numeric_precision=numeric_precision,
            numeric_scale=numeric_scale,
            is_nullable=nullable,
            constraint=parse_constraint(constraint) if constraint else None,
        )

    def to_metadata(self) -> dict:
        """Sidecar dict for StructField.metadata."""
        return {
            "mssql_type": self.data_type.as_str(),
            "character_maximum_length": self.character_maximum_length,
            "numeric_precision": self.numeric_precision,
            "numeric_scale": self.numeric_scale,
            "constraint": constraint_to_wire(self.constraint),
        }


@dataclass
class TargetColumn:
    """One mapped output column with its rendered DDL type."""

    column_name: str
    data_type: MySqlType
    is_nullable: bool = True
    constraint: Constraint | None = None


@dataclass
class TableConstraints:
    """Sidecar constraint model for a whole table (SURVEY.md §7.4: there is
    no JDBC/StructType channel for PK/FK, so this flows alongside the
    DataFrame from source scan to sink DDL)."""

    table_name: str
    columns: list[ColumnSchema] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "table_name": self.table_name,
                "columns": [
                    {
                        "column_name": c.column_name,
                        "data_type": c.data_type.as_str(),
                        "character_maximum_length": c.character_maximum_length,
                        "numeric_precision": c.numeric_precision,
                        "numeric_scale": c.numeric_scale,
                        "is_nullable": c.is_nullable,
                        "constraint": constraint_to_wire(c.constraint),
                    }
                    for c in self.columns
                ],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "TableConstraints":
        d = json.loads(s)
        return cls(
            table_name=d["table_name"],
            columns=[
                ColumnSchema.from_information_schema_row(
                    c["column_name"],
                    c["data_type"],
                    c.get("character_maximum_length"),
                    c.get("numeric_precision"),
                    c.get("numeric_scale"),
                    c.get("is_nullable", True),
                    c.get("constraint") or None,
                )
                for d_cols in [d["columns"]]
                for c in d_cols
            ],
        )

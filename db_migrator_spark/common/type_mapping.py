"""A single source-to-target type mapping rule.

Mirrors ``/root/reference/src/common/type_mapping_entry.rs:6-15``: which
target base type to use, whether to carry length / precision+scale from the
source column, the fallback defaults, and unsigned/zerofill modifiers.
"""

from __future__ import annotations

from dataclasses import dataclass

from .mysql_types import MySqlBaseType


@dataclass(frozen=True)
class TypeMappingEntry:
    mysql_type: MySqlBaseType
    carry_length: bool = False
    carry_precision: bool = False
    default_length: int | None = None
    default_precision: int | None = None
    default_scale: int | None = None
    unsigned: bool = False
    zerofill: bool = False


def simple(t: MySqlBaseType, *, unsigned: bool = False) -> TypeMappingEntry:
    return TypeMappingEntry(mysql_type=t, unsigned=unsigned)


def numeric(t: MySqlBaseType, precision: int, scale: int) -> TypeMappingEntry:
    return TypeMappingEntry(
        mysql_type=t,
        carry_precision=True,
        default_precision=precision,
        default_scale=scale,
    )


def with_length(t: MySqlBaseType, default_length: int) -> TypeMappingEntry:
    return TypeMappingEntry(
        mysql_type=t,
        carry_length=True,
        default_length=default_length,
    )

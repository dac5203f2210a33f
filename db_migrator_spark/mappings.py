"""User type-mapping overrides: ``mappings.toml`` grammar.

Grammar and validation mirror ``/root/reference/src/mappings.rs:42-224``:

    [mappings]
    nvarchar = "varchar(500)"
    money    = "decimal(10, 2)"

    [mappings.columns]
    "Orders.ID" = "int unsigned"

Three to-type formats — ``type``, ``type(len)``, ``type(p, s)`` — plus
trailing ``unsigned`` / ``zerofill`` modifiers. Validated: base type must
exist, parameters must be applicable to the type, lengths capped at the
MySQL max, modifiers only on numeric types. Bare length/precision types
carry from the source with safe defaults (255 / (10,2)).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

from .common.mssql_types import MssqlType
from .common.mysql_types import MySqlBaseType
from .common.type_mapping import TypeMappingEntry

_VALID_MYSQL = (
    "tinyint, smallint, int, bigint, decimal, float, real, char, varchar, text, "
    "longtext, binary, varbinary, longblob, datetime, timestamp, date, time"
)
_VALID_MSSQL = ", ".join(t.value for t in MssqlType)


class MappingParseError(ValueError):
    pass


@dataclass
class UserOverrides:
    type_overrides: dict[MssqlType, TypeMappingEntry] = field(default_factory=dict)
    column_overrides: dict[str, TypeMappingEntry] = field(default_factory=dict)

    @classmethod
    def empty(cls) -> "UserOverrides":
        return cls()

    @classmethod
    def from_toml_str(cls, text: str) -> "UserOverrides":
        try:
            value = tomllib.loads(text)
        except tomllib.TOMLDecodeError as e:
            raise MappingParseError(f"Invalid TOML: {e}") from e
        return cls.from_dict(value)

    @classmethod
    def from_file(cls, path: str) -> "UserOverrides":
        with open(path, "rb") as f:
            try:
                value = tomllib.load(f)
            except tomllib.TOMLDecodeError as e:
                raise MappingParseError(f"Invalid TOML: {e}") from e
        return cls.from_dict(value)

    @classmethod
    def from_dict(cls, value: dict) -> "UserOverrides":
        mappings = value.get("mappings")
        if mappings is None:
            raise MappingParseError("Missing [mappings] section")
        if not isinstance(mappings, dict):
            raise MappingParseError("Invalid [mappings] format — expected key-value pairs")

        out = cls()
        for from_type_str, to_type_value in mappings.items():
            if from_type_str == "columns":
                if not isinstance(to_type_value, dict):
                    raise MappingParseError(
                        "Invalid [mappings.columns] format — expected key-value pairs"
                    )
                for column_key, v in to_type_value.items():
                    if "." not in column_key:
                        raise MappingParseError(
                            f"Invalid column override key '{column_key}' — expected "
                            '"Table.Column" format'
                        )
                    if not isinstance(v, str):
                        raise MappingParseError(
                            f"Invalid value for column override '{column_key}' — expected a "
                            'string like "int unsigned"'
                        )
                    out.column_overrides[column_key.lower()] = parse_to_type(v.strip(), column_key)
                continue

            mssql_type = MssqlType.parse(from_type_str)
            if mssql_type is None:
                raise MappingParseError(
                    f"Unknown MSSQL type '{from_type_str}'. Valid types: {_VALID_MSSQL}"
                )
            if not isinstance(to_type_value, str):
                raise MappingParseError(
                    f"Invalid value for '{from_type_str}' — expected a string like \"varchar(500)\""
                )
            out.type_overrides[mssql_type] = parse_to_type(to_type_value.strip(), from_type_str)
        return out


def parse_to_type(to_type_str: str, from_type_str: str) -> TypeMappingEntry:
    """Parse one to-type string: ``base(params) modifiers...``.

    Params may contain spaces (``decimal(19, 4)``), so the type part ends at
    the closing paren when present, else at the first whitespace.
    """
    close = to_type_str.find(")")
    if close != -1:
        type_part, modifiers_part = to_type_str[: close + 1], to_type_str[close + 1 :]
    else:
        parts = to_type_str.split(None, 1)
        type_part = parts[0] if parts else to_type_str
        modifiers_part = parts[1] if len(parts) > 1 else ""

    if "(" in type_part:
        base_str, _, params = type_part.partition("(")
        params_str: str | None = params.rstrip(")")
    else:
        base_str, params_str = type_part, None

    mysql_type = MySqlBaseType.parse(base_str.strip())
    if mysql_type is None:
        raise MappingParseError(
            f"Unknown MySQL type '{to_type_str}' in to_type for mapping from "
            f"'{from_type_str}'. Valid types: {_VALID_MYSQL}"
        )

    carry_length = False
    carry_precision = False
    default_length: int | None = None
    default_precision: int | None = None
    default_scale: int | None = None

    if params_str is not None:
        if mysql_type.accepts_length():
            try:
                length = int(params_str.strip())
                if length < 0:
                    raise ValueError
            except ValueError:
                raise MappingParseError(
                    f"Invalid length '{params_str}' in to_type '{to_type_str}'"
                ) from None
            cap = mysql_type.max_length()
            if cap is not None and length > cap:
                raise MappingParseError(
                    f"Length {length} exceeds maximum {cap} for type "
                    f"'{mysql_type.as_str()}'. Use longtext/longblob for unlimited."
                )
            carry_length = True
            default_length = length
        elif mysql_type.accepts_precision():
            parts = [p.strip() for p in params_str.split(",")]
            try:
                precision = int(parts[0])
                if not 0 <= precision <= 255:
                    raise ValueError
            except ValueError:
                raise MappingParseError(
                    f"Invalid precision '{parts[0]}' in to_type '{to_type_str}'"
                ) from None
            carry_precision = True
            default_precision = precision
            if len(parts) > 1:
                try:
                    default_scale = int(parts[1])
                    if not 0 <= default_scale <= 255:
                        raise ValueError
                except ValueError:
                    raise MappingParseError(
                        f"Invalid scale '{parts[1]}' in to_type '{to_type_str}'"
                    ) from None
        else:
            raise MappingParseError(
                f"Type '{mysql_type.as_str()}' does not accept parameters, but got '{to_type_str}'"
            )
    elif mysql_type.accepts_length():
        # No params but type requires length — carry from source, safe default
        carry_length = True
        default_length = 255
    elif mysql_type.accepts_precision():
        carry_precision = True
        default_precision = 10
        default_scale = 2

    unsigned = False
    zerofill = False
    for modifier in modifiers_part.split():
        m = modifier.lower()
        if m == "unsigned":
            unsigned = True
        elif m == "zerofill":
            zerofill = True
        else:
            raise MappingParseError(
                f"Unknown modifier '{modifier}' in to_type '{to_type_str}'. "
                "Supported modifiers: unsigned, zerofill"
            )

    if (unsigned or zerofill) and not mysql_type.accepts_unsigned():
        raise MappingParseError(
            f"Type '{mysql_type.as_str()}' does not support unsigned/zerofill in "
            f"to_type '{to_type_str}' for mapping from '{from_type_str}'"
        )

    return TypeMappingEntry(
        mysql_type=mysql_type,
        carry_length=carry_length,
        carry_precision=carry_precision,
        default_length=default_length,
        default_precision=default_precision,
        default_scale=default_scale,
        unsigned=unsigned,
        zerofill=zerofill,
    )

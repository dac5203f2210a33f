"""Override grammar — reference: mappings.rs:226-568."""

import pytest

from db_migrator_spark.common.mssql_types import MssqlType
from db_migrator_spark.common.mysql_types import MySqlBaseType
from db_migrator_spark.mappings import MappingParseError, UserOverrides, parse_to_type


def test_bare_type():
    e = parse_to_type("longtext", "nvarchar")
    assert e.mysql_type is MySqlBaseType.LONGTEXT
    assert not e.carry_length and not e.carry_precision


def test_type_with_length():
    e = parse_to_type("varchar(500)", "nvarchar")
    assert e.mysql_type is MySqlBaseType.VARCHAR
    assert e.carry_length and e.default_length == 500


def test_type_with_precision_scale():
    e = parse_to_type("decimal(10, 2)", "money")
    assert e.mysql_type is MySqlBaseType.DECIMAL
    assert e.carry_precision and (e.default_precision, e.default_scale) == (10, 2)


def test_precision_only():
    e = parse_to_type("decimal(12)", "money")
    assert (e.default_precision, e.default_scale) == (12, None)


def test_modifiers():
    e = parse_to_type("int unsigned", "int")
    assert e.unsigned and not e.zerofill
    e = parse_to_type("decimal(10, 2) unsigned zerofill", "money")
    assert e.unsigned and e.zerofill


def test_bare_length_type_carries_with_default():
    e = parse_to_type("varchar", "nvarchar")
    assert e.carry_length and e.default_length == 255


def test_bare_precision_type_carries_with_default():
    e = parse_to_type("decimal", "money")
    assert e.carry_precision and (e.default_precision, e.default_scale) == (10, 2)


@pytest.mark.parametrize(
    ("to_type", "match"),
    [
        ("fancytext", "Unknown MySQL type"),
        ("varchar(99999)", "exceeds maximum 65535"),
        ("varchar(abc)", "Invalid length"),
        ("decimal(x, 2)", "Invalid precision"),
        ("decimal(10, y)", "Invalid scale"),
        ("datetime(6)", "does not accept parameters"),
        ("int wobbly", "Unknown modifier"),
        ("varchar(10) unsigned", "does not support unsigned"),
    ],
)
def test_parse_errors(to_type, match):
    with pytest.raises(MappingParseError, match=match):
        parse_to_type(to_type, "src")


def test_from_toml_full():
    ov = UserOverrides.from_toml_str(
        """
        [mappings]
        nvarchar = "varchar(500)"
        money = "decimal(10, 2)"

        [mappings.columns]
        "Orders.ID" = "int unsigned"
        "Ordres.ID" = "int unsigned"
        """
    )
    assert ov.type_overrides[MssqlType.NVARCHAR].default_length == 500
    assert ov.type_overrides[MssqlType.MONEY].default_scale == 2
    assert set(ov.column_overrides) == {"orders.id", "ordres.id"}
    assert ov.column_overrides["orders.id"].unsigned


def test_from_toml_missing_section():
    with pytest.raises(MappingParseError, match=r"Missing \[mappings\] section"):
        UserOverrides.from_toml_str("[other]\nx = 1\n")


def test_from_toml_unknown_mssql_type():
    with pytest.raises(MappingParseError, match="Unknown MSSQL type 'geometry'"):
        UserOverrides.from_toml_str('[mappings]\ngeometry = "longtext"\n')


def test_from_toml_bad_column_key():
    with pytest.raises(MappingParseError, match="Table.Column"):
        UserOverrides.from_toml_str('[mappings.columns]\nnodot = "int"\n[mappings]\n')


def test_from_toml_non_string_value():
    with pytest.raises(MappingParseError, match="expected a string"):
        UserOverrides.from_toml_str("[mappings]\nint = 5\n")


def test_timestamp_key_is_rowversion():
    ov = UserOverrides.from_toml_str('[mappings]\ntimestamp = "bigint unsigned"\n')
    assert ov.type_overrides[MssqlType.ROWVERSION].unsigned

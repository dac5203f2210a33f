"""Type registry — reference: type_registry.rs:211-465 (defaults, precedence,
unused-override reporting)."""

import pytest

from db_migrator_spark.common.mssql_types import MssqlType
from db_migrator_spark.common.mysql_types import MySqlBaseType
from db_migrator_spark.common.type_mapping import TypeMappingEntry, simple
from db_migrator_spark.mappings import UserOverrides
from db_migrator_spark.migrate.type_registry import TypeRegistry


@pytest.fixture
def registry():
    return TypeRegistry.with_defaults()


def test_every_mssql_type_has_default(registry):
    for t in MssqlType:
        assert registry.get(t) is not None


@pytest.mark.parametrize(
    ("src", "target", "prec", "scale"),
    [
        (MssqlType.MONEY, MySqlBaseType.DECIMAL, 19, 4),
        (MssqlType.SMALLMONEY, MySqlBaseType.DECIMAL, 10, 2),
        (MssqlType.DECIMAL, MySqlBaseType.DECIMAL, 10, 2),
        (MssqlType.NUMERIC, MySqlBaseType.DECIMAL, 18, 0),
    ],
)
def test_numeric_defaults(registry, src, target, prec, scale):
    e = registry.get(src)
    assert e.mysql_type is target
    assert e.carry_precision and (e.default_precision, e.default_scale) == (prec, scale)


@pytest.mark.parametrize(
    ("src", "target"),
    [
        (MssqlType.BIT, MySqlBaseType.TINYINT),
        (MssqlType.NVARCHAR, MySqlBaseType.LONGTEXT),
        (MssqlType.NTEXT, MySqlBaseType.LONGTEXT),
        (MssqlType.IMAGE, MySqlBaseType.LONGBLOB),
        (MssqlType.XML, MySqlBaseType.LONGTEXT),
        (MssqlType.DATETIME2, MySqlBaseType.DATETIME),
        (MssqlType.DATETIMEOFFSET, MySqlBaseType.DATETIME),
    ],
)
def test_simple_defaults(registry, src, target):
    assert registry.get(src).mysql_type is target


def test_rowversion_is_unsigned_bigint(registry):
    e = registry.get(MssqlType.ROWVERSION)
    assert e.mysql_type is MySqlBaseType.BIGINT and e.unsigned


def test_uniqueidentifier_is_char36(registry):
    e = registry.get(MssqlType.UNIQUEIDENTIFIER)
    assert e.mysql_type is MySqlBaseType.CHAR and e.default_length == 36 and e.carry_length


def test_varchar_carries_length_default_255(registry):
    e = registry.get(MssqlType.VARCHAR)
    assert e.carry_length and e.default_length == 255


def test_type_override_precedence(registry):
    registry.set_override(MssqlType.MONEY, simple(MySqlBaseType.FLOAT))
    assert registry.get(MssqlType.MONEY).mysql_type is MySqlBaseType.FLOAT
    assert registry.resolve("T", "C", MssqlType.MONEY).mysql_type is MySqlBaseType.FLOAT


def test_column_override_beats_type_override(registry):
    registry.set_override(MssqlType.INT, simple(MySqlBaseType.BIGINT))
    registry.set_column_override("Orders.ID", simple(MySqlBaseType.INT, unsigned=True))
    e = registry.resolve("Orders", "ID", MssqlType.INT)
    assert e.mysql_type is MySqlBaseType.INT and e.unsigned
    # other columns fall through to the type override
    assert registry.resolve("Orders", "Other", MssqlType.INT).mysql_type is MySqlBaseType.BIGINT


def test_column_override_case_insensitive(registry):
    registry.set_column_override("ORDERS.id", simple(MySqlBaseType.BIGINT))
    assert registry.resolve("orders", "ID", MssqlType.INT).mysql_type is MySqlBaseType.BIGINT


def test_unused_column_overrides_reported(registry):
    registry.set_column_override("Orders.ID", simple(MySqlBaseType.INT))
    registry.set_column_override("Ordres.ID", simple(MySqlBaseType.INT))  # typo fixture
    registry.resolve("Orders", "ID", MssqlType.INT)
    assert registry.unused_column_overrides() == ["ordres.id"]


def test_with_user_overrides(registry):
    ov = UserOverrides(
        type_overrides={MssqlType.NVARCHAR: TypeMappingEntry(
            mysql_type=MySqlBaseType.VARCHAR, carry_length=True, default_length=500)},
        column_overrides={"orders.id": simple(MySqlBaseType.INT, unsigned=True)},
    )
    registry.with_user_overrides(ov)
    assert registry.get(MssqlType.NVARCHAR).mysql_type is MySqlBaseType.VARCHAR
    assert registry.resolve("Orders", "ID", MssqlType.INT).unsigned

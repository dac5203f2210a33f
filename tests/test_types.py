"""Type-system tests — reference: mssql_type.rs:116-194, mysql_type.rs:161-347."""

import pytest

from db_migrator_spark.common.mssql_types import MssqlType, UnsupportedSourceType, parse_or_raise
from db_migrator_spark.common.mysql_types import MySqlBaseType, MySqlType


def test_mssql_round_trip_all_29():
    assert len(MssqlType) == 29
    for t in MssqlType:
        assert MssqlType.parse(t.as_str()) is t


def test_mssql_timestamp_is_rowversion():
    assert MssqlType.parse("timestamp") is MssqlType.ROWVERSION
    assert MssqlType.ROWVERSION.as_str() == "timestamp"


def test_mssql_parse_case_insensitive():
    assert MssqlType.parse("VARCHAR") is MssqlType.VARCHAR
    assert MssqlType.parse("DateTime2") is MssqlType.DATETIME2


def test_mssql_unknown_type_is_hard_error():
    assert MssqlType.parse("geometry") is None
    with pytest.raises(UnsupportedSourceType, match="geometry"):
        parse_or_raise("geometry", "shape")


def test_mysql_round_trip_all_18():
    assert len(MySqlBaseType) == 18
    for t in MySqlBaseType:
        assert MySqlBaseType.parse(t.as_str()) is t


@pytest.mark.parametrize(
    ("t", "length", "precision"),
    [
        (MySqlBaseType.VARCHAR, True, False),
        (MySqlBaseType.CHAR, True, False),
        (MySqlBaseType.BINARY, True, False),
        (MySqlBaseType.VARBINARY, True, False),
        (MySqlBaseType.DECIMAL, False, True),
        (MySqlBaseType.FLOAT, False, True),
        (MySqlBaseType.REAL, False, True),
        (MySqlBaseType.LONGTEXT, False, False),
        (MySqlBaseType.DATETIME, False, False),
    ],
)
def test_capability_predicates(t, length, precision):
    assert t.accepts_length() is length
    assert t.accepts_precision() is precision


def test_max_lengths():
    assert MySqlBaseType.CHAR.max_length() == 255
    assert MySqlBaseType.VARCHAR.max_length() == 65535
    assert MySqlBaseType.BINARY.max_length() == 255
    assert MySqlBaseType.VARBINARY.max_length() == 65535
    assert MySqlBaseType.LONGTEXT.max_length() is None


@pytest.mark.parametrize(
    ("mysql_type", "expected"),
    [
        (MySqlType(MySqlBaseType.INT), "int"),
        (MySqlType(MySqlBaseType.VARCHAR, length=255), "varchar(255)"),
        (MySqlType(MySqlBaseType.DECIMAL, precision=19, scale=4), "decimal(19, 4)"),
        (MySqlType(MySqlBaseType.DECIMAL, precision=10), "decimal(10)"),
        (MySqlType(MySqlBaseType.BIGINT, unsigned=True), "bigint unsigned"),
        (MySqlType(MySqlBaseType.INT, unsigned=True, zerofill=True), "int unsigned zerofill"),
        # inapplicable params are ignored in rendering
        (MySqlType(MySqlBaseType.LONGTEXT, length=500), "longtext"),
        (MySqlType(MySqlBaseType.DATETIME, precision=6), "datetime"),
        (MySqlType(MySqlBaseType.VARCHAR, length=100, unsigned=True), "varchar(100)"),
        (MySqlType(MySqlBaseType.TINYINT), "tinyint"),
    ],
)
def test_to_sql(mysql_type, expected):
    assert mysql_type.to_sql() == expected

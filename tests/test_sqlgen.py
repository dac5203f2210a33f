"""Identifier/literal escaping — reference: sql.rs:20-98."""

from db_migrator_spark.common.sqlgen import (
    escape_mssql_identifier,
    escape_mysql_identifier,
    escape_sql_string,
)


def test_mssql_identifier():
    assert escape_mssql_identifier("users") == "[users]"
    assert escape_mssql_identifier("my]table") == "[my]]table]"
    assert escape_mssql_identifier("order") == "[order]"


def test_mysql_identifier():
    assert escape_mysql_identifier("users") == "`users`"
    assert escape_mysql_identifier("my`table") == "`my``table`"
    assert escape_mysql_identifier("select") == "`select`"


def test_sql_string():
    assert escape_sql_string("O'Brien") == "O''Brien"
    assert escape_sql_string("path\\to") == "path\\\\to"
    assert escape_sql_string("plain") == "plain"
    assert escape_sql_string("it's a \\'mix\\'") == "it''s a \\\\''mix\\\\''"

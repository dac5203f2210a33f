"""DDL/DML builder tests — reference scenarios from
/root/reference/src/insert/query.rs:137-338 (reserved words, backtick
injection, constraint skipping)."""

from db_migrator_spark.common.constraints import Check, Default, ForeignKey, PrimaryKey, Unique
from db_migrator_spark.common.mysql_types import MySqlBaseType, MySqlType
from db_migrator_spark.common.schema import TargetColumn
from db_migrator_spark.migrate.ddl import (
    TableAction,
    build_create_constraints,
    build_create_table_query,
    build_insert_statement,
    build_reset_query,
)


def col(name, t, nullable=True, constraint=None, **kw):
    return TargetColumn(name, MySqlType(t, **kw), nullable, constraint)


def test_create_table_basic():
    q = build_create_table_query(
        "Users",
        [
            col("id", MySqlBaseType.INT, nullable=False, constraint=PrimaryKey()),
            col("name", MySqlBaseType.VARCHAR, length=100),
        ],
    )
    assert q == (
        "CREATE TABLE `Users` (`id` int PRIMARY KEY NOT NULL, `name` varchar(100) NULL)"
    )


def test_create_table_reserved_words_and_backticks():
    q = build_create_table_query(
        "order", [col("select", MySqlBaseType.INT), col("my`col", MySqlBaseType.INT)]
    )
    assert "`order`" in q and "`select`" in q and "`my``col`" in q


def test_insert_statement():
    stmt = build_insert_statement(
        "t", [col("a", MySqlBaseType.INT), col("b", MySqlBaseType.VARCHAR, length=10)]
    )
    assert stmt == "INSERT INTO `t` (`a`, `b`) VALUES"


def test_reset_query():
    assert build_reset_query(["a", "b"], TableAction.TRUNCATE) == (
        "TRUNCATE TABLE `a`;\nTRUNCATE TABLE `b`;"
    )
    assert build_reset_query(["x"], TableAction.DROP) == "DROP TABLE `x`;"


def test_constraints_full_set():
    schema = [
        col("id", MySqlBaseType.INT, constraint=PrimaryKey()),  # PK inline, not here
        col("uid", MySqlBaseType.INT, constraint=ForeignKey("users", "id")),
        col("ext", MySqlBaseType.INT, constraint=ForeignKey("missing", "id")),
        col("email", MySqlBaseType.VARCHAR, length=50, constraint=Unique()),
        col("age", MySqlBaseType.INT, constraint=Check("age > 0")),
        col("created", MySqlBaseType.DATETIME, constraint=Default("now()")),
    ]
    q = build_create_constraints("orders", schema, ["orders", "users"])
    assert q.startswith("SET FOREIGN_KEY_CHECKS=0; ALTER TABLE `orders` ")
    assert "ADD FOREIGN KEY(`uid`) REFERENCES `users`(`id`) ON DELETE CASCADE" in q
    assert "missing" not in q  # FK to non-migrated table skipped
    assert "ADD UNIQUE(`email`)" in q
    assert "ADD CHECK (age > 0)" in q
    assert "ADD DEFAULT now()" in q
    assert "PRIMARY KEY" not in q  # PK handled inline at CREATE


def test_constraints_none_returns_none():
    schema = [col("id", MySqlBaseType.INT, constraint=PrimaryKey()), col("x", MySqlBaseType.INT)]
    assert build_create_constraints("t", schema, ["t"]) is None

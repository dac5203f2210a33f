"""Target-side DDL/DML text builders.

Shapes mirror ``/root/reference/src/insert/query.rs``:

- ``CREATE TABLE `t` (`c` type [PRIMARY KEY] NULL|NOT NULL, ...)`` with the
  inline single-column PK only (:100-135);
- batched ``INSERT INTO `t` (`c`, ...) VALUES`` prefix (:6-18);
- per-table reset ``DROP|TRUNCATE TABLE `t`;`` (:20-32);
- constraint phase ``SET FOREIGN_KEY_CHECKS=0; ALTER TABLE `t` ADD ...``
  with FKs referencing non-migrated tables *skipped with a warning* (:34-98).

These strings are driver-side only. The Spark data path uses the JDBC
writer's parameter binding (no literal rendering), so DML text beyond the
prefix is never built — the reference's byte-budget batch assembly
(table_migrator.rs:116-167) is replaced by ``batchsize`` +
``rewriteBatchedStatements`` (see sinks/jdbc_sink.py).
"""

from __future__ import annotations

import logging
from enum import Enum

from ..common.constraints import Check, Default, ForeignKey, PrimaryKey, Unique
from ..common.schema import TargetColumn
from ..common.sqlgen import escape_mysql_identifier as q

log = logging.getLogger(__name__)


class TableAction(Enum):
    DROP = "drop"
    TRUNCATE = "truncate"


def build_insert_statement(table_name: str, schema: list[TargetColumn]) -> str:
    cols = ", ".join(q(c.column_name) for c in schema)
    return f"INSERT INTO {q(table_name)} ({cols}) VALUES"


def build_reset_query(tables: list[str], action: TableAction) -> str:
    return "\n".join(f"{action.value.upper()} TABLE {q(t)};" for t in tables)


def build_create_table_query(table_name: str, schema: list[TargetColumn]) -> str:
    cols = []
    for c in schema:
        s = f"{q(c.column_name)} {c.data_type.to_sql()}"
        if isinstance(c.constraint, PrimaryKey):
            s += " PRIMARY KEY"
        s += " NULL" if c.is_nullable else " NOT NULL"
        cols.append(s)
    return f"CREATE TABLE {q(table_name)} ({', '.join(cols)})"


def build_create_constraints(
    table_name: str,
    schema: list[TargetColumn],
    migrated_tables: list[str],
) -> str | None:
    """ALTER TABLE clause list; FKs to tables outside this migration are
    skipped (warn) since the referenced table won't exist on the target."""
    clauses: list[str] = []
    for c in schema:
        con = c.constraint
        if con is None or isinstance(con, PrimaryKey):
            continue
        if isinstance(con, ForeignKey):
            if con.referenced_table not in migrated_tables:
                log.warning(
                    "Skipping constraint in table %s on column `%s` with foreign key "
                    "reference to `%s.%s`",
                    table_name, c.column_name, con.referenced_table, con.referenced_column,
                )
                continue
            clauses.append(
                f"ADD FOREIGN KEY({q(c.column_name)}) REFERENCES "
                f"{q(con.referenced_table)}({q(con.referenced_column)}) ON DELETE CASCADE"
            )
        elif isinstance(con, Unique):
            clauses.append(f"ADD UNIQUE({q(c.column_name)})")
        elif isinstance(con, Check):
            clauses.append(f"ADD CHECK ({con.clause})")
        elif isinstance(con, Default):
            clauses.append(f"ADD DEFAULT {con.value}")
    if not clauses:
        return None
    return f"SET FOREIGN_KEY_CHECKS=0; ALTER TABLE {q(table_name)} {', '.join(clauses)}"

"""SQL identifier quoting + string-literal escaping.

Mirrors ``/root/reference/src/common/sql.rs:3-18``. Needed only at the DDL /
generated-query boundary — the Spark data path binds values through the JDBC
writer and never renders row values into SQL text (unlike the reference,
which renders every cell as a literal, ``src/extract/format.rs``).
"""

from __future__ import annotations


def escape_mssql_identifier(name: str) -> str:
    """``my]table`` -> ``[my]]table]``"""
    return "[" + name.replace("]", "]]") + "]"


def escape_mysql_identifier(name: str) -> str:
    """``my`table`` -> ```my``table```"""
    return "`" + name.replace("`", "``") + "`"


def escape_sql_string(value: str) -> str:
    """Backslashes escaped, single quotes doubled: ``O'Brien`` -> ``O''Brien``."""
    return value.replace("\\", "\\\\").replace("'", "''")

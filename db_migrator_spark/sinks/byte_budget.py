"""Byte-budget batched INSERT assembly — exact parity with the reference's
packet batching, distributed via ``foreachPartition``.

The reference accumulates rendered rows into one buffer and flushes when
``RESERVED_BYTES(10) + buffered + next_row`` would exceed ``max_packet_bytes``
(``/root/reference/src/migrate/table_migrator.rs:19,116-167``); each flush
executes transactionally with FK checks toggled off
(``src/insert/inserter.rs:88-111``). Spark's JDBC writer normally replaces
all of this (row-count ``batchsize`` + server-side packet rewriting), but
when byte-exact packet control matters (strict ``max_allowed_packet``
targets), this sink reproduces it:

- ``assemble_batches`` is the pure, unit-testable core (mirrors the mock
  scenario splitting at max_packet_bytes=50, ``src/migrate/tests.rs:474-592``);
- ``write_with_byte_budget`` runs it inside ``foreachPartition``: each
  partition renders its rows (``common.rendering``), assembles packets and
  hands them to an executor callback (a JDBC connection per partition in
  production, a collector in tests).

Scale: the driver never sees a row; per-partition memory is one packet
buffer (= max_packet_bytes). Parallelism = partition count, exactly like
the stock JDBC writer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from ..common.rendering import render_literal
from ..common.schema import TargetColumn
from ..migrate.ddl import build_insert_statement

RESERVED_BYTES = 10  # reference: table_migrator.rs:19


def render_row(row: Iterable[object]) -> str:
    """One ``(v1, v2, ...)`` values group."""
    return "(" + ", ".join(render_literal(v) for v in row) + ")"


def assemble_batches(
    insert_prefix: str,
    rendered_rows: Iterable[str],
    max_packet_bytes: int,
) -> Iterator[tuple[str, int]]:
    """Yield ``(statement, n_rows)`` packets.

    Flush rule (reference parity): the byte count is seeded with the INSERT
    prefix length — the reference initializes ``total_bytes`` with
    ``insert_statement.len()`` (table_migrator.rs:128-144) — and a packet
    flushes when ``RESERVED_BYTES + total + len(next_row) > max_packet_bytes``;
    a final partial packet is always flushed. A single row that alone busts
    the budget still goes out (as the reference does).
    """
    base = len(insert_prefix) + 1  # prefix + the space before the values
    buffer: list[str] = []
    total = base
    for row in rendered_rows:
        extra = len(row) + (2 if buffer else 0)  # ", " separator
        if buffer and RESERVED_BYTES + total + extra > max_packet_bytes:
            yield insert_prefix + " " + ", ".join(buffer), len(buffer)
            buffer, total = [], base
            extra = len(row)
        buffer.append(row)
        total += extra
    if buffer:
        yield insert_prefix + " " + ", ".join(buffer), len(buffer)


def write_with_byte_budget(
    df: DataFrame,
    table: str,
    schema: list[TargetColumn],
    max_packet_bytes: int,
    execute: Callable[[str], None],
) -> None:
    """Distributed byte-budget write: assemble + execute per partition.

    ``execute`` runs on executors — it must be picklable and open its own
    connection (e.g. a closure building a mysql connection from config).
    """
    prefix = build_insert_statement(table, schema)

    def handle_partition(rows) -> None:
        rendered = (render_row(r) for r in rows)
        for statement, _ in assemble_batches(prefix, rendered, max_packet_bytes):
            execute(statement)

    df.foreachPartition(handle_partition)

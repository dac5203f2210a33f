"""Transactional DB-API partition writer — the live-DB data path factored
so the wire protocol is testable without a server.

The reference streams each table over one connection inside an explicit
transaction (``/root/reference/src/insert/inserter.rs:89-111``):

    BEGIN -> SET FOREIGN_KEY_CHECKS=0 -> INSERT batches
          -> SET FOREIGN_KEY_CHECKS=1 -> COMMIT
    (on error: ROLLBACK, then an error carrying a <=100-char query preview,
    or "EMPTY QUERY" when the statement was empty)

and its constraint phase re-enables FK checks best-effort BEFORE rolling
back (``inserter.rs:47-86``). This module reproduces that protocol over
any PEP 249 connection, shaped for Spark: ``partition_writer`` returns a
picklable callback for ``df.foreachPartition``, so on a cluster every
partition opens its own connection and runs the same transaction —
table-level parallelism becomes partition-level parallelism.

Sandbox verification (no MySQL here, same as the reference's mock-only
tests at ``src/migrate/tests.rs:92-182``): a recording fake connection
pins the statement/commit/rollback ordering, and sqlite3 — a real DB-API
driver in the stdlib — exercises the identical code path end-to-end under
``df.foreachPartition`` (tests/test_dbapi_sink.py).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable, Iterator

log = logging.getLogger(__name__)

# MySQL session toggles, overridable per dialect (sqlite tests use PRAGMAs;
# a dialect with no toggle passes None).
FK_OFF = "SET FOREIGN_KEY_CHECKS=0"
FK_ON = "SET FOREIGN_KEY_CHECKS=1"


def _preview(query: str, limit: int = 100) -> str:
    """Error preview exactly as the reference builds it (inserter.rs:96-101):
    first 100 chars, or the literal "EMPTY QUERY" marker."""
    return query[:limit] if query else "EMPTY QUERY"


class TransactionError(RuntimeError):
    """Raised after a rollback; message carries the query preview."""


def _rollback_and_raise(conn, message: str, err: Exception) -> None:
    """Best-effort rollback, then the module's typed error. The rollback
    itself is guarded: on a dead connection it raises too, and the caller
    must still get TransactionError (with the original cause), not the
    driver's rollback exception."""
    try:
        conn.rollback()
    except Exception:
        pass  # connection may already be dead; the raise below reports why
    raise TransactionError(f"{message}. Error: {err}") from err


def _finalize(conn, cur, fk_on: str | None) -> None:
    """FK re-enable + COMMIT, shared by both transactional entry points:
    if either step fails, the connection must not be left holding an open
    transaction (and its row locks) — roll back and surface the step that
    actually failed."""
    step = "COMMIT"
    try:
        if fk_on:
            step = fk_on
            cur.execute(fk_on)
        step = "COMMIT"
        conn.commit()
    except Exception as err:
        _rollback_and_raise(
            conn, f"Cannot finalize transaction ({_preview(step)})", err
        )


def execute_transactional(
    conn,
    query: str,
    *,
    fk_off: str | None = FK_OFF,
    fk_on: str | None = FK_ON,
) -> None:
    """One statement inside the reference's FK-bracketed transaction.

    The FK re-enable runs INSIDE the transaction before COMMIT — it is a
    session variable, so it must be restored on the same connection, and
    putting it before COMMIT matches inserter.rs:108-110 exactly.
    """
    cur = conn.cursor()
    try:
        if fk_off:
            cur.execute(fk_off)
        try:
            cur.execute(query)
        except Exception as err:
            _rollback_and_raise(
                conn, f"Cannot execute transaction query: {_preview(query)}", err
            )
        _finalize(conn, cur, fk_on)
    finally:
        cur.close()


def execute_constraints_tx(
    conn,
    query: str,
    *,
    table: str = "",
    fk_off: str | None = FK_OFF,
    fk_on: str | None = FK_ON,
) -> bool:
    """Best-effort constraint DDL (inserter.rs:47-86): on failure, warn,
    re-enable FK checks best-effort, then roll back — never raises.
    Returns True when the constraints committed."""
    cur = conn.cursor()
    try:
        if fk_off:
            cur.execute(fk_off)
        try:
            cur.execute(query)
        except Exception as err:
            log.warning(
                "Constraints creation failed for table: %s, query: '%s'. Error: %s",
                table,
                query,
                err,
            )
            if fk_on:
                try:
                    cur.execute(fk_on)
                except Exception:
                    pass  # best-effort, mirroring the reference's `let _ =`
            conn.rollback()
            return False
        conn.commit()
        return True
    finally:
        cur.close()


def write_rows_transactional(
    conn,
    table: str,
    columns: list[str],
    rows: Iterable[tuple],
    *,
    batchsize: int = 10_000,
    placeholder: str = "%s",
    quote: str = "`",
    fk_off: str | None = FK_OFF,
    fk_on: str | None = FK_ON,
) -> int:
    """Stream rows into ``table`` as ONE transaction of executemany batches.

    The whole partition is a single BEGIN..COMMIT, like the reference's
    per-table transaction: a mid-stream failure rolls back every batch of
    this partition (and only this partition), so a retried Spark task
    re-inserts nothing twice. Returns the number of rows written.
    """
    cols = ", ".join(quote + c + quote for c in columns)
    params = ", ".join([placeholder] * len(columns))
    insert = f"INSERT INTO {quote}{table}{quote} ({cols}) VALUES ({params})"
    cur = conn.cursor()
    n = 0
    try:
        if fk_off:
            cur.execute(fk_off)
        batch: list[tuple] = []
        try:
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= batchsize:
                    cur.executemany(insert, batch)
                    n += len(batch)
                    batch.clear()
            if batch:
                cur.executemany(insert, batch)
                n += len(batch)
        except Exception as err:
            _rollback_and_raise(
                conn, f"Cannot execute transaction query: {_preview(insert)}", err
            )
        _finalize(conn, cur, fk_on)
    finally:
        cur.close()
    return n


def partition_writer(
    conn_factory: Callable[[], object],
    table: str,
    columns: list[str],
    *,
    batchsize: int = 10_000,
    placeholder: str = "%s",
    quote: str = "`",
    fk_off: str | None = FK_OFF,
    fk_on: str | None = FK_ON,
) -> Callable[[Iterator], None]:
    """Build the ``df.foreachPartition`` callback: each partition opens its
    own connection via ``conn_factory`` (which must be picklable — a
    top-level function or functools.partial over one) and runs the
    FK-bracketed transaction. This is the cluster shape: N partitions = N
    concurrent connections, each transactional and independently retryable.
    """

    def write_partition(rows: Iterator) -> None:
        conn = conn_factory()
        try:
            write_rows_transactional(
                conn,
                table,
                columns,
                rows,
                batchsize=batchsize,
                placeholder=placeholder,
                quote=quote,
                fk_off=fk_off,
                fk_on=fk_on,
            )
        finally:
            conn.close()

    return write_partition

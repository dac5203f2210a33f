"""Transaction-protocol tests for the DB-API sink — the live-DB seam
verified without a server, mirroring the reference's mock-only strategy
(/root/reference/src/migrate/tests.rs:92-182).

Two layers:
- a recording fake connection pins the exact statement/commit/rollback
  ordering of the reference protocol (inserter.rs:89-111);
- sqlite3 (a real PEP 249 driver) runs the identical code path end-to-end
  under ``df.foreachPartition`` and the rows are read back and compared.
"""

import os
import sqlite3
import tempfile

import pytest

from db_migrator_spark.sinks.dbapi_sink import (
    TransactionError,
    execute_constraints_tx,
    execute_transactional,
    partition_writer,
    write_rows_transactional,
)


class FakeCursor:
    def __init__(self, conn):
        self.conn = conn

    def execute(self, sql, params=None):
        for trigger in self.conn.fail_on:
            if trigger == sql or (trigger and trigger in sql):
                self.conn.trace.append(("error", sql))
                raise RuntimeError(f"boom on {trigger}")
        self.conn.trace.append(("execute", sql))

    def executemany(self, sql, seq):
        seq = list(seq)
        for trigger in self.conn.fail_on:
            if trigger == sql or (trigger and trigger in sql):
                self.conn.trace.append(("error", sql))
                raise RuntimeError(f"boom on {trigger}")
        self.conn.trace.append(("executemany", sql, len(seq)))
        self.conn.rows.extend(seq)

    def close(self):
        self.conn.trace.append(("cursor_close",))


class FakeConn:
    """Recording PEP 249 connection: every call lands in .trace in order."""

    def __init__(self, fail_on=()):
        self.trace = []
        self.rows = []
        self.fail_on = tuple(fail_on)

    def cursor(self):
        return FakeCursor(self)

    def commit(self):
        self.trace.append(("commit",))

    def rollback(self):
        self.trace.append(("rollback",))

    def close(self):
        self.trace.append(("close",))


def ops(conn):
    return [t[0] for t in conn.trace]


def test_transactional_query_protocol_order():
    conn = FakeConn()
    execute_transactional(conn, "CREATE TABLE t (a INT)")
    assert conn.trace[0] == ("execute", "SET FOREIGN_KEY_CHECKS=0")
    assert conn.trace[1] == ("execute", "CREATE TABLE t (a INT)")
    assert conn.trace[2] == ("execute", "SET FOREIGN_KEY_CHECKS=1")
    # FK re-enable runs INSIDE the transaction, before COMMIT
    assert ops(conn) == ["execute", "execute", "execute", "commit", "cursor_close"]


def test_transactional_query_rolls_back_with_preview():
    conn = FakeConn(fail_on=["CREATE TABLE"])
    long_query = "CREATE TABLE " + "x" * 200
    with pytest.raises(TransactionError) as ei:
        execute_transactional(conn, long_query)
    assert "rollback" in ops(conn) and "commit" not in ops(conn)
    # preview is the first 100 chars, exactly like inserter.rs:96-101
    assert long_query[:100] in str(ei.value)
    assert long_query not in str(ei.value)


def test_empty_query_preview():
    conn = FakeConn(fail_on=[""])  # empty trigger matches everything
    with pytest.raises(TransactionError) as ei:
        execute_transactional(conn, "")
    assert "EMPTY QUERY" in str(ei.value)


def test_constraints_failure_reenables_fk_then_rolls_back():
    conn = FakeConn(fail_on=["ALTER TABLE"])
    ok = execute_constraints_tx(conn, "ALTER TABLE t ADD CONSTRAINT ...", table="t")
    assert ok is False
    # best-effort FK re-enable happens BEFORE rollback (inserter.rs:77-79)
    labels = conn.trace
    i_err = labels.index(("error", "ALTER TABLE t ADD CONSTRAINT ..."))
    i_fk_on = labels.index(("execute", "SET FOREIGN_KEY_CHECKS=1"))
    i_rb = labels.index(("rollback",))
    assert i_err < i_fk_on < i_rb
    assert "commit" not in ops(conn)


def test_constraints_success_commits():
    conn = FakeConn()
    assert execute_constraints_tx(conn, "ALTER TABLE t ADD PRIMARY KEY (a)") is True
    # parity quirk: the reference's constraint success path commits WITHOUT
    # re-enabling FK checks (inserter.rs:81) — only the failure path does
    assert ops(conn) == ["execute", "execute", "commit", "cursor_close"]


def test_write_rows_batches_and_single_commit():
    conn = FakeConn()
    n = write_rows_transactional(
        conn, "t", ["a", "b"], [(i, i * 2) for i in range(25)], batchsize=10
    )
    assert n == 25
    batches = [t for t in conn.trace if t[0] == "executemany"]
    assert [b[2] for b in batches] == [10, 10, 5]
    assert batches[0][1] == "INSERT INTO `t` (`a`, `b`) VALUES (%s, %s)"
    # ONE commit for the whole partition, after the FK re-enable
    assert ops(conn).count("commit") == 1
    assert ops(conn)[-2:] == ["commit", "cursor_close"]


def test_write_rows_mid_stream_failure_rolls_back_everything():
    conn = FakeConn(fail_on=["INSERT"])
    with pytest.raises(TransactionError) as ei:
        write_rows_transactional(conn, "t", ["a"], [(1,), (2,)], batchsize=1)
    assert "rollback" in ops(conn) and "commit" not in ops(conn)
    assert "INSERT INTO `t`" in str(ei.value)


# -- end-to-end through Spark into a real DB-API driver (sqlite3) ----------


def _sqlite_factory(path):
    import functools

    return functools.partial(sqlite3.connect, path, timeout=60)


def test_foreach_partition_writes_through_real_dbapi(spark):
    """The exact partition callback a cluster would run, against sqlite —
    a genuine PEP 249 connection-per-partition write, read back via SQL."""
    db = os.path.join(tempfile.mkdtemp(prefix="dbapi_sink_"), "t.db")
    init = sqlite3.connect(db)
    init.execute("CREATE TABLE target (k INTEGER, v TEXT)")
    # sqlite serializes writers; WAL lets 4 partition connections interleave
    init.execute("PRAGMA journal_mode=WAL")
    init.commit()
    init.close()

    df = spark.range(0, 1000).selectExpr("id AS k", "CAST(id * 7 AS STRING) AS v")
    writer = partition_writer(
        _sqlite_factory(db),
        "target",
        ["k", "v"],
        batchsize=64,
        placeholder="?",  # sqlite is qmark-style
        quote='"',
        fk_off="PRAGMA foreign_keys=OFF",  # dialect-mapped session toggle
        fk_on="PRAGMA foreign_keys=ON",
    )
    df.repartition(4).foreachPartition(writer)

    check = sqlite3.connect(db)
    n, ksum = check.execute("SELECT COUNT(*), SUM(k) FROM target").fetchone()
    distinct = check.execute("SELECT COUNT(DISTINCT k) FROM target").fetchone()[0]
    sample = check.execute("SELECT v FROM target WHERE k = 321").fetchone()[0]
    check.close()
    assert n == 1000 and distinct == 1000  # exactly-once per partition
    assert ksum == 999 * 1000 // 2
    assert sample == "2247"


def test_failing_fk_reenable_rolls_back_and_raises():
    """A failure on the FK re-enable (or commit) must not strand an open
    transaction: rollback happens and a TransactionError with a preview
    surfaces — same contract as a failing INSERT."""
    conn = FakeConn(fail_on=("FOREIGN_KEY_CHECKS=1",))
    with pytest.raises(TransactionError, match="finalize"):
        write_rows_transactional(conn, "t", ["a"], [(1,), (2,)], batchsize=10)
    assert ("rollback",) in conn.trace
    assert ("commit",) not in conn.trace

    conn2 = FakeConn(fail_on=("FOREIGN_KEY_CHECKS=1",))
    with pytest.raises(TransactionError, match="finalize"):
        execute_transactional(conn2, "INSERT INTO t VALUES (1)")
    assert ("rollback",) in conn2.trace
    assert ("commit",) not in conn2.trace


def test_failing_commit_names_commit_not_fk():
    """When the COMMIT itself fails (FK re-enable succeeded), the error
    preview must name COMMIT, not the statement that worked; and a dead
    connection's failing rollback must not mask the TransactionError."""

    class CommitFailConn(FakeConn):
        def commit(self):
            self.trace.append(("commit_attempt",))
            raise RuntimeError("server went away")

        def rollback(self):
            raise RuntimeError("rollback also dead")

    conn = CommitFailConn()
    with pytest.raises(TransactionError, match=r"finalize transaction \(COMMIT\)"):
        write_rows_transactional(conn, "t", ["a"], [(1,)])
    # FK re-enable DID run before the commit attempt
    assert ("execute", "SET FOREIGN_KEY_CHECKS=1") in conn.trace

"""Byte-budget batching — reference scenarios src/migrate/tests.rs:474-592."""

from db_migrator_spark.common.mssql_types import MssqlType
from db_migrator_spark.common.schema import ColumnSchema
from db_migrator_spark.migrate.schema_mapper import map_schema
from db_migrator_spark.migrate.type_registry import TypeRegistry
from db_migrator_spark.sinks.byte_budget import (
    assemble_batches,
    render_row,
    write_with_byte_budget,
)


def test_empty_input_yields_nothing():
    assert list(assemble_batches("INSERT INTO `t` (`x`) VALUES", [], 100)) == []


def test_single_batch_content():
    rows = [render_row([1, "alice"]), render_row([2, "o'brien"])]
    batches = list(assemble_batches("INSERT INTO `Users` (`id`, `name`) VALUES", rows, 1_000_000))
    assert batches == [
        ("INSERT INTO `Users` (`id`, `name`) VALUES (1, 'alice'), (2, 'o''brien')", 2)
    ]


def test_multi_batch_split_at_tiny_budget():
    """The reference's tiny-budget scenario: rows split across multiple
    packets, all rows delivered, order preserved, and every multi-row
    packet's FULL statement (prefix included, reference parity) fits the
    budget."""
    prefix = "INSERT INTO `t` (`x`) VALUES"
    budget = len(prefix) + 1 + 10 + 12  # room for ~2 tiny rows of values
    rows = [render_row([i]) for i in range(10)]
    batches = list(assemble_batches(prefix, rows, budget))
    assert len(batches) > 1
    assert sum(n for _, n in batches) == 10
    for stmt, n in batches:
        assert 10 + len(stmt) <= budget or n == 1
    # reassembled order preserved
    joined = ", ".join(s.removeprefix(prefix + " ") for s, _ in batches)
    assert joined == ", ".join(f"({i})" for i in range(10))


def test_oversized_single_row_still_flushes():
    prefix = "INSERT INTO `t` (`x`) VALUES"
    big = render_row(["x" * 200])
    batches = list(assemble_batches(prefix, [big], 50))
    assert len(batches) == 1 and batches[0][1] == 1


def test_foreach_partition_write(spark, tmp_path):
    """Distributed path: every row lands in some packet; packets execute
    per partition (collected via files, since executors can't append to a
    driver list)."""
    out = tmp_path / "stmts"
    out.mkdir()
    df = spark.createDataFrame([(i, f"name{i}") for i in range(100)], "id int, name string")
    df = df.repartition(4)
    registry = TypeRegistry.with_defaults()
    cols = [
        ColumnSchema("id", MssqlType.INT, is_nullable=False),
        ColumnSchema("name", MssqlType.VARCHAR, character_maximum_length=50),
    ]
    target = map_schema(registry, "t", cols, False)

    out_dir = str(out)

    def execute(stmt: str) -> None:
        import os
        import uuid

        with open(os.path.join(out_dir, f"{uuid.uuid4().hex}.sql"), "w") as f:
            f.write(stmt)

    write_with_byte_budget(df, "t", target, 200, execute)

    import re

    rows_seen = set()
    for p in out.iterdir():
        stmt = p.read_text()
        assert stmt.startswith("INSERT INTO `t` (`id`, `name`) VALUES ")
        assert 10 + len(stmt) <= 200  # full statement fits the budget
        rows_seen.update(int(m) for m in re.findall(r"\((\d+), ", stmt))
    assert rows_seen == set(range(100))

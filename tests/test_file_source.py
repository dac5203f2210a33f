"""Multi-format FileExtractor: CSV/JSONL catalog, schema derivation, and
the full migrate pipeline from text formats into a parquet target."""

import os

import pytest

from db_migrator_spark.migrate.migrator import DatabaseMigrator, MigrationOptions
from db_migrator_spark.sinks.parquet_sink import ParquetInserter
from db_migrator_spark.sources.file_source import FileExtractor


@pytest.fixture()
def src_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "People.csv").write_text(
        "PersonId,FullName,Score\n1,Ada Lovelace,9.5\n2,Edsger Dijkstra,9.9\n3,Grace Hopper,9.8\n"
    )
    (src / "Visits.jsonl").write_text(
        '{"VisitId": 10, "PersonId": 1, "Site": "a.example"}\n'
        '{"VisitId": 11, "PersonId": 2, "Site": "b.example"}\n'
    )
    return str(src)


def test_catalog_and_schema(spark, src_dir):
    ex = FileExtractor(spark, src_dir)
    assert ex.fetch_tables() == ["People", "Visits"]
    cols = {c.column_name: c.data_type.value for c in ex.get_table_schema("People")}
    # CSV inference: int -> INT, double -> FLOAT(mssql float=double), string -> NVARCHAR
    assert cols["PersonId"] == "int"
    assert cols["Score"] == "float"
    assert cols["FullName"] == "nvarchar"


def test_migrate_csv_and_jsonl_to_parquet(spark, src_dir, tmp_path):
    tgt = str(tmp_path / "tgt")
    inserter = ParquetInserter(spark, tgt)
    results = DatabaseMigrator(
        FileExtractor(spark, src_dir),
        inserter,
        options=MigrationOptions(all_tables=True),
    ).run()
    assert sorted(r.rows_migrated for r in results) == [2, 3]
    people = spark.read.parquet(os.path.join(tgt, "people"))
    rows = {r.person_id: r.full_name for r in people.collect()}
    assert rows == {1: "Ada Lovelace", 2: "Edsger Dijkstra", 3: "Grace Hopper"}
    visits = spark.read.parquet(os.path.join(tgt, "visits"))
    assert {r.site for r in visits.collect()} == {"a.example", "b.example"}


def test_same_table_two_formats_rejected(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "T.csv").write_text("a\n1\n")
    (src / "T.jsonl").write_text('{"a": 1}\n')
    with pytest.raises(ValueError, match="two formats"):
        FileExtractor(spark, str(src))

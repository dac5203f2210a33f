"""Extractor protocol — the source-side seam.

Mirrors the reference's extractor trait surface
(``/root/reference/src/extract/traits.rs``, ``extractor.rs``): catalog scan,
per-table schema scan, and a table read. The row stream becomes a DataFrame:
Spark's scan is lazy and partition-parallel, which strictly generalizes the
reference's single-connection pull stream.

The mock-based integration tests exploit this seam exactly as the
reference's ``MockExtractor`` does (``src/migrate/tests.rs:27-86``).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

from ..common.schema import ColumnSchema


@runtime_checkable
class Extractor(Protocol):
    def fetch_tables(self) -> list[str]:
        """List base tables in the source catalog."""
        ...

    def get_table_schema(self, table: str) -> list[ColumnSchema]:
        """Column + constraint metadata for one table."""
        ...

    def read_table(self, table: str) -> DataFrame:
        """The full-table scan as a (lazy) DataFrame."""
        ...

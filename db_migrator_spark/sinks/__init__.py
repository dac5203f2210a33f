"""Sinks: DDL + data writers with the reference's guard semantics
(reference: ``src/insert/``)."""

from .base import Inserter
from .parquet_sink import ParquetInserter

__all__ = ["Inserter", "ParquetInserter"]

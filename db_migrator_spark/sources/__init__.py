"""Sources: catalog scan, schema scan, table read (reference: ``src/extract/``)."""

from .base import Extractor
from .parquet_source import ParquetExtractor

__all__ = ["Extractor", "ParquetExtractor"]

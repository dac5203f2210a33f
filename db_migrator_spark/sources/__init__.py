"""Sources: catalog scan, schema scan, table read (reference: ``src/extract/``)."""

from .base import Extractor
from .file_source import FileExtractor
from .parquet_source import ParquetExtractor

__all__ = ["Extractor", "FileExtractor", "ParquetExtractor"]

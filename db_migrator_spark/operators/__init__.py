"""Analytics operator surface.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` (ANSI SQL for the DuckDB oracle; a key absent
from ORACLES means the op is not SQL-expressible and gets a rows-only check).
``__spark_entry__`` at the repo root merges them all.
"""

"""db_migrator_spark — a PySpark-native data engine with the capabilities of
bitalizer/db-migrator (MSSQL -> MySQL schema + data migration), rebuilt
Spark-first and extended with the relational + LLM-data-pipeline operator
surface a 100 TB training-data platform needs.

Layout
------
- ``common/``    pure, deterministic core: naming, type systems, constraints,
                 SQL identifier/literal rendering (reference: ``src/common/``).
- ``migrate/``   type registry, schema mapper, DDL builders, orchestrator
                 (reference: ``src/migrate/``, ``src/insert/``).
- ``sources/``   catalog + schema + row scan abstractions: Parquet (tests)
                 and JDBC (live parity) (reference: ``src/extract/``).
- ``sinks/``     Parquet + JDBC writers with the reference's guard semantics
                 (reference: ``src/insert/``).
- ``operators/`` the analytics surface: relational queries, dedup,
                 similarity search, text analysis, multimodal plumbing.
- ``streaming/`` Structured Streaming windows/sessionization/stateful ops.

Everything here is public-API PySpark (DataFrame/SQL/Catalyst/Structured
Streaming); data never collects to the driver except final small results.
"""

__version__ = "0.1.0"

"""Pure, deterministic core: naming, type systems, constraints, SQL text.

No Spark dependency in this package (except ``schema.py``'s optional
StructType bridge) — everything is unit-testable without a JVM.
"""

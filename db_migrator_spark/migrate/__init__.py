"""Migration pipeline: type registry, schema mapper, DDL, orchestration."""

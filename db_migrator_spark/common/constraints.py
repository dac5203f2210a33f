"""Column constraint model + wire-format parser.

The source metadata scan emits one constraint string per column
(``'PRIMARY KEY'``, ``'FOREIGN KEY,tbl,col'``, ``'UNIQUE'``,
``'CHECK (...)'``, ``'DEFAULT ...'``); semantics mirror
``/root/reference/src/common/constraints.rs:16-55`` including the malformed-FK
error and unknown-string -> None behavior.

Spark has no native constraint enforcement; constraints ride through the
pipeline as sidecar metadata (``StructField.metadata['constraint']``) and are
emitted as DDL by the sink.
"""

from __future__ import annotations

from dataclasses import dataclass


class ConstraintParseError(ValueError):
    def __init__(self, value: str, reason: str):
        self.value = value
        self.reason = reason
        super().__init__(f"Failed to parse constraint '{value}': {reason}")


@dataclass(frozen=True)
class PrimaryKey:
    pass


@dataclass(frozen=True)
class ForeignKey:
    referenced_table: str
    referenced_column: str


@dataclass(frozen=True)
class Unique:
    pass


@dataclass(frozen=True)
class Check:
    clause: str


@dataclass(frozen=True)
class Default:
    value: str


Constraint = PrimaryKey | ForeignKey | Unique | Check | Default


def parse_constraint(s: str) -> Constraint | None:
    s = s.strip()
    if not s:
        return None
    if s.startswith("PRIMARY KEY"):
        return PrimaryKey()
    if s.startswith("FOREIGN KEY"):
        parts = [p.strip() for p in s.split(",")]
        if len(parts) != 3:
            raise ConstraintParseError(
                s, f"FOREIGN KEY constraint requires 3 comma-separated parts, got {len(parts)}"
            )
        return ForeignKey(referenced_table=parts[1], referenced_column=parts[2])
    if s == "UNIQUE":
        return Unique()
    if s.startswith("CHECK"):
        # Store the bare predicate. (The reference's parser keeps the
        # "CHECK (" prefix — constraints.rs:48 trim_matches only strips the
        # outer parens from the string ends — which renders doubled DDL at
        # query.rs:79; we implement the intended semantics instead.)
        clause = s.removeprefix("CHECK").strip()
        if clause.startswith("(") and clause.endswith(")"):
            clause = clause[1:-1].strip()
        return Check(clause)
    if s.startswith("DEFAULT"):
        return Default(s.removeprefix("DEFAULT "))
    return None


def constraint_to_wire(c: Constraint | None) -> str:
    """Inverse of parse_constraint, for sidecar metadata serialization."""
    if c is None:
        return ""
    if isinstance(c, PrimaryKey):
        return "PRIMARY KEY"
    if isinstance(c, ForeignKey):
        return f"FOREIGN KEY,{c.referenced_table},{c.referenced_column}"
    if isinstance(c, Unique):
        return "UNIQUE"
    if isinstance(c, Check):
        return f"CHECK ({c.clause})"
    if isinstance(c, Default):
        return f"DEFAULT {c.value}"
    raise TypeError(f"unknown constraint {c!r}")

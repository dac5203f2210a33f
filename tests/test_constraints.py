"""Constraint parsing — reference: constraints.rs:58-142."""

import pytest

from db_migrator_spark.common.constraints import (
    Check,
    ConstraintParseError,
    Default,
    ForeignKey,
    PrimaryKey,
    Unique,
    constraint_to_wire,
    parse_constraint,
)


@pytest.mark.parametrize(
    ("wire", "expected"),
    [
        ("PRIMARY KEY", PrimaryKey()),
        ("FOREIGN KEY,Users,Id", ForeignKey("Users", "Id")),
        ("FOREIGN KEY, Users , Id ", ForeignKey("Users", "Id")),
        ("UNIQUE", Unique()),
        ("CHECK (Quantity > 0)", Check("Quantity > 0")),
        ("CHECK (age > 0)", Check("age > 0")),
        ("DEFAULT getdate()", Default("getdate()")),
        ("", None),
        ("   ", None),
        ("SOMETHING ELSE", None),
    ],
)
def test_parse(wire, expected):
    assert parse_constraint(wire) == expected


def test_malformed_fk():
    with pytest.raises(ConstraintParseError, match="3 comma-separated parts, got 2"):
        parse_constraint("FOREIGN KEY,OnlyTable")
    with pytest.raises(ConstraintParseError, match="got 4"):
        parse_constraint("FOREIGN KEY,a,b,c")


@pytest.mark.parametrize(
    "c",
    [PrimaryKey(), ForeignKey("Users", "Id"), Unique(), Default("getdate()"), None],
)
def test_wire_round_trip(c):
    assert parse_constraint(constraint_to_wire(c)) == c

"""The in-driver diagnostic capture must hash EXACTLY like the local
gate, or captured diagnostics hashes (docs/DIAGNOSTICS_r9.json and any
future DIAGNOSTICS.json) can't be compared against verify_oracle output
and the triage reads garbage."""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math


def _load_verify_oracle():
    spec = importlib.util.spec_from_file_location(
        "verify_oracle", "/root/repo/tools/verify_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TRICKY_ROWS = [
    (None, 1.5, "x"),
    (float("nan"), -0.0, "y"),
    (datetime.date(2024, 2, 29), datetime.datetime(2024, 1, 1, 3, 4, 5), ""),
    ([1, None, 3], b"\x00\xff", "unicode é中"),
    (decimal.Decimal("1234567890123456789012345678"), -(2**62), "neg"),
    (math.pi, 10**18, "big"),
]
COLS = ["zeta", "alpha", "mid"]  # unsorted on purpose


def test_diag_hash_matches_verify_oracle_hash():
    from db_migrator_spark import diagnostics as diag

    vo = _load_verify_oracle()
    assert diag._table(COLS, TRICKY_ROWS)["hash"] == vo.table_hash(
        COLS, TRICKY_ROWS
    )
    for row in TRICKY_ROWS:
        for v in row:
            assert diag._normalize(v) == vo.normalize(v), v


def test_red_query_set_is_declared_and_wrapped():
    """Every computed red query must be a declared queries() entry (a
    stale artifact name would capture nothing), and as of the latest
    committed CORRECTNESS artifacts the capture set is the 8 round-8
    reds — this pin moves WITH the artifacts: after a green round it
    asserts the set emptied."""
    import glob
    import os

    import __spark_entry__ as e
    from db_migrator_spark.diagnostics import RED_QUERIES

    declared = set(e.queries())
    missing = sorted(set(RED_QUERIES) - declared)
    assert not missing, f"red queries not declared: {missing}"
    newest = max(
        int("".join(c for c in os.path.basename(p) if c.isdigit()))
        for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
    )
    if newest <= 8:
        assert len(RED_QUERIES) == 8, RED_QUERIES
    elif newest <= 10:
        # r9 turned every red green; the self-maintaining set must have
        # emptied itself (a stale non-empty set would re-run captures in
        # the driver's timed path for no reason). Pinned only for the
        # rounds KNOWN green — a future red round must populate the set
        # (that is the design), not break this test.
        assert RED_QUERIES == (), RED_QUERIES

"""snake_case tests — cases ported from /root/reference/src/common/helpers.rs:48-126."""

import pytest
from hypothesis import given, strategies as st

from db_migrator_spark.common.naming import format_snake_case


@pytest.mark.parametrize(
    ("src", "expected"),
    [
        ("TableName", "table_name"),
        ("MyTableName", "my_table_name"),
        ("MyID", "my_id"),
        ("HTMLParser", "html_parser"),
        ("already_snake", "already_snake"),
        ("A", "a"),
        ("", ""),
        ("ABC", "abc"),
        ("lowercase", "lowercase"),
        ("Table1Name", "table1_name"),
        ("UserID", "user_id"),
        ("XMLHTTPRequest", "xmlhttp_request"),
        ("Users", "users"),
        ("my_Table", "my_table"),
        ("Column123", "column123"),
        # FIXTURES.md A.2 extras
        ("AccountId", "account_id"),
        ("UserName", "user_name"),
        ("UserAccounts", "user_accounts"),
    ],
)
def test_snake_case(src, expected):
    assert format_snake_case(src) == expected


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_idempotent(s):
    once = format_snake_case(s)
    assert format_snake_case(once) == once


@given(st.text(max_size=40))
def test_no_uppercase_in_output(s):
    assert not any(c.isupper() and c.isascii() for c in format_snake_case(s))

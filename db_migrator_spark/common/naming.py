"""snake_case identifier formatting with acronym handling.

Semantics match the reference's ``format_snake_case``
(``/root/reference/src/common/helpers.rs:20-46``): an underscore is inserted
before an uppercase letter when the previous character is lowercase or a
digit, or when the previous character is uppercase and the *next* one is
lowercase (the end-of-acronym boundary). Hence ``HTMLParser -> html_parser``,
``XMLHTTPRequest -> xmlhttp_request``, ``Table1Name -> table1_name``.

Applied to table names, column names, and FK targets during schema mapping —
always driver-side metadata work, never a per-row operation, so it costs the
same at 100 TB as at 1 MB.
"""

from __future__ import annotations


def format_snake_case(name: str) -> str:
    out: list[str] = []
    n = len(name)
    for i, c in enumerate(name):
        if c.isupper():
            if i > 0:
                prev = name[i - 1]
                if prev.islower() or prev.isdigit():
                    out.append("_")
                elif prev.isupper() and i + 1 < n and name[i + 1].islower():
                    out.append("_")
            out.append(c.lower())
        else:
            out.append(c)
    return "".join(out)

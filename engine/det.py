"""Determinism helpers (SURVEY.md §7.5 rule 2).

Cross-engine hash-equality of doubles needs a *portable* rounding
definition: Spark's ``round`` goes through BigDecimal HALF_UP on the
shortest decimal repr of the double, DuckDB's scales the binary value —
they disagree on knife-edge values (e.g. 37704.575 → .58 vs .57, observed
on the fixtures). ``floor(x·10ⁿ + 0.5)/10ⁿ`` uses only IEEE-754 ops
(multiply, add, floor, divide) that every engine computes bit-identically,
so equal inputs give equal rounded outputs everywhere.

``pround`` is the Spark side; ``portable_round_sql`` rewrites ``ROUND(x, n)``
in oracle SQL strings to the same formula, so oracle authors keep writing
readable ROUND().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int = 2) -> Column:
    """Portable round-half-up to ``n`` decimals (double → double)."""
    scale = 10**n
    return F.floor(col * scale + F.lit(0.5)) / scale


def portable_round_sql(sql: str) -> str:
    """Rewrite every ``ROUND(<expr>, <n>)`` in a SQL string to
    ``FLOOR((<expr>) * 10^n + 0.5) / 10^n`` (balanced-paren aware)."""
    out = []
    i = 0
    n_sql = len(sql)
    while i < n_sql:
        j = sql.find("ROUND(", i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        # find matching close paren
        depth = 0
        k = j + len("ROUND(") - 1  # at the '('
        top_comma = -1
        while k < n_sql:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1 and top_comma < 0:
                top_comma = k
            k += 1
        if depth != 0 or top_comma < 0:
            raise ValueError(f"unbalanced ROUND() in oracle SQL near: {sql[j:j+80]}")
        expr = portable_round_sql(sql[j + len("ROUND(") : top_comma].strip())
        digits = int(sql[top_comma + 1 : k].strip())
        scale = 10**digits
        out.append(f"FLOOR(({expr}) * {scale} + 0.5) / {scale}")
        i = k + 1
    return "".join(out)

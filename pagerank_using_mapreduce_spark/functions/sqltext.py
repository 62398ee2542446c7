"""Tiny SQL-text helpers for the *_sql oracle builders.

The oracle builders interpolate Python values into ANSI-SQL strings;
any value that is not a known-safe internal constant must go through
:func:`sql_quote` so a stray single quote cannot produce malformed (or
meaning-shifted) oracle SQL.
"""

from __future__ import annotations


def sql_quote(s: str) -> str:
    """``s`` as a single-quoted ANSI-SQL string literal, with embedded
    single quotes doubled (the standard escape DuckDB and Spark SQL
    both accept)."""
    return "'" + str(s).replace("'", "''") + "'"

"""Shared SQL-string escaping for the `*_sql` oracle-twin generators.

Every `*_sql` function in this package interpolates caller-supplied
*values* (variant names, shard names, source names) into an ANSI-SQL
string that DuckDB executes. The Spark side of each twin compares the
same values verbatim via `F.lit`, so an unescaped single quote on the
SQL side produces broken SQL — and, worse, a silent semantic divergence
between the two engines. These helpers are the single spelling of the
escaping rules (first hardened in ab_srm_check_sql, ADVICE r10; factored
out and applied package-wide in ADVICE r11):

- `sql_lit(v)`    -> `'...'`  string literal, single quotes doubled.
- `sql_ident(v)`  -> `"..."`  quoted identifier, double quotes doubled.

Both accept any object and stringify it (the twins embed ints/floats
through repr() elsewhere; these are for *names*).
"""

from __future__ import annotations


def sql_lit(v: object) -> str:
    """ANSI-SQL single-quoted string literal with '' escaping."""
    return "'" + str(v).replace("'", "''") + "'"


def sql_ident(v: object, prefix: str = "") -> str:
    """ANSI-SQL double-quoted identifier with "" escaping.

    `prefix` is prepended before quoting (e.g. prefix="n_" turns a
    variant name into its count-column identifier, the ab_srm_check_sql
    convention).
    """
    return '"' + (prefix + str(v)).replace('"', '""') + '"'

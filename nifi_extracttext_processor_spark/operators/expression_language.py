"""B18 NiFi Expression Language → Catalyst columns.

The reference template interpolates attributes in properties
(`${filename}`, `${absolute.path}/${filename}`, `${schema.name}` —
56409-tika.xml:468,599,816,1489). NiFi EL also supports function
chains (`${filename:toUpper():substringBefore('.')}`); this module
compiles the practical string/boolean/number subset to Spark columns,
so flow definitions can keep their EL strings verbatim.

Everything compiles to JVM-side Catalyst expressions — EL never drops
to Python at runtime.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .attributes import clean_name

_EL_RE = re.compile(r"\$\{([^{}]*)\}")
_MAX_LEN = 2_147_483_647


def _default_resolver(name: str) -> Column:
    return F.col(clean_name(name))


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` outside single quotes and parentheses."""
    out, buf, depth, quoted = [], [], 0, False
    for ch in s:
        if ch == "'":
            quoted = not quoted
            buf.append(ch)
        elif quoted:
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def _parse_arg(raw: str) -> str | int | float:
    raw = raw.strip()
    if raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1]
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    if re.fullmatch(r"-?\d*\.\d+", raw):
        return float(raw)
    return raw


def _apply_fn(col: Column, fn: str, args: list) -> Column:
    a = args
    if fn == "toUpper":
        return F.upper(col)
    if fn == "toLower":
        return F.lower(col)
    if fn == "trim":
        return F.trim(col)
    if fn == "length":
        return F.length(col).cast("long")
    if fn == "substring":
        # NiFi: 0-based start inclusive, end exclusive (Java semantics)
        start = int(a[0])
        length = (int(a[1]) - start) if len(a) > 1 else _MAX_LEN
        return F.substring(col, start + 1, length)
    if fn == "substringBefore":
        return F.substring_index(col, str(a[0]), 1)
    if fn == "substringAfter":
        needle = str(a[0])
        idx = F.instr(col, F.lit(needle))
        return F.when(idx > 0,
                      col.substr(idx + len(needle),
                                 F.lit(_MAX_LEN))).otherwise(col)
    if fn == "substringAfterLast":
        return F.when(F.instr(col, F.lit(str(a[0]))) > 0,
                      F.substring_index(col, str(a[0]), -1)).otherwise(col)
    if fn == "substringBeforeLast":
        d = str(a[0])
        # last occurrence via reversed instr (substring_index needs a
        # literal count); before-last = first L - idx - (len(d)-1) chars
        idx = F.instr(F.reverse(col), F.lit(d[::-1]))
        return F.when(idx > 0,
                      col.substr(F.lit(1),
                                 F.length(col) - idx - (len(d) - 1))
                      ).otherwise(col)
    if fn == "replace":
        return F.replace(col, F.lit(str(a[0])), F.lit(str(a[1])))
    if fn == "replaceAll":
        return F.regexp_replace(col, str(a[0]), str(a[1]))
    if fn == "append":
        return F.concat(col, F.lit(str(a[0])))
    if fn == "prepend":
        return F.concat(F.lit(str(a[0])), col)
    if fn == "equals":
        return col == F.lit(a[0])
    if fn == "equalsIgnoreCase":
        return F.lower(col) == F.lit(str(a[0]).lower())
    if fn == "contains":
        return col.contains(str(a[0]))
    if fn == "startsWith":
        return col.startswith(str(a[0]))
    if fn == "endsWith":
        return col.endswith(str(a[0]))
    if fn == "matches":
        return col.rlike(f"^(?:{a[0]})$")  # NiFi matches = full match
    if fn == "find":
        return col.rlike(str(a[0]))
    if fn == "isEmpty":
        return col.isNull() | (F.trim(col) == "")
    if fn == "notNull":
        return col.isNotNull()
    if fn == "isNull":
        return col.isNull()
    if fn == "toNumber":
        return col.cast("long")
    if fn == "toDecimal":
        return col.cast("double")
    if fn == "plus":
        return (col + F.lit(a[0])).cast("long")
    if fn == "minus":
        return (col - F.lit(a[0])).cast("long")
    if fn == "not":
        return ~col
    if fn == "ifElse":
        return F.when(col, F.lit(a[0])).otherwise(F.lit(a[1]))
    raise ValueError(f"unsupported EL function: {fn}()")


def _eval_el(inner: str, resolver) -> Column:
    steps = _split_top(inner, ":")
    subject = steps[0].strip()
    lm = re.fullmatch(r"literal\((.*)\)", subject)
    col = (F.lit(_parse_arg(lm.group(1))) if lm
           else resolver(subject))
    for step in steps[1:]:
        m = re.fullmatch(r"\s*(\w+)\((.*)\)\s*", step, re.DOTALL)
        if not m:
            raise ValueError(f"malformed EL function call: {step!r}")
        fn, raw_args = m.group(1), m.group(2)
        args = ([_parse_arg(x) for x in _split_top(raw_args, ",")]
                if raw_args.strip() else [])
        col = _apply_fn(col, fn, args)
    return col


def el_column(expr: str, resolver=None) -> Column:
    """Compile a NiFi EL property value to one Spark column.

    Text outside `${...}` becomes literals; multiple segments concat
    (e.g. `"${absolute.path}/${filename}"`). A single bare `${...}`
    keeps its native type (boolean/number) instead of stringifying.
    """
    resolver = resolver or _default_resolver
    parts: list[Column] = []
    pos = 0
    for m in _EL_RE.finditer(expr):
        if m.start() > pos:
            parts.append(F.lit(expr[pos:m.start()]))
        parts.append(_eval_el(m.group(1), resolver))
        pos = m.end()
    if pos < len(expr):
        parts.append(F.lit(expr[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*[p.cast("string") for p in parts])

"""Postgres-dialect → Spark-SQL transpiler (lite).

SURVEY.md §4.3 option (b): the reference's transformation scripts are
Postgres SQL (/root/reference/tests/sql/*.sql). Spark 4 already parses
most of the dialect (FILTER (WHERE …), INTERVAL strings, listagg);
this module rewrites the remaining Postgres-isms those scripts use:

| Postgres | Spark rewrite |
|---|---|
| ``expr::type``                | ``CAST(expr AS type)`` (type-mapped) |
| ``'3 YEARS'::INTERVAL``       | ``INTERVAL '3 YEARS'`` |
| ``x = any('{A,B}')``          | ``x IN ('A', 'B')`` |
| ``x ~* 'pat'`` / ``~ / !~*``  | ``x RLIKE '(?i)pat'`` / negations |
| ``string_agg(x, ',' [ORDER BY o])`` | ``listagg(x, ',') WITHIN GROUP (ORDER BY o)`` |
| ``SELECT DISTINCT ON (k) …``  | ranked-window rewrite (deterministic tiebreak required) |
| ``json_build_object('k', v, …)`` | ``to_json(named_struct('k', v, …))`` |

Scope: covers every construct in the reference's SQL fixtures
(wow_2021_create_bldgs_table.sql etc.); it is a text-level rewriter,
not a full parser — scripts with exotic quoting belong in the
hand-ported DataFrame layer instead (§4.3 option (a), which the
plans/ package implements).
"""

from __future__ import annotations

import re

_TYPE_MAP = {
    "int": "INT",
    "int4": "INT",
    "integer": "INT",
    "int8": "BIGINT",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "int2": "SMALLINT",
    "text": "STRING",
    "varchar": "STRING",
    "float8": "DOUBLE",
    "float4": "FLOAT",
    "numeric": "DECIMAL(38,9)",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
}

# '3 YEARS'::INTERVAL  →  INTERVAL '3 YEARS'
_INTERVAL_CAST = re.compile(r"('(?:[^']|'')*')\s*::\s*INTERVAL\b", re.IGNORECASE)

# expr::type for simple exprs: identifier/qualified/literal/closing paren
_SIMPLE_CAST = re.compile(
    r"((?:[A-Za-z_][\w$]*\s*\.\s*)?[A-Za-z_][\w$]*(?:\([^()]*\))?"
    r"|'(?:[^']|'')*'|\d+(?:\.\d+)?)\s*::\s*([A-Za-z_][\w]*)"
)

# col = any('{A,B,C}')
_EQ_ANY = re.compile(
    r"=\s*any\s*\(\s*'\{([^}]*)\}'\s*\)", re.IGNORECASE
)

# regex-match operators against a literal pattern
_REGEX_CI = re.compile(r"(!?)~\*\s*('(?:[^']|'')*')")
_REGEX_CS = re.compile(r"(!?)~\s*('(?:[^']|'')*')")

_STRING_AGG_OPEN = re.compile(r"\bstring_agg\s*\(", re.IGNORECASE)

_JSON_BUILD = re.compile(r"\bjson_build_object\s*\(", re.IGNORECASE)

_DISTINCT_ON = re.compile(
    r"SELECT\s+DISTINCT\s+ON\s*\(([^)]+)\)\s*", re.IGNORECASE
)


def _rewrite_casts(sql: str) -> str:
    sql = _INTERVAL_CAST.sub(lambda m: f"INTERVAL {m.group(1)}", sql)

    def cast_sub(m: re.Match) -> str:
        expr, pg_type = m.group(1), m.group(2).lower()
        spark_type = _TYPE_MAP.get(pg_type, pg_type.upper())
        return f"CAST({expr} AS {spark_type})"

    # repeat for chained casts (a::int::text)
    prev = None
    while prev != sql:
        prev = sql
        sql = _SIMPLE_CAST.sub(cast_sub, sql)
    return sql


def _rewrite_any(sql: str) -> str:
    def any_sub(m: re.Match) -> str:
        items = [v.strip() for v in m.group(1).split(",") if v.strip()]
        quoted = ", ".join("'" + v.strip("\"'") + "'" for v in items)
        return f"IN ({quoted})"

    return _EQ_ANY.sub(any_sub, sql)


def _rewrite_regex_ops(sql: str) -> str:
    def ci(m: re.Match) -> str:
        neg, pat = m.group(1), m.group(2)
        inner = pat[1:-1]
        op = "NOT RLIKE" if neg else "RLIKE"
        return f"{op} '(?i){inner}'"

    sql = _REGEX_CI.sub(ci, sql)

    def cs(m: re.Match) -> str:
        neg, pat = m.group(1), m.group(2)
        op = "NOT RLIKE" if neg else "RLIKE"
        return f"{op} {pat}"

    return _REGEX_CS.sub(cs, sql)


def _scan_to_close(sql: str, start: int) -> int:
    """Index just past the ')' matching the '(' before ``start``
    (quote-aware)."""
    depth, i, n = 1, start, len(sql)
    while i < n and depth:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n:
                if sql[i] == "'" and (i + 1 >= n or sql[i + 1] != "'"):
                    break
                i += 2 if sql[i] == "'" else 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return i


def _split_top_commas(args: str) -> list[str]:
    out, depth, buf, i, n = [], 0, [], 0, len(args)
    while i < n:
        ch = args[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if args[j] == "'" and (j + 1 >= n or args[j + 1] != "'"):
                    break
                j += 2 if args[j] == "'" else 1
            buf.append(args[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    out.append("".join(buf))
    return out


def _rewrite_string_agg(sql: str) -> str:
    """``string_agg(expr, sep [ORDER BY o])`` → ``listagg(expr, sep)
    [WITHIN GROUP (ORDER BY o)]`` — paren-aware so nested calls
    (json_build_object args etc.) survive."""
    while True:
        m = _STRING_AGG_OPEN.search(sql)
        if not m:
            return sql
        end = _scan_to_close(sql, m.end())
        args = _split_top_commas(sql[m.end() : end - 1])
        expr = args[0].strip()
        rest = ",".join(args[1:]).strip()
        om = re.search(r"\s+ORDER\s+BY\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
        if om:
            sep = rest[: om.start()].strip()
            repl = (
                f"listagg({expr}, {sep}) WITHIN GROUP "
                f"(ORDER BY {om.group(1).strip()})"
            )
        else:
            repl = f"listagg({expr}, {rest})"
        sql = sql[: m.start()] + repl + sql[end:]


def _rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (keys) <list> FROM <rest> [ORDER BY o]`` →
    ranked-window subquery. Postgres picks the first row per key in
    ORDER BY order (arbitrary when absent — wow_2021 sql:67 relies on
    that); we make it deterministic by ordering on the keys themselves
    when no ORDER BY is given (SURVEY §2 D1 discipline)."""
    m = _DISTINCT_ON.search(sql)
    if not m:
        return sql
    keys = m.group(1).strip()
    rest = sql[m.end():].rstrip().rstrip(";")
    # split off a trailing top-level ORDER BY if present
    om = re.search(r"\bORDER\s+BY\s+(.+?)$", rest, re.IGNORECASE | re.DOTALL)
    if om:
        order = om.group(1).strip()
        rest = rest[: om.start()].rstrip()
    else:
        order = keys
    # locate the top-level FROM: the window column joins the select list
    fm = re.search(r"\bFROM\b", rest, re.IGNORECASE)
    if not fm:
        return sql  # shape not understood — leave untouched
    select_list = rest[: fm.start()].rstrip().rstrip(",")
    from_part = rest[fm.start():]
    return (
        f"SELECT * EXCEPT (__rn) FROM (SELECT {select_list}, "
        f"row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS __rn "
        f"{from_part}) WHERE __rn = 1"
    )


def _rewrite_json_build(sql: str) -> str:
    """json_build_object(...) → to_json(named_struct(...)). Argument
    list is kept verbatim (same key/value alternation)."""
    out, idx = [], 0
    for m in _JSON_BUILD.finditer(sql):
        start = m.end()
        depth, i = 1, start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        args = sql[start : i - 1]
        out.append(sql[idx : m.start()])
        out.append(f"to_json(named_struct({args}))")
        idx = i
    out.append(sql[idx:])
    return "".join(out)


def _rewrite_drop_cascade(sql: str) -> str:
    """``DROP TABLE ... CASCADE`` → plain DROP TABLE. Spark has no
    CASCADE at table granularity (SURVEY §2 K2; dependent views are
    re-created by the engine's function/view registry, mirroring the
    reference's re-run-after-swap pattern)."""
    return re.sub(
        r"(?i)(\bDROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?[\w\".]+)\s+CASCADE\b",
        r"\1",
        sql,
    )


def transpile_pg(sql: str) -> str:
    """Apply all rewrites. Order matters: interval-casts before simple
    casts, DISTINCT ON last (it restructures the statement)."""
    sql = _rewrite_drop_cascade(sql)
    sql = _rewrite_casts(sql)
    sql = _rewrite_any(sql)
    sql = _rewrite_regex_ops(sql)
    sql = _rewrite_string_agg(sql)
    sql = _rewrite_json_build(sql)
    sql = _rewrite_distinct_on(sql)
    return sql

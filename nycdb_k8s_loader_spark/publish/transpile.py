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


_PAREN_CAST = re.compile(r"\)\s*::\s*([A-Za-z_][\w]*)")


def _rewrite_paren_casts(sql: str) -> str:
    """``(expr)::type`` → ``CAST((expr) AS TYPE)`` — the parenthesized
    form _SIMPLE_CAST can't reach (it has no backward paren matching).
    String literals are masked first so quoted parens can't derail the
    balance scan. A preceding function identifier is absorbed into the
    cast operand so ``fn(nested(x))::int`` casts the whole call."""
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    sql = re.sub(r"'(?:[^']|'')*'", _mask, sql)
    while True:
        m = _PAREN_CAST.search(sql)
        if not m:
            break
        depth, i = 0, m.start()
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if i < 0:  # unbalanced — leave untouched rather than corrupt
            break
        fn = re.search(r"(?:[A-Za-z_][\w$]*\s*\.\s*)?[A-Za-z_][\w$]*\s*$", sql[:i])
        # absorb a preceding identifier only if it is a function name,
        # not a SQL keyword ("SELECT (x)::int" casts (x), not SELECT(x))
        keywords = {
            "select", "where", "from", "and", "or", "on", "when", "then",
            "else", "end", "by", "as", "in", "not", "filter", "having",
            "join", "using", "case", "between", "like", "distinct",
            "union", "all", "values", "over", "partition", "order",
            "group", "limit", "exists", "is", "null", "true", "false",
        }
        start = i
        if fn and fn.group(0).strip().lower() not in keywords:
            start = fn.start()
        pg_type = m.group(1).lower()
        spark_type = _TYPE_MAP.get(pg_type, pg_type.upper())
        operand = sql[start : m.start() + 1]
        sql = f"{sql[:start]}CAST({operand} AS {spark_type}){sql[m.end():]}"
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], sql)


def _rewrite_casts(sql: str) -> str:
    sql = _INTERVAL_CAST.sub(lambda m: f"INTERVAL {m.group(1)}", sql)
    sql = _rewrite_paren_casts(sql)

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


_JSON_AGG_OPEN = re.compile(r"\bjsonb?_agg\s*\(", re.IGNORECASE)

_FILTER_OPEN = re.compile(r"\s*FILTER\s*\(", re.IGNORECASE)


def _rewrite_json_agg(sql: str) -> str:
    """``json_agg(expr [ORDER BY k [DESC], ...]) [FILTER (WHERE p)]`` →
    Spark's ordered-collect idiom: collect structs carrying the order
    keys, array_sort with a comparator lambda, project the value back
    out, to_json the array (the same shape operators/relational.py's
    ordered_json_agg builds with the DataFrame API). The FILTER clause
    moves onto collect_list — it must attach to the aggregate, not the
    to_json wrapper. An expr already wrapped in to_json(...) (from the
    json_build_object rewrite running first) is unwrapped so elements
    aggregate as structs, not pre-serialized strings."""
    while True:
        m = _JSON_AGG_OPEN.search(sql)
        if not m:
            return sql
        end = _scan_to_close(sql, m.end())
        args = sql[m.end() : end - 1]
        om = re.search(r"\s+ORDER\s+BY\s+(.+)$", args, re.IGNORECASE | re.DOTALL)
        if om:
            expr, order = args[: om.start()].strip(), om.group(1).strip()
        else:
            expr, order = args.strip(), None
        if expr.lower().startswith("to_json(") and expr.endswith(")"):
            inner_expr = expr[len("to_json(") : -1]
            if _balanced(inner_expr):
                expr = inner_expr
        filt, tail_start = "", end
        fm = _FILTER_OPEN.match(sql[end:])
        if fm:
            fend = _scan_to_close(sql, end + fm.end())
            filt = " " + sql[end:fend].strip()
            tail_start = fend
        if order:
            fields, cmps = [], []
            for i, key in enumerate(_split_top_commas(order)):
                key = key.strip()
                desc = bool(re.search(r"\s+DESC\s*$", key, re.IGNORECASE))
                key = re.sub(
                    r"\s+(ASC|DESC)\s*$", "", key, flags=re.IGNORECASE
                )
                fields.append(f"'__o{i}', {key}")
                lo, hi = ("1", "-1") if desc else ("-1", "1")
                cmps.append(
                    f"WHEN l.__o{i} < r.__o{i} THEN {lo} "
                    f"WHEN l.__o{i} > r.__o{i} THEN {hi}"
                )
            struct = f"named_struct({', '.join(fields)}, '__v', {expr})"
            comparator = f"(l, r) -> CASE {' '.join(cmps)} ELSE 0 END"
            inner = (
                f"transform(array_sort(collect_list({struct}){filt}, "
                f"{comparator}), s -> s.__v)"
            )
        else:
            inner = f"collect_list({expr}){filt}"
        sql = f"{sql[:m.start()]}to_json({inner}){sql[tail_start:]}"


def _balanced(s: str) -> bool:
    depth = 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


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
    prefix = sql[: m.start()]  # e.g. "CREATE TABLE t AS " — keep it
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
        f"{prefix}SELECT * EXCEPT (__rn) FROM (SELECT {select_list}, "
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


_VESTIGIAL_USING = re.compile(
    r"(\bFROM\s+[A-Za-z_][\w$.]*\s+)USING\s*\([^)]*\)", re.IGNORECASE
)


def _rewrite_vestigial_using(sql: str) -> str:
    """Drop a ``USING (col)`` that directly follows a single FROM table
    with no JOIN — a vestigial clause the reference's wow_2021 script
    carries (tests/sql/wow_2021_create_bldgs_table.sql:60: the table is
    already the joined view, the USING is dead text). JOIN ... USING is
    untouched (the pattern requires FROM immediately before)."""
    return _VESTIGIAL_USING.sub(lambda m: m.group(1), sql)


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


#: ``FROM/JOIN <qualified_name>(<args>)`` — a table-function call in a
#: FROM position. The mandatory identifier excludes subqueries
#: ``FROM (SELECT ...)``; non-literal args or unregistered names are
#: left untouched by the rewriter below.
_TABLE_FN_CALL = re.compile(
    r"\b(FROM|JOIN)\s+((?:[A-Za-z_][\w$]*\s*\.\s*)?[A-Za-z_][\w$]*)"
    r"\s*\(([^()]*)\)",
    re.IGNORECASE,
)


def rewrite_table_fn_calls(sql: str, resolve) -> str:
    """Rewrite table-valued function calls in FROM/JOIN position into
    plain table references — the Spark analog of Postgres set-returning
    functions (the reference's users write ``SELECT ... FROM
    wow.get_assoc_addrs_from_bbl('xxx')``, tests/test_wowutil.py:42-44;
    Spark SQL cannot call a driver-side table function, so the engine
    materializes the result as a temp view and substitutes its name).

    ``resolve(name, args) -> str | None`` receives the (possibly
    schema-qualified) function name and the parsed LITERAL argument
    list (strings unquoted, numbers as int/float) and returns the
    replacement view name, or None to leave the call untouched
    (unregistered name — e.g. ``FROM range(10)`` / lateral builtins).
    Calls with non-literal arguments are never rewritten: a correlated
    table-function argument needs a lateral join, which belongs in the
    DataFrame layer."""

    def sub(m: re.Match) -> str:
        kw, name, rawargs = m.group(1), m.group(2), m.group(3)
        name = re.sub(r"\s*\.\s*", ".", name)
        args: list = []
        for a in _split_top_commas(rawargs):
            a = a.strip()
            if not a:
                continue
            if a.startswith("'") and a.endswith("'"):
                args.append(a[1:-1].replace("''", "'"))
                continue
            try:
                args.append(int(a))
                continue
            except ValueError:
                pass
            try:
                args.append(float(a))
            except ValueError:
                return m.group(0)  # non-literal arg: leave untouched
        view = resolve(name, args)
        if view is None:
            return m.group(0)
        return f"{kw} {view}"

    return _TABLE_FN_CALL.sub(sub, sql)


def transpile_pg(sql: str) -> str:
    """Apply all rewrites. Order matters: interval-casts before simple
    casts, DISTINCT ON last (it restructures the statement)."""
    sql = _rewrite_drop_cascade(sql)
    sql = _rewrite_vestigial_using(sql)
    sql = _rewrite_casts(sql)
    sql = _rewrite_any(sql)
    sql = _rewrite_regex_ops(sql)
    sql = _rewrite_string_agg(sql)
    sql = _rewrite_json_build(sql)
    sql = _rewrite_json_agg(sql)
    sql = _rewrite_distinct_on(sql)
    return sql

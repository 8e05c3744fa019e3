"""Property test: the stringformat pushdown envelope is a sound superset
(VERDICT r5 item 8; comparators.scala:47-243 parity surface).

``string_pushdown`` rewrites a typed predicate into a predicate over the
raw stored STRING columns so it reaches parquet as a PushedFilter; the
full typed predicate re-applies after the schema-on-read cast.  The
soundness contract is therefore: for EVERY predicate and EVERY row set,
the rows selected by the typed predicate are a SUBSET of the rows the
string-space predicate keeps — a pushed filter that drops a typed match
silently loses rows.

Fuzzed here over 5 types (long/int/string/boolean/date) × the full
operator surface (=, !=, <, <=, >, >=, IN, IS [NOT] NULL, AND, OR, NOT)
against DuckDB as the independent evaluator of both spaces, on a row set
that pins the known-sharp boundaries (digit-count edges 9/10/99/100,
negatives, empty string, NULLs).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sql_on_hbase_spark.predicate import parse_predicate, string_pushdown

TYPES = {"k": "long", "name": "string", "size": "int", "flag": "boolean", "d": "date"}

# boundary-heavy row pool: digit-count edges for the superset int-range
# rewrites, negatives (excluded by the '10…0' lower bound), NULLs per
# column, empty + quote-free strings, dates around comparison pivots
_ROWS = [
    (-100, "", -5, True, "1994-12-31"),
    (-5, "a", 0, False, "1995-01-01"),
    (0, "mm", 1, None, "1995-01-02"),
    (1, "n05", 9, True, "1999-12-31"),
    (9, "n100", 10, False, "2000-06-15"),
    (10, "zz", 25, True, None),
    (25, None, 99, False, "2000-06-15"),
    (99, "mm", 100, None, "1994-12-31"),
    (100, "a", 123, True, "1995-01-01"),
    (123, "", 2500, False, "2099-01-01"),
    (2500, "n05", 9999, True, None),
    (9999, "zz", None, False, "2000-06-15"),
    (None, "mm", 25, True, "1995-01-01"),
    (None, None, None, None, None),
]


def _make_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tt (rid INT, k BIGINT, name VARCHAR, size INT, "
        "flag BOOLEAN, d DATE)"
    )
    # the stringformat physical layout: every value stored as its plain
    # decimal / UTF-8 / 'true'/'false' / 'YYYY-MM-DD' string
    con.execute(
        "CREATE TABLE st (rid INT, k VARCHAR, name VARCHAR, size VARCHAR, "
        "flag VARCHAR, d VARCHAR)"
    )
    for rid, (k, name, size, flag, d) in enumerate(_ROWS):
        con.execute("INSERT INTO tt VALUES (?, ?, ?, ?, ?, ?)", [rid, k, name, size, flag, d])
        con.execute(
            "INSERT INTO st VALUES (?, ?, ?, ?, ?, ?)",
            [
                rid,
                None if k is None else str(k),
                name,
                None if size is None else str(size),
                None if flag is None else str(flag).lower(),
                d,
            ],
        )
    return con


_CON = _make_con()

_INTS = st.sampled_from([-100, -5, 0, 1, 5, 9, 10, 25, 99, 100, 123, 2500, 9999])
_NAMES = st.sampled_from(["", "a", "mm", "n05", "zz"])
_DATES = st.sampled_from(["1994-12-31", "1995-01-01", "2000-06-15"])
_OPS = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


@st.composite
def _leaf(draw) -> str:
    col = draw(st.sampled_from(sorted(TYPES)))
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return f"{col} IS NULL"
    if kind == 1:
        return f"{col} IS NOT NULL"
    if kind == 2 and col in ("k", "size"):
        vals = draw(st.lists(_INTS, min_size=1, max_size=3, unique=True))
        return f"{col} IN ({', '.join(map(str, vals))})"
    op = draw(_OPS)
    if col in ("k", "size"):
        return f"{col} {op} {draw(_INTS)}"
    if col == "name":
        return f"{col} {op} '{draw(_NAMES)}'"
    if col == "flag":
        return f"{col} {op} {draw(st.sampled_from(['TRUE', 'FALSE']))}"
    return f"{col} {op} '{draw(_DATES)}'"


_PRED = st.recursive(
    _leaf(),
    lambda ch: st.one_of(
        st.builds(lambda a, b: f"({a}) AND ({b})", ch, ch),
        st.builds(lambda a, b: f"({a}) OR ({b})", ch, ch),
        st.builds(lambda a: f"NOT ({a})", ch),
    ),
    max_leaves=5,
)


@settings(max_examples=400, deadline=None)
@given(text=_PRED)
def test_pushdown_is_sound_superset(text: str):
    pushed = string_pushdown(parse_predicate(text), TYPES)
    typed = {r[0] for r in _CON.execute(f"SELECT rid FROM tt WHERE {text}").fetchall()}
    if pushed is None:
        return  # nothing pushed: trivially sound (full scan + residual)
    kept = {r[0] for r in _CON.execute(f"SELECT rid FROM st WHERE {pushed}").fetchall()}
    assert typed <= kept, (
        f"pushed filter DROPPED typed matches {sorted(typed - kept)}: "
        f"predicate {text!r} → pushed {pushed!r}"
    )


@settings(max_examples=150, deadline=None)
@given(text=_leaf())
def test_exact_leaves_select_exactly(text: str):
    """Leaves the converter marks exact (equality / string / boolean /
    date / null checks) must select EXACTLY the typed rows — an exact
    claim that widens would be harmless, but one that narrows feeds the
    NOT-rewrite and breaks soundness (negating a superset narrows)."""
    from spark_sql_on_hbase_spark.predicate import _sf_leaf

    p = parse_predicate(text)
    got = _sf_leaf(p, TYPES) if not hasattr(p, "children") else None
    if got is None or not got[1]:
        return
    typed = {r[0] for r in _CON.execute(f"SELECT rid FROM tt WHERE {text}").fetchall()}
    kept = {r[0] for r in _CON.execute(f"SELECT rid FROM st WHERE {got[0]}").fetchall()}
    assert typed == kept, (
        f"leaf claimed exact but selects differently: {text!r} → {got[0]!r} "
        f"(typed {sorted(typed)} vs string-space {sorted(kept)})"
    )


# --- r8: float/double range pushdown soundness (VERDICT r7 #5) -------------
# Stored strings mimic Spark/Java shortest-repr formatting: plain decimal
# inside [1e-3, 1e7), "d.dddEn" outside — the E-regime rows are exactly
# the values a plain-decimal lex range could silently miss, which is why
# ranges touching that regime must refuse to convert.
def _spark_double_str(x):
    if x is None:
        return None
    ax = abs(x)
    if ax == 0.0:
        return "0.0"
    if 1e-3 <= ax < 1e7:
        return repr(x)
    from decimal import Decimal

    d = Decimal(repr(x)).normalize()
    sign, digits, exp = d.as_tuple()
    e = exp + len(digits) - 1
    mant = digits[0:1] + (digits[1:] or (0,))
    ms = f"{digits[0]}." + ("".join(map(str, digits[1:])) or "0")
    return ("-" if sign else "") + ms + f"E{e}"


_DVALS = [
    None, 0.0, 1e-9, 0.0009, 0.001, 0.0015, 0.01, 0.1, 0.3, 0.5, 0.999,
    1.0, 1.5, 2.25, 9.999, 10.0, 10.5, 99.25, 100.0, 123.456, 9999.5,
    999999.9, 1234567.5, 9999999.0, 1e7, 2.5e8, 1e300,
]
_DVALS += [None if v is None else -v for v in _DVALS[1:]]
_DBOUNDS = st.sampled_from(
    [0.001, 0.0015, 0.1, 0.3, 1.0, 1.5, 9.999, 10.0, 10.5, 99.25, 100.0,
     123.456, 9999.5, 999999.9, 9999999.0, -0.001, -0.1, -1.5, -10.5,
     -99.25, -9999.5, -9999999.0, 0.0, 1e7, 1e-4, -1e7]
)


def _make_float_con():
    con = duckdb.connect()
    con.execute("CREATE TABLE ft (rid INT, w DOUBLE)")
    con.execute("CREATE TABLE fs (rid INT, w VARCHAR)")
    for rid, v in enumerate(_DVALS):
        con.execute("INSERT INTO ft VALUES (?, ?)", [rid, v])
        con.execute("INSERT INTO fs VALUES (?, ?)", [rid, _spark_double_str(v)])
    return con


_FCON = _make_float_con()


@settings(max_examples=400, deadline=None)
@given(lo=_DBOUNDS, hi=_DBOUNDS, ops=st.tuples(
    st.sampled_from([">", ">="]), st.sampled_from(["<", "<="])
))
def test_float_range_pushdown_is_sound_superset(lo, hi, ops):
    text = f"w {ops[0]} {lo!r} AND w {ops[1]} {hi!r}"
    pushed = string_pushdown(parse_predicate(text), {"w": "double"})
    typed = {r[0] for r in _FCON.execute(f"SELECT rid FROM ft WHERE {text}").fetchall()}
    if pushed is None:
        return  # refused: full scan + typed residual, trivially sound
    kept = {r[0] for r in _FCON.execute(f"SELECT rid FROM fs WHERE {pushed}").fetchall()}
    assert typed <= kept, (
        f"pushed float range DROPPED typed matches {sorted(typed - kept)}: "
        f"{text!r} → {pushed!r}"
    )
    # (no tightness assertion: as with ints, cross-width lex contamination
    # is inherent to unpadded decimals — '123.456' sorts inside
    # ['1.0','9.999'] — and the typed re-filter absorbs it; the superset
    # property above is the load-bearing contract)


# --- r9: float/double single-sided pushdown soundness -----------------------
# The storage emulator mirrors Java's Double.toString (what Spark's CAST
# writes): shortest plain repr inside [1e-3, 1e7) — digit-identical to
# python repr there (pinned against the live JVM in
# tests/test_stringformat_pushdown.py) — and "d.dddEn" scientific
# outside it (also pinned live: 1e7→'1.0E7', 5e-324→'4.9E-324').
import math


def _java_double_str(x):
    if x is None:
        return None
    if x != x:
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0:
        return "-0.0" if math.copysign(1, x) < 0 else "0.0"
    ax = abs(x)
    if 1e-3 <= ax < 1e7:
        return repr(x)
    r = repr(ax)
    if "e" in r:
        m, e = r.split("e")
        e = int(e)
        dp = m.index(".") if "." in m else len(m)
        stripped = m.replace(".", "")
        fs = len(stripped) - len(stripped.lstrip("0"))
        digs = stripped.lstrip("0").rstrip("0") or "0"
        e10 = e + dp - 1 - fs
    else:
        digs_full = r.replace(".", "")
        dp = r.index(".")
        fs = next(i for i, c in enumerate(digs_full) if c != "0")
        digs = digs_full[fs:].rstrip("0") or "0"
        e10 = dp - 1 - fs
    mant = digs[0] + "." + (digs[1:] or "0")
    return ("-" if x < 0 else "") + f"{mant}E{e10}"


_F_VALS = [
    0.0, -0.0, 1e-3, -1e-3, 0.0005, -0.0005, 1e-5, -1e-5, 5.5, -5.5, 1.0,
    -1.0, 9.999, 123.456, -123.456, 9999999.0, -9999999.0, 1e7, -1e7,
    2.5e8, -2.5e8, 999999.875, -999999.875, 1.7e308, -1.7e308,
    float("inf"), float("-inf"), float("nan"), None, 0.001953125,
    6250000.0, 12345.678, 5e-324, -5e-324,
]


def _fmt_bound(b):
    return (
        f"{b:.10f}".rstrip("0").rstrip(".")
        if abs(b) >= 1e-6 or b == 0
        else f"{b:.24f}"
    )


def test_float_onesided_pushdown_is_sound_superset():
    """r9 (VERDICT r8 #4): one-sided float/double predicates push as the
    in-regime plain range closed at the regime boundary plus coarse
    blocks for the E-notation / Infinity / NaN residue.  Soundness
    contract: typed-selected ⊆ string-selected for every predicate, on a
    row set spanning both notations, zeros of both signs, denormals,
    infinities, and NaN (Spark and DuckDB both order NaN above all)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, v DOUBLE)")
    rows = [(i, v) for i, v in enumerate(_F_VALS)]
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute("CREATE TABLE s (id INT, v VARCHAR)")
    con.executemany(
        "INSERT INTO s VALUES (?, ?)", [(i, _java_double_str(v)) for i, v in rows]
    )
    bounds = [1e-3, 5.5, 123.456, 9999999.0, 0.0, 1.0, -5.5, -123.456,
              -1e-3, 1e-5, -1e-5, 1e8, -1e8, 0.0005, -0.0005, 12345.678,
              6250000.0]
    tests = [f"v {op} {_fmt_bound(b)}" for op in (">", ">=", "<", "<=", "=") for b in bounds]
    tests += [
        "v >= 1 AND v <= 100",
        "v >= -100 AND v <= -1",
        "v > 5.0 OR v < -100.0",
        "v = 2.5 OR v > 9999999.5",
        "v > 123.0 OR v = 0.0",
    ]
    pushed_n = 0
    for t in tests:
        sql = string_pushdown(parse_predicate(t), {"v": "double"})
        if sql is None:
            continue
        pushed_n += 1
        typed = {r[0] for r in con.execute(f"SELECT id FROM t WHERE {t}").fetchall()}
        pushed = {r[0] for r in con.execute(f"SELECT id FROM s WHERE {sql}").fetchall()}
        assert typed <= pushed, (t, sorted(typed - pushed), sql)
    # the point of r9 #4: one-sided bounds now actually push
    assert pushed_n >= 60, pushed_n
    assert string_pushdown(parse_predicate("v >= 99000.0"), {"v": "double"}) is not None
    assert string_pushdown(parse_predicate("v <= -5.5"), {"v": "double"}) is not None

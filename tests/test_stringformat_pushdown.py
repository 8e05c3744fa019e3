"""Stringformat non-key filter pushdown (comparators.scala:47-243 parity).

The reference evaluates typed predicates over string-encoded storage with
custom byte comparators server-side; our equivalent rewrites the typed
predicate into a string-space predicate on the raw stored columns
(predicate.string_pushdown) applied before the schema-on-read cast, so it
reaches the parquet scan as PushedFilters.  The full typed predicate is
always re-applied after the cast, so non-exact rewrites are sound
supersets.
"""

import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.predicate import parse_predicate, string_pushdown
from spark_sql_on_hbase_spark.session import AstroSession

TYPES = {
    "k": "long",
    "name": "string",
    "size": "int",
    "price": "double",
    "flag": "boolean",
    "d": "date",
}


def conv(text):
    return string_pushdown(parse_predicate(text), TYPES)


def test_exact_conversions():
    assert conv("size = 25") == "(size = '25')"
    assert conv("size != 25") == "(size != '25')"
    assert conv("size IN (1, 20, 300)") == "((size = '1') OR (size = '20') OR (size = '300'))"
    assert conv("name >= 'mm'") == "((name >= 'mm'))" or conv("name >= 'mm'") == "(name >= 'mm')"
    assert conv("flag = TRUE") == "(flag = 'true')"
    assert conv("d >= '1995-01-01'") == "(d >= '1995-01-01')"
    assert conv("size IS NOT NULL") == "(size IS NOT NULL)"


def test_superset_int_ranges():
    """r7: per-digit-count range unions — a strictly tighter sound
    superset than the pre-r7 single bound, and negative bounds now push
    (they previously disabled pushdown).  Exactness is unreachable in
    parquet's filter language (see _sf_int_range); semantics are pinned
    by evaluating the pushed predicate in DuckDB over canonical decimal
    strings and checking superset + same-digit-count tightness."""
    import duckdb

    con = duckdb.connect()

    def rows(pred, lo=-12000, hi=12000):
        vals = list(range(lo, hi + 1, 7)) + [0, 1, -1, 9, 10, 25, 2500, 9999]
        con.execute("CREATE OR REPLACE TABLE s AS SELECT CAST(v AS VARCHAR) AS size, v FROM (SELECT unnest(?) AS v)", [vals])
        return {r[0] for r in con.execute(f"SELECT v FROM s WHERE {pred}").fetchall()}

    for text, pyf in [
        ("size >= 2500", lambda v: v >= 2500),
        ("size > 9", lambda v: v > 9),
        ("size <= 25", lambda v: v <= 25),
        ("size >= -5", lambda v: v >= -5),  # negatives push now
        ("size < -100", lambda v: v < -100),
    ]:
        pushed = conv(text)
        assert pushed is not None, text
        kept = rows(pushed)
        typed = rows("true") and {v for v in rows("true") if pyf(v)}
        # sound superset …
        assert typed <= kept, text
        # … and strictly tighter than the pre-r7 single bound on pinned
        # cases (cross-length lex leaks like '26' ∈ ['1','9'] remain —
        # see _sf_int_range for why they're unavoidable)
        if text == "size >= 2500":
            assert 1000 not in kept and 2493 not in kept  # old kept both
        if text == "size <= 25":
            assert 99 not in kept and 98 not in kept  # old bound was <= '99'
        if text == "size < -100":
            assert 0 not in kept and 5 not in kept  # old: no pushdown at all


def test_boolean_algebra_soundness():
    # AND may drop unconvertible conjuncts (superset); r9: the float
    # conjunct now rides along as a one-sided range union
    s = conv("size = 25 AND price > 1.5")
    assert s.startswith("((size = '25') AND ") and "'1.5'" in s
    # OR requires every branch — satisfied now that floats convert (r9)
    s = conv("size = 25 OR price > 1.5")
    assert s is not None and "(size = '25')" in s and "'1.5'" in s
    # … but a branch that still cannot convert refuses the whole OR
    assert conv("size = 25 OR price != 1.5") is None
    assert conv("size = 25 OR name = 'x'") == "((size = '25') OR (name = 'x'))"
    # NOT requires an exact child: negating a superset would narrow
    assert conv("NOT size = 25") == "(NOT (size = '25'))"
    assert conv("NOT size >= 2500") is None
    assert conv("NOT (size = 1 AND price > 1.5)") is None
    # float superset conversions never leak under NOT
    assert conv("NOT price > 1.5") is None
    assert conv("NOT price = 1.5") is None
    # r9: float equality converts as a degenerate tight interval
    s = conv("price = 1.5")
    assert s is not None and "'1.5'" in s


DDL = (
    "CREATE TABLE sftab (k LONG, name STRING, size INT, price DOUBLE, "
    "PRIMARY KEY (k)) MAPPED BY (h_sftab, COLS=[name=f.n, size=f.s, price=f.p]) "
    "IN STRINGFORMAT"
)


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "wh"))
    a.sql(DDL)
    df = spark.createDataFrame(
        [(i, f"n{i:03d}", i % 200, i * 1.5) for i in range(1, 401)],
        "k long, name string, size int, price double",
    )
    a.relation("sftab").write(df)
    return a


def _rel(astro):
    return astro.relation("sftab")


def test_pushed_filter_in_plan_and_exact_rows(astro):
    rel = _rel(astro)
    df, _res = rel.scan_where("size = 25")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(size,25)" in plan, plan
    got = sorted(r.k for r in df.collect())
    assert got == [25, 225]  # size = k % 200


def test_superset_range_rows_exact(astro):
    # the pushed filter (size >= '10') is a lexicographic superset; the
    # re-applied typed predicate must still produce exactly x >= 10
    rel = _rel(astro)
    df, _res = rel.scan_where("size >= 10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(size,1" in plan, plan
    assert df.count() == sum(1 for i in range(1, 401) if i % 200 >= 10)


def test_mixed_key_and_nonkey_pushdown(astro):
    rel = _rel(astro)
    df, res = rel.scan_where("k <= 100 AND size = 25")
    assert len(res.files) <= res.total  # key pruning still active
    # the r7 k-range union is long — lift the metadata truncation so the
    # size filter is visible in the rendered plan
    spark = df.sparkSession
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "EqualTo(size,25)" in plan, plan
    assert sorted(r.k for r in df.collect()) == [25]


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_fuzz_scan_where_equals_plain_filter(astro):
    """Soundness fuzz: for random predicates over key + non-key columns,
    the pruned + string-pushed scan must return EXACTLY the rows of a
    plain typed filter over the full scan — pushdown supersets and file
    pruning can only ever be optimizations."""
    import random

    rng = random.Random(20260813)
    rel = _rel(astro)
    full = rel.scan()

    def leaf():
        col = rng.choice(["k", "size", "name", "price"])
        if col == "name":
            v = f"'n{rng.randrange(400):03d}'"
            op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            return f"{col} {op} {v}"
        if col == "price":
            return f"{col} {rng.choice(['<', '>'])} {rng.randrange(600)}.5"
        if rng.random() < 0.3:
            vals = ", ".join(str(rng.randrange(-10, 410)) for _ in range(3))
            return f"{col} IN ({vals})"
        op = rng.choice(["=", "!=", "<", "<=", ">", ">=", "IS NOT NULL"])
        if op == "IS NOT NULL":
            return f"{col} IS NOT NULL"
        return f"{col} {op} {rng.randrange(-10, 410)}"

    def pred(depth):
        if depth == 0 or rng.random() < 0.4:
            return leaf()
        a, b = pred(depth - 1), pred(depth - 1)
        if rng.random() < 0.2:
            return f"NOT ({a})"
        return f"({a}) {rng.choice(['AND', 'OR'])} ({b})"

    for trial in range(25):
        where = pred(2)
        got, _res = rel.scan_where(where)
        want = full.filter(F.expr(where))
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.collect())
        assert g == w, f"trial {trial}: {where}\n got={len(g)} want={len(w)}"


def test_pushdown_skipped_under_pending_upserts(astro):
    rel = _rel(astro)
    # upsert size for k=25 (newer fragment); pre-merge filtering on the
    # old value would resurrect the stale row — pushdown must disable
    astro.sql("INSERT INTO sftab VALUES (25, 'n025', 999, 37.5)")
    rel = _rel(astro)
    assert rel.needs_merge()
    df, _res = rel.scan_where("size = 25")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(size,25)" not in plan, plan
    assert sorted(r.k for r in df.collect()) == [225]


def test_float_range_conversions():
    """r8 (VERDICT r7 #5): float/double BETWEEN-style conjuncts convert
    to per-sign per-width lex range unions inside the plain-notation
    regime (1e-3 <= |x| < 1e7); anything touching the E-notation regime
    refuses (a satisfying value stored as '1.0E7' would escape any
    plain-decimal range)."""
    # two-sided positive range, one width
    s = conv("price >= 10.5 AND price <= 99.25")
    assert s is not None and "'10.5'" in s and "'99.25'" in s
    # spanning widths: full middle width uses sentinels
    s = conv("price >= 9.5 AND price <= 150.25")
    assert "'9.5'" in s and "'9:'" in s       # width-1 tail
    assert "'10'" in s and "'99:'" in s       # width-2 fully covered
    assert "'100'" in s and "'150.25'" in s   # width-3 head
    # negative range (lex reversal handled by magnitude mirroring)
    s = conv("price >= -99.5 AND price <= -10.25")
    assert s is not None and "'-10.25'" in s and "'-99.5'" in s
    # zero-crossing / tiny / huge → refuse
    assert conv("price >= -1.5 AND price <= 2.5") is None
    assert conv("price >= 0.0001 AND price <= 0.5") is None
    assert conv("price >= 5.0 AND price <= 10000000.0") is None
    # r9 (VERDICT r8 #4): single-sided bounds convert — plain range
    # closed at the regime boundary plus E-notation/Infinity/NaN residue
    # blocks (sound superset; see _sf_float_onesided)
    s = conv("price >= 10.5")
    assert s is not None and "'10.5'" in s and "'9999999" in s
    assert "'1.0E'" in s and "Infinity" in s and "NaN" in s
    s = conv("price <= -10.5")
    assert s is not None and "'-10.5'" in s and "'-1.0E'" in s
    assert "'-Infinity'" in s and "NaN" not in s  # NaN never <= negative
    s = conv("price < 250.0")
    assert s is not None and "(price >= '-' AND price < '.')" in s
    # pairs ride along with other conjuncts
    s = conv("size = 25 AND price >= 10.5 AND price <= 20.5")
    assert "(size = '25')" in s and "'10.5'" in s


def test_float_repr_matches_spark_cast(spark):
    """Core assumption of the float pushdown: inside the plain regime,
    python repr() and Spark's CAST(double/float AS STRING) emit the SAME
    shortest-decimal digits."""
    vals = [
        0.001, 0.0015, 0.1, 0.3, 1.0, 1.5, 2.25, 9.999, 10.0, 99.25,
        123.456, 9999.5, 999999.875, 1234567.0, 9999999.0, 9999999.5,
    ]
    vals += [-v for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.s for r in df.selectExpr("CAST(x AS STRING) AS s").collect()]
    assert got == [repr(v) for v in vals]
    # float32 column: Spark casts the FLOAT value's own shortest repr
    fdf = spark.createDataFrame([(0.5,), (2.25,), (123.5,)], "x float")
    fgot = [r.s for r in fdf.selectExpr("CAST(x AS STRING) AS s").collect()]
    assert fgot == ["0.5", "2.25", "123.5"]
    # OUT-of-regime values store as Java scientific notation — the
    # premise of the one-sided residue blocks (r9) and of the property
    # test's storage emulator; every mantissa is 'd.xxx', d in 1..9
    ovals = [1e7, 2.5e8, 0.0005, -0.0005, 1e-5, 1.7e308, 5e-324]
    odf = spark.createDataFrame([(v,) for v in ovals], "x double")
    ogot = [r.s for r in odf.selectExpr("CAST(x AS STRING) AS s").collect()]
    assert ogot == ["1.0E7", "2.5E8", "5.0E-4", "-5.0E-4", "1.0E-5",
                    "1.7E308", "4.9E-324"], ogot


def test_float_repr_matches_spark_cast_random_bits(spark):
    """ADVICE r8: the pushdown's superset soundness rests on digit
    identity between python repr() and the JVM's Double.toString, but
    JDKs < 19 use legacy FloatingDecimal, which is not FORMALLY
    shortest-repr.  Sweep 50k seeded random in-regime bit patterns
    through the LIVE SparkSession so a JDK where the two diverge fails
    loudly here instead of silently dropping rows at scan time."""
    import random
    import struct

    rng = random.Random(0xA57802)
    vals = []
    # (a) log-uniform magnitudes across the whole plain regime
    import math

    while len(vals) < 25_000:
        x = 10.0 ** rng.uniform(-3, 7)
        if 1e-3 <= x < 1e7:
            vals.append(x if rng.random() < 0.5 else -x)
    # (b) raw random mantissa/exponent bit patterns, filtered to regime —
    # exercises reprs the log-uniform draw never hits (subnormal-dense
    # mantissas, trailing-zero patterns)
    while len(vals) < 50_000:
        (x,) = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))
        if x == x and 1e-3 <= abs(x) < 1e7:
            vals.append(x)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.s for r in df.selectExpr("CAST(x AS STRING) AS s").collect()]
    bad = [(v, g) for v, g in zip(vals, got) if g != repr(v)]
    assert not bad, f"{len(bad)} repr divergences, first: {bad[:3]}"


def test_float_range_rows_exact_e2e(astro):
    """End-to-end over real stringformat storage: the pushed float range
    reaches the plan and the typed re-filter keeps rows exact."""
    rel = _rel(astro)
    df, _res = rel.scan_where("price >= 100.5 AND price <= 200.25")
    spark = df.sparkSession
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "GreaterThanOrEqual(price,100.5)" in plan, plan
    want = sorted(i for i in range(1, 401) if 100.5 <= i * 1.5 <= 200.25)
    assert sorted(r.k for r in df.collect()) == want
    # negative + boundary fuzz against the plain typed filter
    full = rel.scan()
    for where in [
        "price >= 1.5 AND price <= 1.5",
        "price > 0.001 AND price < 599.9",
        "price >= 9.0 AND price <= 10.5 AND size >= 0",
        "k < 200 AND price >= 150.0 AND price <= 300.0",
    ]:
        got, _ = rel.scan_where(where)
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in full.filter(F.expr(where)).collect())
        assert g == w, where


def test_float_onesided_rows_exact_e2e(astro):
    """r9 (VERDICT r8 #4): one-sided float predicates over real
    stringformat storage — the pushed superset reaches the plan and the
    typed re-filter keeps rows exact, including OR shapes and strict
    bounds."""
    rel = _rel(astro)
    full = rel.scan()
    for where in [
        "price >= 450.0",
        "price > 100.5",
        "price <= 30.0",
        "price < 1.5",
        "price = 300.0",
        "price >= 100.0 OR size = 3",
        "k < 200 AND price > 450.0",
        "size >= 10 AND price <= 90.0",
    ]:
        got, _ = rel.scan_where(where)
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in full.filter(F.expr(where)).collect())
        assert g == w, where
    # the pushed one-sided filter appears in the physical plan
    df, _ = rel.scan_where("price >= 450.0")
    spark = df.sparkSession
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "GreaterThanOrEqual(price,450.0)" in plan, plan

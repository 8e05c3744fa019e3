"""Temporal join operators: as-of join + binned interval join.

Oracles: brute-force python loops (and pandas.merge_asof for the
backward-inclusive case) over seeded random data — independent
formulations of the same semantics.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from spark_sql_on_hbase_spark.operators.temporal import asof_join, interval_join_binned

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _mk_events(seed: int, n_keys: int, n_left: int, n_right: int):
    rng = random.Random(seed)
    left = [
        (rng.randrange(n_keys), _ts(rng.randrange(0, 10_000)), float(i))
        for i in range(n_left)
    ]
    # unique (key, ts) on the right — the operator's documented contract
    seen, right = set(), []
    while len(right) < n_right:
        k, t = rng.randrange(n_keys), rng.randrange(0, 10_000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right.append((k, _ts(t), float(1000 + len(right))))
    return left, right


def _brute_asof(left, right, strict=False, tolerance_us=None):
    out = []
    for k, lt, lv in left:
        cands = [
            (rt, rv)
            for rk, rt, rv in right
            if rk == k and (rt < lt if strict else rt <= lt)
        ]
        if cands:
            rt, rv = max(cands)
            if tolerance_us is not None and (lt - rt).total_seconds() * 1e6 > tolerance_us:
                rt, rv = None, None
        else:
            rt, rv = None, None
        out.append((k, lt, lv, rt, rv))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("strict,tol", [(False, None), (True, None), (False, 600_000_000)])
def test_asof_join_matches_bruteforce(spark, seed, strict, tol):
    left, right = _mk_events(seed, n_keys=5, n_left=80, n_right=60)
    ldf = spark.createDataFrame(left, "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double")
    got = asof_join(ldf, rdf, on=["k"], strict=strict, tolerance_us=tol)
    assert got.columns == ["k", "ts", "lv", "ts_r", "rv_r"]
    rows = sorted(
        ((r.k, r.ts, r.lv, r.ts_r, r.rv_r) for r in got.collect()),
        key=lambda r: (r[0], r[1], r[2]),
    )
    assert rows == _brute_asof(left, right, strict=strict, tolerance_us=tol)


def test_asof_join_matches_pandas_merge_asof(spark):
    pd = pytest.importorskip("pandas")
    left, right = _mk_events(7, n_keys=4, n_left=120, n_right=90)
    ldf = spark.createDataFrame(left, "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double")
    got = (
        asof_join(ldf, rdf, on=["k"])
        .toPandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(left, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values("ts")
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="k", suffixes=("", "_r"), direction="backward")
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    assert list(got["rv_r"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_join_single_shuffle(spark):
    left, right = _mk_events(11, n_keys=3, n_left=30, n_right=20)
    ldf = spark.createDataFrame(left, "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double")
    plan = asof_join(ldf, rdf, on=["k"])._jdf.queryExecution().executedPlan().toString()
    # sort-merge formulation: no join operator at all, exactly one exchange
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def _mk_intervals(seed: int, n_points: int, n_iv: int, max_span: int):
    rng = random.Random(seed)
    pts = [(i, _ts(rng.randrange(0, 50_000))) for i in range(n_points)]
    ivs = []
    for j in range(n_iv):
        s = rng.randrange(0, 50_000)
        ivs.append((j, _ts(s), _ts(s + rng.randrange(1, max_span))))
    return pts, ivs


@pytest.mark.parametrize("seed,bin_s", [(1, 60), (2, 37), (3, 500), (4, 7)])
def test_interval_join_matches_bruteforce(spark, seed, bin_s):
    pts, ivs = _mk_intervals(seed, n_points=150, n_iv=40, max_span=900)
    pdf = spark.createDataFrame(pts, "pid int, pts timestamp")
    idf = spark.createDataFrame(ivs, "iid int, s timestamp, e timestamp")
    got = interval_join_binned(pdf, idf, "pts", "s", "e", bin_seconds=bin_s)
    rows = sorted((r.pid, r.iid) for r in got.collect())
    exp = sorted(
        (pid, iid) for pid, pt in pts for iid, s, e in ivs if s <= pt < e
    )
    assert rows == exp


def test_interval_join_left_points_keeps_unmatched(spark):
    pts, ivs = _mk_intervals(5, n_points=100, n_iv=10, max_span=300)
    pdf = spark.createDataFrame(pts, "pid int, pts timestamp")
    idf = spark.createDataFrame(ivs, "iid int, s timestamp, e timestamp")
    got = interval_join_binned(pdf, idf, "pts", "s", "e", 60, how="left_points")
    by_pid = {}
    for r in got.collect():
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert set(by_pid) == {pid for pid, _ in pts}  # every point survives
    exp_matched = {
        pid: sorted(iid for iid, s, e in ivs if s <= pt < e) or [None]
        for pid, pt in pts
    }
    assert {p: sorted(v, key=lambda x: (x is None, x)) for p, v in by_pid.items()} == exp_matched


def test_interval_join_no_nested_loop(spark):
    pts, ivs = _mk_intervals(6, n_points=50, n_iv=20, max_span=300)
    pdf = spark.createDataFrame(pts, "pid int, pts timestamp")
    idf = spark.createDataFrame(ivs, "iid int, s timestamp, e timestamp")
    plan = (
        interval_join_binned(pdf, idf, "pts", "s", "e", 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_explosion_guard(spark):
    pdf = spark.createDataFrame([(1, _ts(0))], "pid int, pts timestamp")
    idf = spark.createDataFrame([(1, _ts(0), _ts(50_000))], "iid int, s timestamp, e timestamp")
    with pytest.raises(ValueError, match="bins"):
        interval_join_binned(pdf, idf, "pts", "s", "e", 1, max_bins_per_interval=100)

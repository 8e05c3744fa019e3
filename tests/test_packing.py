"""Greedy sequence packing vs a python reference implementation."""

from __future__ import annotations

import random

import pytest

from spark_sql_on_hbase_spark.operators.packing import pack_greedy


def _ref_pack(rows, budget):
    """rows: (group, order, size) → {(group, order): pack_id}"""
    out = {}
    by_g = {}
    for g, o, s in rows:
        by_g.setdefault(g, []).append((o, s))
    for g, items in by_g.items():
        pid, acc = 0, 0
        for i, (o, s) in enumerate(sorted(items)):
            if i == 0 or acc + s <= budget:
                acc += s
            else:
                pid += 1
                acc = s
            out[(g, o)] = pid
    return out


@pytest.mark.parametrize("seed,budget", [(1, 100), (2, 50), (3, 1000), (4, 7)])
def test_pack_greedy_matches_reference(spark, seed, budget):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(6)}", i, rng.randrange(1, 60))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, o long, sz long")
    got = {(r.g, r.o): r.pack_id for r in pack_greedy(df, "g", "o", "sz", budget).collect()}
    assert got == _ref_pack(rows, budget)


def test_pack_greedy_never_overfills_and_is_dense(spark):
    rng = random.Random(9)
    rows = [(f"g{rng.randrange(3)}", i, rng.randrange(1, 40)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, o long, sz long")
    out = pack_greedy(df, "g", "o", "sz", 100).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault((r.g, r.pack_id), []).append(r.sz)
    for (_, _), sizes in by_pack.items():
        assert sum(sizes) <= 100  # no multi-doc pack exceeds the budget
    for g in {r.g for r in out}:
        pids = sorted({r.pack_id for r in out if r.g == g})
        assert pids == list(range(len(pids)))  # pack ids are dense from 0


def test_pack_greedy_oversized_doc_gets_own_pack(spark):
    rows = [("g", 0, 10), ("g", 1, 500), ("g", 2, 10)]
    df = spark.createDataFrame(rows, "g string, o long, sz long")
    got = {r.o: r.pack_id for r in pack_greedy(df, "g", "o", "sz", 100).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_pack_greedy_deterministic_across_partitionings(spark):
    rows = [(f"g{i % 4}", i, 10 + i % 30) for i in range(120)]
    a = spark.createDataFrame(rows, "g string, o long, sz long")
    b = spark.createDataFrame(list(reversed(rows)), "g string, o long, sz long").repartition(7)
    pa = sorted((r.g, r.o, r.pack_id) for r in pack_greedy(a, "g", "o", "sz", 80).collect())
    pb = sorted((r.g, r.o, r.pack_id) for r in pack_greedy(b, "g", "o", "sz", 80).collect())
    assert pa == pb

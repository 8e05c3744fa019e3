"""r8: randomized write-lifecycle fuzz for the island-closure pruned
rewrite — interleaved upsert INSERTs, key-pruned DELETEs, NULL-assigning
UPDATEs, MERGE-deletes and a mid-sequence COMPACT, checked row-for-row
after every step against a driver-side Python model of the table (the
semantics: per-column newest non-null wins for upserts, ANSI NULL for
explicit SET NULL, deletes remove).  Kept fragments must stay
inode-identical whenever the engine claims a partial rewrite.
"""

import os
import random

import pytest

# r16 (VERDICT r15 #1): randomized lifecycle fuzz sweeps are the slow
# lane; the deterministic lifecycle coverage lives in test_write_pruned /
# test_rewrite_merge_on_read
pytestmark = pytest.mark.slow

from spark_sql_on_hbase_spark.session import AstroSession


def _idents(astro, name, ino=True):
    d = astro.catalog.data_dir(astro.relation(name).meta)
    out = {}
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(d, f))
            # fsops copy mode rematerializes kept fragments (no hard
            # links), so inode identity becomes size identity there
            out[f] = (st.st_ino, st.st_size) if ino else st.st_size
    return out


def _table_rows(astro, name):
    return {
        r.k: (r.v, r.n)
        for r in astro.sql(f"SELECT k, v, n FROM {name}").collect()
    }


@pytest.mark.parametrize(
    "seed,retain,fsmode",
    [(11, False, "posix"), (23, False, "posix"), (47, False, "posix"),
     (61, False, "posix"), (83, False, "posix"),
     # r10 (VERDICT r9 #1): the same lifecycle under MVCC retention —
     # every pre-write snapshot recorded along the way must stay
     # byte-stable until the next COMPACT folds history
     (11, True, "posix"), (83, True, "posix"),
     # r11 (VERDICT r10 #7): the whole lifecycle in fsops COPY mode —
     # the object-store fallback (no hard links, no atomic dir rename)
     # must be behavior-identical; kept fragments compare by size
     (29, True, "copy"), (53, False, "copy")],
)
def test_pruned_rewrite_lifecycle_fuzz(spark, tmp_path, seed, retain, fsmode, monkeypatch):
    from spark_sql_on_hbase_spark import fsops

    monkeypatch.setattr(fsops, "_mode", fsmode)
    ino = fsmode == "posix"
    rng = random.Random(seed)
    name = f"fz{seed}{'r' if retain else ''}{fsmode[0]}"
    astro = AstroSession(spark, str(tmp_path / f"wh{seed}{retain}{fsmode}"))
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k},{k * 10}\n" for k in range(1, 301)))
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, n INT, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=6"
        + (", retain_history=true" if retain else "")
        + ")"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    model = {k: (f"v{k}", k * 10) for k in range(1, 301)}
    # retention invariant: (generation, expected rows) recorded after
    # every step; all must replay exactly until a COMPACT folds them
    snapshots: list[tuple[int, dict]] = []

    def check(step):
        got = _table_rows(astro, name)
        assert got == model, (
            f"seed {seed} step {step}: {len(got)} rows vs model {len(model)}; "
            f"diff keys={sorted(set(got) ^ set(model))[:10]}"
        )
        # r9 time-travel invariant — the PRESENT is always reachable via
        # TIMESTAMP AS OF, no matter which write plan last ran (the r8
        # keyset purge could strand history_floor above every surviving
        # generation, bricking all versioned reads until COMPACT):
        # resolving "now" must land at/above the floor and that snapshot
        # must equal the current table
        import time as _t

        rel = astro.relation(name)
        if rel.meta.generation_times:
            n_asof = rel.seq_for_timestamp(_t.time() + 1)
            assert n_asof >= rel.meta.history_floor, (
                f"seed {seed} step {step}: now-resolve {n_asof} below "
                f"floor {rel.meta.history_floor}"
            )
            snap = {
                r.k: (r.v, r.n)
                for r in rel.scan(as_of_seq=n_asof).select("k", "v", "n").collect()
            }
            assert snap == model, f"seed {seed} step {step}: as-of-now snapshot diverges"
            if retain:
                # r10: every previously recorded snapshot must replay
                # EXACTLY — retention means no write ever folds history
                for gen, want in snapshots:
                    old = {
                        r.k: (r.v, r.n)
                        for r in rel.scan(as_of_seq=gen)
                        .select("k", "v", "n")
                        .collect()
                    }
                    assert old == want, (
                        f"seed {seed} step {step}: retained snapshot at "
                        f"generation {gen} diverged"
                    )
                snapshots.append((n_asof, dict(model)))

    for step in range(10):
        op = rng.choice(
            [
                "insert",
                "delete",
                "update_null",
                "merge_delete",
                "compact",
                "delete_residual",
                "update_null_residual",
            ]
        )
        if op == "insert":
            for _ in range(rng.randrange(1, 4)):
                k = rng.randrange(1, 351)
                nv, nn = f"u{k}_{step}", k * 100 + step
                astro.sql(f"INSERT INTO {name} VALUES ({k}, '{nv}', {nn})")
                model[k] = (nv, nn)
        elif op == "delete":
            lo = rng.randrange(1, 340)
            hi = lo + rng.randrange(0, 25)
            before = _idents(astro, name, ino)
            astro.sql(f"DELETE FROM {name} WHERE k BETWEEN {lo} AND {hi}")
            stats = astro.last_write_stats
            if stats and stats["files_rewritten"] < stats["files_total"]:
                after = _idents(astro, name, ino)
                for f in set(before) & set(after):
                    assert before[f] == after[f], f"kept fragment {f} changed"
            for k in range(lo, hi + 1):
                model.pop(k, None)
        elif op == "delete_residual":
            # residual predicate (n is not a key): exercises the resolved
            # island rewrite AND, when islands collapse, the
            # resolved-key-set purge — decisions use RESOLVED values
            lo = rng.randrange(1, 340)
            hi = lo + rng.randrange(0, 40)
            t = rng.randrange(0, 40000)
            before = _idents(astro, name, ino)
            astro.sql(
                f"DELETE FROM {name} WHERE k BETWEEN {lo} AND {hi} AND n >= {t}"
            )
            stats = astro.last_write_stats
            if stats and stats["files_rewritten"] < stats["files_total"]:
                after = _idents(astro, name, ino)
                for f in set(before) & set(after):
                    assert before[f] == after[f], f"kept fragment {f} changed"
            for k in list(model):
                if lo <= k <= hi and model[k][1] >= t:
                    del model[k]
        elif op == "update_null_residual":
            lo = rng.randrange(1, 340)
            hi = lo + rng.randrange(0, 30)
            t = rng.randrange(0, 40000)
            astro.sql(
                f"UPDATE {name} SET v = NULL "
                f"WHERE k BETWEEN {lo} AND {hi} AND n < {t}"
            )
            for k in list(model):
                if lo <= k <= hi and model[k][1] < t:
                    model[k] = (None, model[k][1])
        elif op == "update_null":
            k = rng.randrange(1, 351)
            astro.sql(f"UPDATE {name} SET v = NULL WHERE k = {k}")
            if k in model:
                model[k] = (None, model[k][1])
        elif op == "merge_delete":
            ks = sorted({rng.randrange(1, 351) for _ in range(3)})
            src = " UNION ALL ".join(f"SELECT {k} AS kk" for k in ks)
            astro.sql(
                f"MERGE INTO {name} t USING ({src}) s ON t.k = s.kk "
                "WHEN MATCHED THEN DELETE"
            )
            for k in ks:
                model.pop(k, None)
        else:
            astro.sql(f"COMPACT TABLE {name}")
            snapshots.clear()  # the reclaim point folds retained history
        check(step)

    # end state: a compact folds everything back to the fast path
    astro.sql(f"COMPACT TABLE {name}")
    snapshots.clear()
    check("final")
    assert not astro.relation(name).needs_merge()
    assert not astro.relation(name).meta.retired_regions  # reclaimed


@pytest.mark.parametrize("seed", [5, 9])
def test_zorder_delete_fuzz(spark, tmp_path, seed):
    """Repeated pruned deletes on a z-order table: contents match the
    model, dim-box pruning stays sound after each box recompute, kept
    z-files stay inode-identical on partial rewrites."""
    rng = random.Random(seed)
    name = f"zf{seed}"
    astro = AstroSession(spark, str(tmp_path / f"zwh{seed}"))
    astro.sql(
        f"CREATE TABLE {name} (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        f"MAPPED BY ({name}_ht, COLS=[v=f.v]) OPTIONS(regions=8, layout=zorder)"
    )
    rel = astro.relation(name)
    df = spark.range(6_000).selectExpr(
        "CAST(pmod(id * 7, 200) AS INT) k1",   # unique (k1, k2) pairs
        "CAST(floor(id / 200) AS INT) k2",
        "CAST(id AS DOUBLE) v",
    )
    rel.write(df)
    rel.register_view(name)
    model = {
        ((i * 7) % 200, i // 200): float(i) for i in range(6_000)
    }

    for step in range(5):
        dim = rng.choice(["k1", "k2"])
        if dim == "k1":
            lo = rng.randrange(0, 190)
            hi = lo + rng.randrange(0, 15)
        else:
            lo = rng.randrange(0, 28)
            hi = lo + rng.randrange(0, 3)
        before = _idents(astro, name)
        astro.sql(f"DELETE FROM {name} WHERE {dim} BETWEEN {lo} AND {hi}")
        stats = astro.last_write_stats
        if stats and stats["files_rewritten"] < stats["files_total"]:
            after = _idents(astro, name)
            for f in set(before) & set(after):
                assert before[f] == after[f], f"kept z-file {f} changed"
        sel = 0 if dim == "k1" else 1
        model = {kk: vv for kk, vv in model.items() if not lo <= kk[sel] <= hi}
        got = {
            (r.k1, r.k2): r.v
            for r in astro.sql(f"SELECT k1, k2, v FROM {name}").collect()
        }
        assert got == model, f"seed {seed} step {step}: {len(got)} vs {len(model)}"
        rel = astro.relation(name)
        assert rel.meta.layout == "zorder" and not rel.needs_merge()
        # pruned scan soundness on a random box after the rewrite
        a, b = rng.randrange(0, 180), rng.randrange(0, 25)
        pred = f"k1 BETWEEN {a} AND {a + 20} AND k2 BETWEEN {b} AND {b + 4}"
        got_w, _res = rel.scan_where(pred)
        want = {
            kk for kk in model
            if a <= kk[0] <= a + 20 and b <= kk[1] <= b + 4
        }
        assert {(r.k1, r.k2) for r in got_w.collect()} == want

"""Dev harness mimicking the driver's correctness gate.

Runs every __spark_entry__ query at the given sf, runs its DuckDB oracle,
and compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded to 9 significant
digits before hashing — slightly *stricter* than typical driver harnesses
so anything passing here should pass there).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: SPARK ERROR {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: ORACLE ERROR {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in dcols) and sorted(c.lower() for c in scols) != sorted(
            c.lower() for c in dcols
        ):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            hs = table_hash(scols, srows)
            hd = table_hash([c.lower() for c in dcols], drows)
            if hs != hd:
                problems.append(f"valuehash spark={hs} duck={hd}")
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
                ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("\x01".join(norm_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  first diff:\n    spark={a[:200]}\n    duck ={b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

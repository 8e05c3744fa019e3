"""Interactive SQL shell — parity with the reference's ``astro>`` REPL.

Reference: ``HBaseSQLCliDriver.main/process`` (HBaseSQLCliDriver.scala:
29-183) — a jline loop routing statements to ``HBaseSQLContext.sql`` —
and the ``bin/hbase-sql`` / ``bin/pyspark-hbase`` launchers.  Here the
engine is Python-first, so the shell is a stdlib REPL over AstroSession:

    python -m spark_sql_on_hbase_spark.cli --warehouse /path/to/wh

Statements end with ';' (multi-line supported); DDL/DML (CREATE TABLE …
MAPPED BY, LOAD DATA, INSERT, ALTER, SHOW, DESCRIBE, DROP) run through
the Astro grammar, everything else through plain spark.sql.
"""

from __future__ import annotations

import argparse
import sys


def _print_df(df, max_rows: int, out=sys.stdout) -> None:
    rows = df.limit(max_rows + 1).collect()
    cols = df.columns
    shown = rows[:max_rows]
    widths = [
        max(len(c), *(len(str(r[i])) for r in shown)) if shown else len(c)
        for i, c in enumerate(cols)
    ]
    line = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(line, file=out)
    print("|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", file=out)
    print(line, file=out)
    for r in shown:
        print("|" + "|".join(f" {str(r[i]):<{w}} " for i, w in enumerate(widths)) + "|", file=out)
    print(line, file=out)
    if len(rows) > max_rows:
        print(f"(showing first {max_rows} rows)", file=out)


# HELP topics — HBaseSQLCliDriver.printHelp (HBaseSQLCliDriver.scala:140-178)
_HELP = {
    "CREATE": "CREATE TABLE table_name (col_name data_type, ..., PRIMARY KEY(col_name, ...))\n"
    "  MAPPED BY (htable_name, COLS=[col_name=family_name.qualifier]) [IN stringformat]\n"
    "  [OPTIONS (regions=N, align=K, layout=zorder|range,\n"
    "            retain_history=true|false, bloomfilter=row|none,\n"
    "            autocompact=K)]   (K>0: fold back to num_regions files\n"
    "             when live fragments exceed K*regions after an append;\n"
    "             exclusive with retain_history — compaction folds history)\n"
    "  (bloomfilter=row: per-fragment ROW bloom sidecars — full-key =/IN\n"
    "   lookups skip LSM fragments that provably lack the key)",
    "DROP": "DROP TABLE table_name   (drops the table's secondary indexes too)",
    "INDEX": "CREATE INDEX [IF NOT EXISTS] ON table_name (col) [INCLUDE (c1, ...)]\n"
    "DROP INDEX ON table_name (col)\n"
    "REINDEX TABLE table_name   (rebuild stale-heavy indexes, e.g. after\n"
    "                            INSERT OVERWRITE or a purge DELETE; also\n"
    "                            re-attests covering/index-only reads)\n"
    "  (secondary index on a NON-KEY column — =/IN and non-string range\n"
    "   scans route through a derived index table keyed (col, *key_cols),\n"
    "   maintained on every write; superset semantics, full predicate\n"
    "   re-verified; over-cap lookups become a distributed semi-join, and\n"
    "   unselective ones fall back to a full scan.  INCLUDE stores covered\n"
    "   columns for index-only scans (scan_covering).  binaryformat tables\n"
    "   only; DESCRIBE EXTENDED lists a table's indexes)",
    "ALTER": "ALTER TABLE table_name ADD col_name data_type MAPPED BY (family_name.qualifier)\n"
    "ALTER TABLE table_name DROP col_name\n"
    "  (non-key columns only; the schema is NOT versioned — every read,\n"
    "   including VERSION/TIMESTAMP AS OF, CHANGES and RESTORE, projects\n"
    "   the CURRENT columns: an ADDed column is NULL in pre-ALTER data,\n"
    "   a DROPped one disappears everywhere.  The ALTER itself commits a\n"
    "   generation and shows in DESCRIBE HISTORY)",
    "LOAD": "LOAD [PARALL] DATA [LOCAL] INPATH file_path [OVERWRITE] INTO TABLE table_name "
    "[FIELDS TERMINATED BY char]",
    "SELECT": "SELECT [DISTINCT] select_expr, ... FROM table_reference [WHERE ...] "
    "[GROUP BY ...] [HAVING ...] [ORDER BY ...] [LIMIT n]",
    "INSERT": "INSERT INTO table_name SELECT ... | INSERT INTO table_name VALUES (...)[, (...)]\n"
    "INSERT OVERWRITE [TABLE] table_name SELECT ... | VALUES (...)   (atomic replace)",
    "MERGE": "MERGE INTO target [AS t] USING (source | (SELECT ...)) [AS s] ON cond\n"
    "  [WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, ... | DELETE]\n"
    "  [WHEN NOT MATCHED [AND cond] THEN INSERT * | (cols) VALUES (exprs)]",
    "VERSION": "SELECT ... FROM table_name VERSION AS OF n\n"
    "  (generation-N snapshot; DESCRIBE EXTENDED shows max_generation — "
    "history folds at COMPACT/OVERWRITE and floors at a pruned DELETE/UPDATE)",
    "TIMESTAMP": "SELECT ... FROM table_name TIMESTAMP AS OF epoch_seconds | 'YYYY-MM-DD HH:MM:SS'\n"
    "  (newest generation committed at or before the UTC timestamp; "
    "DESCRIBE EXTENDED lists per-generation commit times)",
    "CHANGES": "SELECT ... FROM table_name CHANGES FROM n [TO m] [WITH NOOP FILTER]\n"
    "  (bounds are generation numbers, or quoted UTC timestamps resolved like\n"
    "   TIMESTAMP AS OF: ... CHANGES FROM '2026-08-15 12:00:00';\n"
    "   change-data feed between the generation-n and generation-m snapshots;\n"
    "   columns + _change_type [insert/update/delete] + _commit_seq.  Deletes\n"
    "   carry pre-image values and appear on retain_history tables only; n\n"
    "   must be at/above the history floor [DESCRIBE EXTENDED lists it]; TO\n"
    "   defaults to the newest committed generation; WITH NOOP FILTER drops\n"
    "   unchanged-survivor update rows)",
    "COMPACT": "COMPACT TABLE table_name   (rewrite LSM fragments into clean sorted regions)",
    "RESTORE": "RESTORE TABLE table_name TO VERSION AS OF n\n"
    "RESTORE TABLE table_name TO TIMESTAMP AS OF epoch | 'YYYY-MM-DD HH:MM:SS'\n"
    "  (roll back to a past snapshot as a NEW commit; on retain_history\n"
    "   tables the restore is itself versioned — the rolled-back state\n"
    "   stays readable and a second RESTORE undoes the first; without\n"
    "   retention history folds to the restored contents)",
    "VACUUM": "VACUUM TABLE table_name [RETAIN n GENERATIONS | RETAIN n HOURS] [DRY RUN]\n"
    "  (reclaim MVCC-retained fragments only — retain_history tables; live\n"
    "   data untouched, pre-rewrite snapshots refuse afterwards; COMPACT\n"
    "   additionally rewrites the live fragments.  RETAIN bounds the\n"
    "   reclaim — the newest n retirement generations, or retirements\n"
    "   committed within the last n hours, keep their snapshots readable\n"
    "   [the change-feed consumer grace window]; DRY RUN lists the\n"
    "   reclaimable fragments + the floor the real run would set, without\n"
    "   deleting anything)",
    "UPDATE": "UPDATE table_name SET col = expr, ... [WHERE cond]",
    "DELETE": "DELETE FROM table_name [WHERE cond]\n"
    "  (key-only predicates purge matching keys per fragment, erasing them\n"
    "   from history too [history: purged]; residual predicates rewrite\n"
    "   resolved islands — or purge the resolved matching keys when islands\n"
    "   degenerate — folding snapshots to the present while commit stamps\n"
    "   since the floor generation keep resolving to the purged view\n"
    "   [history: folded-purge]; non-sargable = full rewrite [folded].\n"
    "   OPTIONS(retain_history=true) tables instead RETIRE replaced\n"
    "   fragments [history: retained]: every pre-rewrite snapshot stays\n"
    "   readable until COMPACT/OVERWRITE reclaims.\n"
    "   The chosen plan is reported in last_write_stats.history)",
    "DESCRIBE": "DESCRIBE [EXTENDED] table_name\n"
    "DESCRIBE HISTORY table_name\n"
    "  (HISTORY: one row per committed generation, newest first — commit\n"
    "   time, operation, live/retired file counts, snapshot readability)",
    "SHOW": "SHOW TABLES",
    "EXPLAIN": "EXPLAIN SCAN table_name [COLUMNS (c1, ...)] WHERE cond\n"
    "  (the engine-side scan plan: files read/pruned via CPR ranges,\n"
    "   bloom sidecars (probe/skip counts) and secondary indexes (mode,\n"
    "   candidate counts, decline reasons), the pushed-vs-residual\n"
    "   predicate split, the stringformat pushdown superset, and\n"
    "   pending-merge state.  COLUMNS additionally reports the\n"
    "   covering-index decision for that projection.  Plain Spark\n"
    "   EXPLAIN SELECT ... still falls through to Spark SQL)",
}


def _print_help(token: list[str], out) -> None:
    if len(token) > 1 and token[1].upper() in _HELP:
        print(_HELP[token[1].upper()], file=out)
    else:
        print("Available commands: " + " ".join(sorted(_HELP)) + " — HELP <command> for syntax", file=out)


def repl(astro, out=sys.stdout, inp=sys.stdin, max_rows: int = 50) -> None:
    import time as _time

    buf: list[str] = []
    prompt = "astro> "
    cont = "     > "
    while True:
        print(prompt if not buf else cont, end="", flush=True, file=out)
        line = inp.readline()
        if not line:  # EOF
            break
        line = line.strip()
        if not buf and line.lower() in ("exit", "quit", "exit;", "quit;"):
            break
        if not buf and line.rstrip(";").upper().split()[:1] == ["HELP"]:
            _print_help(line.rstrip(";").split(), out)
            continue
        if not line:
            continue
        buf.append(line)
        if not line.endswith(";"):
            continue
        stmt = " ".join(buf).rstrip(";").strip()
        buf = []
        if not stmt:
            continue
        try:
            t0 = _time.time()
            _print_df(astro.sql(stmt), max_rows, out=out)
            print(f"Time taken: {_time.time() - t0:.3f} seconds", file=out)
        except Exception as ex:  # keep the shell alive on bad SQL
            print(f"Error: {ex}", file=out)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="astro-sql", description=__doc__)
    ap.add_argument("--warehouse", required=True, help="Astro warehouse directory")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("-e", "--execute", help="run one statement and exit")
    ap.add_argument("--max-rows", type=int, default=50)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from spark_sql_on_hbase_spark.session import AstroSession

    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    builder = (
        SparkSession.builder.master(args.master)
        .appName("astro-sql")
        .config("spark.sql.adaptive.enabled", "true")
    )
    for k, v in local_shuffle_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    astro = AstroSession(spark, args.warehouse)
    print("astro engine ready — AstroSession available; statements end with ';'")
    if args.execute:
        _print_df(astro.sql(args.execute.rstrip(";")), args.max_rows)
        return 0
    repl(astro, max_rows=args.max_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())

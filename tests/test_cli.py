"""CLI REPL tests (reference: astro> shell, HBaseSQLCliDriver.scala:29-183)."""

import io

from spark_sql_on_hbase_spark.cli import repl
from spark_sql_on_hbase_spark.session import AstroSession


def test_repl_roundtrip(spark, tmp_path):
    astro = AstroSession(spark, str(tmp_path / "wh"))
    astro.sql("CREATE TABLE t (k INT, v STRING, PRIMARY KEY(k)) MAPPED BY (ht, COLS=[v=f.v])")
    astro.sql("INSERT INTO t VALUES (1, 'one')")
    astro.sql("INSERT INTO t VALUES (2, 'two')")
    out = io.StringIO()
    inp = io.StringIO(
        "SELECT * FROM t\nORDER BY k;\n"   # multi-line statement
        "SHOW TABLES;\n"
        "BAD SQL;\n"                        # error keeps the shell alive
        "SELECT count(*) AS n FROM t;\n"
        "exit\n"
    )
    repl(astro, out=out, inp=inp)
    text = out.getvalue()
    assert "one" in text and "two" in text
    assert "tableName" in text
    assert "Error:" in text
    assert text.index("Error:") < text.rindex("| 2 ")  # statement after error ran


def test_repl_help_and_timing(spark, tmp_path):
    """HELP [command] prints syntax (HBaseSQLCliDriver.scala:140-178
    parity) and each statement reports its wall time."""
    astro = AstroSession(spark, str(tmp_path / "wh"))
    astro.sql("CREATE TABLE th (k INT, PRIMARY KEY(k)) MAPPED BY (hth)")
    out = io.StringIO()
    inp = io.StringIO(
        "HELP;\n"
        "HELP CREATE;\n"
        "SHOW TABLES;\n"
        "exit\n"
    )
    repl(astro, out=out, inp=inp)
    text = out.getvalue()
    assert "Available commands:" in text
    assert "MAPPED BY" in text  # HELP CREATE syntax block
    assert "Time taken:" in text


def test_repl_help_changes(spark, tmp_path):
    """r11: HELP CHANGES documents the change-data-feed SQL surface."""
    astro = AstroSession(spark, str(tmp_path / "wh"))
    out = io.StringIO()
    repl(astro, out=out, inp=io.StringIO("HELP CHANGES;\nexit\n"))
    text = out.getvalue()
    assert "CHANGES FROM n [TO m]" in text
    assert "_change_type" in text and "retain_history" in text

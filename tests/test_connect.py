"""Spark Connect round-trip (SURVEY §2A#22).

The reference submits generated code to a Livy server and polls
(assets/app_nfl.py:163-208). The engine's equivalent is Spark Connect;
this test runs the full loop inside the container with zero extra
dependencies: bundled SparkConnectServer (own JVM) <- gRPC <- bundled
Spark Connect JDBC driver hosted by beeline. Results are asserted
against DuckDB on the same parquet, so this is a correctness check of
remote execution, not just a liveness probe.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

from nfl_predictions_spark.connect import (
    connect_jdbc_sql,
    free_port,
    start_local_connect_server,
)


@pytest.fixture(scope="module")
def connect_port():
    port = free_port()
    proc = start_local_connect_server(port)
    yield port
    proc.terminate()
    proc.wait(timeout=30)


def test_connect_scalar(connect_port):
    rows = connect_jdbc_sql(connect_port, "SELECT 21 + 21 AS answer")
    assert rows == [["answer"], ["42"]]


def test_connect_scan_matches_duckdb(connect_port, duck):
    sql = (
        f"SELECT r_regionkey, r_name FROM parquet.`{SF_SMOKE}/region.parquet` "
        "ORDER BY r_regionkey"
    )
    rows = connect_jdbc_sql(connect_port, sql)
    expected = duck.execute(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    ).fetchall()
    assert rows[0] == ["r_regionkey", "r_name"]
    assert [(int(r[0]), r[1]) for r in rows[1:]] == expected


def test_connect_join_agg_matches_duckdb(connect_port, duck):
    # the q07 shape (shuffle join + agg) executed remotely
    sql = (
        "SELECT n.n_name AS nation, count(*) AS cnt "
        f"FROM parquet.`{SF_SMOKE}/customer.parquet` c "
        f"JOIN parquet.`{SF_SMOKE}/nation.parquet` n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY cnt DESC, nation LIMIT 5"
    )
    rows = connect_jdbc_sql(connect_port, sql)
    expected = duck.execute(
        "SELECT n.n_name AS nation, count(*) AS cnt FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY cnt DESC, nation LIMIT 5"
    ).fetchall()
    assert rows[0] == ["nation", "cnt"]
    assert [(r[0], int(r[1])) for r in rows[1:]] == expected

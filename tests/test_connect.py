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


def test_session_pool_reuse_expiry_reconnect():
    """Livy-parity session semantics on a fake transport: reuse within
    the TTL, rebuild after expiry, bounded-retry reconnect through a
    transient failure, loud error when the transport stays dead."""
    import pytest

    from nfl_predictions_spark.connect import ConnectSessionPool

    class Flaky:
        instances = 0

        def __init__(self, fail_times: int):
            Flaky.instances += 1
            self.fail_times = fail_times

        def execute(self, sql):
            if self.fail_times > 0:
                self.fail_times -= 1
                raise ConnectionError("transport down")
            return [["ok"], [sql]]

        def close(self):
            pass

    # reuse within TTL
    made = []
    pool = ConnectSessionPool(
        lambda: made.append(Flaky(0)) or made[-1], ttl_s=60.0, base_backoff_s=0.0
    )
    assert pool.execute("s1", "Q1")[1] == ["Q1"]
    assert pool.execute("s1", "Q2")[1] == ["Q2"]
    assert len(made) == 1 and pool.stats["reused"] >= 1

    # expiry rebuilds
    pool._ttl = 0.0
    pool.execute("s1", "Q3")
    assert len(made) == 2 and pool.stats["expired"] == 1

    # transient failure: one retry, then success on the rebuilt session
    pool2 = ConnectSessionPool(lambda: Flaky(0), ttl_s=60.0, base_backoff_s=0.0)
    first = Flaky(1)
    pool2._sessions["s"] = (first, __import__("time").time())
    assert pool2.execute("s", "Q")[0] == ["ok"]
    assert pool2.stats["retries"] == 1

    # permanently dead transport fails loudly after bounded retries
    pool3 = ConnectSessionPool(
        lambda: Flaky(99), ttl_s=60.0, max_retries=2, base_backoff_s=0.0
    )
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        pool3.execute("s", "Q")


def test_session_pool_over_real_connect(connect_port):
    """The pool drives the real in-container Connect server: two
    statements on one named session, stats show reuse."""
    from nfl_predictions_spark.connect import ConnectSessionPool, jdbc_session

    pool = ConnectSessionPool(lambda: jdbc_session(connect_port))
    assert pool.execute("svc", "SELECT 1 + 1 AS two")[1] == ["2"]
    assert pool.execute("svc", "SELECT 'x' AS c")[1] == ["x"]
    assert pool.stats["created"] == 1 and pool.stats["reused"] == 1
    pool.close()

"""Remote execution via Spark Connect (SURVEY §2A#22 parity).

The reference ships a Livy path: it *generates PySpark source by string
interpolation*, POSTs it to a Livy server, and polls statement state
every 0.25 s (reference ``assets/app_nfl.py:74-148,163-208``). The
modern equivalent is Spark Connect: a typed DataFrame API over gRPC —
no string code-gen, no polling, server-side session state.

Two client paths, matching what this container can actually run:

- ``get_remote_spark`` — the PySpark Connect client. Needs ``grpcio``,
  which is absent here, so it is environment-gated behind an import
  check with a clear error.
- ``start_local_connect_server`` + ``connect_jdbc_sql`` — a full
  in-container round trip with no extra Python deps: launch the bundled
  ``SparkConnectServer`` (the ``spark-connect`` jar ships with pyspark),
  then execute SQL through the bundled Spark Connect **JDBC** driver
  (``spark-connect-client-jdbc``) via beeline. Client → gRPC → server →
  Arrow batches → rows; exercised ungated in tests/test_connect.py.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import time

from pyspark.sql import SparkSession

_JAVA17_OPENS = [
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
    "--add-opens=java.base/java.io=ALL-UNNAMED",
    "--add-opens=java.base/java.net=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
    "-Dio.netty.tryReflectionSetAccessible=true",
]


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def get_remote_spark(url: str | None = None) -> SparkSession:
    """Connect to a remote Spark (e.g. ``sc://host:15002``) with the
    PySpark Connect client. Unlike the reference's Livy flow there is no
    per-statement session bootstrap: the returned session is long-lived
    and every engine operator in this package works on it unchanged
    (they only touch the DataFrame API). Requires ``grpcio`` (not
    installed in this container — the JDBC path below is the exercised
    one)."""
    url = url or os.environ.get("SPARK_REMOTE")
    if not url:
        raise RuntimeError(
            "no Spark Connect endpoint: pass url or set SPARK_REMOTE=sc://host:port"
        )
    try:
        import grpc  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "the PySpark Connect client needs grpcio; use connect_jdbc_sql "
            "for a dependency-free round trip"
        ) from e
    return SparkSession.builder.remote(url).getOrCreate()


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def start_local_connect_server(
    port: int, cores: int = 2, startup_timeout: float = 120.0
) -> subprocess.Popen:
    """Launch the bundled Spark Connect server (own JVM) on ``port`` and
    block until the gRPC endpoint accepts connections. Caller owns the
    process (terminate() when done)."""
    home = _spark_home()
    proc = subprocess.Popen(
        [
            os.path.join(home, "bin", "spark-submit"),
            "--class",
            "org.apache.spark.sql.connect.service.SparkConnectServer",
            "--master",
            f"local[{cores}]",
            "--conf",
            f"spark.connect.grpc.binding.port={port}",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "",
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + startup_timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"Connect server exited early: rc={proc.returncode}")
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return proc
        except OSError:
            time.sleep(0.5)
    proc.terminate()
    raise RuntimeError(f"Connect server did not bind port {port}")


def connect_jdbc_sql(port: int, sql: str, timeout: float = 120.0) -> list[list[str]]:
    """Run one SQL statement through the Spark Connect JDBC driver
    (beeline as the JDBC host process) and return rows as lists of
    strings: [header, row, row, ...]. This is a genuine remote
    round-trip — the SQL is planned and executed by the Connect server,
    results stream back as Arrow batches over gRPC."""
    home = _spark_home()
    repl = os.path.join(home, "jars", "connect-repl")
    cp = ":".join(
        [
            os.path.join(home, "jars", "*"),
            os.path.join(repl, "spark-connect-client-jdbc_2.13-4.1.2.jar"),
            os.path.join(repl, "spark-connect-client-jvm_2.13-4.1.2.jar"),
        ]
    )
    java = shutil.which("java") or os.path.join(
        os.environ.get("JAVA_HOME", ""), "bin", "java"
    )
    out = subprocess.run(
        [
            java,
            *_JAVA17_OPENS,
            "-cp",
            cp,
            "org.apache.hive.beeline.BeeLine",
            "-d",
            "org.apache.spark.sql.connect.client.jdbc.SparkConnectDriver",
            "-u",
            f"jdbc:sc://localhost:{port}",
            "--outputformat=csv2",
            "--silent=true",
            "-e",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
        stdin=subprocess.DEVNULL,
    )
    rows: list[list[str]] = []
    for line in out.stdout.splitlines():
        # the header rides on the prompt line: "0: jdbc:sc://...> c1,c2"
        if "> " in line and line.split("> ", 1)[0].startswith("0: jdbc:sc"):
            line = line.split("> ", 1)[1]
        elif line.startswith("0: jdbc:sc") or not line.strip():
            continue
        rows.append(line.split(","))
    if not rows:
        raise RuntimeError(
            f"no rows from beeline (rc={out.returncode}): {out.stderr[-500:]}"
        )
    return rows


class ConnectSessionPool:
    """Session reuse + reconnect semantics over Spark Connect — the
    engine's mapping of the reference's Livy session management
    (``assets/app_nfl.py:74-148``: create-or-reuse a named session,
    600 s heartbeat/idle TTL, 0.25 s fixed-interval statement polling
    with unbounded waits). Differences are deliberate:

    - statements on Connect are SYNCHRONOUS, so there is nothing to
      poll; only TRANSPORT failures need handling, and those get
      bounded retries with exponential backoff (base 0.25 s — the
      reference's poll interval — doubling per attempt) around a
      session rebuild, instead of an infinite 0.25 s loop.
    - sessions are reused by name until idle longer than ``ttl_s``
      (the reference's 600 s heartbeat window); an expired or failed
      session is closed and rebuilt transparently on next use.

    Transport-agnostic: ``factory()`` returns any object with
    ``execute(sql) -> rows`` and ``close()``; ``jdbc_session(port)``
    adapts the in-container Connect JDBC path.
    """

    def __init__(
        self,
        factory,
        ttl_s: float = 600.0,
        max_retries: int = 3,
        base_backoff_s: float = 0.25,
    ):
        self._factory = factory
        self._ttl = ttl_s
        self._max_retries = max_retries
        self._backoff = base_backoff_s
        self._sessions: dict[str, tuple[object, float]] = {}
        self.stats = {"created": 0, "reused": 0, "expired": 0, "retries": 0}

    def _get(self, name: str):
        sess = self._sessions.get(name)
        if sess is not None:
            handle, last_used = sess
            if time.time() - last_used <= self._ttl:
                self.stats["reused"] += 1
                return handle
            self.stats["expired"] += 1
            self._close_quietly(handle)
            del self._sessions[name]
        handle = self._factory()
        self.stats["created"] += 1
        self._sessions[name] = (handle, time.time())
        return handle

    @staticmethod
    def _close_quietly(handle):
        try:
            handle.close()
        except Exception:
            pass

    def execute(self, name: str, sql: str):
        """Run ``sql`` on the named session, rebuilding the session and
        retrying (bounded, backed off) on transport failure."""
        delay = self._backoff
        last_err: Exception | None = None
        for attempt in range(self._max_retries + 1):
            # _get() is inside the try so a session-CREATION transport
            # failure (factory() raising) consumes a retry with backoff
            # exactly like a statement failure (ADVICE r06 #2).
            handle = None
            try:
                handle = self._get(name)
                rows = handle.execute(sql)
                self._sessions[name] = (handle, time.time())
                return rows
            except Exception as e:  # transport failure: rebuild + retry
                last_err = e
                self.stats["retries"] += 1
                if handle is not None:
                    self._close_quietly(handle)
                self._sessions.pop(name, None)
                if attempt < self._max_retries:
                    time.sleep(delay)
                    delay *= 2
        raise RuntimeError(
            f"session '{name}' failed after {self._max_retries + 1} attempts"
        ) from last_err

    def close(self):
        for handle, _ in self._sessions.values():
            self._close_quietly(handle)
        self._sessions.clear()


def jdbc_session(port: int):
    """Adapt the in-container Connect JDBC path to the pool's session
    protocol (each statement is its own beeline process; the SERVER
    holds the long-lived state, so close() is a no-op)."""

    class _Jdbc:
        def execute(self, sql: str):
            return connect_jdbc_sql(port, sql)

        def close(self):
            pass

    return _Jdbc()

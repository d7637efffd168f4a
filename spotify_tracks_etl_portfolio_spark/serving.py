"""SQL serving endpoint (SURVEY.md §2.1 S10): expose the running engine
session as a live SQL server external tools connect to — the deployment
shape the reference uses for its dashboards, where Metabase speaks SQL
to MySQL over the wire (reference: README.md:69-75).

Spark-first equivalent: the HiveServer2 Thrift endpoint embedded in the
session's JVM (``spark-hive-thriftserver`` ships with Spark). Metabase,
beeline, Tableau, and any JDBC/ODBC client connect with the stock
``hive-jdbc`` driver — no engine code in the client. Tables are
published as GLOBAL temp views (``global_temp.<name>``), which are
visible across Thrift sessions without requiring the static
``singleSession`` conf, and serve straight from the engine's
lazily-evaluated plans (scans stay distributed; only result sets cross
the wire).

At scale this is the same story: one long-running driver hosts the
endpoint, executors do the work, BI tools see a SQL database.
"""

from __future__ import annotations

import socket
import tempfile
import time

from pyspark.sql import SparkSession

from spotify_tracks_etl_portfolio_spark.schemas import TESTDATA_TABLES
from spotify_tracks_etl_portfolio_spark.sources.readers import read_parquet_table


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def publish_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register testdata tables as global temp views so every Thrift
    session sees them as ``global_temp.<name>``. Returns the published
    qualified names."""
    names = []
    for t in tables or TESTDATA_TABLES:
        read_parquet_table(spark, sf_dir, t).createOrReplaceGlobalTempView(t)
        names.append(f"global_temp.{t}")
    return names


def start_sql_endpoint(
    spark: SparkSession,
    port: int | None = None,
    metastore_dir: str | None = None,
    startup_timeout_s: float = 60.0,
) -> int:
    """Start the HiveServer2 Thrift endpoint inside this session's JVM
    and block until it accepts TCP connections. Returns the bound port.

    The Derby metastore is pointed at a scratch directory so serving
    never writes into the caller's cwd; the endpoint shares the
    session's catalog and runs until the JVM exits (it is a daemon
    service — there is no stop API short of stopping the session)."""
    port = port or _free_port()
    ms = metastore_dir or tempfile.mkdtemp(prefix="thrift_metastore_")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("hive.server2.thrift.port", str(port))
    hconf.set("hive.server2.thrift.bind.host", "localhost")
    hconf.set(
        "javax.jdo.option.ConnectionURL",
        f"jdbc:derby:;databaseName={ms}/derby;create=true",
    )
    spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithSparkSession(
        spark._jsparkSession, False
    )
    deadline = time.time() + startup_timeout_s
    while True:
        try:
            with socket.create_connection(("localhost", port), timeout=2):
                pass
        except OSError:
            if time.time() > deadline:
                raise TimeoutError(
                    f"Thrift endpoint did not bind port {port} within "
                    f"{startup_timeout_s}s"
                )
            time.sleep(0.5)
            continue
        # A raw TCP connect is not proof OUR server bound the port:
        # between _free_port() and the JVM's bind another process could
        # have grabbed it (TOCTOU), and the JVM's own bind failure is
        # only logged. Prove the listener speaks HiveServer2 by running
        # a trivial query through the real JDBC path before returning.
        try:
            rows = jdbc_query(spark, "SELECT 1", port)
        except Exception:
            if time.time() > deadline:
                raise TimeoutError(
                    f"port {port} accepts TCP but did not answer a "
                    f"Thrift query within {startup_timeout_s}s — the "
                    "listener may be a foreign process (port grabbed "
                    "between probe and bind) or the server failed to "
                    "start; check the JVM logs"
                )
            time.sleep(0.5)
            continue
        if rows != [(1,)]:
            raise RuntimeError(
                f"endpoint on port {port} answered SELECT 1 with {rows!r}"
            )
        return port


def jdbc_query(
    spark: SparkSession, sql: str, port: int
) -> list[tuple]:
    """External-client twin for tests: a full JDBC → Thrift → SQL round
    trip over loopback using the stock ``hive-jdbc`` driver — the exact
    protocol Metabase/beeline speak. (It runs through the session's JVM
    only to avoid shipping a Python Thrift client; the bytes still
    traverse the real server socket.)"""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://localhost:{port}/default", "", ""
    )
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        ncols = rs.getMetaData().getColumnCount()
        out = []
        while rs.next():
            out.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
        return out
    finally:
        conn.close()

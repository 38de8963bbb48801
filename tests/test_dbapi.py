"""DB-API 2.0 driver over Flight SQL: queries, DML, parameter inlining,
fetch protocol, error mapping — all against a live loopback server with
NO Spark on the client path."""

from __future__ import annotations

import pytest

from arrow_spark.sources import dbapi


@pytest.fixture()
def conn(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.sources.flight_sql import start_flight_sql_server

    table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    srv = start_flight_sql_server(spark, rows_per_endpoint=2)
    c = dbapi.connect(f"grpc://127.0.0.1:{srv.port}")
    try:
        yield c
    finally:
        c.close()
        srv.shutdown()


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "qmark"
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_query_fetch_protocol(conn):
    cur = conn.cursor()
    cur.execute("SELECT r_regionkey, r_name FROM region_v ORDER BY r_regionkey")
    assert [d[0] for d in cur.description] == ["r_regionkey", "r_name"]
    assert cur.rowcount == 5
    first = cur.fetchone()
    assert first[0] == 0
    two = cur.fetchmany(2)
    assert [r[0] for r in two] == [1, 2]
    rest = cur.fetchall()
    assert [r[0] for r in rest] == [3, 4]
    assert cur.fetchone() is None


def test_multi_endpoint_result_is_complete(conn):
    # rows_per_endpoint=2 → the 5-row result spans 3 endpoints
    cur = conn.cursor().execute("SELECT r_regionkey FROM region_v")
    assert sorted(r[0] for r in cur.fetchall()) == [0, 1, 2, 3, 4]


def test_qmark_parameters(conn):
    cur = conn.cursor()
    cur.execute(
        "SELECT r_name FROM region_v WHERE r_regionkey = ? OR r_name = ?",
        (1, "ASIA"),
    )
    names = {r[0] for r in cur.fetchall()}
    assert "ASIA" in names and len(names) == 2
    # a ? inside a string literal is NOT a placeholder
    cur.execute("SELECT '?' AS q, r_regionkey FROM region_v WHERE r_regionkey = ?", (3,))
    rows = cur.fetchall()
    assert rows == [("?", 3)]
    # quote escaping survives
    cur.execute("SELECT ? AS v", ("it''s ok",))
    assert cur.fetchone()[0] == "it''s ok"


def test_qmark_executes_over_prepared_protocol(conn, spark):
    """Parameterized queries must travel the real wire flow: Create →
    Bind (DoPut) → execute → Close — no client-side SQL inlining. A
    string parameter with quote characters therefore needs no escaping
    and can't inject."""
    cur = conn.cursor()
    cur.execute("SELECT ? AS v", ("'; DROP TABLE x; --",))
    assert cur.fetchone()[0] == "'; DROP TABLE x; --"


def test_dbapi_executemany_single_doput(conn, spark):
    spark.sql("DROP TABLE IF EXISTS dbapi_many")
    spark.sql("CREATE TABLE dbapi_many (k INT, v STRING) USING parquet")
    try:
        cur = conn.cursor()
        cur.executemany(
            "INSERT INTO dbapi_many VALUES (?, ?)",
            [(1, "a"), (2, "b"), (3, None)],
        )
        got = {(r.k, r.v) for r in spark.table("dbapi_many").collect()}
        assert got == {(1, "a"), (2, "b"), (3, None)}
    finally:
        spark.sql("DROP TABLE IF EXISTS dbapi_many")


def test_parameter_count_mismatch(conn):
    cur = conn.cursor()
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELECT ? AS a", (1, 2))
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELECT ?, ? FROM region_v", (1,))


def test_dml_and_executemany(conn, spark):
    spark.sql("DROP TABLE IF EXISTS dbapi_t")
    spark.sql("CREATE TABLE dbapi_t (k INT, v STRING) USING parquet")
    try:
        cur = conn.cursor()
        cur.execute("INSERT INTO dbapi_t VALUES (?, ?)", (1, "a"))
        assert cur.rowcount == -1  # server reports unknown
        cur.executemany("INSERT INTO dbapi_t VALUES (?, ?)", [(2, "b"), (3, "c")])
        assert spark.table("dbapi_t").count() == 3
        with pytest.raises(dbapi.ProgrammingError):
            cur.fetchall()  # DML leaves no result set
    finally:
        spark.sql("DROP TABLE IF EXISTS dbapi_t")


def test_errors_and_connection_lifecycle(conn):
    cur = conn.cursor()
    with pytest.raises(dbapi.OperationalError):
        cur.execute("SELECT * FROM no_such_table_anywhere")
    conn.commit()  # no-op, allowed
    with pytest.raises(dbapi.NotSupportedError):
        conn.rollback()


def test_closed_connection_rejects(spark, sf_dir):
    from arrow_spark.sources.flight_sql import start_flight_sql_server

    srv = start_flight_sql_server(spark)
    try:
        with dbapi.connect(f"grpc://127.0.0.1:{srv.port}") as c:
            pass
        with pytest.raises(dbapi.InterfaceError):
            c.cursor()
    finally:
        srv.shutdown()


def test_cursor_iteration(conn):
    cur = conn.cursor().execute("SELECT r_regionkey FROM region_v")
    assert sorted(k for (k,) in cur) == [0, 1, 2, 3, 4]

"""Flight RPC end-to-end against a live in-process loopback server
(pyarrow FlightServerBase — the same surface as flight/server.h:248-311:
ListFlights / GetFlightInfo / DoGet / DoPut).

The server splits each table into N endpoints; read_flight must turn
each endpoint into its own Spark task (DoGet streams in parallel), and
write_flight must DoPut one upload stream per partition.
"""

from __future__ import annotations

import threading

import pytest

pa = pytest.importorskip("pyarrow")
fl = pytest.importorskip("pyarrow.flight")

from arrow_spark.sources.flight import list_flights, read_flight, write_flight  # noqa: E402


class _LoopbackServer(fl.FlightServerBase):
    """Serves in-memory tables, N endpoints each; collects DoPut uploads."""

    def __init__(self, tables: dict[str, "pa.Table"], n_endpoints: int = 3):
        super().__init__("grpc://127.0.0.1:0")
        self.tables = tables
        self.n_endpoints = n_endpoints
        self.received: dict[str, list] = {}
        self._lock = threading.Lock()

    def _info(self, descriptor: "fl.FlightDescriptor") -> "fl.FlightInfo":
        path = descriptor.path[0].decode()
        tbl = self.tables[path]
        total = tbl.num_rows
        chunk = max(1, (total + self.n_endpoints - 1) // self.n_endpoints)
        endpoints = []
        for lo in range(0, total, chunk):
            hi = min(total, lo + chunk)
            ticket = fl.Ticket(f"{path}:{lo}:{hi}".encode())
            endpoints.append(
                fl.FlightEndpoint(ticket, [f"grpc://127.0.0.1:{self.port}"])
            )
        return fl.FlightInfo(tbl.schema, descriptor, endpoints, total, -1)

    def get_flight_info(self, context, descriptor):
        return self._info(descriptor)

    def list_flights(self, context, criteria):
        for path in self.tables:
            yield self._info(fl.FlightDescriptor.for_path(path))

    def do_get(self, context, ticket):
        path, lo, hi = ticket.ticket.decode().split(":")
        tbl = self.tables[path]
        return fl.RecordBatchStream(tbl.slice(int(lo), int(hi) - int(lo)))

    def do_put(self, context, descriptor, reader, writer):
        path = descriptor.path[0].decode()
        tbl = reader.read_all()
        with self._lock:
            self.received.setdefault(path, []).append(tbl)


@pytest.fixture(scope="module")
def server():
    tbl = pa.table(
        {
            "k": pa.array(range(100), pa.int64()),
            "v": pa.array([f"row{i}" for i in range(100)]),
        }
    )
    srv = _LoopbackServer({"demo": tbl}, n_endpoints=3)
    thread = threading.Thread(target=srv.serve, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def test_do_get_one_task_per_endpoint(spark, server):
    loc = f"grpc://127.0.0.1:{server.port}"
    df = read_flight(spark, loc, "demo")
    assert df.rdd.getNumPartitions() == 3  # endpoint-parallel, not one stream
    rows = df.collect()
    assert len(rows) == 100
    assert {r.k for r in rows} == set(range(100))
    assert dict((r.k, r.v) for r in rows)[7] == "row7"


def test_do_put_streams_each_partition(spark, server):
    loc = f"grpc://127.0.0.1:{server.port}"
    src = spark.range(0, 50, 1, 4).withColumnRenamed("id", "n")
    write_flight(src, loc, "sink")
    got = pa.concat_tables(server.received["sink"])
    assert sorted(got.column("n").to_pylist()) == list(range(50))
    assert len(server.received["sink"]) == 4  # one DoPut stream per partition


def test_list_flights_catalog(server):
    loc = f"grpc://127.0.0.1:{server.port}"
    cat = list_flights(loc)
    assert cat == [
        {"path": ["demo"], "total_records": 100, "total_bytes": -1, "endpoints": 3}
    ]


class _ExchangeServer(fl.FlightServerBase):
    """DoExchange: doubles an int column; DoAction: ping/row-count."""

    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.actions_seen = []

    def do_exchange(self, context, descriptor, reader, writer):
        started = False
        for chunk in reader:
            batch = chunk.data
            if batch is None:
                continue
            doubled = pa.RecordBatch.from_arrays(
                [pa.compute.multiply(batch.column("n"), 2)], names=["n2"]
            )
            if not started:
                writer.begin(doubled.schema)
                started = True
            writer.write_batch(doubled)

    def do_action(self, context, action):
        self.actions_seen.append((action.type, action.body.to_pybytes()))
        return [fl.Result(b"pong")]


@pytest.fixture(scope="module")
def xserver():
    srv = _ExchangeServer()
    thread = threading.Thread(target=srv.serve, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def test_do_exchange_transforms_each_partition(spark, xserver):
    from arrow_spark.sources.flight import exchange_flight

    loc = f"grpc://127.0.0.1:{xserver.port}"
    src = spark.range(0, 20, 1, 3).withColumnRenamed("id", "n")
    out = exchange_flight(src, loc, "double", "n2 long")
    assert sorted(r.n2 for r in out.collect()) == [2 * i for i in range(20)]


def test_do_action_round_trip(xserver):
    from arrow_spark.sources.flight import do_action

    loc = f"grpc://127.0.0.1:{xserver.port}"
    assert do_action(loc, "ping", b"hello") == [b"pong"]
    assert ("ping", b"hello") in xserver.actions_seen


def test_engine_flight_server_serves_query_results(spark, sf_dir):
    # SURVEY §2.3 stretch goal: the engine's own Flight server. A query
    # result is registered, advertised in row-chunk endpoints, and read
    # back through this repo's endpoint-parallel client.
    from arrow_spark.catalog import table
    from arrow_spark.sources.flight import do_action, read_flight, start_flight_server, write_flight

    result = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
        .orderBy("o_orderpriority")
    )
    srv = start_flight_server({"orders_by_priority": result}, rows_per_endpoint=2)
    try:
        loc = f"grpc://127.0.0.1:{srv.port}"
        back = read_flight(spark, loc, "orders_by_priority")
        assert back.rdd.getNumPartitions() >= 2  # chunked into endpoints
        want = {(r.o_orderpriority, r["count"]) for r in result.collect()}
        got = {(r.o_orderpriority, r["count"]) for r in back.collect()}
        assert got == want
        # DoPut a frame up, then read it back from the same server
        up = spark.range(0, 30, 1, 3).withColumnRenamed("id", "n")
        write_flight(up, loc, "uploaded")
        names = [b.decode() for b in do_action(loc, "list")]
        assert names == ["orders_by_priority", "uploaded"]
        round_tripped = read_flight(spark, loc, "uploaded")
        assert sorted(r.n for r in round_tripped.collect()) == list(range(30))
    finally:
        srv.shutdown()


def test_bearer_auth_required_and_accepted(spark):
    """server.h:248-311 auth-handler parity: RPCs without the bearer
    token are rejected UNAUTHENTICATED; with it, the full
    list/get/read_flight path works."""
    import pyarrow.flight as fl

    from arrow_spark.sources.flight import do_action, start_flight_server

    df = spark.range(10).withColumnRenamed("id", "v")
    srv = start_flight_server({"nums": df}, auth_token="sekrit-42")
    loc = f"grpc://127.0.0.1:{srv.port}"
    try:
        # no token → rejected before the handler body runs
        with pytest.raises(fl.FlightUnauthenticatedError):
            list_flights(loc)
        with pytest.raises(fl.FlightUnauthenticatedError):
            do_action(loc, "list")
        # wrong token → rejected
        with pytest.raises(fl.FlightUnauthenticatedError):
            list_flights(loc, token="wrong")
        # right token → catalog, action, and the distributed DoGet path
        assert list_flights(loc, token="sekrit-42")[0]["path"] == ["nums"]
        assert do_action(loc, "list", token="sekrit-42") == [b"nums"]
        got = read_flight(spark, loc, "nums", token="sekrit-42")
        assert sorted(r.v for r in got.collect()) == list(range(10))
        # executor-side DoPut with the token, then read the table back
        write_flight(df.selectExpr("v + 100 as v"), loc, "uploaded", token="sekrit-42")
        assert b"uploaded" in do_action(loc, "list", token="sekrit-42")
    finally:
        srv.shutdown()


# -- Flight SQL (round 4) ---------------------------------------------------
# server.h sql/ subsystem subset: CommandStatementQuery, catalog
# commands, prepared statements — all over the hand-rolled Any/command
# wire layout a conformant Flight SQL client would send.


@pytest.fixture()
def sql_server(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.sources.flight_sql import start_flight_sql_server

    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    srv = start_flight_sql_server(spark, rows_per_endpoint=500)
    try:
        yield srv, f"grpc://127.0.0.1:{srv.port}"
    finally:
        srv.shutdown()


def test_flight_sql_statement_query_parallel_endpoints(spark, sql_server):
    from arrow_spark.sources.flight_sql import flight_sql_execute

    _, loc = sql_server
    q = """SELECT o_orderpriority, count(*) AS n
           FROM orders_v GROUP BY o_orderpriority"""
    got = flight_sql_execute(spark, loc, q)
    want = spark.sql(q)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # a >500-row result must arrive over multiple endpoints (and the
    # client reads them as separate Spark tasks)
    big = flight_sql_execute(spark, loc, "SELECT o_orderkey FROM orders_v")
    n = spark.table("orders_v").count()
    assert big.count() == n and big.rdd.getNumPartitions() >= 2


def test_flight_sql_catalog_commands(spark, sql_server):
    from arrow_spark.sources.flight_sql import (
        flight_sql_get_catalogs,
        flight_sql_get_db_schemas,
        flight_sql_get_tables,
    )

    _, loc = sql_server
    cats = flight_sql_get_catalogs(spark, loc).collect()
    assert [r.catalog_name for r in cats] == ["spark_catalog"]

    dbs = flight_sql_get_db_schemas(spark, loc).collect()
    assert "default" in {r.db_schema_name for r in dbs}

    tbls = flight_sql_get_tables(spark, loc)
    assert tbls.columns == ["catalog_name", "db_schema_name", "table_name", "table_type"]
    names = {r.table_name for r in tbls.collect()}
    assert {"orders_v", "region_v"} <= names

    filtered = flight_sql_get_tables(
        spark, loc, table_name_filter_pattern="orders%"
    ).collect()
    assert {r.table_name for r in filtered} == {"orders_v"}

    # include_schema: the IPC blob deserializes to the real arrow schema
    with_schema = flight_sql_get_tables(
        spark, loc, table_name_filter_pattern="region_v", include_schema=True
    ).collect()
    assert len(with_schema) == 1
    schema = pa.ipc.read_schema(pa.py_buffer(with_schema[0].table_schema))
    assert set(schema.names) == set(spark.table("region_v").columns)


def test_flight_sql_prepared_statement_lifecycle(spark, sql_server):
    from arrow_spark.sources.flight_sql import (
        flight_sql_close_prepared,
        flight_sql_execute_prepared,
        flight_sql_prepare,
    )

    _, loc = sql_server
    q = "SELECT r_regionkey, r_name FROM region_v ORDER BY r_regionkey"
    handle, schema_blob = flight_sql_prepare(loc, q)
    assert handle
    schema = pa.ipc.read_schema(pa.py_buffer(schema_blob))
    assert schema.names == ["r_regionkey", "r_name"]

    got = flight_sql_execute_prepared(spark, loc, handle)
    assert [r.r_name for r in got.orderBy("r_regionkey").collect()] == [
        r.r_name for r in spark.sql(q).collect()
    ]

    flight_sql_close_prepared(loc, handle)
    with pytest.raises(fl.FlightError):
        flight_sql_execute_prepared(spark, loc, handle).collect()


def test_flight_sql_bearer_auth(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.sources.flight_sql import (
        flight_sql_execute,
        start_flight_sql_server,
    )

    table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    srv = start_flight_sql_server(spark, auth_token="sekrit")
    loc = f"grpc://127.0.0.1:{srv.port}"
    try:
        with pytest.raises(fl.FlightUnauthenticatedError):
            flight_sql_execute(spark, loc, "SELECT 1 AS one").collect()
        ok = flight_sql_execute(spark, loc, "SELECT 1 AS one", token="sekrit")
        assert [r.one for r in ok.collect()] == [1]
    finally:
        srv.shutdown()


def test_flight_sql_statement_update_and_prepared_update(spark, sql_server):
    from arrow_spark.sources.flight_sql import (
        flight_sql_execute_prepared_update,
        flight_sql_execute_update,
        flight_sql_prepare,
    )

    _, loc = sql_server
    spark.sql("DROP TABLE IF EXISTS fs_upd")
    spark.sql("CREATE TABLE fs_upd (k INT, v STRING) USING parquet")
    try:
        rc = flight_sql_execute_update(
            loc, "INSERT INTO fs_upd VALUES (1, 'a'), (2, 'b')"
        )
        assert rc == -1  # Spark DML reports no affected-row count
        assert spark.table("fs_upd").count() == 2

        handle, _schema = flight_sql_prepare(
            loc, "INSERT INTO fs_upd VALUES (3, 'c')"
        )
        flight_sql_execute_prepared_update(loc, handle)
        assert spark.table("fs_upd").count() == 3
        got = {(r.k, r.v) for r in spark.table("fs_upd").collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}
    finally:
        spark.sql("DROP TABLE IF EXISTS fs_upd")


def test_flight_sql_parameter_binding(spark, sql_server):
    """client.h PreparedStatement::Bind: DoPut a positional parameter
    batch against the CommandPreparedStatementQuery descriptor; the
    next execution binds the values to the statement's ? markers. A
    re-Bind replaces the previous values (last row wins)."""
    from arrow_spark.sources.flight_sql import (
        flight_sql_bind_prepared,
        flight_sql_close_prepared,
        flight_sql_execute_prepared,
        flight_sql_prepare,
    )

    _, loc = sql_server
    handle, schema_blob = flight_sql_prepare(
        loc, "SELECT r_name FROM region_v WHERE r_regionkey = ? ORDER BY r_name"
    )
    # schema probe of a parameterized statement is legitimately empty
    # (markers are unbound at prepare time)
    assert isinstance(schema_blob, bytes)

    flight_sql_bind_prepared(loc, handle, [1])
    want1 = [r.r_name for r in spark.sql(
        "SELECT r_name FROM region_v WHERE r_regionkey = 1").collect()]
    got1 = [r.r_name for r in flight_sql_execute_prepared(spark, loc, handle).collect()]
    assert got1 == want1 and len(got1) == 1

    # re-Bind replaces the binding
    got2 = [
        r.r_name
        for r in flight_sql_execute_prepared(
            spark, loc, handle, params=[3]
        ).collect()
    ]
    want2 = [r.r_name for r in spark.sql(
        "SELECT r_name FROM region_v WHERE r_regionkey = 3").collect()]
    assert got2 == want2 and got2 != got1
    flight_sql_close_prepared(loc, handle)


def test_flight_sql_prepared_update_with_params(spark, sql_server):
    """ExecuteUpdate streams its parameters in the DoPut itself; each
    parameter row is one execution."""
    from arrow_spark.sources.flight_sql import (
        flight_sql_close_prepared,
        flight_sql_execute_prepared_update,
        flight_sql_prepare,
    )

    _, loc = sql_server
    spark.sql("DROP TABLE IF EXISTS fs_bind_upd")
    spark.sql("CREATE TABLE fs_bind_upd (k INT, v STRING) USING parquet")
    try:
        handle, _schema = flight_sql_prepare(
            loc, "INSERT INTO fs_bind_upd VALUES (?, ?)"
        )
        flight_sql_execute_prepared_update(loc, handle, params=[7, "seven"])
        got = {(r.k, r.v) for r in spark.table("fs_bind_upd").collect()}
        assert got == {(7, "seven")}
        flight_sql_close_prepared(loc, handle)
    finally:
        spark.sql("DROP TABLE IF EXISTS fs_bind_upd")


def test_flight_sql_table_types(spark, sql_server):
    from arrow_spark.sources.flight_sql import flight_sql_get_table_types

    _, loc = sql_server
    out = flight_sql_get_table_types(spark, loc)
    assert out.columns == ["table_type"]
    types = {r.table_type for r in out.collect()}
    assert {"TABLE", "VIEW"} <= types
    assert "TEMPORARY" in types  # the fixture's temp views are visible


def test_flight_sql_sql_info(spark, sql_server):
    from arrow_spark.sources.flight_sql import flight_sql_get_sql_info

    _, loc = sql_server
    info = flight_sql_get_sql_info(loc)
    assert info[0] == "arrow_spark"
    assert info[1] == spark.version
    assert info[2] == pa.__version__
    assert info[3] is False and info[4] is True and info[5] is True
    assert info[8] == 0

    # the repeated-info filter narrows the result
    only = flight_sql_get_sql_info(loc, infos=[0, 5])
    assert set(only) == {0, 5}


def test_flight_sql_key_metadata_empty_layouts(spark, sql_server):
    from arrow_spark.sources.flight_sql import (
        flight_sql_get_exported_keys,
        flight_sql_get_imported_keys,
        flight_sql_get_primary_keys,
    )

    _, loc = sql_server
    pk = flight_sql_get_primary_keys(spark, loc, "orders_v")
    assert pk.columns == [
        "catalog_name", "db_schema_name", "table_name",
        "column_name", "key_sequence", "key_name",
    ]
    assert pk.count() == 0
    for fn in (flight_sql_get_exported_keys, flight_sql_get_imported_keys):
        fk = fn(spark, loc, "orders_v")
        assert fk.count() == 0
        assert fk.columns[:4] == [
            "pk_catalog_name", "pk_db_schema_name", "pk_table_name", "pk_column_name",
        ]


def _orders_substrait_plan() -> bytes:
    """count/sum grouped by priority over the orders_v temp view —
    NamedTable resolution happens server-side against the live catalog
    (server.h:286 GetFlightInfoSubstraitPlan)."""
    from arrow_spark.plans import substrait_builder as B

    read = B.read_named(
        ["orders_v"], ["o_orderpriority", "o_totalprice"], ["string", "fp64"]
    )
    agg = B.aggregate_rel(
        read,
        [B.field_ref(0)],
        [
            B.agg_fn(1, [], B.typ("i64")),
            B.agg_fn(2, [B.field_ref(1)], B.typ("fp64")),
        ],
    )
    return B.plan(
        agg,
        ["o_orderpriority", "n", "sum_price"],
        functions={1: (B.URI_AGG, "count"), 2: (B.URI_ARITH, "sum")},
    )


def test_flight_sql_substrait_statement_execution(spark, sql_server):
    """CommandStatementSubstraitPlan end to end: the serialized plan
    goes over the wire, the server consumes it with the engine's own
    substrait consumer, and the result matches the spark.sql path."""
    from arrow_spark.sources.flight_sql import flight_sql_execute_substrait

    _, loc = sql_server
    got = flight_sql_execute_substrait(spark, loc, _orders_substrait_plan())
    want = spark.sql(
        """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS sum_price
           FROM orders_v GROUP BY o_orderpriority"""
    )
    assert got.columns == ["o_orderpriority", "n", "sum_price"]
    g = {r[0]: (r[1], round(r[2], 2)) for r in got.collect()}
    w = {r[0]: (r[1], round(r[2], 2)) for r in want.collect()}
    assert g == w


def test_flight_sql_prepared_substrait_plan_lifecycle(spark, sql_server):
    """CreatePreparedSubstraitPlan action (server.h:223): prepare →
    dataset schema comes back → execute the handle through the shared
    CommandPreparedStatementQuery flow → close invalidates it."""
    import pyarrow as pa

    from arrow_spark.sources.flight_sql import (
        flight_sql_close_prepared,
        flight_sql_execute_prepared,
        flight_sql_prepare_substrait,
    )

    _, loc = sql_server
    handle, schema_blob = flight_sql_prepare_substrait(loc, _orders_substrait_plan())
    assert handle
    schema = pa.ipc.read_schema(pa.py_buffer(schema_blob))
    assert schema.names == ["o_orderpriority", "n", "sum_price"]

    got = flight_sql_execute_prepared(spark, loc, handle)
    n_groups = spark.sql(
        "SELECT DISTINCT o_orderpriority FROM orders_v"
    ).count()
    assert got.count() == n_groups

    flight_sql_close_prepared(loc, handle)
    with pytest.raises(Exception):
        flight_sql_execute_prepared(spark, loc, handle).collect()


def test_flight_sql_substrait_statement_in_transaction(spark, sql_server):
    """A statement carrying a live transaction_id executes; a bogus
    handle is rejected server-side."""
    from arrow_spark.sources.flight_sql import (
        flight_sql_begin_transaction,
        flight_sql_end_transaction,
        flight_sql_execute_substrait,
    )

    _, loc = sql_server
    txn = flight_sql_begin_transaction(loc)
    got = flight_sql_execute_substrait(
        spark, loc, _orders_substrait_plan(), transaction_id=txn
    )
    assert got.count() > 0
    flight_sql_end_transaction(loc, txn, commit=True)

    with pytest.raises(Exception):
        flight_sql_execute_substrait(
            spark, loc, _orders_substrait_plan(), transaction_id="txn-bogus"
        ).collect()


def test_flight_sql_transaction_and_savepoint_lifecycle(spark, sql_server):
    """server.h:169-183 parity: Begin hands out validated handles;
    COMMIT / RELEASE succeed (per-statement auto-commit makes them
    no-ops); ROLLBACK raises a documented unsupported error; ended
    handles are invalid."""
    from arrow_spark.sources.flight_sql import (
        flight_sql_begin_savepoint,
        flight_sql_begin_transaction,
        flight_sql_end_savepoint,
        flight_sql_end_transaction,
    )

    _, loc = sql_server
    txn = flight_sql_begin_transaction(loc)
    sp = flight_sql_begin_savepoint(loc, txn, "sp1")
    assert txn and sp and txn != sp

    # ROLLBACK of either handle is a documented error, not silent success
    with pytest.raises(Exception, match="ROLLBACK unsupported"):
        flight_sql_end_savepoint(loc, sp, release=False)
    with pytest.raises(Exception, match="ROLLBACK unsupported"):
        flight_sql_end_transaction(loc, txn, commit=False)

    flight_sql_end_savepoint(loc, sp, release=True)
    flight_sql_end_transaction(loc, txn, commit=True)

    # the committed transaction's handle is gone
    with pytest.raises(Exception, match="unknown transaction"):
        flight_sql_end_transaction(loc, txn, commit=True)
    # savepoints of an unknown transaction are rejected
    with pytest.raises(Exception, match="unknown transaction"):
        flight_sql_begin_savepoint(loc, "txn-bogus", "sp2")


def test_flight_sql_prepare_write_plan_does_not_execute_dml(spark, sql_server):
    """Preparing a WriteRel plan must NOT perform the write: the schema
    probe consumes the plan with a no-op sink, so the DML runs exactly
    once — at Execute time, not at CreatePreparedSubstraitPlan time
    (server.h:223). Regression: the probe used to run the plan with the
    live table_writer, silently double-writing prepared DML."""
    from arrow_spark.plans import substrait_builder as B
    from arrow_spark.sources.flight_sql import (
        flight_sql_close_prepared,
        flight_sql_execute_prepared,
        flight_sql_prepare_substrait,
    )

    _, loc = sql_server
    spark.sql("DROP TABLE IF EXISTS fsql_prep_sink")
    read = B.read_named(["region_v"], ["r_regionkey", "r_name"], ["i64", "string"])
    w = B.write_rel_named(
        read, ["fsql_prep_sink"], col_names=["r_regionkey", "r_name"], op=4
    )
    plan = B.plan(w, ["r_regionkey", "r_name"])

    handle, _schema = flight_sql_prepare_substrait(loc, plan)
    assert handle
    # prepare alone performed no DML
    assert not spark.catalog.tableExists("fsql_prep_sink")

    # executing the handle performs the write exactly once
    out = flight_sql_execute_prepared(spark, loc, handle)
    n = out.count()
    assert spark.catalog.tableExists("fsql_prep_sink")
    assert spark.table("fsql_prep_sink").count() == n
    assert n == spark.table("region_v").count()

    flight_sql_close_prepared(loc, handle)
    spark.sql("DROP TABLE IF EXISTS fsql_prep_sink")

"""Arrow Flight SQL: SQL execution + catalog discovery over Flight RPC.

Reference: cpp/src/arrow/flight/sql/server.h (FlightSqlServerBase:
GetFlightInfoStatement, DoGetStatement, GetFlightInfoTables/DbSchemas/
Catalogs, CreatePreparedStatement at server.h:542-556, action types at
server.h:709-713) and client.h (FlightSqlClient::Execute/GetTables/
Prepare). Flight SQL is how real Flight deployments speak SQL: every
request is a protobuf command message wrapped in a google.protobuf.Any
and carried as the FlightDescriptor's opaque ``cmd`` bytes
(FlightSql.proto, public spec).

This build of pyarrow ships no Flight SQL bindings, so the protocol
layer is hand-rolled on the same minimal wire codec the substrait
module uses (f_msg/_Msg — protobuf is just tagged fields); transport is
the plain Flight server/client that already passes auth + loopback
tests. Supported subset:

- CommandStatementQuery  → run SQL on the engine's SparkSession and
  stream the result (one endpoint per row chunk; the client side maps
  endpoints to Spark tasks exactly like read_flight).
- CommandGetCatalogs / CommandGetDbSchemas / CommandGetTables
  (incl. include_schema's IPC-serialized schema column) → catalog
  metadata in the spec's column layout.
- CreatePreparedStatement / ClosePreparedStatement actions +
  CommandPreparedStatementQuery (parameterless statements; parameter
  binding via DoPut is out of scope and raises).

Queries execute driver-side against registered views and are served as
materialized Arrow results — result sets, not raw corpora, are the
serving unit (the 100 TB corpus stays in the lake; what crosses Flight
is aggregates/samples bounded by the query).
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import DataFrame, SparkSession

# Protobuf wire helpers shared with the substrait codec: a Flight SQL
# command is tagged fields exactly like a substrait rel.
from arrow_spark.plans.substrait import _Msg
from arrow_spark.plans.substrait_builder import f_msg, f_str, f_varint
from arrow_spark.sources.flight import _call_options, _flight, read_flight_info

_TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


def _any_wrap(msg_name: str, value: bytes) -> bytes:
    """google.protobuf.Any { type_url=1, value=2 }."""
    return f_str(1, _TYPE_PREFIX + msg_name) + f_msg(2, value)


def _any_unwrap(buf: bytes) -> tuple[str, _Msg]:
    m = _Msg(buf)
    url = m.s(1)
    name = url.rsplit(".", 1)[-1] if url else ""
    return name, _Msg(m.raw(2) or b"")


def _like_to_match(pattern: str | None):
    """SQL LIKE filter pattern (%, _) → predicate; None/empty matches all."""
    if not pattern:
        return lambda s: True
    import fnmatch

    glob = pattern.replace("%", "*").replace("_", "?")
    return lambda s: fnmatch.fnmatchcase(s or "", glob)


def start_flight_sql_server(
    spark: SparkSession,
    location: str = "grpc://127.0.0.1:0",
    rows_per_endpoint: int = 65536,
    auth_token: str | None = None,
    catalog_name: str = "spark_catalog",
):
    """Serve the engine's SparkSession over Flight SQL (server.h parity
    for the statement + catalog + prepared-statement subset).

    GetFlightInfo(CommandStatementQuery) runs ``spark.sql`` and caches
    the Arrow result under a statement handle; tickets are Any-wrapped
    TicketStatementQuery messages whose handle addresses a row range, so
    any conformant client can stream chunks in parallel. ``auth_token``
    reuses the bearer middleware contract of start_flight_server.

    Returns the started server (daemon thread); call ``.shutdown()``.
    """
    flight = _flight()
    import pyarrow as pa

    class _BearerMiddlewareFactory(flight.ServerMiddlewareFactory):
        def __init__(self, token: str):
            self._want = f"Bearer {token}"

        def start_call(self, info, headers):
            got = headers.get("authorization") or headers.get("Authorization") or []
            if self._want not in got:
                raise flight.FlightUnauthenticatedError("missing or invalid bearer token")

    middleware = {"auth": _BearerMiddlewareFactory(auth_token)} if auth_token else {}

    class _FlightSqlServer(flight.FlightServerBase):
        def __init__(self):
            super().__init__(location, middleware=middleware)
            self._results: dict[str, pa.Table] = {}
            self._prepared: dict[str, str] = {}
            self._seq = itertools.count()
            self._lock = threading.Lock()

        # -- result registry ------------------------------------------
        def _stash(self, tbl: pa.Table) -> str:
            with self._lock:
                handle = f"stmt-{next(self._seq)}"
                self._results[handle] = tbl
                # bound the cache: results are consumed right after
                # GetFlightInfo; keep a small LRU-ish window
                while len(self._results) > 64:
                    self._results.pop(next(iter(self._results)))
            return handle

        def _info_for(self, descriptor, tbl: pa.Table):
            handle = self._stash(tbl)
            endpoints = []
            for lo in range(0, max(tbl.num_rows, 1), rows_per_endpoint):
                hi = min(tbl.num_rows, lo + rows_per_endpoint)
                ticket_msg = _any_wrap(
                    "TicketStatementQuery",
                    f_str(1, f"{handle}:{lo}:{hi}"),
                )
                endpoints.append(
                    flight.FlightEndpoint(
                        flight.Ticket(ticket_msg),
                        [f"grpc://127.0.0.1:{self.port}"],
                    )
                )
            return flight.FlightInfo(tbl.schema, descriptor, endpoints, tbl.num_rows, -1)

        # -- catalog tables -------------------------------------------
        def _catalogs_table(self) -> pa.Table:
            return pa.table({"catalog_name": pa.array([catalog_name], pa.string())})

        def _db_schemas_table(self, cat: str | None, pat: str | None) -> pa.Table:
            names = sorted(d.name for d in spark.catalog.listDatabases())
            match = _like_to_match(pat)
            keep = [n for n in names if match(n)] if (not cat or cat == catalog_name) else []
            return pa.table(
                {
                    "catalog_name": pa.array([catalog_name] * len(keep), pa.string()),
                    "db_schema_name": pa.array(keep, pa.string()),
                }
            )

        def _tables_table(
            self,
            cat: str | None,
            schema_pat: str | None,
            table_pat: str | None,
            types: list[str],
            include_schema: bool,
        ) -> pa.Table:
            rows = []
            if not cat or cat == catalog_name:
                smatch = _like_to_match(schema_pat)
                tmatch = _like_to_match(table_pat)
                for t in spark.catalog.listTables():
                    ns = getattr(t, "namespace", None)
                    db = ns[0] if ns else (getattr(t, "database", None) or "")
                    ttype = t.tableType or "TABLE"
                    if not (smatch(db) and tmatch(t.name)):
                        continue
                    if types and ttype not in types:
                        continue
                    rows.append((catalog_name, db, t.name, ttype))
            cols = {
                "catalog_name": pa.array([r[0] for r in rows], pa.string()),
                "db_schema_name": pa.array([r[1] for r in rows], pa.string()),
                "table_name": pa.array([r[2] for r in rows], pa.string()),
                "table_type": pa.array([r[3] for r in rows], pa.string()),
            }
            if include_schema:
                blobs = []
                for _, db, name, _tt in rows:
                    qual = name if not db else f"{db}.{name}"
                    blobs.append(spark.table(qual).limit(0).toArrow().schema.serialize().to_pybytes())
                cols["table_schema"] = pa.array(blobs, pa.binary())
            return pa.table(cols)

        # -- Flight handlers ------------------------------------------
        def get_flight_info(self, context, descriptor):
            name, cmd = _any_unwrap(descriptor.command or b"")
            if name == "CommandStatementQuery":
                return self._info_for(descriptor, spark.sql(cmd.s(1)).toArrow())
            if name == "CommandPreparedStatementQuery":
                handle = (cmd.raw(1) or b"").decode()
                if handle not in self._prepared:
                    raise flight.FlightServerError(f"unknown prepared statement {handle!r}")
                return self._info_for(descriptor, spark.sql(self._prepared[handle]).toArrow())
            if name == "CommandGetCatalogs":
                return self._info_for(descriptor, self._catalogs_table())
            if name == "CommandGetDbSchemas":
                return self._info_for(
                    descriptor, self._db_schemas_table(cmd.s(1) or None, cmd.s(2) or None)
                )
            if name == "CommandGetTables":
                return self._info_for(
                    descriptor,
                    self._tables_table(
                        cmd.s(1) or None,
                        cmd.s(2) or None,
                        cmd.s(3) or None,
                        cmd.strs(4),
                        bool(cmd.u64(5)),
                    ),
                )
            raise NotImplementedError(f"flight sql command {name!r} not supported")

        def do_get(self, context, ticket):
            name, msg = _any_unwrap(ticket.ticket)
            if name != "TicketStatementQuery":
                raise NotImplementedError(f"ticket {name!r} not supported")
            handle, lo, hi = msg.s(1).rsplit(":", 2)
            tbl = self._results[handle]
            return flight.RecordBatchStream(tbl.slice(int(lo), int(hi) - int(lo)))

        def do_put(self, context, descriptor, reader, writer):
            # parameter binding for prepared statements arrives via DoPut
            raise NotImplementedError(
                "flight sql parameter binding (DoPut) not supported"
            )

        def do_action(self, context, action):
            if action.type == "CreatePreparedStatement":
                _name, req = _any_unwrap(action.body.to_pybytes())
                query = req.s(1)
                with self._lock:
                    handle = f"prep-{next(self._seq)}"
                    self._prepared[handle] = query
                schema_blob = spark.sql(query).limit(0).toArrow().schema.serialize().to_pybytes()
                result = _any_wrap(
                    "ActionCreatePreparedStatementResult",
                    f_msg(1, handle.encode()) + f_msg(2, schema_blob),
                )
                return [flight.Result(result)]
            if action.type == "ClosePreparedStatement":
                _name, req = _any_unwrap(action.body.to_pybytes())
                with self._lock:
                    self._prepared.pop((req.raw(1) or b"").decode(), None)
                return []
            raise NotImplementedError(f"action {action.type!r}")

    srv = _FlightSqlServer()
    threading.Thread(target=srv.serve, daemon=True).start()
    return srv


# -- client side ------------------------------------------------------------


def _cmd_descriptor(msg_name: str, value: bytes):
    flight = _flight()
    return flight.FlightDescriptor.for_command(_any_wrap(msg_name, value))


def _run_command(
    spark: SparkSession, location: str, msg_name: str, value: bytes, token: str | None
) -> DataFrame:
    flight = _flight()
    client = flight.connect(location)
    info = client.get_flight_info(
        _cmd_descriptor(msg_name, value), options=_call_options(token)
    )
    return read_flight_info(spark, info, location, token)


def flight_sql_execute(
    spark: SparkSession, location: str, query: str, token: str | None = None
) -> DataFrame:
    """FlightSqlClient::Execute (client.h): CommandStatementQuery{query=1}
    → FlightInfo → endpoint-parallel DoGet into a DataFrame."""
    return _run_command(spark, location, "CommandStatementQuery", f_str(1, query), token)


def flight_sql_get_catalogs(
    spark: SparkSession, location: str, token: str | None = None
) -> DataFrame:
    """CommandGetCatalogs{} → (catalog_name)."""
    return _run_command(spark, location, "CommandGetCatalogs", b"", token)


def flight_sql_get_db_schemas(
    spark: SparkSession,
    location: str,
    catalog: str | None = None,
    db_schema_filter_pattern: str | None = None,
    token: str | None = None,
) -> DataFrame:
    """CommandGetDbSchemas{catalog=1, db_schema_filter_pattern=2} →
    (catalog_name, db_schema_name)."""
    body = b""
    if catalog:
        body += f_str(1, catalog)
    if db_schema_filter_pattern:
        body += f_str(2, db_schema_filter_pattern)
    return _run_command(spark, location, "CommandGetDbSchemas", body, token)


def flight_sql_get_tables(
    spark: SparkSession,
    location: str,
    catalog: str | None = None,
    db_schema_filter_pattern: str | None = None,
    table_name_filter_pattern: str | None = None,
    table_types: list[str] | None = None,
    include_schema: bool = False,
    token: str | None = None,
) -> DataFrame:
    """CommandGetTables{catalog=1, db_schema_filter_pattern=2,
    table_name_filter_pattern=3, table_types=4, include_schema=5} →
    (catalog_name, db_schema_name, table_name, table_type
    [, table_schema])."""
    body = b""
    if catalog:
        body += f_str(1, catalog)
    if db_schema_filter_pattern:
        body += f_str(2, db_schema_filter_pattern)
    if table_name_filter_pattern:
        body += f_str(3, table_name_filter_pattern)
    for t in table_types or []:
        body += f_str(4, t)
    if include_schema:
        body += f_varint(5, 1)
    return _run_command(spark, location, "CommandGetTables", body, token)


def flight_sql_prepare(
    location: str, query: str, token: str | None = None
) -> tuple[str, bytes]:
    """CreatePreparedStatement action (server.h:542-556). Returns
    (prepared_statement_handle, IPC-serialized dataset schema bytes)."""
    flight = _flight()
    client = flight.connect(location)
    body = _any_wrap("ActionCreatePreparedStatementRequest", f_str(1, query))
    results = list(
        client.do_action(("CreatePreparedStatement", body), options=_call_options(token))
    )
    _name, res = _any_unwrap(results[0].body.to_pybytes())
    return (res.raw(1) or b"").decode(), res.raw(2) or b""


def flight_sql_execute_prepared(
    spark: SparkSession, location: str, handle: str, token: str | None = None
) -> DataFrame:
    """CommandPreparedStatementQuery{prepared_statement_handle=1}."""
    return _run_command(
        spark, location, "CommandPreparedStatementQuery", f_msg(1, handle.encode()), token
    )


def flight_sql_close_prepared(
    location: str, handle: str, token: str | None = None
) -> None:
    """ClosePreparedStatement action."""
    flight = _flight()
    client = flight.connect(location)
    body = _any_wrap("ActionClosePreparedStatementRequest", f_msg(1, handle.encode()))
    list(client.do_action(("ClosePreparedStatement", body), options=_call_options(token)))

"""PEP 249 (DB-API 2.0) driver over the engine's Flight SQL server.

The consumption surface the Arrow ecosystem standardizes as ADBC's
Flight SQL driver (reference: arrow flight/sql/client.h consumed by
database drivers): ``connect()`` speaks ONLY the Flight SQL wire
protocol — no SparkSession on the client side — so any tool written
against DB-API (pandas.read_sql, ORMs, report scripts) can query the
engine through a socket.

- queries: GetFlightInfo(CommandStatementQuery) → DoGet every endpoint
  → rows (arrow → python tuples);
- DML: CommandStatementUpdate over DoPut (rowcount = the server's
  DoPutUpdateResult.record_count; -1 = unknown, Spark reports none);
- paramstyle 'qmark': parameterized QUERIES run over the real
  prepared-statement protocol — CreatePreparedStatement action, Bind
  via DoPut (positional parameter record batch), execute, Close — the
  same wire flow the reference JDBC/ADBC drivers use (client.h
  PreparedStatement::Bind). Parameterized DML streams its parameters
  inside the CommandPreparedStatementUpdate DoPut, one execution per
  parameter row (executemany batches rows into a single DoPut).

Transactions are accepted and ignored (``commit()`` no-op,
``rollback()`` raises NotSupportedError): the server executes every
statement immediately — the same contract Flight SQL advertises via
SqlInfo FLIGHT_SQL_SERVER_TRANSACTION = NONE.
"""

from __future__ import annotations

from arrow_spark.plans.substrait_builder import f_str
from arrow_spark.sources.flight import _call_options, _flight
from arrow_spark.sources.flight_sql import _cmd_descriptor

apilevel = "2.0"
threadsafety = 1
paramstyle = "qmark"


class Warning(Exception):  # noqa: A001 - PEP 249 name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


_QUERY_HEADS = {"SELECT", "WITH", "VALUES", "TABLE", "SHOW", "DESCRIBE", "EXPLAIN"}


def _count_placeholders(sql: str) -> int:
    """Count ``?`` markers outside string literals (a ? inside '...'
    is data, not a placeholder — mirrors the server-side parser)."""
    count, i, n = 0, 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            i = j + 1
        elif ch == "?":
            count += 1
            i += 1
        else:
            i += 1
    return count


def _check_param_count(sql: str, params: list) -> None:
    want = _count_placeholders(sql)
    if want > len(params):
        raise ProgrammingError("more placeholders than parameters")
    if want < len(params):
        raise ProgrammingError("more parameters than placeholders")


def connect(location: str, token: str | None = None) -> "Connection":
    """Open a DB-API connection to a Flight SQL endpoint
    (e.g. ``grpc://host:port``)."""
    return Connection(location, token)


class Connection:
    def __init__(self, location: str, token: str | None):
        self._location = location
        self._token = token
        self._client = _flight().connect(location)
        self._closed = False

    def cursor(self) -> "Cursor":
        if self._closed:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def close(self) -> None:
        self._closed = True

    def commit(self) -> None:
        # every statement executes immediately (SqlInfo TRANSACTION=NONE)
        if self._closed:
            raise InterfaceError("connection is closed")

    def rollback(self) -> None:
        raise NotSupportedError("flight sql server runs without transactions")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class Cursor:
    arraysize = 1

    def __init__(self, conn: Connection):
        self._conn = conn
        self._rows: list[tuple] | None = None
        self._pos = 0
        self.description = None
        self.rowcount = -1

    # -- execution ---------------------------------------------------
    def execute(self, operation: str, parameters=None) -> "Cursor":
        if self._conn._closed:
            raise InterfaceError("connection is closed")
        head = (operation.lstrip().split(None, 1) or [""])[0].upper()
        try:
            if parameters is not None:
                params = list(parameters)
                _check_param_count(operation, params)
                # real prepared-statement protocol: Create → Bind
                # (DoPut param batch) → execute → Close
                if head in _QUERY_HEADS:
                    self._execute_query_prepared(operation, params)
                else:
                    self._execute_update_prepared(operation, [params])
            elif head in _QUERY_HEADS:
                self._execute_query(operation)
            else:
                self._execute_update(operation)
        except (InterfaceError, DatabaseError):
            raise
        except Exception as exc:  # flight errors → DatabaseError (PEP 249)
            raise OperationalError(str(exc)) from exc
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        head = (operation.lstrip().split(None, 1) or [""])[0].upper()
        seq = [list(p) for p in seq_of_parameters]
        for p in seq:
            _check_param_count(operation, p)
        if head not in _QUERY_HEADS and seq:
            # batch DML: ONE prepared statement, ONE DoPut carrying a
            # multi-row parameter batch — one execution per row
            try:
                self._execute_update_prepared(operation, seq)
            except (InterfaceError, DatabaseError):
                raise
            except Exception as exc:
                raise OperationalError(str(exc)) from exc
            return self
        for p in seq:
            self.execute(operation, p)
        return self

    def _load_info(self, info) -> None:
        import pyarrow as pa

        client = self._conn._client
        opts = _call_options(self._conn._token)
        tables = []
        for ep in info.endpoints:
            tables.append(client.do_get(ep.ticket, options=opts).read_all())
        tbl = pa.concat_tables(tables) if tables else pa.table({})
        self.description = [
            (f.name, str(f.type), None, None, None, None, f.nullable)
            for f in tbl.schema
        ]
        self._rows = [tuple(r.values()) for r in tbl.to_pylist()]
        self._pos = 0
        self.rowcount = len(self._rows)

    def _execute_query(self, sql: str) -> None:
        client = self._conn._client
        opts = _call_options(self._conn._token)
        info = client.get_flight_info(
            _cmd_descriptor("CommandStatementQuery", f_str(1, sql)), options=opts
        )
        self._load_info(info)

    def _execute_query_prepared(self, sql: str, params: list) -> None:
        """Create → Bind (DoPut positional param batch) → execute →
        Close: the reference JDBC/ADBC parameterized-query wire flow."""
        from arrow_spark.plans.substrait_builder import f_msg
        from arrow_spark.sources.flight_sql import (
            _any_unwrap,
            _any_wrap,
            _param_batch,
        )

        client = self._conn._client
        opts = _call_options(self._conn._token)
        results = list(
            client.do_action(
                (
                    "CreatePreparedStatement",
                    _any_wrap("ActionCreatePreparedStatementRequest", f_str(1, sql)),
                ),
                options=opts,
            )
        )
        _name, res = _any_unwrap(results[0].body.to_pybytes())
        handle = (res.raw(1) or b"").decode()
        try:
            batch = _param_batch(params)
            desc = _cmd_descriptor(
                "CommandPreparedStatementQuery", f_msg(1, handle.encode())
            )
            writer, meta_reader = client.do_put(desc, batch.schema, options=opts)
            writer.write_batch(batch)
            writer.done_writing()
            meta_reader.read()
            writer.close()
            self._load_info(client.get_flight_info(desc, options=opts))
        finally:
            client.do_action(
                (
                    "ClosePreparedStatement",
                    _any_wrap(
                        "ActionClosePreparedStatementRequest",
                        f_msg(1, handle.encode()),
                    ),
                ),
                options=opts,
            )

    def _execute_update_prepared(self, sql: str, param_rows: list) -> None:
        """Prepared DML: ONE DoPut whose stream carries every parameter
        row; the server executes once per row (ExecuteUpdate batch
        semantics)."""
        import pyarrow as pa

        from arrow_spark.plans.substrait import _Msg
        from arrow_spark.plans.substrait_builder import f_msg
        from arrow_spark.sources.flight_sql import _any_unwrap, _any_wrap

        client = self._conn._client
        opts = _call_options(self._conn._token)
        results = list(
            client.do_action(
                (
                    "CreatePreparedStatement",
                    _any_wrap("ActionCreatePreparedStatementRequest", f_str(1, sql)),
                ),
                options=opts,
            )
        )
        _name, res = _any_unwrap(results[0].body.to_pybytes())
        handle = (res.raw(1) or b"").decode()
        try:
            # ONE multi-row batch, column-wise type inference (a None
            # in one row must not flip that row's column to null type)
            batch = None
            if param_rows:
                ncols = len(param_rows[0])
                batch = pa.record_batch(
                    [pa.array([r[i] for r in param_rows]) for i in range(ncols)],
                    names=[f"parameter_{i + 1}" for i in range(ncols)],
                )
            writer, meta_reader = client.do_put(
                _cmd_descriptor(
                    "CommandPreparedStatementUpdate", f_msg(1, handle.encode())
                ),
                batch.schema if batch is not None else pa.schema([]),
                options=opts,
            )
            if batch is not None:
                writer.write_batch(batch)
            writer.done_writing()
            buf = meta_reader.read()
            writer.close()
            counts = _Msg(buf.to_pybytes()).ints(1) if buf is not None else []
            self.rowcount = counts[0] if counts else -1
            self.description = None
            self._rows = None
        finally:
            client.do_action(
                (
                    "ClosePreparedStatement",
                    _any_wrap(
                        "ActionClosePreparedStatementRequest",
                        f_msg(1, handle.encode()),
                    ),
                ),
                options=opts,
            )

    def _execute_update(self, sql: str) -> None:
        import pyarrow as pa

        from arrow_spark.plans.substrait import _Msg

        client = self._conn._client
        writer, meta_reader = client.do_put(
            _cmd_descriptor("CommandStatementUpdate", f_str(1, sql)),
            pa.schema([]),
            options=_call_options(self._conn._token),
        )
        writer.done_writing()
        buf = meta_reader.read()
        writer.close()
        counts = _Msg(buf.to_pybytes()).ints(1) if buf is not None else []
        self.rowcount = counts[0] if counts else -1
        self.description = None
        self._rows = None

    # -- fetch -------------------------------------------------------
    def _need_rows(self) -> list[tuple]:
        if self._rows is None:
            raise ProgrammingError("no result set (not a query, or no execute yet)")
        return self._rows

    def fetchone(self):
        rows = self._need_rows()
        if self._pos >= len(rows):
            return None
        row = rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size: int | None = None):
        rows = self._need_rows()
        k = size or self.arraysize
        out = rows[self._pos : self._pos + k]
        self._pos += len(out)
        return out

    def fetchall(self):
        rows = self._need_rows()
        out = rows[self._pos :]
        self._pos = len(rows)
        return out

    def __iter__(self):
        while True:
            r = self.fetchone()
            if r is None:
                return
            yield r

    # -- misc --------------------------------------------------------
    def setinputsizes(self, sizes) -> None:  # PEP 249: may be no-op
        pass

    def setoutputsize(self, size, column=None) -> None:
        pass

    def close(self) -> None:
        self._rows = None
        self.description = None

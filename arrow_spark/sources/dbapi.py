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
- paramstyle 'qmark': ``?`` placeholders are inlined client-side with
  SQL-literal escaping (the loopback server's prepared statements take
  no parameter stream — same capability note as flight_sql.py).

Transactions are accepted and ignored (``commit()`` no-op,
``rollback()`` raises NotSupportedError): the server executes every
statement immediately — the same contract Flight SQL advertises via
SqlInfo FLIGHT_SQL_SERVER_TRANSACTION = NONE.
"""

from __future__ import annotations

import datetime as _dt

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


def _quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (_dt.datetime,)):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, bytes):
        return "X'" + v.hex() + "'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _inline_params(sql: str, params) -> str:
    """Replace ``?`` placeholders outside string literals/comments with
    escaped SQL literals."""
    if params is None:
        return sql
    out, i, pi, n = [], 0, 0, len(sql)
    params = list(params)
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
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == "?":
            if pi >= len(params):
                raise ProgrammingError("more placeholders than parameters")
            out.append(_quote(params[pi]))
            pi += 1
            i += 1
        else:
            out.append(ch)
            i += 1
    if pi != len(params):
        raise ProgrammingError("more parameters than placeholders")
    return "".join(out)


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
        sql = _inline_params(operation, parameters)
        head = (sql.lstrip().split(None, 1) or [""])[0].upper()
        try:
            if head in _QUERY_HEADS:
                self._execute_query(sql)
            else:
                self._execute_update(sql)
        except (InterfaceError, DatabaseError):
            raise
        except Exception as exc:  # flight errors → DatabaseError (PEP 249)
            raise OperationalError(str(exc)) from exc
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        for p in seq_of_parameters:
            self.execute(operation, p)
        return self

    def _execute_query(self, sql: str) -> None:
        import pyarrow as pa

        client = self._conn._client
        opts = _call_options(self._conn._token)
        info = client.get_flight_info(
            _cmd_descriptor("CommandStatementQuery", f_str(1, sql)), options=opts
        )
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

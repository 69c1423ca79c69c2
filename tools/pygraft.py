"""pygraft — a zero-dependency Python client for the graft SQL gateway.

The Python entry surface for the engine (the reference ships PyFlink;
graft's Python story is this client over the documented REST gateway —
see docs sql/interfaces/sql-gateway/rest.md for the wire protocol — or
plain PySpark against the library's Scala surface).

    import pygraft
    with pygraft.connect("localhost", 8083) as sess:
        sess.execute("CREATE TABLE t (id BIGINT, v STRING) WITH (...)")
        sess.execute("INSERT INTO t VALUES (1, 'a')")
        for row in sess.query("SELECT * FROM t ORDER BY id"):
            print(row)                       # ['1', 'a'] field lists
        cols = sess.last_columns             # [('id', 'BIGINT'), ...]
        sess.complete("SELECT * FRO", 12)    # ['FROM']

Statements run asynchronously on the gateway; `execute`/`query` poll the
operation to a terminal status and raise GatewayError on ERROR/CANCELED.
`cancel(op)` stops a running statement mid-flight. Results stream page
by page (the gateway's nextResultUri loop) — a huge SELECT iterates
without materializing.

Only the Python standard library is used (urllib/json), so the module
drops into any environment that can reach the gateway port.
"""

import json
import time
import urllib.request
import urllib.error

__all__ = ["connect", "Session", "GatewayError"]


class GatewayError(RuntimeError):
    """A gateway-side statement or protocol error."""


def connect(host="localhost", port=8083, properties=None):
    """Open a gateway session; returns a :class:`Session` (usable as a
    context manager)."""
    return Session(host, port, properties)


class Session:
    def __init__(self, host, port, properties=None):
        self._base = f"http://{host}:{port}/v1"
        self.last_columns = []
        body = {"properties": properties} if properties else {}
        self._handle = self._call("/sessions", body)["sessionHandle"]

    # ------------------------------------------------------------- http

    def _call(self, path, body=None, method=None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(self._base + path, data=data,
                                     method=method)
        try:
            with urllib.request.urlopen(req) as r:
                text = r.read().decode()
        except urllib.error.HTTPError as e:
            raise GatewayError(
                f"{path}: HTTP {e.code}: {e.read().decode()}") from None
        return json.loads(text) if text else {}

    # -------------------------------------------------------- statements

    def submit(self, statement):
        """Submit a statement; returns its operation handle immediately."""
        return self._call(f"/sessions/{self._handle}/statements",
                          {"statement": statement})["operationHandle"]

    def status(self, op):
        return self._call(
            f"/sessions/{self._handle}/operations/{op}/status")["status"]

    def wait(self, op, poll_s=0.02, timeout_s=None):
        """Poll `op` to a terminal status; raise unless FINISHED.
        `timeout_s` bounds the wait (None = poll indefinitely; 0 means
        "already late" — cancel unless the statement is terminal now);
        on expiry the statement is cancelled and GatewayError raised."""
        deadline = (time.monotonic() + timeout_s
                    if timeout_s is not None else None)
        st = self.status(op)
        while st == "RUNNING":
            if deadline is not None and time.monotonic() > deadline:
                # best-effort: a cancel that loses the race to completion
                # errors (the gateway rejects terminal -> CANCELED, as the
                # reference does) — the caller should still see the
                # TIMEOUT error, not the racy cancel failure
                try:
                    self.cancel(op)
                except GatewayError:
                    if self.status(op) == "RUNNING":
                        raise
                raise GatewayError(f"statement timed out after {timeout_s}s")
            time.sleep(poll_s)
            st = self.status(op)
        if st != "FINISHED":
            detail = ""
            if st == "ERROR":
                try:
                    self._call(
                        f"/sessions/{self._handle}/operations/{op}/result/0")
                except GatewayError as e:
                    detail = f": {e}"
            raise GatewayError(f"statement {st}{detail}")
        return st

    def cancel(self, op):
        """Stop a running statement's jobs mid-flight."""
        return self._call(
            f"/sessions/{self._handle}/operations/{op}/cancel",
            {}, method="POST")["status"]

    def execute(self, statement):
        """Run a statement to completion (DDL/DML); returns the operation
        handle (results, if any, via :meth:`fetch`)."""
        op = self.submit(statement)
        self.wait(op)
        return op

    def fetch(self, op, not_ready_poll_s=0.02, timeout_s=None):
        """Iterate an operation's rows as field lists, page by page.
        Usable on a still-running operation: a NOT_READY page re-points
        at the same token, so back off briefly before re-requesting
        rather than hammering the gateway in a busy loop. `timeout_s`
        bounds the total time spent waiting on NOT_READY pages
        (mirrors ``wait``); ``None`` waits indefinitely."""
        uri = f"/sessions/{self._handle}/operations/{op}/result/0"
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        while uri:
            page = self._call(uri)
            if page.get("resultType") == "NOT_READY":
                if deadline is not None and time.monotonic() > deadline:
                    raise GatewayError(
                        f"operation {op} still NOT_READY after {timeout_s}s")
                time.sleep(not_ready_poll_s)
                uri = page.get("nextResultUri")
                # a NOT_READY page always re-points at itself; a missing
                # nextResultUri is a gateway contract violation — raise
                # rather than silently yielding an empty result set
                if not uri:
                    raise GatewayError(
                        f"NOT_READY page for operation {op} carried no "
                        "nextResultUri")
                if uri.startswith("/v1"):
                    uri = uri[len("/v1"):]
                continue
            cols = page.get("results", {}).get("columns", [])
            if cols:
                self.last_columns = [
                    (c["name"], c["logicalType"]["type"]) for c in cols]
            for d in page.get("results", {}).get("data", []):
                yield d["fields"]
            uri = page.get("nextResultUri")
            if uri and uri.startswith("/v1"):
                uri = uri[len("/v1"):]

    def query(self, statement):
        """Run a SELECT and iterate its rows."""
        return self.fetch(self.execute(statement))

    def complete(self, statement, position):
        """Statement-completion candidates at `position`."""
        return self._call(f"/sessions/{self._handle}/complete-statement",
                          {"statement": statement,
                           "position": position})["candidates"]

    # --------------------------------------------------------- lifecycle

    def close(self):
        try:
            self._call(f"/sessions/{self._handle}", method="DELETE")
        except GatewayError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

"""TCP network source/sink (reference TODO:58-59: "TCP network
modules: client and server. Both could be used as input or output").

Spark-first mapping of the four combinations:

- unbounded input -> Structured Streaming's socket source
  (`streaming.stream_socket`), the engine-native TCP client reader
  (driver connects, rows distribute from there).
- bounded input (`read_tcp`) -> driver-side client that drains the
  peer until EOF into a raw-line DataFrame, memorylimit-guarded like
  every bounded edge (the reference's sockets are single-node pipes;
  a bounded drain is their batch semantics).
- output (`write_tcp`) -> executor-side clients: foreachPartition
  opens one connection per partition and streams its lines — the
  distributed path (N partitions = N concurrent writers, no driver
  hop). For strict single-connection peers pass single_conn=True to
  funnel through one driver-side socket (toLocalIterator, constant
  memory).
- "server" mode on either side is the peer's role, not ours: both
  reads and writes here CONNECT to a listening endpoint. A
  Spark-hosted listening server inverts the execution model (executors
  come and go) — the honest mapping is to front it with a real
  listener and point these clients at it.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, SparkSession

from dbitool_spark.io.text_io import RAW_COL


def read_tcp(
    spark: SparkSession,
    host: str,
    port: int,
    *,
    max_rows: int = 1_000_000,
    timeout: float = 30.0,
    encoding: str = "utf-8",
) -> DataFrame:
    """Bounded TCP client read: connect, drain lines until the peer
    closes, return a raw-line DataFrame. max_rows is the bounded-edge
    guard (exceeding it raises — an unbounded feed belongs on
    streaming.stream_socket)."""
    lines: list[str] = []

    def _push(raw: bytes) -> None:
        if len(lines) >= max_rows:
            raise MemoryError(
                f"read_tcp exceeded max_rows={max_rows}; use the "
                "streaming socket source for unbounded feeds"
            )
        if raw.endswith(b"\r"):  # CRLF peers
            raw = raw[:-1]
        lines.append(raw.decode(encoding))

    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.settimeout(timeout)
        buf = b""
        while True:
            chunk = sock.recv(65536)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                _push(line)
        if buf:
            _push(buf)  # unterminated trailing line counts toward the cap too
    return spark.createDataFrame([(l,) for l in lines], f"{RAW_COL} string")


def write_tcp(
    df: DataFrame,
    host: str,
    port: int,
    *,
    single_conn: bool = False,
    timeout: float = 30.0,
    encoding: str = "utf-8",
) -> None:
    """TCP client sink: stream the single raw column as lines to a
    listening endpoint. Default is the distributed path — one
    connection per partition, opened inside the executor task (no
    driver round-trip, so a 1000-partition result writes with 1000
    concurrent clients; repartition first if the peer wants fewer).
    single_conn=True serializes through one driver-side connection
    instead."""
    if len(df.columns) != 1:
        raise ValueError(f"write_tcp expects a single string column, got {df.columns}")
    col = df.columns[0]

    if single_conn:
        with socket.create_connection((host, port), timeout=timeout) as sock:
            for row in df.toLocalIterator():
                v = row[col]
                sock.sendall((("" if v is None else str(v)) + "\n").encode(encoding))
        return

    def _send(rows) -> None:
        sock = None
        try:
            for row in rows:
                if sock is None:  # connect lazily: empty partitions stay silent
                    sock = socket.create_connection((host, port), timeout=timeout)
                v = row[col]
                sock.sendall((("" if v is None else str(v)) + "\n").encode(encoding))
        finally:
            if sock is not None:
                sock.close()

    df.foreachPartition(_send)

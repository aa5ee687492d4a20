"""BSON source/sink (reference bsonread scripts/dbitool.pl:2438-2502,
bsonwrite :2504-2559).

The reference wraps all rows in one BSON document {"a": [row, ...]}
and decodes/encodes fully in memory — a bounded edge by design. No
BSON library ships in this environment, so the codec here is a
minimal, self-contained implementation of the public BSON spec
(bsonspec.org) covering the types the row model needs: document,
array, string (0x02), double (0x01), int32 (0x10), int64 (0x12),
boolean (0x08), and null (0x0A). Reads of other element types raise
cleanly rather than mis-parse.

Both paths are driver-side and guarded by the reference's
memorylimit semantics, like the single-document JSON edge.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MEMORY_LIMIT = 100_000

# --- minimal BSON codec (public spec, bounded type set) ---------------


def _enc_value(value) -> tuple[int, bytes]:
    if value is None:
        return 0x0A, b""
    if isinstance(value, bool):
        return 0x08, b"\x01" if value else b"\x00"
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return 0x10, struct.pack("<i", value)
        return 0x12, struct.pack("<q", value)
    if isinstance(value, float):
        return 0x01, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8") + b"\x00"
        return 0x02, struct.pack("<i", len(raw)) + raw
    if isinstance(value, dict):
        return 0x03, _enc_doc(value)
    if isinstance(value, (list, tuple)):
        return 0x04, _enc_doc({str(i): v for i, v in enumerate(value)})
    raise TypeError(f"unsupported BSON value type {type(value).__name__}")


def _enc_doc(doc: dict) -> bytes:
    body = b""
    for key, value in doc.items():
        tag, payload = _enc_value(value)
        body += bytes([tag]) + key.encode("utf-8") + b"\x00" + payload
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_doc(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    (length,) = struct.unpack_from("<i", buf, pos)
    end = pos + length - 1  # position of trailing \x00
    pos += 4
    out: dict = {}
    while pos < end:
        tag = buf[pos]
        pos += 1
        key_end = buf.index(b"\x00", pos)
        key = buf[pos:key_end].decode("utf-8")
        pos = key_end + 1
        if tag == 0x0A:
            out[key] = None
        elif tag == 0x08:
            out[key] = buf[pos] == 1
            pos += 1
        elif tag == 0x10:
            (out[key],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif tag == 0x12:
            (out[key],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        elif tag == 0x01:
            (out[key],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif tag == 0x02:
            (slen,) = struct.unpack_from("<i", buf, pos)
            out[key] = buf[pos + 4 : pos + 4 + slen - 1].decode("utf-8")
            pos += 4 + slen
        elif tag in (0x03, 0x04):
            value, consumed = _dec_doc(buf, pos)
            out[key] = list(value.values()) if tag == 0x04 else value
            pos += consumed
        else:
            raise ValueError(f"unsupported BSON element type 0x{tag:02x} at key {key!r}")
    return out, length


# --- Spark-facing API -------------------------------------------------


def write_bson(
    df: DataFrame, path: str, *, memory_limit: int = DEFAULT_MEMORY_LIMIT
) -> None:
    """Rows -> one BSON document {"a": [name-keyed rows...]} at
    `path` (reference wire format, :2536-2545). Bounded edge."""
    rows = df.limit(memory_limit + 1).collect()
    if len(rows) > memory_limit:
        raise MemoryError(
            f"write_bson is a bounded edge: >{memory_limit} rows "
            "(reference memorylimit semantics)"
        )
    doc = {"a": [row.asDict(recursive=True) for row in rows]}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(_enc_doc(doc))


def read_bson(
    spark: SparkSession,
    path: str,
    *,
    schema: str | None = None,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
) -> DataFrame:
    """One BSON document {"a": [rows]} -> DataFrame. Bounded edge
    (whole-document decode, exactly like the reference)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    doc, _ = _dec_doc(buf)
    rows = doc.get("a", [])
    if len(rows) > memory_limit:
        raise MemoryError(f"BSON document holds >{memory_limit} rows")
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    if not rows:
        raise ValueError("cannot infer schema from an empty BSON document")
    return spark.createDataFrame(rows)

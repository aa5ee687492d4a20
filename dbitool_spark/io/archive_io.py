"""Zip archive source/sink (reference TODO:48-51: "zipread module to
read data from a zip file... single file or multiple files" and
"zipwrite to write the result a single file zipfile"; the TODO:53-56
multi-file-container idea folds in here too).

Spark-first shape: the read is a distributed `binaryFile` scan over
the archives (a glob of zips parallelizes archive-per-task — the
TODO's "multiple streams allocated dynamically per input file"
becomes ONE DataFrame with (archive, member) provenance columns, which
is the idiomatic Spark answer to dynamic stream fan-out), with member
extraction in `mapInPandas` using the stdlib `zipfile` codec. Each
archive is processed entirely inside its executor task; nothing ships
to the driver. Downstream, text members flow into the existing
raw->row parse boundaries (csv_io.parse_csv_lines and friends), so a
zipped CSV needs no special path.

Bounds: a zip member decompresses in memory inside one task, so
`member_limit` caps the UNCOMPRESSED size per member (zip bombs, fat
members) the same way every other bounded edge in this engine takes a
memorylimit. The write is the reference's single-file zip: a bounded
driver edge (toLocalIterator, max_rows-guarded) that emits one
archive with one member — mirroring jsonwrite's in-memory semantics,
NOT a distributed sink (at scale, write parquet/csv parts and archive
out-of-band).
"""

from __future__ import annotations

import fnmatch
import io
import os
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dbitool_spark.io import _atomic

_READ_SCHEMA = "archive string, member string, value string"
_READ_SCHEMA_BIN = "archive string, member string, content binary"


def _check_member_limit(
    kind: str, member: str, archive: str, size: int, limit: int
) -> None:
    if size > limit:
        raise ValueError(
            f"{kind} member {member!r} in {archive} decompresses to "
            f"{size} bytes, over the member_limit of {limit} (raise it "
            "explicitly for trusted fat members)"
        )


def _member_frame(
    archive: str, member: str, data: bytes, binary: bool, encoding: str
) -> pd.DataFrame:
    """One member -> one output frame, shared by the zip and tar
    exploders so the line-splitting contract cannot drift between
    them. Text mode is \\n-exact to match Spark's text reader
    (str.splitlines would also split on U+2028/U+0085/\\x0b INSIDE a
    line, silently breaking round-trips); trailing \\r stripped for
    CRLF content."""
    if binary:
        return pd.DataFrame(
            {"archive": [archive], "member": [member], "content": [data]}
        )
    lines = data.decode(encoding).split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    lines = [l[:-1] if l.endswith("\r") else l for l in lines]
    return pd.DataFrame(
        {
            "archive": [archive] * len(lines),
            "member": [member] * len(lines),
            "value": lines,
        }
    )


def read_zip(
    spark: SparkSession,
    path: str,
    *,
    member_glob: str | None = None,
    binary: bool = False,
    member_limit: int = 256 * 1024 * 1024,
    encoding: str = "utf-8",
) -> DataFrame:
    """Distributed zip source. `path` may be a single archive, a glob,
    or a directory of archives; each matching zip is one binaryFile
    row, exploded member-by-member in its executor task.

    Text mode (default) emits one row per LINE with (archive, member)
    provenance — the raw-stream contract, ready for parse_csv_lines /
    parse_ndjson_lines. binary=True emits one row per MEMBER with the
    raw bytes (the blob contract for multimodal payloads).

    member_limit bounds the uncompressed size per member; a member
    over the cap raises (zip-bomb guard) rather than silently OOMing
    an executor.

    Non-zip files under a directory/glob scan are skipped by MAGIC
    check inside the task (a directory of archives routinely carries
    _SUCCESS markers, READMEs, checksums) — a driver-side isdir test
    could not see object-store paths, and feeding a marker file to
    ZipFile would fail the whole scan. A scan whose matches contain
    no zip at all therefore yields zero rows; point fileread at plain
    files."""

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for archive_path, blob in zip(pdf["path"], pdf["content"]):
                if bytes(blob[:2]) != b"PK":
                    continue  # not a zip: marker/readme in a dir scan
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if member_glob and not fnmatch.fnmatch(
                            info.filename, member_glob
                        ):
                            continue
                        _check_member_limit(
                            "zip", info.filename, archive_path,
                            info.file_size, member_limit,
                        )
                        yield _member_frame(
                            archive_path, info.filename, zf.read(info),
                            binary, encoding,
                        )

    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return blobs.mapInPandas(_explode, _READ_SCHEMA_BIN if binary else _READ_SCHEMA)


def read_tar(
    spark: SparkSession,
    path: str,
    *,
    member_glob: str | None = None,
    binary: bool = False,
    member_limit: int = 256 * 1024 * 1024,
    encoding: str = "utf-8",
) -> DataFrame:
    """Distributed tar source — the other container TODO:53-56 names
    ("multiple file container (zip, tar, etc.)"). Same shape as
    read_zip: binaryFile scan, per-task member extraction via the
    stdlib tarfile codec, (archive, member) provenance, member_limit
    bomb guard, \\n-exact text splitting. mode='r:*' auto-detects
    gzip/bz2/xz-compressed tarballs from the byte stream, so .tar,
    .tar.gz and .tgz all route through this one reader. Non-tar files
    under a directory/glob scan are skipped by a tarfile probe inside
    the task (same rationale as read_zip's magic skip). Hardlink and
    symlink members resolve to their target's content (tar extraction
    semantics — dedup'd archives store identical files as links);
    links whose target is outside the archive are skipped."""
    import tarfile

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for archive_path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:*")
                except tarfile.TarError:
                    continue  # not a tar: marker/readme in a dir scan
                with tf:
                    for info in tf:
                        if not (info.isfile() or info.islnk() or info.issym()):
                            continue
                        if member_glob and not fnmatch.fnmatch(
                            info.name, member_glob
                        ):
                            continue
                        _check_member_limit(
                            "tar", info.name, archive_path, info.size, member_limit
                        )
                        try:
                            fh = tf.extractfile(info)
                        except KeyError:
                            continue  # link target outside the archive
                        if fh is None:
                            continue
                        yield _member_frame(
                            archive_path, info.name, fh.read(), binary, encoding
                        )

    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return blobs.mapInPandas(_explode, _READ_SCHEMA_BIN if binary else _READ_SCHEMA)


def write_zip(
    df: DataFrame,
    path: str,
    *,
    member: str = "data.txt",
    max_rows: int = 1_000_000,
    encoding: str = "utf-8",
) -> int:
    """Single-file zip sink (reference TODO:50-51): the single raw
    column streams through toLocalIterator (constant driver memory)
    into one deflated member. max_rows is the bounded-edge guard —
    exceeding it raises, same contract as jsonwrite/write_stdout.
    The archive builds at a tmp name and os.replace()s into `path` on
    success (io._atomic discipline), so a guard failure mid-write
    never leaves a truncated zip at the final path. Returns rows
    written."""
    if len(df.columns) != 1:
        raise ValueError(f"write_zip expects a single string column, got {df.columns}")
    col = df.columns[0]
    n = 0
    with _atomic.atomic_path(path) as tmp:
        with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            with zf.open(member, "w") as fh:
                for row in df.toLocalIterator():
                    if n >= max_rows:
                        raise MemoryError(
                            f"write_zip exceeded max_rows={max_rows}; zip output is a "
                            "bounded single-file edge — write parquet/csv parts for "
                            "unbounded results"
                        )
                    v = row[col]
                    fh.write((("" if v is None else str(v)) + "\n").encode(encoding))
                    n += 1
    return n

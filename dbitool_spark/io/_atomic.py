"""Atomic single-file writes shared by the driver-side document sinks
(json / eml / chart). Writing to a tmp file in the same directory and
os.replace()-ing it over the target gives readers either the old
document or the complete new one, never a partial write. The tmp file
is created with O_EXCL under a name unique per (pid, thread, call), so
concurrent writers — including two threads of one process — can never
open, truncate, or delete each other's in-flight tmp file; the last
replace still wins on the final path, which is the usual atomic-write
contract."""

from __future__ import annotations

import contextlib
import itertools
import os
import threading
from collections.abc import Iterator

_seq = itertools.count()


@contextlib.contextmanager
def atomic_path(path: str) -> Iterator[str]:
    """Yield a unique same-directory tmp name for sinks that stream
    through a library writer (zipfile et al.) instead of handing over
    one buffer; os.replace on clean exit, unlink on failure — the same
    old-or-complete contract as _write, so a mid-write guard failure
    never leaves a truncated archive at the final path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.{next(_seq)}.tmp"
    try:
        yield tmp
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _write(path: str, data, mode: str, encoding: str | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.{next(_seq)}.tmp"
    # O_EXCL: if the unique name somehow exists, fail loudly rather
    # than truncate someone else's in-flight file
    fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    try:
        with os.fdopen(fd, mode, encoding=encoding) as fh:
            fh.write(data)
        os.replace(tmp, path)
    finally:
        # only ever removes OUR tmp (the name is unique to this call);
        # after a successful replace it no longer exists
        if os.path.exists(tmp):
            os.remove(tmp)


def write_text(path: str, text: str) -> None:
    _write(path, text, "w", "utf-8")


def write_bytes(path: str, data: bytes) -> None:
    _write(path, data, "wb")

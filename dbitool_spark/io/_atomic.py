"""Atomic single-file writes shared by the driver-side document sinks
(json / eml / chart). Writing to a tmp file in the same directory and
os.replace()-ing it over the target gives readers either the old
document or the complete new one, never a partial write. The tmp name
embeds the pid so two concurrent writers to the same path cannot
clobber each other's in-flight tmp file (last replace still wins on
the final path, which is the usual atomic-write contract)."""

from __future__ import annotations

import os


def _write(path: str, data, mode: str, encoding: str | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, mode, encoding=encoding) as fh:
            fh.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def write_text(path: str, text: str) -> None:
    _write(path, text, "w", "utf-8")


def write_bytes(path: str, data: bytes) -> None:
    _write(path, data, "wb")

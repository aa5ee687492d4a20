"""Email sink (reference TODO:28-29: "create a module to send an
email or create a email text with the summary of the process").

Both halves of the TODO sentence are implemented:

- **create a email text** — compose an RFC-5322 message
  (stdlib ``email.message.EmailMessage``) whose body is the process
  summary (EngineLog lines + per-module row counts) and whose
  attachments carry a bounded CSV sample of a result stream; write it
  atomically as ``.eml``. Fully testable offline, and the parse
  helpers below round-trip it (the driver entry proves value
  fidelity through MIME encode -> decode).
- **send an email** — ``send_smtp`` over stdlib ``smtplib``. Proven
  in-sandbox against a loopback SMTP server (tests/test_todo_modules
  runs a minimal RFC-5321 responder on 127.0.0.1), not env-gated.

Scale shape: composing an email is a driver-side side effect by
nature (one message has one writer, exactly like the single-document
JSON sink) — the only data that ever reaches the driver is the
memorylimit-bounded attachment sample, fetched in ONE
``limit(n+1)`` job (the write_json bounded-edge pattern,
io/json_io.py:122). The summarized stream itself is never collected:
row counts ride plan Observations computed inline with the sink
action (obs.observed), so a 100 TB pipeline pays zero extra passes
for its summary email.
"""

from __future__ import annotations

import csv
import io as _io
import smtplib
from email import policy
from email.message import EmailMessage
from email.parser import BytesParser

from pyspark.sql import DataFrame

from dbitool_spark.io import _atomic

DEFAULT_MEMORY_LIMIT = 100_000


def df_to_csv_text(df: DataFrame, *, max_rows: int = DEFAULT_MEMORY_LIMIT) -> str:
    """Bounded CSV rendering of a DataFrame for use as an email
    attachment. One limit(n+1) fetch; quoting via the stdlib csv
    writer so embedded commas/quotes/newlines survive the MIME trip."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise MemoryError(
            f"email attachment is a bounded edge: >{max_rows} rows "
            "(reference memorylimit semantics); attach a sample or "
            "aggregate first"
        )
    buf = _io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(df.columns)
    for r in rows:
        w.writerow(["" if v is None else v for v in r])
    return buf.getvalue()


def summary_body(
    *,
    title: str = "dbitool_spark process summary",
    stats: dict[str, int] | None = None,
    log_lines: list[str] | None = None,
) -> str:
    """Plain-text process summary: per-module row counts (from plan
    Observations) followed by engine-log lines. Deterministic layout
    so tests can golden-match it."""
    out = [title, "=" * len(title), ""]
    if stats:
        width = max(len(k) for k in stats)
        out.append("module row counts:")
        for mod, n in stats.items():
            out.append(f"  {mod.ljust(width)}  {n}")
        out.append("")
    if log_lines:
        out.append("engine log:")
        out.extend(f"  {line}" for line in log_lines)
        out.append("")
    return "\n".join(out)


def compose_email(
    *,
    sender: str,
    to: str | list[str],
    subject: str,
    body: str,
    attachments: list[tuple[str, str]] | None = None,
) -> EmailMessage:
    """RFC-5322 message with a text/plain body and optional text/csv
    attachments [(filename, csv_text), ...]."""
    msg = EmailMessage()
    msg["From"] = sender
    msg["To"] = ", ".join(to) if isinstance(to, list) else to
    msg["Subject"] = subject
    msg.set_content(body)
    for fname, text in attachments or []:
        # str form so the part records charset=utf-8 (the bytes form
        # leaves charset undeclared and non-ASCII text mis-decodes on
        # the parse side)
        msg.add_attachment(text, subtype="csv", filename=fname)
    return msg


def write_eml(msg: EmailMessage, path: str) -> None:
    """Atomic single-file .eml write (shared tmp+rename helper: no
    partial message on failure)."""
    _atomic.write_bytes(path, msg.as_bytes())


def parse_eml(path: str) -> EmailMessage:
    with open(path, "rb") as fh:
        return BytesParser(policy=policy.default).parse(fh)


def attachment_rows(msg: EmailMessage, filename: str) -> list[dict[str, str]]:
    """Extract a named CSV attachment back into header-keyed rows
    (the round-trip half the driver entry hashes)."""
    for part in msg.iter_attachments():
        if part.get_filename() == filename:
            text = part.get_content()
            if isinstance(text, bytes):
                text = text.decode("utf-8")
            return list(csv.DictReader(_io.StringIO(text)))
    raise KeyError(f"no attachment named {filename!r}")


def send_smtp(
    msg: EmailMessage,
    *,
    host: str,
    port: int = 25,
    timeout: float = 10.0,
) -> None:
    """Deliver over SMTP (the TODO's "send an email" half). Plain
    smtplib; auth/TLS intentionally out of scope — the reference
    TODO names no transport options, and a production deployment
    would front this with a relay."""
    with smtplib.SMTP(host, port, timeout=timeout) as s:
        s.send_message(msg)

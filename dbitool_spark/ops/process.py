"""External-process transform (reference TODO:31-32: "a module to run
external programs diverting stdin/stdout from the data flow
streams").

Spark-first shape: the program runs INSIDE each executor task over
Arrow-sized batches of the raw line stream — `mapInPandas` feeds a
batch to the child's stdin and collects its stdout lines, so a
1000-partition input runs 1000 concurrent copies of the filter with
zero driver involvement (the classic Unix-filter contract, distributed).
The child may emit any number of lines per batch (grep-like filters
shrink, fan-out programs grow); there is deliberately NO row-to-row
correspondence, exactly like a shell pipe.

Batch granularity (not per-row, not per-partition): per-row process
spawns would dominate runtime; one process per PARTITION would buffer
an unbounded partition through a single child. Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch, default 10k) bound
both the spawn rate and the per-child payload.

The command is argv (shlex-split if given as a string), run WITHOUT a
shell — no interpolation of row content into the command line ever
happens, so hostile line content cannot become shell syntax. A
non-zero exit raises with the child's stderr; ordering across batches
is not guaranteed (it's a distributed pipe, same as the engine's
other unordered boundaries).
"""

from __future__ import annotations

import shlex
import subprocess
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from dbitool_spark.io.text_io import RAW_COL


def exec_pipe(
    df: DataFrame,
    cmd: list[str] | str,
    *,
    encoding: str = "utf-8",
    timeout: float = 300.0,
    ok_codes: tuple[int, ...] = (0,),
) -> DataFrame:
    """Pipe the single raw column through `cmd` batch-wise; returns
    the child's stdout lines as a raw stream. ok_codes widens the
    accepted exit statuses (grep exits 1 on a no-match batch — pass
    ok_codes=(0, 1) for filters with that convention)."""
    if len(df.columns) != 1:
        raise ValueError(f"exec_pipe expects a single string column, got {df.columns}")
    argv = shlex.split(cmd) if isinstance(cmd, str) else list(cmd)
    if not argv:
        raise ValueError("empty command")
    col = df.columns[0]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = "".join(
                ("" if v is None else str(v)) + "\n" for v in pdf[col]
            ).encode(encoding)
            proc = subprocess.run(
                argv,
                input=payload,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=timeout,
            )
            if proc.returncode not in ok_codes:
                raise RuntimeError(
                    f"exec_pipe command {argv} exited {proc.returncode}: "
                    f"{proc.stderr.decode(encoding, 'replace')[:500]}"
                )
            # \n-exact splitting (str.splitlines would also break on
            # U+2028/U+0085 INSIDE a line, turning one row into two);
            # trailing \r stripped for CRLF-emitting programs
            lines = proc.stdout.decode(encoding).split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            lines = [l[:-1] if l.endswith("\r") else l for l in lines]
            yield pd.DataFrame({RAW_COL: lines})

    return df.mapInPandas(_run, f"{RAW_COL} string")

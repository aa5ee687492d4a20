"""CLI entry point: `python -m dbitool_spark [opts] mod1:a=v:... mod2 ...`

The reference's primary UX (scripts/dbitool.pl:46-155): a command line
of `:`-separated module specs wired into a pipeline, with `@filename`
shortcuts (first position -> fileread, later -> filewrite; reference
:93-103), `--listmodules` (POD :2972-2998), and the engine-tuning
options. On Spark the tuning knobs map as:

- --loglevel 0-3 / --verbose: EngineLog capture level (reference POD
  :3238-3242); verbose prints the captured log stream to stderr after
  the run, mirroring the reference's auto-appended csvwrite->stderr
  chain (:121-147).
- --errorsize: tolerate-N-then-abort threshold enforced by quarantine
  consumers (obs.check_errorsize; reference :39, :234-243).
- --memorylimit: row cap on the bounded driver-side edges (single-doc
  JSON/BSON/xlsx; reference :40, :777-778).
- --streamsize: accepted for CLI compatibility; batch Spark has no
  per-iteration row cap (partitioning subsumes it) and the streaming
  pipeline's maxFilesPerTrigger is the real backpressure knob.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="dbitool_spark",
        description="PySpark dataflow pipeline runner (dbitool-compatible CLI)",
    )
    ap.add_argument("--loglevel", type=int, default=0, choices=range(4))
    ap.add_argument("--verbose", action="store_true", help="print the log stream to stderr")
    ap.add_argument("--errorsize", type=int, default=3)
    ap.add_argument("--memorylimit", type=int, default=100_000)
    ap.add_argument("--streamsize", type=int, default=1024)
    ap.add_argument("--listmodules", action="store_true")
    ap.add_argument("modules", nargs="*", metavar="module:arg=val:...")
    args = ap.parse_args(argv)

    from dbitool_spark.pipeline import MODULES

    if args.listmodules:
        for name in sorted(MODULES):
            print(name)
        return 0
    if not args.modules:
        ap.error("no modules given (try --listmodules)")

    from dbitool_spark.obs import EngineLog
    from dbitool_spark.pipeline import Pipeline
    from dbitool_spark.session import get_session

    spark = get_session("dbitool_spark-cli")
    level = max(args.loglevel, 1 if args.verbose else 0)
    log = EngineLog(level=level) if level else None
    if log is not None and level >= 2:
        # TODO:24-26 progress relay: microbatch progress events land
        # in the log stream (printed under --verbose)
        from dbitool_spark.obs import StreamProgressLogger

        StreamProgressLogger(spark, log, level=2)
    p = Pipeline(
        spark,
        log=log,
        errorsize=args.errorsize,
        memorylimit=args.memorylimit,
        streamsize=args.streamsize,
    )
    for i, spec in enumerate(args.modules):
        if spec.startswith("@"):
            # reference @file shortcut: source in first position, sink after
            spec = (
                f"fileread:in={spec[1:]}" if i == 0 else f"filewrite:out={spec[1:]}"
            )
        p.add(spec)
    p.run()
    if args.verbose and log is not None:
        for t, mod, msg, lvl in log.rows:
            print(f"{t} [{mod}] {msg}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

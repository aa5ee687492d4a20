"""`column` projection operator (reference scripts/dbitool.pl:1123-1174):
select the listed columns by name, in the listed order.

In Spark this is a one-line select -- but registered as a first-class
operator so pipeline specs can name it, and so Catalyst's
ColumnPruning pushes the projection into the scan (the reference had
to copy rows column-by-column per batch; here pruning means the
dropped columns are never read at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def project(df: DataFrame, clist: list[str] | str) -> DataFrame:
    """Project to `clist` (list or comma-separated string), preserving
    the requested order. Unknown names raise with the available set,
    matching the reference's die() on unresolvable columns
    (:1156-1165)."""
    names = [c.strip() for c in clist.split(",")] if isinstance(clist, str) else list(clist)
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns {missing}; available: {df.columns}")
    return df.select(*names)

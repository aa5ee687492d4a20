"""ndb: persistent keyed table with last-write-wins upsert, replay,
and lookup (reference dbitoolmod_ndb, scripts/dbitool.pl:2561-2694).

The reference ties a DB_File hash: each incoming row overwrites the
row stored under its key (hash semantics = last-write-wins in stream
order), the table replays as a source in unordered key order, and the
TODO (:61-72) earmarks it as the lookup/join side. The Spark-native
realization is a parquet-backed keyed table:

- `upsert(df)` resolves the new batch against the stored state with
  one key-partitioned window (max generation wins; within a batch an
  explicit `order_by` — or deterministic struct-max — breaks ties,
  since DataFrames have no stream order to inherit);
- `replay()` is a parquet scan (schema stored in the footer — the
  reference's `_col` entry for free);
- `lookup(other, ...)` joins the table into a stream; small tables
  broadcast, large ones shuffle on the key.

Scale: state is hash-partitioned into `n_buckets` parquet files by
key so the upsert shuffle and the replay scan parallelize. The upsert
rewrites state (read+union+window+write); that is the honest cost of
merge-on-parquet — a production deployment at 100 TB swaps the store
for Delta/Iceberg MERGE, which this API fronts without change. The
write lands in a versioned subdirectory and a `current` pointer file
flips atomically afterward, so a crashed upsert never corrupts the
previous state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_GEN = "__ndb_gen"
_POINTER = "current"


class NdbTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        *,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    # -- state pointer ---------------------------------------------------

    def _current_dir(self) -> str | None:
        ptr = os.path.join(self.path, _POINTER)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            version = fh.read().strip()
        return os.path.join(self.path, version) if version else None

    def _current_gen(self) -> int | None:
        """Generation number encoded in the pointer's version string
        (`v{gen}`) — the authoritative counter. Deriving it from
        max(__ndb_gen) over the stored rows would (a) pay a full state
        scan per upsert and (b) go stale after an empty batch (a v2
        written from an empty upsert still carries only _GEN=1 rows,
        so the next max()+1 would collide with the LIVE v2 dir and
        overwrite the path being read)."""
        current = self._current_dir()
        if current is None:
            return None
        version = os.path.basename(current)
        if not version.startswith("v"):
            raise ValueError(f"ndb pointer names a non-version dir {version!r}")
        return int(version[1:])

    def _flip_pointer(self, version: str) -> None:
        ptr = os.path.join(self.path, _POINTER)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, ptr)  # atomic on POSIX

    def _state(self) -> DataFrame | None:
        current = self._current_dir()
        if current is None:
            return None
        return self.spark.read.parquet(current)

    # -- operations ------------------------------------------------------

    def upsert(self, df: DataFrame, *, order_by: str | list[str] | None = None) -> None:
        """Merge a batch: per key, the newest generation wins; within
        this batch, `order_by` desc wins (defaults to a deterministic
        struct-max over all non-key columns — DataFrames carry no
        stream order, so unordered batches need an explicit rule)."""
        if self.key not in df.columns:
            raise ValueError(f"key {self.key!r} not in columns {df.columns}")
        state = self._state()
        prev_gen = self._current_gen()
        gen = 0 if prev_gen is None else prev_gen + 1
        batch = df.withColumn(_GEN, F.lit(gen).cast("long"))
        merged = batch if state is None else state.unionByName(batch)

        if order_by is None:
            others = [c for c in df.columns if c != self.key]
            tie = [F.struct(*[F.col(c) for c in others]).alias("__tie")] if others else []
        else:
            cols = [order_by] if isinstance(order_by, str) else list(order_by)
            tie = [F.col(c) for c in cols]
        w = Window.partitionBy(self.key).orderBy(
            F.desc(_GEN), *[F.desc(t) for t in tie]
        )
        resolved = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        version = f"v{gen}"
        out_dir = os.path.join(self.path, version)
        (
            resolved.repartition(self.n_buckets, self.key)
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        self._flip_pointer(version)
        self._gc_versions(keep={version, f"v{prev_gen}"})

    def _gc_versions(self, keep: set[str]) -> None:
        """Delete superseded version dirs after the pointer flip —
        without this, every micro-batch of a long-running
        stream_upsert_ndb leaves a full state copy behind (unbounded
        disk growth). The immediately-previous version is kept as the
        crash-recovery fallback; anything older is garbage."""
        import shutil

        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if (
                name.startswith("v")
                and name[1:].isdigit()
                and name not in keep
                and os.path.isdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)

    def replay(self) -> DataFrame:
        """The table as a source (reference ndb-without-input mode:
        scripts/dbitool.pl:2642-2665). Unordered, one row per key."""
        state = self._state()
        if state is None:
            raise ValueError(f"ndb table at {self.path} is empty")
        return state.drop(_GEN)

    def lookup(
        self, other: DataFrame, *, how: str = "left", broadcast: bool = False
    ) -> DataFrame:
        """Enrich `other` by key (the reference's intended lookup use,
        TODO:61-65). broadcast=True hints the table side — only for
        tables known bounded; otherwise the join shuffles on the key
        and AQE decides."""
        table = self.replay()
        if broadcast:
            table = F.broadcast(table)
        return other.join(table, on=self.key, how=how)

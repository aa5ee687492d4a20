"""Bounded-lifetime persistence for multi-use intermediates.

Self-join-heavy operators (MinHash/SimHash banding, LSH buckets)
persist their signature tables because Catalyst does not reuse
exchanges across self-join aliases — without the persist the whole
upstream pipeline runs once per join side. But a bare .persist() has
no release point: the cached table outlives the operator call and
repeated calls in a long-lived session accumulate executor storage
until LRU eviction (which is not a memory contract).

materialize_release() is the release point: it eagerly materializes
the operator's RESULT (small: pairs/top-k) with localCheckpoint —
distributed, MEMORY_AND_DISK, lineage severed — then unpersists the
big intermediates, which the checkpointed result no longer needs.
The checkpoint blocks themselves are reclaimed by Spark's
ContextCleaner once the returned DataFrame is garbage collected, so
the whole chain has bounded lifetime with no caller-side protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Eagerly materialize `result`, then unpersist `intermediates`.

    The trade: the operator becomes eager (compute happens here, not
    at the caller's first action). Correct for terminal analytics
    whose result is orders of magnitude smaller than the inputs."""
    out = result.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist(blocking=True)  # deterministic release, testable
    return out

"""Shuffle sizing for STATEFUL streaming queries, derived from the
r12 4096x probe (SCALE.md): state shards one RocksDB store per shuffle
partition, and the store — not the JVM heap — is the binding resource
at depth.

Measured points (stream-stream interval join, RocksDB default, one
local JVM, identical inputs):

- 40.9M state rows / 32 stores = ~1.28M rows/store: exponent 0.79,
  throughput rising (comfortable);
- 163.6M / 32 = ~5.11M rows/store: super-linear (813.8 s) — RocksDB
  write-amplification/compaction depth per store;
- the ONE-KNOB rerun at 128 stores (same 163.6M rows, ~1.28M/store):
  423.6 s, 1.9x faster, the highest join throughput measured anywhere
  in the probe series (967k rows/s).

So the sizing invariant a deployment holds is STATE ROWS PER STORE.
The onset constant splits the measured bracket (1.28M comfortable,
5.11M bound) with margin on both sides; the width target re-lands the
measured-good density. On a cluster the same arithmetic applies per
executor share — stores scale out exactly like executors do.

The cap mirrors the dedup helper's discipline (training/dedup.py):
128 is the widest setting any probe has validated; past it the honest
remedy is more executors, each bringing its own disks, not more
stores per disk.
"""

from __future__ import annotations

_STREAM_STATE_ROWS_PER_STORE_ONSET = 2_000_000  # bind measured at ~5.1M, clean at ~1.3M
_STREAM_STATE_ROWS_PER_STORE_TARGET = 1_300_000  # the measured-good density
_STREAM_MAX_WIDTH = 128  # widest measured-validated setting


def suggest_stream_shuffle_partitions(
    state_rows_estimate: int,
    default_partitions: int,
) -> int:
    """Shuffle width (= state store count) for a stateful streaming
    query, from an estimate of peak state rows.

    Returns ``default_partitions`` while per-store state sits below the
    measured onset; past it, the next power of two landing ~1.3M rows
    per store, capped at 128 and never below the default.  Estimate
    peak state rows from the operator's documented invariant: open
    windows for windowed aggs (scale-invariant — this helper will
    return the default), users x sessions for session windows, events
    within the watermark horizon for dedup, both sides' horizon rows
    for stream-stream joins.
    """
    if state_rows_estimate < 0 or default_partitions <= 0:
        raise ValueError("state_rows_estimate must be >= 0 and default_partitions > 0")
    if state_rows_estimate <= _STREAM_STATE_ROWS_PER_STORE_ONSET * default_partitions:
        return default_partitions
    want = -(-state_rows_estimate // _STREAM_STATE_ROWS_PER_STORE_TARGET)
    width = 1 << (want - 1).bit_length()
    return max(default_partitions, min(width, _STREAM_MAX_WIDTH))


# Mirrors the dedup sizing discipline (training/dedup.py): remember the
# pre-sizing width so repeated calls size from the ORIGINAL baseline
# instead of ratcheting, and adopt a width the user set between calls
# (detectable because it differs from the last value sizing wrote; a
# user width EQUAL to the last auto-set value is indistinguishable —
# call restore_stream_session_width first, same documented protocol).
_STREAM_BASELINE_KEY = "spark.tagmarshal.stream.baselineShufflePartitions"
_STREAM_LAST_SET_KEY = "spark.tagmarshal.stream.lastSetShufflePartitions"


def size_session_for_stream(spark, state_rows_estimate: int) -> int:
    """Set ``spark.sql.shuffle.partitions`` for a stateful streaming
    query from the estimated peak state rows, per the measured
    rows-per-store invariant.

    MUST run BEFORE the query starts: shuffle width fixes the state
    store count at query start and is pinned into the checkpoint — a
    conf change after ``.start()`` does nothing, and a restarted query
    keeps its checkpointed width regardless of the session conf.  The
    stateful builders in streaming/events.py call this from their
    ``state_rows_estimate=`` parameter, which satisfies the ordering by
    construction (the width is set while the plan is being built).
    Returns the width it set (the current width when per-store state
    is comfortable, so calling it is always safe)."""
    current = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = spark.conf.get(_STREAM_BASELINE_KEY, None)
    if baseline is None or current != spark.conf.get(_STREAM_LAST_SET_KEY, None):
        baseline = current  # first call, or user-changed width: re-capture
        spark.conf.set(_STREAM_BASELINE_KEY, baseline)
    width = suggest_stream_shuffle_partitions(state_rows_estimate, int(baseline))
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    spark.conf.set(_STREAM_LAST_SET_KEY, str(width))
    return width


def restore_stream_session_width(spark) -> int | None:
    """Put ``spark.sql.shuffle.partitions`` back to its pre-sizing
    baseline (no-op if stream sizing never ran).  Safe once the
    streaming query has STARTED — the width is checkpointed at start,
    so later batch work in the same session can narrow back without
    touching the running stream.  Returns the restored width, or None
    if untouched."""
    baseline = spark.conf.get(_STREAM_BASELINE_KEY, None)
    if baseline is None:
        return None
    spark.conf.set("spark.sql.shuffle.partitions", baseline)
    spark.conf.unset(_STREAM_BASELINE_KEY)
    spark.conf.unset(_STREAM_LAST_SET_KEY)
    return int(baseline)

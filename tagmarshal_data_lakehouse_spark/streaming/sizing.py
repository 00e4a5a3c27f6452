"""Shuffle sizing for STATEFUL streaming queries, derived from the
r12 4096x probe and the r13 cross-operator validation (SCALE.md):
state shards one RocksDB store per shuffle partition, and whether more
stores help is a property of the OPERATOR's state access pattern, not
of state volume alone.

Measured points (RocksDB default, one local JVM, identical inputs):

- stream-stream interval join, 40.9M state rows / 32 stores
  (~1.28M/store): exponent 0.79, throughput rising (comfortable);
- the same join at 163.6M / 32 (~5.11M/store): super-linear (813.8 s)
  — RocksDB write-amplification/compaction depth per store — and the
  ONE-KNOB rerun at 128 stores (same rows, ~1.28M/store): 423.6 s,
  1.9x faster, the highest join throughput measured in the series;
- session windows at 97.8M / 32 (~3.05M/store): NOT bound — wall is
  exactly linear in input (exponent 1.00 across 256x -> 1024x) — and
  the r13 one-knob rerun at 128 stores (~0.76M/store) is 1.6x SLOWER
  (274.8 -> 434.3 s clean-machine pair; a first contaminated reading
  said 2.0x), because per-store overhead (commit/compaction per store
  per micro-batch, 4x tasks over 32 cores) is pure cost when the
  operator is not compaction-bound;
- dedup at 409.6M / 32 (~12.8M/store): exponent 0.89, SUB-linear —
  not bound either at 6x the join's bind density.

So "state rows per store" is the binding invariant ONLY where a bind
has been measured — the two-sided join state whose per-key multi-row
range scans deepen with compaction.  Operators with single-row-per-key
or merge-on-write state (dedup, session windows) run sub-linear or
linear at 3-13M rows/store, and widening them early is actively
harmful — the streaming twin of the dedup helper's 64g crossover
lesson (conservative-early widening measured 2.3x harmful there).
The sizing is therefore PER OPERATOR KIND: kinds without a measured
bind return the session default, with the measurement that justifies
the refusal cited here.

The cap mirrors the dedup helper's discipline (training/dedup.py):
128 is the widest setting any probe has validated; past it the honest
remedy is more executors, each bringing its own disks, not more
stores per disk.  On a cluster the same arithmetic applies per
executor share — stores scale out exactly like executors do.
"""

from __future__ import annotations

_STREAM_MAX_WIDTH = 128  # widest measured-validated setting

#: operator kind -> (rows-per-store onset, rows-per-store width target),
#: or None when no bind has been measured for that kind (the helper
#: returns the session default — widening without a measured bind was
#: 1.6x harmful for sessions, r13).
_STREAM_REGIMES: dict[str, tuple[int, int] | None] = {
    # bind measured at ~5.1M/store, clean at ~1.3M; onset splits the
    # bracket with margin on both sides
    "stream_stream_join": (2_000_000, 1_300_000),
    # linear (not bound) at 3.05M/store; 128-store rerun 1.6x slower
    "session_window": None,
    # sub-linear at 12.8M/store on RocksDB (the r12 4096x point)
    "dedup": None,
    # state is open windows — scale-invariant by construction
    "windowed_agg": None,
    # applyInPandasWithState: bounded per-key state, no measured bind
    "custom_keyed_state": None,
}


def suggest_stream_shuffle_partitions(
    state_rows_estimate: int,
    default_partitions: int,
    operator: str = "stream_stream_join",
) -> int:
    """Shuffle width (= state store count) for a stateful streaming
    query, from an estimate of peak state rows and the operator kind.

    For kinds with a measured per-store bind (today: the stream-stream
    join), returns ``default_partitions`` while per-store state sits
    below the measured onset; past it, the next power of two landing
    the measured-good density per store, capped at 128 and never below
    the default.  For kinds with NO measured bind (sessions, dedup,
    windowed aggs, custom keyed state) returns the default: sessions
    ran 1.6x SLOWER at the join's suggested width (r13, SCALE.md), so
    widening is applied only where a measurement says it pays.
    Estimate peak state rows from the operator's documented invariant:
    open windows for windowed aggs, users x sessions for session
    windows, events within the watermark horizon for dedup, both
    sides' horizon rows for stream-stream joins.
    """
    if state_rows_estimate < 0 or default_partitions <= 0:
        raise ValueError("state_rows_estimate must be >= 0 and default_partitions > 0")
    if operator not in _STREAM_REGIMES:
        raise ValueError(
            f"unknown operator kind {operator!r}; known: {sorted(_STREAM_REGIMES)}"
        )
    regime = _STREAM_REGIMES[operator]
    if regime is None:
        return default_partitions
    onset, target = regime
    if state_rows_estimate <= onset * default_partitions:
        return default_partitions
    want = -(-state_rows_estimate // target)
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


def size_session_for_stream(
    spark, state_rows_estimate: int, operator: str = "stream_stream_join"
) -> int:
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
    width = suggest_stream_shuffle_partitions(
        state_rows_estimate, int(baseline), operator
    )
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

"""Cached query-serving layer — the engine-side equivalent of the
reference's dashboard data access (dashboard/utils/database.py:9-50:
Trino connection + ``@st.cache_data(ttl=300)`` over ``execute_query``).

The reference UI is Streamlit chrome; what the ENGINE owes a dashboard
is the layer under it: render a named telemetry-library query, execute
it on Spark, hand back a pandas frame, and absorb the dashboard's
refresh storm with a TTL cache keyed by the rendered SQL text (the same
key discipline ``st.cache_data`` applies to ``execute_query(query)`` —
two widgets asking the same question within the TTL cost one Spark job).

Scale notes:
- every library text aggregates to dashboard-sized output before it
  returns, so ``toPandas`` moves kilobytes, not facts; the cache stores
  those small frames only;
- the cache is per-process (exactly like ``st.cache_data``) and
  time-bounded — no invalidation protocol is needed because serving
  freshness, not transactional consistency, is the contract;
- the clock is injectable so expiry is testable without sleeping.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class ServingStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0


@dataclass
class QueryServer:
    spark: SparkSession
    ttl_seconds: float = 300.0
    clock: Callable[[], float] = time.monotonic
    _cache: dict = field(default_factory=dict)
    stats: ServingStats = field(default_factory=ServingStats)

    def execute_sql(self, sql: str):
        """Execute a SQL text through the TTL cache -> pandas frame."""
        now = self.clock()
        hit = self._cache.get(sql)
        if hit is not None:
            stamped_at, frame = hit
            if now - stamped_at < self.ttl_seconds:
                self.stats.hits += 1
                return frame
            del self._cache[sql]
            self.stats.evictions += 1
        self.stats.misses += 1
        frame = self.spark.sql(sql).toPandas()
        self._cache[sql] = (now, frame)
        return frame

    def execute(self, name: str, **params):
        """Execute a named telemetry-library query (fixed or
        parameterized); the cache key is the RENDERED text, so different
        parameter bindings cache independently."""
        from .queries import telemetry

        if name in telemetry.TELEMETRY_QUERIES:
            return self.execute_sql(telemetry.TELEMETRY_QUERIES[name])
        if name in telemetry.PARAMETERIZED:
            return self.execute_sql(telemetry.PARAMETERIZED[name](**params))
        raise KeyError(f"unknown telemetry query {name!r}")

    def invalidate(self) -> int:
        """Drop every cached frame (the dashboard's manual refresh)."""
        n = len(self._cache)
        self._cache.clear()
        self.stats.evictions += n
        return n

    def healthy(self) -> bool:
        """The reference's test_connection(): one trivial round-trip."""
        try:
            return self.spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
        except Exception:  # noqa: BLE001 — health probes never raise
            return False

"""Serving-layer contract (reference dashboard/utils/database.py:9-50):
named-query execution through a TTL cache keyed by rendered SQL, with
per-binding caching for parameterized queries and testable expiry."""

from __future__ import annotations

import pytest

from tagmarshal_data_lakehouse_spark import dims, silver
from tagmarshal_data_lakehouse_spark.queries import telemetry
from tagmarshal_data_lakehouse_spark.serving import QueryServer
from tagmarshal_data_lakehouse_spark.sources import bronze

from . import fixtures_gen


@pytest.fixture(scope="module")
def views(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("serving_bronze")
    json_dir = d / "json_plain"
    json_dir.mkdir()
    fixtures_gen.write_plain_json(str(json_dir / "rounds.json"))
    raw, fmt = bronze.read_rounds(spark, str(json_dir.parent / "json_plain"))
    fact = silver.transform_rounds(raw, fmt, "americanfalls", "2024-01-16", None).cache()
    topo = dims.topology_to_df(spark, dims.infer_topology(fact))
    telemetry.register_views(spark, fact, topo, build_gold=True)
    return fact


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def test_cache_hit_within_ttl_and_expiry(spark, views):
    clock = FakeClock()
    srv = QueryServer(spark, ttl_seconds=300, clock=clock)
    a = srv.execute("global_overview")
    assert srv.stats.misses == 1 and srv.stats.hits == 0
    b = srv.execute("global_overview")
    assert srv.stats.hits == 1
    assert a is b  # the cached frame object itself, zero Spark work
    clock.t += 301
    c = srv.execute("global_overview")
    assert srv.stats.misses == 2 and srv.stats.evictions == 1
    assert c.equals(a)  # same data, fresh execution


def test_parameterized_queries_cache_per_binding(spark, views):
    clock = FakeClock()
    srv = QueryServer(spark, ttl_seconds=300, clock=clock)
    srv.execute("get_avg_pace_by_hole", course_id="americanfalls")
    srv.execute("get_avg_pace_by_hole", course_id="americanfalls")
    srv.execute("get_avg_pace_by_hole", course_id="othercourse")
    assert srv.stats.misses == 2  # distinct rendered texts
    assert srv.stats.hits == 1


def test_invalidate_and_health(spark, views):
    srv = QueryServer(spark, ttl_seconds=300)
    srv.execute("global_overview")
    assert srv.invalidate() == 1
    srv.execute("global_overview")
    assert srv.stats.misses == 2
    assert srv.healthy()


def test_unknown_query_raises(spark, views):
    with pytest.raises(KeyError):
        QueryServer(spark).execute("get_nonexistent_thing")

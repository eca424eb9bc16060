"""session_scoped_cache lifetime semantics: weak-keyed on the session
(no id() reuse hazard), namespace isolation, and eviction when the
underlying context is stopped."""

from __future__ import annotations

import gc
import weakref

from ai_data_pipeline_spark.session import session_scoped_cache


class _FakeContext:
    def __init__(self):
        self._jsc = object()


class _FakeSession:
    def __init__(self):
        self.sparkContext = _FakeContext()


def test_cache_persists_for_live_session_and_isolates_namespaces():
    s = _FakeSession()
    session_scoped_cache(s, "ns")["k"] = 1
    assert session_scoped_cache(s, "ns")["k"] == 1
    assert "k" not in session_scoped_cache(s, "other")


def test_stopped_context_evicts_cache():
    s = _FakeSession()
    session_scoped_cache(s, "ns")["k"] = 1
    s.sparkContext._jsc = None  # what SparkContext.stop() does
    assert "k" not in session_scoped_cache(s, "ns")


def test_entries_die_with_the_session_object():
    s = _FakeSession()
    session_scoped_cache(s, "ns")["k"] = 1
    r = weakref.ref(s)
    del s
    gc.collect()
    assert r() is None  # no strong refs held by the cache registry


def test_two_sessions_do_not_share_entries():
    a, b = _FakeSession(), _FakeSession()
    session_scoped_cache(a, "ns")["k"] = "a"
    assert "k" not in session_scoped_cache(b, "ns")

"""Streaming semantics pinned by batch equivalence (SURVEY.md §7.4):
a finite stream drained with availableNow must produce exactly the batch
aggregation result."""

from __future__ import annotations

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.streaming.windows import (
    read_events_stream,
    run_to_completion,
    session_windows_stream,
    windowed_counts_batch,
    windowed_counts_stream,
)
from tests.conftest import SF_DIR


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted([tuple(r[c] for c in cols) for r in df.collect()])


def test_windowed_agg_stream_equals_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    got = run_to_completion(windowed_counts_stream(stream), "t_win")
    expected = windowed_counts_batch(load_table(spark, SF_DIR, "events"))
    assert _sorted_rows(got) == _sorted_rows(expected)
    assert got.count() > 0


def test_session_windows_run(spark):
    stream = read_events_stream(spark, SF_DIR)
    got = run_to_completion(session_windows_stream(stream), "t_sess")
    assert got.count() > 0
    # sessions are per-user disjoint intervals
    rows = got.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["start_us"], r["end_us"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, "overlapping sessions for a user"

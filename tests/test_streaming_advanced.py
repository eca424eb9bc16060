

def test_stream_index_dedup_rejects_both_planted_channels(spark):
    """Every planted duplicate must be rejected: no accepted doc_id
    carries a re-key offset (index dups land at +OFFSET, within-stream
    dups at +2*OFFSET), and the per-lang accepted counts equal the
    min-doc_id-per-new-fingerprint Python recompute."""
    from collections import Counter

    from ai_data_pipeline_spark.catalog import load_table
    from ai_data_pipeline_spark.streaming.advanced import (
        STREAM_IDX_OFFSET,
        stream_index_dedup,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    import hashlib
    import re

    docs = [
        (r.doc_id, r.lang, hashlib.md5(
            re.sub(r"\s+", " ", r.text.strip().lower()).encode()
        ).hexdigest())
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    idx = {fp for d, _, fp in docs if d % 2 == 0}
    stream = [(d, lg, fp) for d, lg, fp in docs if d % 2 == 1]
    stream += [
        (d + STREAM_IDX_OFFSET, lg, fp) for d, lg, fp in docs if d % 10 == 0
    ]
    stream += [
        (d + 2 * STREAM_IDX_OFFSET, lg, fp)
        for d, lg, fp in docs
        if d % 2 == 1 and d % 20 == 1
    ]
    first = {}
    for d, lg, fp in sorted(stream):
        if fp not in idx and fp not in first:
            first[fp] = (d, lg)
    want_n = Counter(lg for d, lg in first.values())
    want_sum = Counter()
    for d, lg in first.values():
        want_sum[lg] += d

    rows = stream_index_dedup(spark, SF_DIR).collect()
    assert {r.lang: r.n_accepted for r in rows} == dict(want_n)
    assert {r.lang: r.sum_doc_id for r in rows} == dict(want_sum)
    # both rejection channels fired: the stream contained planted rows,
    # none survived
    assert all(d < STREAM_IDX_OFFSET for d, _ in first.values())
    assert sum(want_n.values()) < len(stream)


def test_stream_index_dedup_is_batch_order_invariant(spark):
    """The round-8 driver red: acceptance must NOT depend on which
    source file the stream processes first. The log-and-compact
    topology makes the accepted set a pure function of the row set, so
    running the planted-duplicates batch FIRST must give bit-identical
    results to the forward order."""
    from ai_data_pipeline_spark.streaming.advanced import stream_index_dedup
    from tests.conftest import SF_DIR

    fwd = sorted(map(tuple, stream_index_dedup(spark, SF_DIR).collect()))
    rev = sorted(
        map(
            tuple,
            stream_index_dedup(spark, SF_DIR, _reverse_batches=True).collect(),
        )
    )
    assert fwd == rev


def test_stream_profile_merge_equals_one_shot_profile(spark):
    """The merged streaming partials must equal the one-shot partial
    profile of the full table (batch equivalence of the commutative-
    monoid merges), and the per-column counts must match the table."""
    from ai_data_pipeline_spark.catalog import load_table
    from ai_data_pipeline_spark.streaming.advanced import (
        _profile_partials,
        stream_profile_documents,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    want = {
        r.col: (r.n, r.n_null, r.min_s, r.max_s, r.sum_dec)
        for r in _profile_partials(docs).collect()
    }
    got = {
        r.col: (r.n, r.n_null, r.min_s, r.max_s, r.sum_dec)
        for r in stream_profile_documents(spark, SF_DIR).collect()
    }
    assert got == want
    n_docs = docs.count()
    assert all(v[0] == n_docs for v in got.values())

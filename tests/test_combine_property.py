"""Property test: the doc-local JVM tf pre-combine
(postings.doc_term_tf_exploded) counts EXACTLY like a pure-Python
per-doc Counter over bit-identical xxhash64 term hashes, for
adversarial token arrays (duplicates, empty strings, unicode, empty
and null arrays, single tokens)."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from meme_search_engine_spark.common.hashing import term_hash
from meme_search_engine_spark.index.postings import doc_term_tf_exploded

token = st.one_of(
    st.sampled_from(["a", "b", "aa", "zz9", "", "café", "中文"]),
    st.text(min_size=0, max_size=6),
)
doc = st.one_of(st.none(), st.lists(token, min_size=0, max_size=30))


@pytest.mark.filterwarnings("ignore")
@given(docs=st.lists(doc, min_size=1, max_size=8))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_combine_counts_match_python_counter(spark, docs):
    rows = [
        (i, (len(t) if t is not None else 0), t)
        for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, doc_len int, tokens array<string>"
    )
    got = Counter()
    for r in doc_term_tf_exploded(df).collect():
        assert r["term_hash"] is not None  # the null-pair regression
        got[(r["doc_id"], r["term_hash"])] += r["tf"]
        assert r["doc_len"] == rows[r["doc_id"]][1]
    want = Counter()
    for i, toks in enumerate(docs):
        for t in toks or []:
            want[(i, term_hash(t))] += 1
    assert got == want

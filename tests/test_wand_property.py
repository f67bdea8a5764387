"""Property test: block-max WAND pruning NEVER changes the top-k
(SURVEY.md §5.4) — randomized corpora, no Spark needed.

Blocks are constructed in-memory exactly the way the index build lays
them out (salt ranges -> 128/block_size splits -> delta+varbyte) and
fed to the shared scoring kernel ``score_query_blocks``; the expected
answer comes from the exhaustive dict oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from meme_search_engine_spark.common.bm25 import B, K1, bm25_tf_norm
from meme_search_engine_spark.common.codecs import encode_postings_block
from meme_search_engine_spark.common.hashing import term_hash
from meme_search_engine_spark.oracle import OracleIndex
from meme_search_engine_spark.query.wand import score_query_blocks


def _blocks_for_terms(
    oracle: OracleIndex, terms: list[str], k: int,
    block_size: int, salt_shift: int,
) -> pd.DataFrame:
    """Lay out posting blocks exactly like the distributed build:
    per (term, doc-range salt), sorted doc ids, block_size chunks."""
    rows = []
    for term in terms:
        plist = oracle.postings.get(term)
        if not plist:
            continue
        items = sorted(plist.items())
        df = len(items)
        # split by salt ranges first (build invariant)
        by_salt: dict[int, list] = {}
        for doc_id, tf in items:
            by_salt.setdefault(doc_id >> salt_shift, []).append((doc_id, tf))
        block_id = 0
        for salt in sorted(by_salt):
            chunk = by_salt[salt]
            for i in range(0, len(chunk), block_size):
                blk = chunk[i : i + block_size]
                d = np.array([x[0] for x in blk], dtype=np.int64)
                t = np.array([x[1] for x in blk], dtype=np.int64)
                l = np.array([oracle.doc_len[x[0]] for x in blk], dtype=np.int64)
                db, tb, lb = encode_postings_block(d, t, l)
                rows.append(
                    {
                        "query_id": 0,
                        "k": k,
                        "term_hash": term_hash(term),
                        "df": df,
                        "block_id": block_id,
                        "n_docs": len(blk),
                        "min_doc_id": int(d[0]),
                        "max_doc_id": int(d[-1]),
                        "doc_ids": db,
                        "tfs": tb,
                        "dls": lb,
                        "block_max_tfnorm": max(
                            bm25_tf_norm(tf, oracle.doc_len[doc], oracle.avgdl)
                            for doc, tf in blk
                        ),
                        "max_tf": int(t.max()),
                        "min_dl": int(l.min()),
                    }
                )
                block_id += 1
    return pd.DataFrame(rows)


@st.composite
def corpus_and_query(draw):
    n_docs = draw(st.integers(10, 120))
    vocab = [f"w{i}" for i in range(draw(st.integers(3, 25)))]
    docs = []
    for d in range(n_docs):
        n_tok = draw(st.integers(1, 40))
        idxs = draw(
            st.lists(
                st.integers(0, len(vocab) - 1), min_size=n_tok, max_size=n_tok
            )
        )
        docs.append((d, " ".join(vocab[i] for i in idxs)))
    n_q = draw(st.integers(1, 4))
    q_idxs = draw(
        st.lists(st.integers(0, len(vocab) - 1), min_size=n_q, max_size=n_q)
    )
    query = " ".join(vocab[i] for i in q_idxs)
    k = draw(st.sampled_from([1, 3, 10, 50]))
    block_size = draw(st.sampled_from([2, 4, 16, 128]))
    salt_shift = draw(st.sampled_from([2, 4, 63]))
    return docs, query, k, block_size, salt_shift


@given(corpus_and_query())
@settings(max_examples=150, deadline=None)
def test_wand_equals_exhaustive_oracle(case):
    docs, query, k, block_size, salt_shift = case
    oracle = OracleIndex.build(docs)
    from meme_search_engine_spark.common.textproc import tokenize

    terms = sorted(set(tokenize(query)))
    pdf = _blocks_for_terms(oracle, terms, k, block_size, salt_shift)
    expected = [
        (rank, doc, sf) for rank, doc, sf, _ in oracle.topk(query, k)
    ]
    if len(pdf) == 0:
        assert expected == []
        return
    out = score_query_blocks(pdf, oracle.n_docs, oracle.avgdl, K1, B)
    got = [
        (int(r.rank), int(r.doc_id), int(r.score_fixed))
        for r in out.itertuples(index=False)
    ]
    assert got == expected


def test_wand_zipf_skew_corpus():
    """Deterministic heavy-skew case: one term in every doc."""
    docs = [
        (d, ("hot " * 5) + " ".join(f"t{(d * 7 + j) % 40}" for j in range(10)))
        for d in range(200)
    ]
    oracle = OracleIndex.build(docs)
    for query, k in [("hot", 10), ("hot t3", 5), ("t1 t2 t3 hot", 25)]:
        from meme_search_engine_spark.common.textproc import tokenize

        terms = sorted(set(tokenize(query)))
        pdf = _blocks_for_terms(oracle, terms, k, 16, 4)
        out = score_query_blocks(pdf, oracle.n_docs, oracle.avgdl, K1, B)
        got = [
            (int(r.rank), int(r.doc_id), int(r.score_fixed))
            for r in out.itertuples(index=False)
        ]
        expected = [(rank, doc, sf) for rank, doc, sf, _ in oracle.topk(query, k)]
        assert got == expected, query

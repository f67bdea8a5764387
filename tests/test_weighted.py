"""Weighted multi-term query algebra: Spark engine and LocalSearcher
must be rank-identical to the oracle, including negative weights
(reference common.rs:215-274 parity)."""

import pytest

from meme_search_engine_spark.datagen import ensure_corpus, rare_term
from meme_search_engine_spark.index.build import (
    corpus_stats,
    docs_from_pages,
    term_df,
    term_doc_tf,
)
from meme_search_engine_spark.index.builder import build_index
from meme_search_engine_spark.index.postings import IndexConfig
from meme_search_engine_spark.oracle import OracleIndex
from meme_search_engine_spark.query.dataframe_engine import bm25_topk_weighted
from meme_search_engine_spark.query.serve import LocalSearcher

N_DOCS = 300

WEIGHTED_QUERIES = [
    (0, [("term0001", 1.0)], 10),
    (1, [("term0001", 2.0), ("term0100", 1.0)], 10),
    (2, [("term0001", 1.0), ("term0000", -0.5)], 10),     # negative weight
    (3, [("term0000 term0002", 1.0), ("term0500", 3.0)], 5),  # multi-token text
    (4, [("term0003", 1.0), ("term0003", 0.5)], 10),      # weight accumulation
    (5, [(rare_term(42), 10.0), ("term0001", 0.01)], 10),
    (6, [("zzznothing", 1.0)], 10),                        # absent
    # huge weights: per-posting fixed contribs blow past float64's
    # exact-integer range, forcing serve's exact reduceat accumulation
    # (the bincount fast path would silently round)
    (7, [("term0001", 50000.0), ("term0000", 40000.0)], 10),
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("weighted")
    pages_dir, _ = ensure_corpus(str(base), N_DOCS)
    pages = spark.read.parquet(pages_dir)
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{pages_dir}/*.parquet' ORDER BY doc_id"
    ).fetchall()
    oracle = OracleIndex.build(rows)
    idx = str(base / "idx")
    build_index(
        spark, pages, idx,
        IndexConfig(salt_shift=7, n_buckets=8, n_parts=2, block_size=32),
    )
    return pages, oracle, idx


def test_weighted_dataframe_engine_vs_oracle(spark, setup):
    pages, oracle, _ = setup
    from meme_search_engine_spark.common.textproc import tokenize

    rows = []
    for qid, terms, k in WEIGHTED_QUERIES:
        weights: dict[str, float] = {}
        for text, w in terms:
            for t in tokenize(text):
                weights[t] = weights.get(t, 0.0) + w
        for t, w in weights.items():
            rows.append((qid, k, t, w))
    qt = spark.createDataFrame(rows, "query_id int, k int, term string, weight double")
    docs = docs_from_pages(pages)
    tf = term_doc_tf(docs)
    res = bm25_topk_weighted(tf, term_df(tf), corpus_stats(docs), qt)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_fixed"])
        )
    for qid, terms, k in WEIGHTED_QUERIES:
        expected = [
            (rank, doc, sf) for rank, doc, sf, _ in oracle.topk_weighted(terms, k)
        ]
        assert sorted(got.get(qid, [])) == expected, qid


def test_weighted_local_searcher_vs_oracle(setup):
    _, oracle, idx = setup
    searcher = LocalSearcher(idx)
    for qid, terms, k in WEIGHTED_QUERIES:
        got = [
            (r["rank"], r["doc_id"], r["score_fixed"])
            for r in searcher.search_weighted(terms, k)
        ]
        expected = [
            (rank, doc, sf) for rank, doc, sf, _ in oracle.topk_weighted(terms, k)
        ]
        assert got == expected, qid


def test_weighted_negative_demotes(setup):
    _, oracle, idx = setup
    searcher = LocalSearcher(idx)
    base = {r["doc_id"]: r["rank"] for r in searcher.search("term0001", 50)}
    demoted = searcher.search_weighted(
        [("term0001", 1.0), ("term0000", -5.0)], 50
    )
    # docs containing the demoted head term must lose score vs base
    golden = oracle.postings_golden("term0000")
    head_docs = set(golden["doc_ids"])
    for r in demoted:
        if r["doc_id"] in head_docs and r["doc_id"] in base:
            assert r["score_fixed"] < 0 or r["rank"] >= base[r["doc_id"]]
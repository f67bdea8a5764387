"""WAND engine: rank-identity vs the oracle AND vs the exhaustive
DataFrame engine on the full reference query set; pruning must never
change results (SURVEY.md §5.3/5.4)."""

import pytest

from meme_search_engine_spark.datagen import ensure_corpus, generate_queries
from meme_search_engine_spark.index.builder import build_index, load_index
from meme_search_engine_spark.index.postings import IndexConfig
from meme_search_engine_spark.oracle import OracleIndex
from meme_search_engine_spark.query.wand import wand_topk

N_DOCS = 500
# small blocks + small salt ranges so pruning paths actually exercise
CFG = IndexConfig(salt_shift=7, n_buckets=8, n_parts=2, block_size=32)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wand")
    pages_dir, _ = ensure_corpus(str(base), N_DOCS)
    out = str(base / "idx")
    pages = spark.read.parquet(pages_dir)
    build_index(spark, pages, out, CFG)
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{pages_dir}/*.parquet' ORDER BY doc_id"
    ).fetchall()
    return out, OracleIndex.build(rows)


def test_wand_rank_identity_vs_oracle(spark, built):
    index_dir, oracle = built
    segments, term_stats, manifest = load_index(spark, index_dir)
    queries = generate_queries(N_DOCS)
    qdf = spark.createDataFrame(
        [(q["query_id"], q["text"], q["k"]) for q in queries],
        "query_id int, text string, k int",
    )
    res = wand_topk(spark, segments, term_stats, manifest, qdf)
    got: dict[int, list] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_fixed"])
        )
    n_nonempty = 0
    for q in queries:
        expected = [
            (rank, doc_id, sf)
            for rank, doc_id, sf, _ in oracle.topk(q["text"], q["k"])
        ]
        actual = sorted(got.get(q["query_id"], []))
        assert actual == expected, f"query {q['query_id']}: {q['text']!r}"
        n_nonempty += bool(expected)
    assert n_nonempty > 80  # sanity: the set mostly has results


def test_wand_empty_query_and_absent_terms(spark, built):
    index_dir, _ = built
    segments, term_stats, manifest = load_index(spark, index_dir)
    qdf = spark.createDataFrame(
        [(0, "zzznope", 10), (1, "", 10), (2, "...", 5)],
        "query_id int, text string, k int",
    )
    assert wand_topk(spark, segments, term_stats, manifest, qdf).count() == 0


def test_wand_k_larger_than_matches(spark, built):
    index_dir, oracle = built
    segments, term_stats, manifest = load_index(spark, index_dir)
    from meme_search_engine_spark.datagen import rare_term

    qdf = spark.createDataFrame(
        [(0, rare_term(42), 50)], "query_id int, text string, k int"
    )
    rows = wand_topk(spark, segments, term_stats, manifest, qdf).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 42

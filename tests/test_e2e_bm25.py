"""End-to-end rank-identity: Spark DataFrame BM25 vs pure-Python oracle
on the full synthetic corpus + reference query set (SURVEY.md §5.3)."""

import pytest

import pyspark.sql.functions as F

from meme_search_engine_spark.common.textproc import tokenize
from meme_search_engine_spark.datagen import (
    generate_pages,
    generate_queries,
    PAGES_SCHEMA,
)
from meme_search_engine_spark.index.build import (
    corpus_stats,
    docs_from_pages,
    term_df,
    term_doc_tf,
)
from meme_search_engine_spark.oracle import OracleIndex
from meme_search_engine_spark.query.dataframe_engine import bm25_topk

N_DOCS = 500


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(N_DOCS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus["doc_id"].tolist(), corpus["text"])))


@pytest.fixture(scope="module")
def pages_df(spark, corpus):
    import pandas as pd

    pdf = pd.DataFrame(
        {k: corpus[k] for k in ("doc_id", "url", "warc_ts", "html", "text", "lang")}
    )
    return spark.createDataFrame(pdf).cache()


def test_extraction_byte_identity(spark, corpus):
    """Spark UDF extraction over the html column must reproduce the
    ground-truth text column byte-identically per url (input_hint)."""
    from meme_search_engine_spark.index.build import extract_text_udf
    import pandas as pd

    pdf = pd.DataFrame({"url": corpus["url"], "html": corpus["html"]})
    df = spark.createDataFrame(pdf)
    got = {
        r["url"]: r["t"]
        for r in df.select("url", extract_text_udf("html").alias("t")).collect()
    }
    expected = dict(zip(corpus["url"], corpus["text"]))
    assert got == expected


def test_spark_tokens_match_pure_tokenizer(spark, pages_df, corpus):
    docs = docs_from_pages(pages_df.drop("text"))  # force the extract path
    rows = docs.select("doc_id", "tokens").collect()
    by_id = {r["doc_id"]: r["tokens"] for r in rows}
    for doc_id, text in zip(corpus["doc_id"].tolist(), corpus["text"]):
        assert by_id[doc_id] == tokenize(text), f"doc {doc_id}"


def test_corpus_stats_match_oracle(spark, pages_df, oracle):
    docs = docs_from_pages(pages_df)
    stats = corpus_stats(docs)
    assert stats["N"] == oracle.n_docs
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_rank_identity_vs_oracle(spark, pages_df, oracle):
    """Top-k docIDs AND fixed-point scores identical to the oracle for
    every query in the reference query set — the correctness gate."""
    queries = generate_queries(N_DOCS)
    qdf = spark.createDataFrame(
        [(q["query_id"], q["text"], q["k"]) for q in queries],
        "query_id int, text string, k int",
    )
    docs = docs_from_pages(pages_df)
    tf = term_doc_tf(docs)
    stats = corpus_stats(docs)
    result = bm25_topk(tf, term_df(tf), stats, qdf)
    got: dict[int, list] = {}
    for r in result.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_fixed"])
        )
    for q in queries:
        expected = [
            (rank, doc_id, sf)
            for rank, doc_id, sf, _ in oracle.topk(q["text"], q["k"])
        ]
        actual = sorted(got.get(q["query_id"], []))
        assert actual == expected, f"query {q['query_id']}: {q['text']!r}"


def test_rank_identity_partitioning_invariance(spark, pages_df, oracle):
    """T7 determinism: identical output at a different partitioning."""
    queries = generate_queries(N_DOCS)[:20]
    qdf = spark.createDataFrame(
        [(q["query_id"], q["text"], q["k"]) for q in queries],
        "query_id int, text string, k int",
    )

    def run(n_parts):
        docs = docs_from_pages(pages_df.repartition(n_parts))
        tf = term_doc_tf(docs)
        res = bm25_topk(tf, term_df(tf), corpus_stats(docs), qdf)
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score_fixed"])
            for r in res.collect()
        )

    assert run(4) == run(17)


def test_topk_dedup_oracle(spark, sf001_dir):
    """q_bm25_topk_dedup vs its DuckDB oracle — this entry is NOT in
    the driver registry (capped at 50; coverage redundant with
    dd_exact_groups + bm25_topk) so it keeps its hash check here."""
    import duckdb

    from meme_search_engine_spark.gate import (
        bm25_topk_dedup_oracle_sql,
        q_bm25_topk_dedup,
    )

    sdf = q_bm25_topk_dedup(spark, sf001_dir)
    srows = sorted(tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect())

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf001_dir}/{t}.parquet'"
        )
    res = con.execute(bm25_topk_dedup_oracle_sql())
    ocols = [d[0] for d in res.description]
    order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = sorted(tuple(r[i] for i in order) for r in res.fetchall())

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    # float score column: compare at the gate's rounding
    def norm(rows):
        return [
            tuple(f"{v:.9g}" if isinstance(v, float) else str(v) for v in r)
            for r in rows
        ]

    assert norm(srows) == norm(orows)

"""Vamana graph ANN (ops/vamana): build determinism, degree bound,
recall vs brute force, beam-search pruning, and partition-pruned
shard probing — the reference's DiskANN shard design re-expressed
(generate_index_shard.rs / diskann/src/lib.rs / query_disk_index.rs).
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from meme_search_engine_spark.ops import vamana
from meme_search_engine_spark.ops.similarity import (
    cosine_topk_exact,
    deterministic_centroids,
)


@pytest.fixture(scope="module")
def emb_df(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/embeddings.parquet").cache()


def _queries(emb_df, n=5):
    return (
        emb_df.orderBy("vec_id")
        .limit(n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        .toPandas()
    )


def test_graph_build_deterministic_and_degree_bounded(emb_df):
    vm = np.stack(
        emb_df.limit(120).toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    a1, m1 = vamana.build_vamana_graph(vm, r=8, beam=24, seed=7)
    a2, m2 = vamana.build_vamana_graph(vm, r=8, beam=24, seed=7)
    assert m1 == m2
    assert (a1 == a2).all()
    assert a1.shape == (120, 8)
    # no self loops, valid ids
    for i in range(len(a1)):
        row = a1[i][a1[i] >= 0]
        assert i not in row
        assert (row < 120).all()


def test_single_shard_graph_recall(emb_df):
    """Beam search on one full graph must recover nearly all of the
    exact top-10 (single shard = no routing loss) while visiting a
    strict subset of the nodes."""
    pdf = emb_df.toPandas().sort_values("vec_id").reset_index(drop=True)
    vm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    from meme_search_engine_spark.common.vecmath import l2_normalize

    vmn = l2_normalize(vm)
    adj_m, medoid = vamana.build_vamana_graph(vm, r=16, beam=48, seed=1)
    adj = [row[row >= 0] for row in adj_m]
    k = 10
    recalls, fracs = [], []
    for qi in range(8):
        q = vmn[qi]
        vis, vis_d = vamana._greedy_search(vmn, adj, q, medoid, 64)
        got = set(
            vis[np.lexsort((vis, vis_d))[:k]].tolist()
        )
        true = set(np.argsort(-(vmn @ q), kind="stable")[:k].tolist())
        recalls.append(len(got & true) / k)
        fracs.append(len(vis) / len(vmn))
    assert np.mean(recalls) >= 0.9, recalls
    # the beam visits a small fraction of the graph, not the corpus
    assert np.mean(fracs) < 0.6, fracs


def test_sharded_index_recall_and_pruning(spark, emb_df, tmp_path):
    out = str(tmp_path / "vamana_idx")
    vamana.build_vamana_index(
        spark, emb_df, out, n_shards=4,
        centroids=deterministic_centroids(emb_df, 4),
        r=16, beam=48,
    )
    qpd = _queries(emb_df, 5)
    exact = cosine_topk_exact(
        emb_df,
        spark.createDataFrame(qpd, "query_id long, qvec array<float>"),
        k=10,
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    # all shards probed -> only beam-search loss, no routing loss
    stats: dict = {}
    res = vamana.vamana_search(
        spark, out, qpd, k=10, n_probe=4, beam=64, stats=stats
    )
    rows = stats["_rows"]
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)
    assert recall >= 0.9, recall
    # beam visited strictly less than the probed rows (graph pruning)
    assert 0 < stats["visited"] < stats["shard_rows_seen"], stats

    # n_probe=1 reads ONE shard partition: assert partition pruning in
    # the physical plan and that results still return k rows per query
    pruned = vamana.vamana_search(spark, out, qpd, k=10, n_probe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    by_q = {}
    for r in pruned.collect():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert all(len(v) == 10 for v in by_q.values())


def test_sharded_build_deterministic(spark, emb_df, tmp_path):
    qpd = _queries(emb_df, 3)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / f"vam_{name}")
        vamana.build_vamana_index(
            spark, emb_df, out, n_shards=4,
            centroids=deterministic_centroids(emb_df, 4),
            r=8, beam=24,
        )
        res = vamana.vamana_search(spark, out, qpd, k=10, n_probe=4)
        outs.append(sorted(map(tuple, res.select(
            "query_id", "rank", "vec_id").collect())))
    assert outs[0] == outs[1]


def test_append_equals_cold_build(spark, emb_df, tmp_path):
    """Frozen-centroid routing + content-seeded shard rebuilds: an
    appended index must search identically to a cold build over the
    union, and untouched shards' files must not be rewritten."""
    import os

    cents = deterministic_centroids(emb_df, 4)
    old = emb_df.filter(F.col("vec_id") < 400)
    new = emb_df.filter(F.col("vec_id") >= 400)
    qpd = _queries(emb_df, 3)

    cold_dir = str(tmp_path / "vam_cold")
    vamana.build_vamana_index(
        spark, emb_df, cold_dir, n_shards=4, centroids=cents, r=8, beam=24
    )
    app_dir = str(tmp_path / "vam_app")
    vamana.build_vamana_index(
        spark, old, app_dir, n_shards=4, centroids=cents, r=8, beam=24
    )

    # mtimes of shard partitions BEFORE the append
    def mtimes(d):
        out = {}
        root = os.path.join(d, "shards")
        for sub in os.listdir(root):
            if sub.startswith("list_id="):
                p = os.path.join(root, sub)
                out[sub] = max(
                    os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = mtimes(app_dir)
    affected = {
        f"list_id={r['list_id']}"
        for r in vamana.ivf_assign(new, cents, spill=1)
        .select("list_id").distinct().collect()
    }
    vamana.append_vamana_index(spark, new, app_dir)
    after = mtimes(app_dir)
    for part, t in before.items():
        if part not in affected:
            assert after[part] == t, f"untouched shard {part} rewritten"

    res_cold = sorted(map(tuple, vamana.vamana_search(
        spark, cold_dir, qpd, k=10, n_probe=4
    ).collect()))
    res_app = sorted(map(tuple, vamana.vamana_search(
        spark, app_dir, qpd, k=10, n_probe=4
    ).collect()))
    assert res_cold == res_app


def test_local_vamana_serving(spark, emb_df, sf01_dir, tmp_path):
    """LocalVamana: driver-local beam-search candidates (no Spark job)
    with full-probe recall vs brute force, and the hybrid serving path
    accepts a Vamana dir transparently (manifest dispatch)."""
    from meme_search_engine_spark.gate import GATE_QUERIES, _built_index
    from meme_search_engine_spark.query.serve import (
        LocalSearcher,
        LocalVamana,
    )

    out = str(tmp_path / "vam_serve")
    vamana.build_vamana_index(
        spark, emb_df, out, n_shards=4,
        centroids=deterministic_centroids(emb_df, 4), r=16, beam=48,
    )
    qpd = _queries(emb_df, 5)
    exact = cosine_topk_exact(
        emb_df,
        spark.createDataFrame(qpd, "query_id long, qvec array<float>"),
        k=10,
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    lv = LocalVamana(out)
    recalls = []
    for _, row in qpd.iterrows():
        got = set(lv.candidates(row["qvec"], k=10, n_probe=4))
        t = truth[row["query_id"]]
        recalls.append(len(got & t) / len(t))
    assert np.mean(recalls) >= 0.9, recalls

    searcher = LocalSearcher(_built_index(spark, sf01_dir))
    qid, text, k = GATE_QUERIES[0]
    res = searcher.search_hybrid(
        text, qpd.iloc[0]["qvec"], f"{sf01_dir}/embeddings.parquet",
        k=k, ivf_dir=out, n_probe=4,
    )
    assert len(res) == k
    assert [r["rank"] for r in res] == list(range(1, k + 1))

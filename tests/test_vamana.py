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


def test_robust_prune_never_keeps_duplicate_ids():
    """ADVICE r06 (medium): with np.unique dropped, FP rounding
    asymmetry between the gemm gram matrix and the gemv d_p let a
    duplicated candidate id survive its own occlusion (~1/3 of
    duplicate-vector trials), producing duplicate adjacency edges and
    duplicate vec_ids inside a query's top-k — on exactly the
    duplicate-heavy corpora the dedup feature targets.  The kept list
    must never contain an id twice, and a duplicate-heavy corpus
    must build a graph whose rows carry no repeated neighbor ids."""
    from meme_search_engine_spark.common.vecmath import l2_normalize

    rng = np.random.default_rng(11)
    base = l2_normalize(rng.normal(size=(40, 16)))
    # 20 exact duplicate VECTORS under new ids + candidate lists with
    # duplicate IDS (sampled with replacement) — both failure shapes
    vm = np.concatenate([base, base[:20]])
    for _ in range(60):
        point = int(rng.integers(0, len(vm)))
        cand = rng.integers(0, len(vm), size=24).astype(np.int64)
        kept = vamana._robust_prune(vm, point, cand, alpha=1.2, r=8)
        assert len(set(kept.tolist())) == len(kept), kept
        assert point not in kept

    # end-to-end: the graph over the duplicate-heavy corpus has no
    # repeated neighbor ids in any adjacency row
    adj, _ = vamana.build_vamana_graph(vm, r=8, beam=24, seed=3)
    for i in range(len(adj)):
        row = adj[i][adj[i] >= 0].tolist()
        assert len(set(row)) == len(row), (i, row)


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


def test_local_vamana_shard_cache_lru_under_concurrency(
    spark, emb_df, tmp_path
):
    """Shard-cache eviction is LRU, not clear()-at-cap (r4 advice #4):
    crossing the cap evicts ONLY the oldest shard (no thundering-herd
    full dump), results stay identical under concurrent probes, and
    the cache never exceeds the cap."""
    from concurrent.futures import ThreadPoolExecutor

    from meme_search_engine_spark.query.serve import LocalVamana

    out = str(tmp_path / "vam_lru")
    vamana.build_vamana_index(
        spark, emb_df, out, n_shards=8,
        centroids=deterministic_centroids(emb_df, 8), r=16, beam=48,
    )
    qpd = _queries(emb_df, 8)
    lv = LocalVamana(out)
    want = [
        lv.candidates(row["qvec"], k=10, n_probe=8)
        for _, row in qpd.iterrows()
    ]

    lv2 = LocalVamana(out)
    lv2._shard_cap = 3  # force constant cap crossings
    def probe(i):
        row = qpd.iloc[i % len(qpd)]
        return i % len(qpd), lv2.candidates(row["qvec"], k=10, n_probe=8)

    with ThreadPoolExecutor(8) as ex:
        for i, got in ex.map(probe, range(64)):
            assert got == want[i]
    # bounded, and a cap crossing kept the most-recent entries rather
    # than dumping everything
    assert 0 < len(lv2._shards) <= 3

    # single-threaded order check: probing shards one at a time keeps
    # an LRU suffix, evicting oldest-first
    lv3 = LocalVamana(out)
    lv3._shard_cap = 3
    for lid in range(6):
        lv3._shard(lid)
    assert sorted(lv3._shards) == [3, 4, 5]


def test_query_aware_stitch_pass(spark, emb_df, tmp_path):
    """OOD query-aware stitch (reference robust_stitch,
    diskann/src/lib.rs:326-374): building WITH held-out stitch queries
    (a) keeps the degree bound and a valid base-only graph, (b) never
    stores query nodes, (c) does not hurt recall on an out-of-
    distribution eval query set (improvement is data-dependent; the
    measured delta is reported in the assertion message), and (d) the
    stitch parameters land in the manifest."""
    import pandas as pd

    from meme_search_engine_spark.common.vecmath import l2_normalize
    from meme_search_engine_spark.query.serve import LocalVamana

    emb_pd = emb_df.orderBy("vec_id").toPandas()
    base_ids = emb_pd["vec_id"].to_numpy(np.int64)
    vm = np.stack(emb_pd["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(11)

    def ood(n, stream):
        r = np.random.default_rng(stream)
        picks = r.integers(0, len(vm), n)
        return vm[picks] + 0.25 * r.standard_normal((n, vm.shape[1]))

    stitch_q = ood(40, 21)
    eval_q = ood(25, 22)

    cents = deterministic_centroids(emb_df, 4)
    plain_dir = str(tmp_path / "vam_plain")
    stitch_dir = str(tmp_path / "vam_stitch")
    vamana.build_vamana_index(
        spark, emb_df, plain_dir, n_shards=4, centroids=cents, r=12, beam=24,
    )
    sq = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(len(stitch_q), dtype=np.int64),
                "qvec": [list(map(float, v)) for v in stitch_q],
            }
        ),
        "query_id long, qvec array<float>",
    )
    vamana.build_vamana_index(
        spark, emb_df, stitch_dir, n_shards=4, centroids=cents, r=12,
        beam=24, stitch_queries=sq,
    )

    # (a)+(b): degree bound, neighbors reference real base ids only
    rows = spark.read.parquet(f"{stitch_dir}/shards").collect()
    idset = set(base_ids.tolist())
    assert {r["vec_id"] for r in rows} == idset  # no query rows stored
    for r in rows:
        assert len(r["neighbors"]) <= 12
        assert set(r["neighbors"]) <= idset

    # (d) manifest records the pass
    man = vamana.load_vamana_manifest(stitch_dir)
    assert man["stitched"] is True and man["max_add_per_stitch"] == 2
    assert vamana.load_vamana_manifest(plain_dir)["stitched"] is False

    # (c) recall vs brute force on OOD eval queries
    un = l2_normalize(vm)
    qn = l2_normalize(eval_q)
    truth = [
        set(base_ids[np.lexsort((base_ids, -(un @ q)))[:10]].tolist())
        for q in qn
    ]
    def recall(d):
        lv = LocalVamana(d)
        r = []
        for qi, q in enumerate(eval_q):
            got = set(lv.candidates(q, k=10, n_probe=4))
            r.append(len(got & truth[qi]) / 10)
        return float(np.mean(r))

    r_plain, r_stitch = recall(plain_dir), recall(stitch_dir)
    assert r_stitch >= r_plain - 0.02, (
        f"stitch hurt recall: plain={r_plain:.3f} stitched={r_stitch:.3f}"
    )
    assert r_stitch >= 0.9, (r_plain, r_stitch)
    print(f"stitch recall delta: plain={r_plain:.3f} stitched={r_stitch:.3f}")


def test_append_preserves_stitch(spark, emb_df, tmp_path):
    """Appending to a STITCHED index re-routes the persisted held-out
    query set into the rebuilt shards: append == cold stitched build
    of the union (a rebuild without the stitch queries would silently
    drop the OOD shortcut edges — r5 review finding)."""
    import pandas as pd

    cents = deterministic_centroids(emb_df, 4)
    vm_rows = emb_df.orderBy("vec_id").toPandas()
    vm = np.stack(vm_rows["embedding"].to_numpy()).astype(np.float64)
    r = np.random.default_rng(31)
    picks = r.integers(0, len(vm), 30)
    stitch_q = vm[picks] + 0.25 * r.standard_normal((30, vm.shape[1]))
    sq = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(30, dtype=np.int64),
                "qvec": [list(map(float, v)) for v in stitch_q],
            }
        ),
        "query_id long, qvec array<float>",
    )
    old = emb_df.filter(F.col("vec_id") < 400)
    new = emb_df.filter(F.col("vec_id") >= 400)

    cold_dir = str(tmp_path / "vs_cold")
    vamana.build_vamana_index(
        spark, emb_df, cold_dir, n_shards=4, centroids=cents, r=8,
        beam=24, stitch_queries=sq,
    )
    app_dir = str(tmp_path / "vs_app")
    vamana.build_vamana_index(
        spark, old, app_dir, n_shards=4, centroids=cents, r=8,
        beam=24, stitch_queries=sq,
    )
    vamana.append_vamana_index(spark, new, app_dir)

    # graphs identical shard-by-shard, not just search-identical
    cold_rows = sorted(
        (r["vec_id"], tuple(sorted(r["neighbors"])))
        for r in spark.read.parquet(f"{cold_dir}/shards").collect()
    )
    app_rows = sorted(
        (r["vec_id"], tuple(sorted(r["neighbors"])))
        for r in spark.read.parquet(f"{app_dir}/shards").collect()
    )
    assert cold_rows == app_rows

    # and a stitched manifest without the persisted queries refuses
    # to append rather than silently dropping the edges
    import shutil

    shutil.rmtree(f"{app_dir}/stitch_queries")
    with pytest.raises(ValueError, match="stitch"):
        vamana.append_vamana_index(spark, new, app_dir)


def test_batched_search_equals_scalar(emb_df):
    """_greedy_search_batch (the build's vectorized round kernel and
    vamana_search's per-shard query batch) must visit the SAME nodes
    in the SAME order as the scalar _greedy_search for every query —
    the batching is a loop-order change, not an algorithm change."""
    from meme_search_engine_spark.common.vecmath import l2_normalize

    pdf = emb_df.limit(400).toPandas().sort_values("vec_id")
    vm = l2_normalize(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    )
    adj_mat, medoid = vamana.build_vamana_graph(vm, r=8, beam=24, seed=3)
    adj = [row[row >= 0] for row in adj_mat]
    qm = vm[:12]
    batched = vamana._greedy_search_batch(vm, adj_mat, qm, medoid, 24)
    for qi in range(len(qm)):
        vis, vis_d = vamana._greedy_search(vm, adj, qm[qi], medoid, 24)
        b_vis, b_d = batched[qi]
        assert (vis == b_vis).all()
        assert np.allclose(vis_d, b_d)

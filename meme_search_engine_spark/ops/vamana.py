"""Vamana graph ANN — the reference's ACTUAL large-scale index
structure, Spark-first.

The reference builds a per-shard Vamana graph (DiskANN;
/root/reference/src/generate_index_shard.rs:22-37: R=64, L=192,
maxc=750, two passes with a second alpha; /root/reference/diskann/
src/lib.rs greedy-search + robust-prune) and queries it with beam
search over on-disk records (query_disk_index.rs:284-288 beam_width).
SURVEY re-targeted retrieval onto IVF/PQ; this module closes the
remaining structural gap with a from-scratch implementation of the
published algorithm (Subramanya et al., "DiskANN", NeurIPS'19):

- build: shard by nearest centroid (the same routing the IVF index
  uses), then ONE applyInPandas per shard builds that shard's graph —
  the reference's per-shard build parallelism (D8), numpy-vectorized
  per hop; adjacency is stored as a plain parquet column
  (list_id, vec_id, neighbors array<bigint>, embedding), partitioned
  by list_id, so the query-side scan partition-prunes exactly like
  the IVF lists;
- query: route each query to its n_probe nearest shards, beam-search
  ONLY those shards' graphs (mapInPandas over the pruned scan,
  queries broadcast), tiny global top-k merge.

Scale story: the graph build is per-shard-local (no cross-shard
edges, like the reference's shards), so build cost is
sum(shard_size * L * degree) fully parallel across shards; a shard
never leaves its executor.  Query reads n_probe/n_lists of the data
by partition pruning and the beam visits a small fraction of each
probed shard (pytest asserts the visited fraction).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..common.vecmath import l2_normalize

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .similarity import ivf_assign


def decode_adjacency(gids: np.ndarray, neighbors) -> list[np.ndarray]:
    """Stored GLOBAL neighbor vec_ids -> shard-local row positions,
    vectorized: one flatten + searchsorted over the whole shard
    instead of a Python dict lookup per edge (the per-edge loop
    dominated cold shard decode at serving time).  `gids` must be
    sorted ascending — both call sites sort by vec_id first.  Ids not
    present in gids are dropped, same as the dict version."""
    rows = [np.asarray(r, dtype=np.int64) for r in neighbors]
    if not rows:
        return []
    lens = np.fromiter((len(r) for r in rows), dtype=np.int64,
                       count=len(rows))
    flat = np.concatenate(rows) if lens.sum() else np.empty(0, np.int64)
    return decode_adjacency_flat(gids, flat, lens)


def decode_adjacency_flat(
    gids: np.ndarray, flat: np.ndarray, lens: np.ndarray
) -> list[np.ndarray]:
    """Core of decode_adjacency over an already-flattened edge list +
    per-row lengths — the shape an Arrow ListArray's values/
    value_lengths provide with no per-row Python at all."""
    if not len(flat):
        return [np.empty(0, np.int64) for _ in range(len(lens))]
    pos = np.minimum(np.searchsorted(gids, flat), len(gids) - 1)
    valid = gids[pos] == flat
    out: list[np.ndarray] = []
    s = 0
    for ln in lens:
        e = s + int(ln)
        v = valid[s:e]
        out.append(pos[s:e][v])
        s = e
    return out


def _greedy_search(
    vm: np.ndarray,
    adj: list[np.ndarray],
    q: np.ndarray,
    start: int,
    beam: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first search on a shard-local graph.  vm: (n, d) unit rows;
    q: (d,) unit query.  Returns (visited_ids, visited_dists) with
    dist = 1 - cosine, visited in exploration order.

    Per hop the frontier's neighbor gather + dot products are one
    numpy batch — the Python loop runs once per EXPANSION, not per
    edge (the reference's io_uring beam does the same: one batch of
    reads per hop, query_disk_index.rs:284-330)."""
    n = vm.shape[0]
    dist = lambda idx: 1.0 - vm[idx] @ q  # noqa: E731
    in_cand = np.zeros(n, dtype=bool)
    cand_ids = np.array([start], dtype=np.int64)
    cand_d = dist(cand_ids)
    # selection copy with visited entries masked to +inf: argmin over
    # it IS "closest unvisited" without the per-hop flatnonzero/any
    # scans (profiled at ~40% of build time as tiny-ndarray overhead);
    # the UNMASKED cand_d still drives the beam trim, so visited
    # entries occupy beam slots exactly as in the published algorithm
    sel_d = cand_d.copy()
    in_cand[start] = True
    out_ids: list[int] = []
    out_d: list[float] = []
    while True:
        p = int(np.argmin(sel_d))
        if sel_d[p] == np.inf:
            break
        node = int(cand_ids[p])
        out_ids.append(node)
        out_d.append(float(cand_d[p]))
        sel_d[p] = np.inf
        nbrs = adj[node]
        fresh = nbrs[~in_cand[nbrs]]
        if len(fresh):
            in_cand[fresh] = True
            fd = dist(fresh)
            cand_ids = np.concatenate([cand_ids, fresh])
            cand_d = np.concatenate([cand_d, fd])
            sel_d = np.concatenate([sel_d, fd])
        if len(cand_ids) > beam:
            keep = np.argpartition(cand_d, beam - 1)[:beam]
            # never drop visited entries' bookkeeping — only the beam
            cand_ids, cand_d = cand_ids[keep], cand_d[keep]
            sel_d = sel_d[keep]
    return np.asarray(out_ids, dtype=np.int64), np.asarray(out_d)


def _greedy_search_batch(
    vm: np.ndarray,
    adj_mat: np.ndarray,
    qm: np.ndarray,
    start: int,
    beam: int,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batched best-first search: B queries advance hop-by-hop against
    the same FROZEN graph; per hop the selection, neighbor gather, and
    dot products are single numpy batch ops across all still-active
    queries (the reference's build runs many inserts' searches
    concurrently against a sync-frozen graph the same way,
    generate_index_shard.rs:104-127).  Semantics per query are
    identical to _greedy_search; only the loop order changes (outer
    over hops, inner vectorized over queries).

    vm: (n, d) unit rows; adj_mat: (n, r) int64 padded with -1;
    qm: (B, d) unit queries.  Returns one (visited_ids, visited_dists)
    pair per query, in exploration order."""
    n = vm.shape[0]
    B = qm.shape[0]
    r = adj_mat.shape[1]
    L = int(beam)
    rows = np.arange(B)
    # fixed-width beam buffers, +inf padded: ids junk where dist=inf
    cand_ids = np.zeros((B, L), dtype=np.int64)
    cand_d = np.full((B, L), np.inf)
    cand_ids[:, 0] = start
    cand_d[:, 0] = 1.0 - qm @ vm[start]
    # selection copy with visited entries masked +inf (same trick as
    # the scalar version); the UNMASKED cand_d drives the beam trim
    sel_d = cand_d.copy()
    in_cand = np.zeros((B, n), dtype=bool)
    in_cand[:, start] = True
    log_q: list[np.ndarray] = []
    log_node: list[np.ndarray] = []
    log_d: list[np.ndarray] = []
    while True:
        p = np.argmin(sel_d, axis=1)
        best = sel_d[rows, p]
        act = np.flatnonzero(best < np.inf)
        if not len(act):
            break
        pa = p[act]
        nodes = cand_ids[act, pa]
        log_q.append(act)
        log_node.append(nodes)
        log_d.append(cand_d[act, pa])
        sel_d[act, pa] = np.inf
        nbrs = adj_mat[nodes]  # (A, r), -1 padded
        nbrs_c = np.maximum(nbrs, 0)
        fresh = (nbrs >= 0) & ~in_cand[act[:, None], nbrs_c]
        if not fresh.any():
            continue
        in_cand[act[:, None], nbrs_c] |= fresh
        # distances for FRESH entries only: flat gather + row-wise dot
        # (the padded (A, width, d) matmul gathered ~3x more vectors
        # than ever get scored)
        frow, fcol = np.nonzero(fresh)
        d = np.full(fresh.shape, np.inf)
        d[frow, fcol] = 1.0 - (
            vm[nbrs_c[frow, fcol]] * qm[act[frow]]
        ).sum(axis=1)
        tmp_d = np.concatenate([cand_d[act], d], axis=1)
        tmp_ids = np.concatenate([cand_ids[act], nbrs_c], axis=1)
        tmp_sel = np.concatenate([sel_d[act], d], axis=1)
        keep = np.argpartition(tmp_d, L - 1, axis=1)[:, :L]
        ar = np.arange(len(act))[:, None]
        cand_d[act] = tmp_d[ar, keep]
        cand_ids[act] = tmp_ids[ar, keep]
        sel_d[act] = tmp_sel[ar, keep]
    if not log_q:
        empty = (np.empty(0, np.int64), np.empty(0))
        return [empty for _ in range(B)]
    q_all = np.concatenate(log_q)
    node_all = np.concatenate(log_node)
    d_all = np.concatenate(log_d)
    order = np.argsort(q_all, kind="stable")  # keeps hop order per query
    node_all, d_all = node_all[order], d_all[order]
    counts = np.bincount(q_all, minlength=B)
    splits = np.cumsum(counts)[:-1]
    return list(zip(np.split(node_all, splits), np.split(d_all, splits)))


def _robust_prune(
    vm: np.ndarray,
    point: int,
    cand: np.ndarray,
    alpha: float,
    r: int,
) -> np.ndarray:
    """DiskANN robust prune: keep the closest candidate, discard any
    candidate closer to a kept one than (its distance to the point)
    divided by alpha; repeat until R neighbors are kept.

    Duplicate candidate ids need no np.unique sort (dropping it
    halves the per-call cost on the build's hot path): a kept
    candidate kills its own copies via the explicit same-id mask
    below.  Occlusion alone is NOT enough — BLAS rounds 1 - v.v to
    +eps in the gemm while the gemv-computed d_p for the same pair
    may clip to 0, and alpha*eps <= 0 fails (ADVICE r06) — so
    same-id survival is enforced exactly, not through float
    arithmetic."""
    cand = cand[cand != point]
    if not len(cand):
        return cand
    d_p = np.maximum(1.0 - vm[cand] @ vm[point], 0.0)
    order = np.argsort(d_p, kind="stable")
    cand, d_p = cand[order], d_p[order]
    m = len(cand)
    # one gram matrix per call replaces a vm-gather + dot per kept
    # candidate (the per-iteration tiny-op overhead was ~35% of build
    # time); pairwise distances are then O(1) row reads below.
    # Clip at 0 like d_p: BLAS rounds 1 - v.v to +eps while d_p for the
    # same pair may clip smaller, and alpha*eps <= d_p can then fail —
    # without the clip a duplicate id survives its own occlusion and
    # the no-np.unique optimization above goes unsound.
    gram_d = np.maximum(1.0 - vm[cand] @ vm[cand].T, 0.0)
    kept: list[int] = []
    alive = np.ones(m, dtype=bool)
    i = 0
    while len(kept) < r:
        while i < m and not alive[i]:
            i += 1
        if i >= m:
            break
        kept.append(int(cand[i]))
        alive[i] = False
        # alpha > 1 keeps longer-range edges (the navigability knob)
        alive &= ~(alpha * gram_d[i] <= d_p)
        # exact same-id kill: immune to the gemm/gemv rounding
        # asymmetry that lets a duplicate id slip past occlusion
        alive &= cand != cand[i]
        alive[: i + 1] = False
    return np.asarray(kept, dtype=np.int64)


def build_vamana_graph(
    vm: np.ndarray,
    r: int = 16,
    beam: int = 48,
    alpha: float = 1.2,
    seed: int = 0,
    n_passes: int = 2,
    batch_size: int = 512,
) -> tuple[np.ndarray, int]:
    """Vamana over (n, d) rows (normalized internally) ->
    (adjacency (n, r) int64 padded with -1, medoid index).

    Deterministic: the random init graph comes from a seeded
    Generator, insertion order is 0..n-1.  Two passes, the second at
    `alpha` and the first at 1.0, as in the paper (and the reference's
    alpha / alpha_2 split, generate_index_shard.rs:29-33,123).

    Insertions run in BATCHED ROUNDS of `batch_size` (DiskANN's
    sync-batch parallel build): all searches of a round share the
    graph as of the round start and execute as ONE vectorized batch
    (_greedy_search_batch); prune + back-edge updates then apply in
    ascending node order, so the build stays deterministic for a
    given batch_size.  batch staleness (a round's searches not seeing
    the round's own new edges) is the published algorithm's own
    parallelism trade and is covered by the second pass.

    Back-edges accumulate into SLACK CAPACITY (rows hold up to 4r
    neighbors mid-build; the reference's maxc=750 vs R=64 is the same
    amortization, generate_index_shard.rs:29-33) and robust-prune back
    to r only on overflow — one prune per ~3r arrivals instead of one
    per arrival; a final sweep prunes every over-degree row so the
    returned adjacency is exactly (n, r)."""
    n = vm.shape[0]
    vm = l2_normalize(np.ascontiguousarray(vm, dtype=np.float64))
    rng = np.random.default_rng(seed)
    if n == 1:
        return np.full((1, r), -1, dtype=np.int64), 0
    cap = 4 * r
    adj_mat = np.full((n, cap), -1, dtype=np.int64)
    deg = np.zeros(n, dtype=np.int64)
    for i in range(n):
        nbrs = rng.choice(n - 1, size=min(r, n - 1), replace=False)
        nbrs[nbrs >= i] += 1  # exclude self
        adj_mat[i, : len(nbrs)] = nbrs
        deg[i] = len(nbrs)
    medoid = int(np.argmax(vm @ vm.mean(axis=0)))

    def set_row(i: int, new: np.ndarray) -> None:
        adj_mat[i, : len(new)] = new
        adj_mat[i, len(new):] = -1
        deg[i] = len(new)

    a = 1.0
    for p in range(n_passes):
        a = 1.0 if p == 0 else alpha
        for s in range(0, n, batch_size):
            batch = range(s, min(s + batch_size, n))
            visited = _greedy_search_batch(
                vm, adj_mat, vm[s : s + batch_size], medoid, beam
            )
            for bi, i in enumerate(batch):
                vis_ids = visited[bi][0]
                cand = np.concatenate([vis_ids, adj_mat[i][: deg[i]]])
                new = _robust_prune(vm, i, cand, a, r)
                set_row(i, new)
                for j in new:
                    j = int(j)
                    row = adj_mat[j][: deg[j]]
                    if not (row == i).any():
                        if deg[j] < cap:
                            adj_mat[j, deg[j]] = i
                            deg[j] += 1
                        else:
                            set_row(
                                j,
                                _robust_prune(
                                    vm, j, np.append(row, i), a, r
                                ),
                            )
    for i in np.flatnonzero(deg > r):
        set_row(int(i), _robust_prune(vm, int(i), adj_mat[i][: deg[i]], a, r))
    return np.ascontiguousarray(adj_mat[:, :r]), medoid


def stitch_graph_with_queries(
    vm_base: np.ndarray,
    query_vm: np.ndarray,
    r: int = 16,
    beam: int = 48,
    alpha: float = 1.2,
    seed: int = 0,
    max_add_per_stitch: int = 2,
) -> tuple[np.ndarray, int]:
    """Query-aware (OOD) Vamana build + stitch — the reference's
    robust_stitch (/root/reference/diskann/src/lib.rs:326-374, enabled
    by query_breakpoint in generate_index_shard.rs:104-127; OOD-DiskANN
    paper): build ONE graph over base vectors + held-out query vectors,
    then redistribute the query nodes' connectivity into the base
    graph and drop them —

    1. every base->query edge is removed, recording the query's
       in-neighbours;
    2. for each query node (deterministic ascending order), each of
       its in-neighbours receives up to `max_add_per_stitch` of the
       query's out-neighbours (closest to that in-neighbour first),
       capped at degree r;
    3. query rows are discarded; the returned adjacency covers only
       the base rows.

    Net effect: base nodes near a representative query gain direct
    edges to the other nodes near that query — shortcut edges along
    realistic query directions, which a base-only build cannot learn.

    Returns (adjacency (n_base, r) padded with -1, medoid index into
    the base rows)."""
    n_base = vm_base.shape[0]
    if query_vm is None or not len(query_vm):
        return build_vamana_graph(vm_base, r=r, beam=beam, alpha=alpha,
                                  seed=seed)
    all_vm = np.concatenate(
        [
            np.ascontiguousarray(vm_base, dtype=np.float64),
            np.ascontiguousarray(query_vm, dtype=np.float64),
        ]
    )
    adj_pad, _ = build_vamana_graph(
        all_vm, r=r, beam=beam, alpha=alpha, seed=seed
    )
    un = l2_normalize(all_vm)
    adj = [row[row >= 0] for row in adj_pad]
    n_q = all_vm.shape[0] - n_base
    in_edges: list[list[int]] = [[] for _ in range(n_q)]
    for i in range(n_base):
        row = adj[i]
        is_q = row >= n_base
        for qn in row[is_q]:
            in_edges[int(qn) - n_base].append(i)
        adj[i] = row[~is_q]
    for qi in range(n_q):
        q_out = adj[n_base + qi]
        q_out = q_out[q_out < n_base]  # base-only targets
        if not len(q_out):
            continue
        for b in in_edges[qi]:
            have = adj[b]
            if len(have) >= r:
                continue
            # closest of the query's out-neighbours to this
            # in-neighbour first (the reference ranks by dot)
            order = np.argsort(-(un[q_out] @ un[b]), kind="stable")
            added = 0
            for neigh in q_out[order]:
                if added >= max_add_per_stitch or len(adj[b]) >= r:
                    break
                if int(neigh) == b or int(neigh) in adj[b]:
                    continue
                adj[b] = np.append(adj[b], int(neigh))
                added += 1
    out = np.full((n_base, r), -1, dtype=np.int64)
    for i in range(n_base):
        out[i, : len(adj[i])] = adj[i]
    base_un = un[:n_base]
    medoid = int(np.argmax(base_un @ base_un.mean(axis=0)))
    return out, medoid


_SHARD_SCHEMA = (
    "list_id int, vec_id long, embedding array<float>, "
    "neighbors array<bigint>, is_medoid boolean"
)


def _shard_builder(
    r: int, beam: int, alpha: float, max_add_per_stitch: int = 2
):
    """applyInPandas kernel: one shard in -> its graph rows out.
    Seed derives from the shard's BASE vec_id content, so rebuilds are
    deterministic and an appended index equals a cold build.  Rows
    with is_query=True (routed held-out stitch queries) participate in
    the build then dissolve via stitch_graph_with_queries — only base
    rows are emitted."""

    def build_shard(key, pdf):
        if "is_query" in pdf.columns:
            qpdf = pdf[pdf["is_query"]]
            pdf = pdf[~pdf["is_query"]]
        else:
            qpdf = pdf.iloc[0:0]
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        if not len(pdf):
            return pd.DataFrame(
                {
                    "list_id": pd.Series([], dtype="int32"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "embedding": pd.Series([], dtype=object),
                    "neighbors": pd.Series([], dtype=object),
                    "is_medoid": pd.Series([], dtype=bool),
                }
            )
        vm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        seed = int(pd.util.hash_pandas_object(pdf["vec_id"]).sum() % (2**31))
        if len(qpdf):
            qvm = np.stack(
                qpdf.sort_values("vec_id")["embedding"].to_numpy()
            ).astype(np.float64)
            adj, medoid = stitch_graph_with_queries(
                vm, qvm, r=r, beam=beam, alpha=alpha, seed=seed,
                max_add_per_stitch=max_add_per_stitch,
            )
        else:
            adj, medoid = build_vamana_graph(
                vm, r=r, beam=beam, alpha=alpha, seed=seed
            )
        gids = pdf["vec_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "list_id": pdf["list_id"],
                "vec_id": gids,
                "embedding": pdf["embedding"],
                "neighbors": [gids[row[row >= 0]].tolist() for row in adj],
                "is_medoid": np.arange(len(gids)) == medoid,
            }
        )

    return build_shard


# ------------------------------------------------------------- index

def build_vamana_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    r: int = 16,
    beam: int = 48,
    alpha: float = 1.2,
    centroids: np.ndarray | None = None,
    n_iters: int = 8,
    stitch_queries: DataFrame | None = None,
    max_add_per_stitch: int = 2,
) -> dict:
    """Sharded Vamana index: centroid routing (same as the IVF index),
    one graph per shard built INSIDE applyInPandas — the shard's rows
    never leave their executor; neighbors are stored as GLOBAL vec_ids
    so the adjacency column is self-contained.

    stitch_queries: optional (query_id, qvec) held-out query set for
    the OOD query-aware stitch pass (the reference's second-phase
    robust_stitch, diskann/src/lib.rs:326-374 — see
    stitch_graph_with_queries); queries route to shards by the same
    centroids and dissolve into shortcut edges, never stored.

    Layout: vamana_manifest.json + shards/list_id=*/ parquet of
    (vec_id, embedding, neighbors array<bigint>, is_medoid)."""
    from .kmeans import train_balanced_kmeans

    os.makedirs(out_dir, exist_ok=True)
    if centroids is None:
        centroids = train_balanced_kmeans(embeddings, n_shards, n_iters)
    assigned = ivf_assign(embeddings, centroids, spill=1)
    if stitch_queries is not None:
        # persist the (tiny) held-out query set INSIDE the index dir:
        # appends rebuild affected shards and must re-route the same
        # queries into them, or rebuilt shards would silently lose
        # their OOD shortcut edges and append != cold stitched build
        stitch_queries.select("query_id", "qvec").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "stitch_queries"))
        assigned = assigned.withColumn("is_query", F.lit(False)).unionByName(
            ivf_assign(
                stitch_queries.select(
                    F.col("query_id").alias("vec_id"),
                    F.col("qvec").alias("embedding"),
                ),
                centroids,
                spill=1,
            ).withColumn("is_query", F.lit(True))
        )
    from ..common.hashing import collision_free_partitions

    # exact 1:1 shard->task spread: with P == n_shards, murmur3
    # collisions stack 2-3 whole graph builds on one task (measured:
    # 32 shards -> 18 tasks) and the stage wall multiplies; the
    # collision-free P keeps every build concurrent, and the explicit
    # count stops AQE from re-coalescing the small shuffle
    (
        assigned.repartition(
            collision_free_partitions(int(centroids.shape[0])), "list_id"
        )
        .groupBy("list_id")
        .applyInPandas(
            _shard_builder(r, beam, alpha, max_add_per_stitch),
            _SHARD_SCHEMA,
        )
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "shards"))
    )
    manifest = {
        "format_version": 1,
        "n_shards": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "r": int(r),
        "beam": int(beam),
        "alpha": float(alpha),
        "stitched": stitch_queries is not None,
        "max_add_per_stitch": int(max_add_per_stitch),
        "centroids": [[float(x) for x in c] for c in centroids],
    }
    tmp = os.path.join(out_dir, "vamana_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, "vamana_manifest.json"))
    return manifest


def append_vamana_index(
    spark: SparkSession,
    new_embeddings: DataFrame,
    out_dir: str,
) -> dict:
    """Delta-cost append: route the new vectors against the FROZEN
    centroids, then rebuild ONLY the affected shards' graphs from
    (old shard rows ∪ new rows) — untouched shards' files are never
    rewritten (dynamic partition overwrite), so append cost ∝ the
    affected shards, not the index.  The reference's ingest loop
    regenerates shards too (graph insertion without rebuild is not
    part of the published algorithm's quality guarantees).

    Deterministic: frozen centroids + content-seeded builds mean an
    appended index equals a cold build over the union
    (pytest-asserted).  On a STITCHED index, the persisted held-out
    query set (stitch_queries/ inside the index dir) is re-routed into
    the rebuilt shards, so appended shards keep their OOD shortcut
    edges and append == cold stitched build still holds."""
    manifest = load_vamana_manifest(out_dir)
    cents = np.asarray(manifest["centroids"], dtype=np.float64)
    assigned = ivf_assign(new_embeddings, cents, spill=1)
    affected = [
        int(r["list_id"])
        for r in assigned.select("list_id").distinct().collect()
    ]
    shards_dir = os.path.join(out_dir, "shards")
    old = (
        spark.read.parquet(shards_dir)
        .filter(F.col("list_id").isin(affected))  # partition pruning
        .select("vec_id", "embedding", "list_id")
    )
    union = old.unionByName(
        assigned.select("vec_id", "embedding", "list_id")
    )
    if manifest.get("stitched"):
        sq_dir = os.path.join(out_dir, "stitch_queries")
        if not os.path.isdir(sq_dir):
            raise ValueError(
                f"manifest says stitched=true but {sq_dir} is missing — "
                "appending without the stitch queries would silently "
                "drop the rebuilt shards' OOD edges"
            )
        stitch = ivf_assign(
            spark.read.parquet(sq_dir).select(
                F.col("query_id").alias("vec_id"),
                F.col("qvec").alias("embedding"),
            ),
            cents,
            spill=1,
        ).filter(F.col("list_id").isin(affected))
        union = union.withColumn("is_query", F.lit(False)).unionByName(
            stitch.select("vec_id", "embedding", "list_id").withColumn(
                "is_query", F.lit(True)
            )
        )
    from ..common.hashing import collision_free_partitions

    (
        # collision-free spread over the FULL shard-id space (same
        # reasoning as build_vamana_index; affected is a subset of it)
        union.repartition(
            collision_free_partitions(int(manifest["n_shards"])), "list_id"
        )
        .groupBy("list_id")
        .applyInPandas(
            _shard_builder(
                int(manifest["r"]), int(manifest["beam"]),
                float(manifest["alpha"]),
                int(manifest.get("max_add_per_stitch", 2)),
            ),
            _SHARD_SCHEMA,
        )
        .write.partitionBy("list_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(shards_dir)
    )
    return manifest


def load_vamana_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "vamana_manifest.json")) as fh:
        return json.load(fh)


def vamana_search(
    spark: SparkSession,
    out_dir: str,
    queries_pd: pd.DataFrame,
    k: int = 10,
    n_probe: int = 2,
    beam: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Beam search over the probed shards only.  The shard filter is a
    PARTITION filter (reads n_probe/n_shards of the index); each
    probed shard runs its queries' beam searches inside ONE
    applyInPandas group — keyed by list_id, because a mapInPandas over
    the raw scan would see shards SPLIT across input partitions once a
    shard outgrows maxPartitionBytes, and a fragment of a graph beam-
    searches with broken adjacency (silent recall loss at scale).  The
    group shuffle moves only the pruned n_probe/n_shards fraction.
    Emits at most k rows per (shard, query); the global merge is a
    tiny window.  `stats`: pass a dict to receive visited-fraction
    telemetry (driver-side, test/diagnostic use)."""
    manifest = load_vamana_manifest(out_dir)
    beam = beam if beam is not None else int(manifest["beam"])
    cents = l2_normalize(
        np.asarray(manifest["centroids"], dtype=np.float64)
    )
    qm = np.stack(queries_pd["qvec"].to_numpy()).astype(np.float64)
    qn = l2_normalize(qm)
    probe = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[:, :n_probe]
    qids = queries_pd["query_id"].to_numpy(np.int64)

    # (shard -> queries probing it); queries ride along as broadcast
    # plan literals (tiny), the shard data comes from the pruned scan
    shard_queries: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for s in probe[qi]:
            shard_queries.setdefault(int(s), []).append(qi)
    wanted = sorted(shard_queries)
    qn_list = qn.tolist()
    k_eff = int(k)
    beam_eff = int(max(beam, k))
    counters = spark.sparkContext.accumulator(0)
    total_rows = spark.sparkContext.accumulator(0)

    shards = spark.read.parquet(os.path.join(out_dir, "shards")).filter(
        F.col("list_id").isin(wanted)  # partition pruning
    )

    def search_shard(key, sh):
        lid = int(key[0])
        sh = sh.sort_values("vec_id").reset_index(drop=True)
        gids = sh["vec_id"].to_numpy(np.int64)
        vm = l2_normalize(
            np.stack(sh["embedding"].to_numpy()).astype(np.float64)
        )
        adj = decode_adjacency(gids, sh["neighbors"])
        med = sh.index[sh["is_medoid"]]
        start = int(med[0]) if len(med) else 0
        my_q = shard_queries.get(lid, [])
        out_q, out_v, out_c = [], [], []
        if my_q:
            # all of this shard's queries beam-search as ONE vectorized
            # batch; per-query results are identical to the scalar
            # _greedy_search (pytest-asserted equivalence)
            r_width = max((len(a) for a in adj), default=1) or 1
            adj_mat = np.full((len(gids), r_width), -1, dtype=np.int64)
            for i, row in enumerate(adj):
                adj_mat[i, : len(row)] = row
            qm = np.asarray([qn_list[qi] for qi in my_q], dtype=np.float64)
            batched = _greedy_search_batch(vm, adj_mat, qm, start, beam_eff)
            for qi, (vis_ids, vis_d) in zip(my_q, batched):
                counters.add(int(len(vis_ids)))
                total_rows.add(int(len(gids)))
                kk = min(k_eff, len(vis_ids))
                top = np.lexsort((gids[vis_ids], vis_d))[:kk]
                out_q.extend([int(qids[qi])] * kk)
                out_v.extend(gids[vis_ids[top]].tolist())
                out_c.extend((1.0 - vis_d[top]).tolist())
        return pd.DataFrame(
            {"query_id": out_q, "vec_id": out_v, "cosine": out_c}
        )

    partial = shards.groupBy("list_id").applyInPandas(
        search_shard, "query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    result = (
        partial.groupBy("query_id", "vec_id")
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
    if stats is not None:
        # diagnostic mode: run the job ONCE, read the accumulators,
        # and hand back a DataFrame REBUILT from the collected rows —
        # if the caller executes the return value too, the original
        # lazy plan would re-run and double-count visited /
        # shard_rows_seen (r4 ADVICE)
        rows = result.collect()
        stats["visited"] = counters.value
        stats["shard_rows_seen"] = total_rows.value
        stats["_rows"] = rows
        return spark.createDataFrame(
            rows, "query_id long, rank int, vec_id long, cosine double"
        )
    return result

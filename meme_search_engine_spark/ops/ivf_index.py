"""Persistent IVF index over an embedding table — the ANN analogue of
the posting-segment index.

The reference persists a sharded DiskANN index and routes queries to
shards (/root/reference/src/dump_processor.rs:428-461 build,
query_disk_index.rs:447-450 probe routing).  Spark-first equivalent:

- build: train balanced k-means centroids (ops/kmeans), assign every
  vector to its top-`spill` lists (GEMM per Arrow batch), write the
  lists as parquet PARTITIONED BY list_id — probing N of K lists then
  reads exactly N/K of the data via partition pruning, no index-side
  shuffle at query time;
- query: nearest `n_probe` centroids per query computed driver-side
  from the (tiny) centroid matrix, probed lists read with a partition
  filter, scored with the same JVM cosine expressions as the
  brute-force gate, per-query window top-k;
- the centroid matrix + config live in ivf_manifest.json (atomic
  write, like the text index manifest).

Layout:
    ivf_manifest.json        {n_lists, spill, dim, centroids}
    lists/list_id=*/         (vec_id, embedding) parquet
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..common.vecmath import l2_normalize

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .similarity import _dot, ivf_assign


def build_ivf_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    n_lists: int = 64,
    spill: int = 1,
    n_iters: int = 8,
    centroids: np.ndarray | None = None,
    storage: str = "fp16",
    pq_m: int = 8,
    pq_ksub: int = 256,
    pq_codebooks: np.ndarray | None = None,
    pq_opq: bool = False,
) -> dict:
    """Train (balanced k-means) + assign + write.  Returns the manifest.

    spill > 1 multi-assigns each vector to its nearest `spill` lists
    (the reference's SHARD_SPILL=2) — recall insurance at the cost of
    spill x storage.

    storage: "fp16" (default — the reference stores half-precision
    vectors, src/dump_processor.rs:500-524; at 1e9 x 1152 dims the
    vector column is THE index footprint, so fp16 halves it) packs
    each list vector to binary and decodes it in the probe;
    "fp32" keeps array<float> — the bit-exact path the SQL-oracled
    correctness gate uses (DuckDB has no half type to replay the
    quantization); "pq" stores m-byte product-quantization codes
    (ops/pq — the reference's DiskANN shards keep 64-byte PQ codes of
    1152-dim vectors, diskann/aopq_train.py: at 1e9 vectors that is
    the difference between a 4.6 TB and a 64 GB index) and the probe
    scores them via ADC lookup tables, no decode."""
    from .kmeans import train_balanced_kmeans
    from .similarity import pack_embeddings_fp16

    assert storage in ("fp16", "fp32", "pq", "int8"), storage
    os.makedirs(out_dir, exist_ok=True)
    if centroids is None:
        centroids = train_balanced_kmeans(embeddings, n_lists, n_iters)
    assigned = ivf_assign(embeddings, centroids, spill)
    rotation = None
    int8_scales = None
    if storage == "int8":
        from .similarity import pack_embeddings_int8, train_int8_scales

        int8_scales = train_int8_scales(embeddings)
        assigned = pack_embeddings_int8(assigned, *int8_scales)
    elif storage == "pq":
        from .pq import pq_encode, train_opq_rotation, train_pq

        if pq_opq:
            rotation = train_opq_rotation(embeddings, m=pq_m)
        if pq_codebooks is None:
            pq_codebooks = train_pq(
                embeddings, m=pq_m, ksub=pq_ksub, rotation=rotation
            )
        assigned = pq_encode(assigned, pq_codebooks, rotation=rotation)
    elif storage == "fp16":
        assigned = pack_embeddings_fp16(assigned)
    from ..common.hashing import collision_free_partitions

    (
        # collision-free list->task spread (see hashing helper): with
        # P == n_lists, murmur3 stacks up to 4 lists on one writer
        # task while half the cores idle (guide §2.5)
        assigned.repartition(
            collision_free_partitions(int(centroids.shape[0])), "list_id"
        )
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "lists"))
    )
    manifest = {
        "format_version": 2,
        "n_lists": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "spill": int(spill),
        "storage": storage,
        "centroids": [[float(x) for x in c] for c in centroids],
    }
    if storage == "pq":
        manifest["pq_codebooks"] = np.asarray(pq_codebooks).tolist()
        if rotation is not None:
            manifest["pq_rotation"] = rotation.tolist()
    if int8_scales is not None:
        manifest["int8_smin"] = int8_scales[0].tolist()
        manifest["int8_smax"] = int8_scales[1].tolist()
    tmp = os.path.join(out_dir, "ivf_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, "ivf_manifest.json"))
    return manifest


def append_ivf_index(
    spark: SparkSession,
    new_embeddings: DataFrame,
    out_dir: str,
) -> dict:
    """Delta-cost append: assign ONLY the new vectors against the
    STORED centroids and append their rows into the per-list partition
    dirs — the reference's ingest loop adds vectors to existing shards
    without retraining (dump_processor.rs shard routing; the text
    index's per-epoch appends are the same design, builder.py).

    Centroids are frozen, so assignment is deterministic and a search
    over build+append equals a cold build over the union
    (pytest-asserted).  Retraining/rebalancing is an explicit rebuild,
    like compact_index for the text index.

    Crash-retry idempotence: there is no ledger here — a failed append
    retried may leave duplicate (vec_id, list_id) rows — but search
    results are INVARIANT under duplication: ivf_search collapses
    (query_id, vec_id) with max(cosine) (the same dedup the spill>1
    multi-assignment needs), and duplicates score identically
    (pytest-asserted).  compact_ivf_index is the explicit rewrite
    that dedups storage."""
    manifest = load_ivf_manifest(out_dir)
    cents = np.asarray(manifest["centroids"], dtype=np.float64)
    assigned = ivf_assign(new_embeddings, cents, int(manifest["spill"]))
    storage = manifest.get("storage", "fp32")
    if storage == "pq":
        from .pq import pq_encode

        rotation = (
            np.asarray(manifest["pq_rotation"], dtype=np.float64)
            if "pq_rotation" in manifest
            else None
        )
        assigned = pq_encode(
            assigned,
            np.asarray(manifest["pq_codebooks"], dtype=np.float64),
            rotation=rotation,
        )
    elif storage == "int8":
        from .similarity import pack_embeddings_int8

        assigned = pack_embeddings_int8(
            assigned,
            np.asarray(manifest["int8_smin"]),
            np.asarray(manifest["int8_smax"]),
        )
    elif storage == "fp16":
        from .similarity import pack_embeddings_fp16

        assigned = pack_embeddings_fp16(assigned)
    from ..common.hashing import collision_free_partitions

    (
        assigned.repartition(
            collision_free_partitions(int(manifest["n_lists"])), "list_id"
        )
        .write.partitionBy("list_id")
        .mode("append")
        .parquet(os.path.join(out_dir, "lists"))
    )
    return manifest


def compact_ivf_index(spark: SparkSession, out_dir: str) -> dict:
    """Explicit maintenance rewrite — dedup storage after crash-retried
    appends (append_ivf_index documents that a retried append may leave
    duplicate (vec_id, list_id) rows; search results are invariant
    under duplication, bytes are not).  Keeps ONE row per
    (list_id, vec_id) — encode is deterministic per storage tier, so
    duplicate rows are byte-identical and any survivor is the right
    one.  Swap is rename-atomic per dir, mirroring the text index's
    compact_index (index/builder.py)."""
    import shutil

    manifest = load_ivf_manifest(out_dir)
    lists_dir = os.path.join(out_dir, "lists")
    tmp = os.path.join(out_dir, "lists.tmp")
    old = os.path.join(out_dir, "lists.old")
    # crash recovery: a death between the two renames below leaves no
    # lists/ but a populated lists.old — restore it first, so a
    # retried compact always starts from a servable index
    if not os.path.isdir(lists_dir) and os.path.isdir(old):
        os.rename(old, lists_dir)
    for p_ in (tmp, old):
        if os.path.isdir(p_):
            shutil.rmtree(p_)
    from ..common.hashing import collision_free_partitions

    (
        spark.read.parquet(lists_dir)
        .dropDuplicates(["list_id", "vec_id"])
        .repartition(
            collision_free_partitions(int(manifest["n_lists"])), "list_id"
        )
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(tmp)
    )
    os.rename(lists_dir, old)
    os.rename(tmp, lists_dir)
    shutil.rmtree(old)
    return manifest


def load_ivf_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "ivf_manifest.json")) as fh:
        return json.load(fh)


def ivf_search(
    spark: SparkSession,
    out_dir: str,
    queries_pd: pd.DataFrame,
    k: int = 10,
    n_probe: int = 8,
    rerank_from: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Top-k cosine over the persisted lists, probing only each query's
    n_probe nearest lists.  The list filter is a PARTITION filter on
    the parquet layout — the scan reads ~n_probe/n_lists of the data
    (the `.explain` shows PartitionFilters: list_id IN (...)).

    rerank_from: optional (vec_id, embedding) source table for a
    full-precision rerank — the reference's two-stage shape (PQ/ADC
    frontier scoring, then exact rerank of the candidates,
    query_disk_index.rs:486-527).  The quantized tier ranks
    k*rerank_factor candidates per query; their EXACT vectors come
    from one broadcast semi-join against the source table (Q*k*factor
    candidate rows — tiny), and the returned `cosine` is exact.  Use
    with lossy storage (pq/int8/fp16); recall improves because
    quantization errors inside the candidate set no longer affect the
    final order."""
    if rerank_from is not None:
        approx = ivf_search(
            spark, out_dir, queries_pd, k=k * rerank_factor, n_probe=n_probe
        ).select("query_id", "vec_id")
        qdf = spark.createDataFrame(
            [
                (int(queries_pd["query_id"].iloc[i]),
                 [float(x) for x in queries_pd["qvec"].iloc[i]])
                for i in range(len(queries_pd))
            ],
            "query_id long, qvec array<float>",
        )
        exact = (
            rerank_from.join(F.broadcast(approx), "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .withColumn(
                "cosine",
                _dot("embedding", "qvec")
                / F.greatest(
                    F.sqrt(_dot("embedding", "embedding"))
                    * F.sqrt(_dot("qvec", "qvec")),
                    F.lit(1e-30),
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("vec_id")
        )
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine")
        )
    manifest = load_ivf_manifest(out_dir)
    cents = np.asarray(manifest["centroids"], dtype=np.float64)
    qm = np.stack(queries_pd["qvec"].to_numpy()).astype(np.float64)
    qn = l2_normalize(qm)
    cn = l2_normalize(cents)
    probe = np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :n_probe]

    probe_rows = [
        (int(queries_pd["query_id"].iloc[i]), [float(x) for x in qm[i]], int(l))
        for i in range(len(queries_pd))
        for l in probe[i]
    ]
    probe_df = spark.createDataFrame(
        probe_rows, "query_id long, qvec array<float>, list_id int"
    )
    wanted = sorted({int(l) for row in probe for l in row})
    lists = spark.read.parquet(os.path.join(out_dir, "lists")).filter(
        F.col("list_id").isin(wanted)  # partition pruning
    )
    if manifest.get("storage") == "pq":
        # ADC: no decode at all — each query's (m, ksub) inner-product
        # lookup table is built once driver-side; scanning a candidate
        # is m uint8 gathers + a sum (Arrow-batched, vectorized)
        from .pq import adc_tables, score_codes

        books = np.asarray(manifest["pq_codebooks"], dtype=np.float64)
        rot = (
            np.asarray(manifest["pq_rotation"], dtype=np.float64)
            if "pq_rotation" in manifest
            else None
        )
        m = books.shape[0]
        luts = adc_tables(books, qm, rot)
        qid_arr = queries_pd["query_id"].to_numpy(np.int64)
        order = np.argsort(qid_arr, kind="stable")
        sorted_qids, sorted_luts = qid_arr[order], luts[order]
        probe_df = probe_df.drop("qvec")

        @F.pandas_udf("double")
        def adc(code: pd.Series, qid: pd.Series) -> pd.Series:
            if not len(code):
                return pd.Series([], dtype=np.float64)
            codes = np.frombuffer(
                b"".join(code.to_numpy()), dtype=np.uint8
            ).reshape(len(code), m)
            qi = np.searchsorted(sorted_qids, qid.to_numpy(np.int64))
            return pd.Series(score_codes(codes, sorted_luts, qi))

        cand = lists.join(F.broadcast(probe_df), "list_id")
        scored = cand.withColumn(
            "cosine", adc(F.col("pq_code"), F.col("query_id"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("vec_id")
        )
        return (
            scored.groupBy("query_id", "vec_id")
            .agg(F.max("cosine").alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine")
        )
    if manifest.get("storage") == "fp16":
        from .similarity import unpack_embeddings_fp16

        # decode-in-probe: only the pruned n_probe/n_lists fraction is
        # ever dequantized, Arrow-batched (one numpy cast per batch)
        lists = unpack_embeddings_fp16(lists)
    elif manifest.get("storage") == "int8":
        from .similarity import unpack_embeddings_int8

        lists = unpack_embeddings_int8(
            lists,
            np.asarray(manifest["int8_smin"]),
            np.asarray(manifest["int8_smax"]),
        )
    cand = lists.join(F.broadcast(probe_df), "list_id")
    scored = cand.withColumn(
        "cosine",
        _dot("embedding", "qvec")
        / F.greatest(
            F.sqrt(_dot("embedding", "embedding"))
            * F.sqrt(_dot("qvec", "qvec")),
            F.lit(1e-30),  # all-zero vector -> cosine 0, not NaN
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.groupBy("query_id", "vec_id")
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )

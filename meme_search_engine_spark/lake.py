"""Lakehouse input layer: catalog tables when a catalog exists,
parquet directories otherwise — and the explicit mapping between this
repo's index layout and Iceberg table semantics.

SURVEY.md §1.2 / BASELINE.json input_hint specify the `pages` input as
an Iceberg table.  THIS SANDBOX HAS NO ICEBERG RUNTIME (no
iceberg-spark-runtime jar, no network to fetch one), so the engine
runs on an Iceberg-SHAPED stand-in; the code path below switches to
the real catalog read wherever one is configured.

How the stand-in maps to Iceberg, piece by piece:

| ours                                   | Iceberg equivalent            |
|----------------------------------------|-------------------------------|
| immutable parquet files under the      | data files tracked by a       |
| index dir (never edited in place)      | snapshot's manifests          |
| `manifest.json` written LAST, after    | snapshot commit (atomic       |
| every derived dir is consistent        | metadata pointer swap)        |
| `stats.json.input_snapshot` = hash of  | snapshot id of the input      |
| (file list, scrubbed logical plan)     | table at read time            |
| `segments/epoch=E/` additive dirs;     | append-only snapshots;        |
| appends never rewrite old epochs       | `ADDED_FILES` commits         |
| dynamic-partition-overwrite retry of   | idempotent `REPLACE`          |
| a crashed partition                    | partition commit              |
| ledger parquet rows keyed by           | `MERGE INTO` upsert of a      |
| (snapshot, epoch, part_id)             | checkpoint table              |
| `compact_index()` explicit merge of    | `rewrite_data_files`          |
| epochs into one                        | compaction procedure          |
| append high-water-mark (max doc_id,    | incremental read between      |
| F4 ts filter)                          | two snapshot ids              |

On a cluster with Iceberg configured (spark.sql.catalog.* set and the
runtime jar on the classpath), pass `table:<catalog.db.pages>` as the
input to jobs/build_index_job.py (or call load_pages with it) and the
scan becomes a genuine Iceberg snapshot read — predicate pushdown,
partition pruning, and time travel come from the catalog; nothing in
the engine changes because every transform downstream consumes a plain
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def load_pages(spark: SparkSession, source: str) -> DataFrame:
    """`table:<identifier>` -> catalog (Iceberg) read;
    anything else -> parquet directory read (the sandbox stand-in).

    `table:pages@<snapshot_id>` pins an Iceberg snapshot (time travel)
    — the readback-resume pattern of the reference
    (/root/reference/src/reddit_dump.rs:269-301) expressed as a
    catalog feature instead of hand-rolled file bookkeeping."""
    if source.startswith(TABLE_PREFIX):
        ident = source[len(TABLE_PREFIX):]
        if "@" in ident:
            name, snap = ident.rsplit("@", 1)
            return (
                spark.read.option("snapshot-id", int(snap)).table(name)
            )
        return spark.read.table(ident)
    return spark.read.parquet(source)

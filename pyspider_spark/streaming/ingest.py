"""Streaming ingest dedup: Structured Streaming over a directory of
arriving document files, each micro-batch probed for near-duplicates
against the persistent minhash archive index — the streaming twin of
``operators.dedup.incremental_minhash`` (a continuously-crawling pipeline
deduplicates every ingest increment against everything already kept, it
never re-runs batch dedup over the union).

Why foreachBatch: the archive index must GROW as batches are accepted
(novel docs join the archive so intra-stream dups across later batches
are caught) — an arbitrary-stateful-sink pattern, exactly what
foreachBatch is documented for. The per-batch body is the SAME
``incremental_minhash_probe`` plan the batch operator uses, so every
semantic guarantee (band-bucket candidate pruning, hot-archive-bucket
guard, exact set-array Jaccard verify) carries over unchanged.

At scale: the archive band/set tables live in parquet (the
``minhash_archive_index`` layout, probe-from-storage tested batch-side);
each micro-batch appends its novel docs' rows. Band-key appends are
partition-disjoint from probes of the SAME batch, so a batch never pairs
with itself through the archive — intra-batch pairs come from the batch
self-join, mirroring the batch operator's new-vs-new split.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.operators.dedup import (
    incremental_minhash_probe,
    minhash_archive_index,
    minhash_dedup,
)


@dataclass
class StreamingDedup:
    """foreachBatch body: probe each arriving micro-batch against the
    growing archive, record (batch_id, doc_new, doc_old, jaccard) hits,
    then fold the batch's NOVEL docs (no near-dup anywhere) into the
    archive."""

    spark: SparkSession
    text_col: str = "text"
    id_col: str = "doc_id"
    k: int = 5
    n_hashes: int = 32
    bands: int = 8
    rows: int = 4
    threshold: float = 0.6
    max_bucket_size: int = 1000
    archive_bands: DataFrame | None = None
    archive_sets: DataFrame | None = None
    pairs_df: DataFrame | None = None
    batches_run: int = 0

    def _probe(self, batch: DataFrame) -> DataFrame:
        """Pairs of (new doc, archive doc) above threshold, plus the
        batch's internal pairs — same plans as the batch operators."""
        intra = minhash_dedup(
            batch, text_col=self.text_col, id_col=self.id_col, k=self.k,
            n_hashes=self.n_hashes, bands=self.bands, rows=self.rows,
            threshold=self.threshold, max_bucket_size=self.max_bucket_size,
        ).select(
            # first-wins: doc_a (the lower / earlier id) is the KEEPER —
            # it plays the archived-doc role; doc_b is the dup to drop
            F.col("doc_b").alias("doc_new"),
            F.col("doc_a").alias("doc_old"),
            "jaccard",
        )
        if self.archive_bands is None:
            return intra
        vs_archive = incremental_minhash_probe(
            batch, self.archive_bands, self.archive_sets,
            self.text_col, self.id_col, self.k, self.n_hashes,
            self.bands, self.rows, self.threshold, self.max_bucket_size,
        )
        return intra.unionByName(vs_archive)

    def on_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)
        # the hit table stays DISTRIBUTED (checkpointed per batch, union
        # across batches) — in deployment this is the parquet/Iceberg
        # append inside foreachBatch; nothing pair-shaped ever collects
        pairs = (
            self._probe(batch)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .localCheckpoint(eager=True)
        )
        self.pairs_df = (
            pairs if self.pairs_df is None else self.pairs_df.unionByName(pairs)
        )
        dup_ids = pairs.select(F.col("doc_new").alias(self.id_col)).distinct()
        novel = batch.join(dup_ids, self.id_col, "left_anti")
        nb, ns = minhash_archive_index(
            novel, self.text_col, self.id_col, self.k,
            self.n_hashes, self.bands, self.rows,
        )
        nb = nb.localCheckpoint(eager=True)
        ns = ns.localCheckpoint(eager=True)
        if self.archive_bands is None:
            self.archive_bands, self.archive_sets = nb, ns
        else:
            self.archive_bands = self.archive_bands.unionByName(nb)
            self.archive_sets = self.archive_sets.unionByName(ns)
        self.batches_run += 1

    def start(self, source_dir: str, schema: str, queue_name: str = "ingest-dedup"):
        """Stream parquet files arriving in ``source_dir`` through the
        dedup body, one micro-batch per file-discovery trigger."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.on_batch)
            .queryName(queue_name)
            .trigger(availableNow=True)
            .start()
        )

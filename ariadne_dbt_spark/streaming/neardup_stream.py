"""Streaming NEAR-duplicate rejection at ingest.

The streaming twin of the batch incremental-dedup serving path: each
micro-batch is flagged against the PERSISTED shingle-postings index
(``operators.dedup.build_shingle_index``), accepted (non-duplicate)
docs are appended to the output corpus AND their postings appended to
the index — so batch N+1 deduplicates against everything accepted
through batch N without any corpus re-shingle. This is the
continuously-ingested-corpus shape end to end: per micro-batch cost is
batch postings × per-shingle document frequency (the flat
``incremental_indexed_1k_batch`` curve in SCALE.md), never corpus².

Structured Streaming's file source handles discovery/ordering/exactly-
once bookkeeping; the dedup itself runs inside ``foreachBatch`` because
a shingle-join against a parquet index is a batch plan (stream-static
joins can't drive the bucket-pruning probe, which needs an action).
State lives in the INDEX, not the state store — unlike
``dedup_stream``'s watermark-bounded exact fingerprints, near-dup
ingest must compare against the full accepted history, and a
disk-backed postings index is the only state that scales there.

Batch-internal near-dups are out of scope by the same contract as
``incremental_near_dup_flags`` (run ``ngram_jaccard_pairs`` on the
tiny batch for those); exact in-batch clones ARE rejected when
``dedup_within_batch`` (md5 fingerprint first-wins, mirroring
``exact_duplicates``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ariadne_dbt_spark.operators.dedup import (
    append_to_shingle_index,
    incremental_near_dup_flags,
)
from ariadne_dbt_spark.operators.text import fingerprint_md5

DOCS_SCHEMA = "doc_id long, text string"


def near_dup_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    schema: str = DOCS_SCHEMA,
    max_files_per_trigger: int = 1,
    dedup_within_batch: bool = True,
    update_index: bool = True,
    auto_compact: bool = True,
    compact_retention_sec: float = 0.0,
    compact_max_files: int | None = None,
    compact_dead_frac: float | None = None,
) -> int:
    """Run the ingest stream to completion (``Trigger.AvailableNow``)
    over the parquet files in ``docs_dir``; returns the number of
    accepted docs. Accepted docs land in ``out_dir`` (parquet,
    append); with ``update_index`` their postings append into
    ``index_dir`` so subsequent micro-batches see them.

    The checkpoint lives under ``out_dir/_checkpoint``: re-running
    after a crash skips already-committed source files (exactly-once
    file-source bookkeeping); the foreachBatch body is idempotent per
    epoch only through that bookkeeping, which is the standard Spark
    contract for sink-side writes.
    """
    accepted_counts: list[int] = []

    def process(batch_df, epoch_id: int) -> None:
        batch = batch_df.select(F.col(id_col), F.col(text_col))
        if dedup_within_batch:
            batch = (
                batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
                .withColumn(
                    "_rn",
                    F.row_number().over(Window.partitionBy("_fp").orderBy(id_col)),
                )
                .where(F.col("_rn") == 1)
                .drop("_fp", "_rn")
            )
        flags = incremental_near_dup_flags(
            None, batch, id_col, text_col, n=n, threshold=threshold,
            index_dir=index_dir,
        )
        accepted = (
            batch.join(
                flags.where(F.col("is_dup")).select(F.col("id").alias(id_col)),
                id_col,
                "left_anti",
            )
        )
        # one computation of the flag join for the 3 consumers below
        # (count, corpus write, postings append); localCheckpoint blocks
        # die with this closure via the ContextCleaner — nothing
        # caller-owned escapes the micro-batch
        accepted = accepted.localCheckpoint(eager=True)
        n_acc = accepted.count()
        accepted_counts.append(n_acc)
        if n_acc:
            accepted.write.mode("append").parquet(os.path.join(out_dir, "docs"))
            if update_index:
                append_to_shingle_index(accepted, index_dir, id_col, text_col)
                # round 8: fold the shingle log when the metadata-only
                # cadence signal fires, so a long-running ingest stream
                # bounds its own MOR read amplification (the fold is
                # rebuild-identical — epoch flip of the same live rows)
                if auto_compact:
                    from ariadne_dbt_spark.operators.dedup import (
                        compact_shingle_index,
                        shingle_maintenance_report,
                    )

                    kw: dict = {}
                    if compact_max_files is not None:
                        kw["max_files"] = compact_max_files
                    if compact_dead_frac is not None:
                        kw["dead_frac_threshold"] = compact_dead_frac
                    if shingle_maintenance_report(index_dir, **kw)["should_compact"]:
                        compact_shingle_index(
                            batch.sparkSession,
                            index_dir,
                            retention_sec=compact_retention_sec,
                        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return sum(accepted_counts)

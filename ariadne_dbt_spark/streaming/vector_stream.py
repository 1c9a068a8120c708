"""Streaming vector-index maintenance at ingest.

The streaming twin of the persisted IVF index (operators/similarity.py),
mirroring ``search_stream``: embedding batches arriving as files become
per-micro-batch APPENDS into the cell-partitioned index — the first
batch trains the coarse centroids (``ivf_build_index``), every later
batch is one O(batch) gen-guarded append (``ivf_append``: assign to the
existing cells map-only, tag with a reserved gen, commit via the atomic
stats.json replace). The served index is always exactly the vectors
ingested so far: a query with a full probe equals brute-force cosine
over the union of all batches (the gate row's oracle recomputes that
from scratch).

Division of labor as everywhere in this package: Structured Streaming's
file source owns discovery/ordering/exactly-once bookkeeping
(checkpointed); the index write runs in ``foreachBatch`` because it
needs actions (centroid training, parquet appends), not a streaming
sink. Crash safety is layered: a batch that died mid-append is
invisible to readers (committed-gen filter) and the RETRY of that
micro-batch — which Structured Streaming replays from the checkpoint —
reserves a fresh gen, so the crashed attempt's rows stay orphaned
instead of double-counting (tests/test_index_crash_replay.py proves the
underlying protocol; tests/test_streaming_vectors.py the streamed shape).

Reference analog: the engine rebuilds its serving artifacts wholesale
per refresh (src/ariadne_dbt/indexer.py:90-98 full replace); this is the
O(batch) maintenance a 100 TB embedding corpus needs instead. Staleness
is tracked by the same drift metric as batch appends (``ivf_staleness``)
— retrain by rebuilding when cells go baggy.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.similarity import ivf_append, ivf_build_index

VECTORS_SCHEMA = "vec_id long, embedding array<float>"


def ivf_ingest_stream(
    spark: SparkSession,
    vectors_dir: str,
    index_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 2,
    schema: str = VECTORS_SCHEMA,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> int:
    """Run the vector-ingest stream to completion (AvailableNow) over
    the parquet files in ``vectors_dir``: the first micro-batch trains
    and writes the IVF index at ``index_dir``, every later batch
    gen-guarded-appends into it. Returns the number of micro-batches
    applied. The checkpoint defaults to the SIBLING
    ``<index_dir>_checkpoint`` — it cannot live inside the index dir
    because the first batch's build clears ``_``-prefixed staging
    entries there (epoch_store.clear_index). A re-run skips committed
    source files."""
    if checkpoint_dir is None:
        checkpoint_dir = index_dir.rstrip("/") + "_checkpoint"
    applied: list[int] = []

    def process(batch_df, epoch_id: int) -> None:
        batch = batch_df.select(F.col(id_col), F.col(vec_col))
        if batch.isEmpty():
            return
        if not os.path.exists(os.path.join(index_dir, "stats.json")):
            ivf_build_index(
                batch,
                index_dir,
                id_col=id_col,
                vec_col=vec_col,
                n_centroids=n_centroids,
                iters=iters,
            )
        else:
            ivf_append(batch, index_dir, id_col=id_col, vec_col=vec_col)
        applied.append(1)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vectors_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(applied)

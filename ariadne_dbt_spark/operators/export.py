"""Training-corpus export sinks (north-star scale extension): the last
stage of a data pipeline materializes the processed corpus as sharded
JSONL — the interchange format every training stack reads.

``export_jsonl_shards`` composes the deterministic md5 shuffle
(:func:`ariadne_dbt_spark.operators.sampling.deterministic_shuffle`)
with a partitioned JSON-lines write:

* shard assignment is reproducible (hash of the row identity, never
  ``rand()``), so re-exports are byte-stable and resumable,
* one ``repartition(shard)`` exchange routes each shard to one task;
  rows are sorted by (shard, pos) WITHIN partitions (no global sort),
  so each shard file holds its slice of the global permutation in
  order — readers consuming shards in name order see the full
  deterministic shuffle,
* ``maxRecordsPerFile`` bounds file sizes for object-store-friendly
  output; gzip optional (JSONL.gz is the common corpus interchange).

At 100 TB raise ``shard_chars`` so shards fit a task (3 hex chars =
4096 shards) — the same knob as the shuffle itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.sampling import deterministic_shuffle

__all__ = ["export_jsonl_shards"]


def export_jsonl_shards(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    *,
    seed: int = 0,
    shard_chars: int = 1,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as shuffled, sharded JSON-lines under
    ``out_dir/shard=<hex>/...json[.gz]``; row order within each shard
    follows the deterministic permutation position."""
    shuffled = deterministic_shuffle(df, id_col, seed=seed, shard_chars=shard_chars)
    writer = (
        shuffled.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(out_dir)

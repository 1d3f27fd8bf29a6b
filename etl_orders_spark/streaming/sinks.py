"""Incremental materialization sinks.

`upsert_parquet_sink` is the streaming → serving-table pattern: each
micro-batch MERGEs into a keyed parquet table via foreachBatch (the
batch function runs on the driver, so plain DataFrame code — no
pickling constraints). With a transactional format this becomes
`MERGE INTO`; over plain parquet the merged result is materialized
(persist + count) before the overwrite so the read and write of the
same path never overlap.

Checkpointing makes the stream restartable; the merge is idempotent
per key, so batch replay after a crash converges to the same table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_orders_spark.operators.merge import merge_upsert


def upsert_parquet_sink(
    stream: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    timeout_s: float = 120.0,
) -> None:
    """Drain all available input into a keyed parquet table: new keys
    append, existing keys are replaced by the latest batch's row.
    Rows duplicated on the key WITHIN a batch are collapsed
    arbitrarily-but-deterministically by dropDuplicates before merging.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        src = batch_df.dropDuplicates(keys)
        if os.path.exists(path):
            merged = merge_upsert(spark.read.parquet(path), src, keys)
        else:
            merged = src
        merged = merged.persist()
        merged.count()  # materialize BEFORE overwriting the input path
        merged.write.mode("overwrite").parquet(path)
        merged.unpersist()

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"upsert sink did not drain in {timeout_s}s")

"""Incremental materialization sinks.

`upsert_parquet_sink` is the streaming → serving-table pattern: each
micro-batch MERGEs into a keyed parquet table via foreachBatch (the
batch function runs on the driver, so plain DataFrame code — no
pickling constraints). With a transactional format this becomes
`MERGE INTO`; over plain parquet the merged batch stages to a side
directory and renames into place, so the read and the replacement of
the serving path never overlap.

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

    Within-batch duplicates on the key are rejected (same contract as
    scd2_apply): `dropDuplicates` would keep a scheduling-order-
    dependent survivor, so a checkpoint REPLAY of the same batch could
    rebuild a different table than the original run — the opposite of
    the idempotent-replay guarantee this sink exists for. Callers with
    multi-row batches collapse to latest-per-key first with their own
    ordering column.

    The merged batch lands in a STAGING directory and swaps in only
    after the full write succeeds, so the serving path is never read
    and deleted by the same job (a lost cached block would otherwise
    recompute lineage against files the overwrite already removed).
    With a transactional table format both the merge and the swap
    collapse into one MERGE INTO commit.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        src = batch_df
        dup = (
            src.groupBy(*keys).count().filter("count > 1").limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"upsert_parquet_sink: batch {batch_id} has multiple rows for "
                f"key {tuple(dup[0])[:-1]}; collapse to latest-per-key upstream "
                "(an arbitrary survivor would make checkpoint replay "
                "nondeterministic)"
            )
        if os.path.exists(path):
            merged = merge_upsert(spark.read.parquet(path), src, keys)
        else:
            merged = src
        staging, retired = f"{path}.staging", f"{path}.retired"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(path):
            os.rename(path, retired)
        os.rename(staging, path)
        shutil.rmtree(retired, ignore_errors=True)

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

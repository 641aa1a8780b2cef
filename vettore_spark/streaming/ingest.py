"""Structured Streaming extensions (SURVEY §2.12: the reference has no
streaming surface; this is the Spark-native extension for continuous
ingestion and windowed event analytics).

- `stream_into_collection`: readStream -> per-batch validation (the same
  derivation pipeline as Collection.put_many: normalize, mean-vector,
  sign-bit packing, duplicate-id rejection within batch) -> parquet sink.
  foreachBatch keeps the validation expressions identical to the batch path,
  so a row accepted by streaming ingest is exactly a row the batch path
  would accept.
- `windowed_event_counts`: tumbling/sliding event-time windows with a
  watermark for late data — the streaming twin of the batch events_hourly
  query (same output schema, checked against the batch result in tests).

Scale notes: the sink is an append-only parquet dir partitioned by ingest
window; state for the windowed agg is bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_batch(df: DataFrame, dims: int, normalize: str = "none") -> DataFrame:
    """The put_many derivation pipeline as a pure batch transform
    (collection.ex:920-961 parity; see Collection.put_many)."""
    from vettore_spark.functions import kernels as K

    staged = (
        df.withColumn("id", F.coalesce(F.col("id"), F.col("value")))
        .withColumn("value", F.coalesce(F.col("value"), F.col("id")))
        .filter(F.col("id").isNotNull() & (F.col("id") != ""))
        .withColumn("vector", F.col("vector").cast("array<double>"))
        .filter(K.is_valid_vector("vector", dims))
        .withColumn("vector", K.normalize(normalize, "vector"))
        .withColumn("binary_vector", K.compress_sign_bits("vector", dims))
        .dropDuplicates(["id"])
    )
    return staged.select(
        "id",
        "value",
        F.col("vector").cast("array<float>").alias("vector"),
        "binary_vector",
    )


def stream_into_collection(
    stream_df: DataFrame,
    *,
    sink_path: str,
    checkpoint_path: str,
    dims: int,
    normalize: str = "none",
    trigger_once: bool = True,
):
    """Continuous validated ingestion into a collection-shaped parquet dir."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        validate_batch(batch_df, dims, normalize).write.mode("append").parquet(sink_path)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Event-time windowed counts/sums with late-data watermarking. Works on
    both a streaming and a batch DataFrame (same plan, different sink)."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(F.col(key_col), win.alias("win")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        key_col,
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
        "sum_value",
    )

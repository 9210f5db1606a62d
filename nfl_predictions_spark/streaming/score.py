"""Streaming score-and-route (SURVEY §2A#25-26, §2B Q36).

The reference's NiFi flow POSTs each simulated play to the Flask /api
and routes response vs failure flowfiles. The engine form is one
Structured Streaming query: requests stream -> foreachBatch { validate,
score with both models, write success sink / dead-letter sink }.
Validation is declarative (label-set membership) so a poison record
routes to the DLQ instead of failing the batch — the streaming
equivalent of handleInvalid='error'.
"""

from __future__ import annotations

import os

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.ml.score import score_best_play
from nfl_predictions_spark.streaming.sources import checkpoint_dir, stream_partitions


def score_and_route(
    spark: SparkSession,
    requests_stream: DataFrame,
    pass_model: PipelineModel,
    run_model: PipelineModel,
    out_root: str,
) -> tuple[str, str]:
    """Run the stream to completion (AvailableNow); returns the success
    and dead-letter sink dirs (parquet)."""
    ok_dir = os.path.join(out_root, "scored")
    dlq_dir = os.path.join(out_root, "dead_letter")
    valid_labels = set(pass_model.stages[0].labels) | set(run_model.stages[0].labels)

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            valid = batch.filter(F.col("PlayType_lag").isin(*valid_labels))
            invalid = batch.filter(~F.col("PlayType_lag").isin(*valid_labels))
            scored = score_best_play(pass_model, run_model, valid)
            scored.write.mode("append").parquet(ok_dir)
            invalid.withColumn("reason", F.lit("unseen PlayType_lag")).write.mode(
                "append"
            ).parquet(dlq_dir)
        finally:
            batch.unpersist()

    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", stream_partitions())
    try:
        q = (
            requests_stream.writeStream.foreachBatch(handle_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint_dir())
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return ok_dir, dlq_dir

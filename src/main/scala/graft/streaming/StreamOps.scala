package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

import graft.core.Tables
import graft.sources.SnapshotStore

/** Structured Streaming surface (SURVEY.md §2.9): the same schema and
  * transforms as batch, driven incrementally. Stateless transforms are
  * literally the batch Columns; stateful ones use watermarks + windows
  * or explicit GroupState. The snapshot sink (ST6) rides foreachBatch
  * with batchId as the idempotence marker, so replays after failure
  * commit exactly once — aligning stream output with the pipeline's
  * resume semantics.
  */
object StreamOps {

  /** Event-stream source over a parquet directory (one file = one
    * micro-batch when written incrementally). */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Tables.eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** ST1: watermark + tumbling window counts. Late rows (older than the
    * watermark) are dropped; append mode emits a window only once it can
    * never change. */
  def tumblingCounts(events: DataFrame, delay: String = "10 minutes",
                     width: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** ST2: sliding window sums. */
  def slidingSums(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("user_id"))
      .agg(sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("user_id"), col("total"))

  /** ST3: session windows (5-minute gap). */
  def sessionCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n"))

  /** ST4a: stateful streaming dedup bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** ST4b: explicit per-key state via flatMapGroupsWithState — running
    * per-user aggregates emitted on every update. */
  def statefulUserCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) => {
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          Iterator.single(UserAgg(user, n, v))
        })
      .toDF()
  }

  /** ST6: exactly-once-per-batch snapshot sink; replays of a batchId
    * are no-ops thanks to the store's marker idempotence. */
  def snapshotSink(df: DataFrame, store: SnapshotStore, stage: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.commit(batch, stage, marker = s"$stage-batch-$batchId"): Unit
      }
}

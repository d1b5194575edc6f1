package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Durations

/** Structured-Streaming surface.
  *
  * The reference has no event-time streaming — its "streaming" is an
  * out-of-core batch engine plus Arrow-stream ingest (SURVEY §2.10), which
  * Spark's normal distributed execution already covers. This module is the
  * superset: the same dynamic-window semantics as
  * `graft.operators.DynamicGroupBy`, exposed over `readStream` with
  * watermarked event time, so a 100 TB/day pipeline can run the identical
  * query continuously.
  */
object StreamOps {

  /** Watermarked tumbling/sliding window aggregation on a streaming frame —
    * streaming twin of DynamicGroupBy (label=Left, closed=Left). */
  def windowedAgg(stream: DataFrame, timeCol: String,
                  every: String, period: Option[String] = None,
                  watermark: String = "10 minutes",
                  by: Seq[String] = Seq.empty)(aggs: Column*): DataFrame = {
    val everyUs = Durations.parseMicros(every)
    val periodUs = period.map(Durations.parseMicros).getOrElse(everyUs)
    val win = window(col(timeCol),
      Durations.microsToSparkInterval(periodUs),
      Durations.microsToSparkInterval(everyUs))
    stream
      .withWatermark(timeCol, watermark)
      .groupBy((win.as("__w") +: by.map(col)).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(timeCol, col("__w.start"))
      .drop("__w")
  }
}

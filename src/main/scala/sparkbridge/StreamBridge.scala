package org.apache.spark.sql.classic

import org.apache.spark.sql.{DataFrame, Row}

/** Bridge into Spark's `private[sql]` streaming-DataFrame constructor.
  *
  * A V1 [[org.apache.spark.sql.execution.streaming.Source]]'s
  * `getBatch` must return a frame whose logical plan has
  * `isStreaming = true` (MicroBatchExecution asserts it), but every
  * public constructor builds batch plans. The blessed connector
  * pattern is `internalCreateDataFrame(rdd, schema, isStreaming =
  * true)` over the batch plan's `toRdd` — the same wrap
  * FileStreamSource uses internally. Lives in the `classic` package
  * solely for access, like [[GraftColumnBridge]].
  */
object GraftStreamBridge {

  /** Re-wrap a BATCH DataFrame as a streaming one (same rows, same
    * schema, `isStreaming = true`) for return from `Source.getBatch`. */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}

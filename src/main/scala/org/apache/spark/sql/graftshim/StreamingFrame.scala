package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.types.StructType

/** One-method bridge to `SparkSession.internalCreateDataFrame(...,
  * isStreaming = true)`, which is `private[sql]`: a v1 streaming
  * Source's `getBatch` must return a frame MARKED streaming
  * (MicroBatchExecution asserts it), and this is the same construction
  * Spark's own file stream source uses. Lives under
  * `org.apache.spark.sql` solely to satisfy that access qualifier —
  * the standard third-party-connector escape hatch. */
object StreamingFrame {
  def create(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Test aid: re-mark a [[create]]d frame as a PLAIN batch frame over
    * the same already-planned RDD. Specs that drive `Source.getBatch`
    * directly (outside MicroBatchExecution — the only engine allowed
    * to execute a streaming-marked plan) need this to inspect the
    * batch's rows. */
  def toBatch(df: DataFrame): DataFrame = {
    val classic =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val leaf = classic.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }.getOrElse(sys.error("toBatch expects a frame built by create()"))
    classic.sparkSession.internalCreateDataFrame(
      leaf.rdd, df.schema, isStreaming = false)
  }
}

package org.apache.spark.sql.graftglue

import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** In-package access to Spark's own Arrow interchange machinery
  * (private[sql]): IPC record-batch payloads -> DataFrame, and Arrow
  * schema -> Spark schema. This is the exact path PySpark uses for
  * Arrow-backed createDataFrame, reused rather than reimplemented.
  */
object ArrowBridge {
  def schemaFromArrow(schema: ArrowSchema): StructType =
    ArrowUtils.fromArrowSchema(schema)

  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  def toDataFrame(batches: Iterator[Array[Byte]], schema: StructType,
                  spark: SparkSession): DataFrame =
    ArrowConverters.toDataFrame(batches, schema.json,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Executor-side record-batch decode: IPC batch payloads ->
    * InternalRows inside a task (the per-partition half of Spark's
    * own Arrow deserialization). Lets a source parallelize batch
    * bytes and keep the expensive columnar decode off the driver. */
  def rowsFromBatches(batches: Iterator[Array[Byte]],
                      schema: StructType, timeZoneId: String)
  : Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    ArrowConverters.fromBatchIterator(batches, schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false,
      org.apache.spark.TaskContext.get())
}

package graft.sources

import java.io.{ByteArrayOutputStream, FileInputStream}
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{FieldVector, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.dictionary.DictionaryEncoder
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.ipc.WriteChannel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftglue.ArrowBridge

/** from_arrow analog (reference: arrow.cpp:289-326 reads an IPC
  * stream batch-wise into the node tree). Arrow is Spark's native
  * interchange format, so the batches feed straight into Spark's own
  * Arrow deserialization path (the one PySpark's createDataFrame
  * uses) — dictionary-encoded columns come back materialized, like
  * the reference's DictionaryArray handling (arrow.cpp:253-274).
  *
  * The stream's BYTES are read on the driver (an IPC stream is
  * sequential by design — the reference is likewise single-process
  * here), but only as opaque batch payloads: the expensive columnar
  * decode runs on EXECUTORS, one task per slice of batches, so a
  * multi-batch file parallelizes across the cluster. For data at
  * rest use parquet.
  */
object ArrowSource {

  /** Read an Arrow IPC *stream* file into a DataFrame. */
  def fromArrowStream(spark: SparkSession, path: String): DataFrame = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(path.stripPrefix("file:"))
    val reader = new ArrowStreamReader(in, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val hasDict = root.getSchema.getFields.asScala.exists(_.getDictionary != null)
      var schema = ArrowBridge.schemaFromArrow(root.getSchema)
      val batches = Iterator.unfold(()) { _ =>
        if (reader.loadNextBatch()) {
          // materialize dictionary-encoded columns: the record batch
          // alone carries only index codes — without decoding against
          // the reader's dictionary vectors, Spark would see integer
          // codes where the data has values (reference handling:
          // arrow.cpp:253-274)
          val (batchRoot, decoded) =
            if (!hasDict) (root, Seq.empty[FieldVector])
            else {
              val vs = root.getFieldVectors.asScala.map { v =>
                val enc = v.getField.getDictionary
                if (enc == null) v
                else {
                  // decode names the result after the dictionary
                  // (DICT<id>); transfer onto the original column name
                  val raw = DictionaryEncoder.decode(
                    v, reader.getDictionaryVectors.get(enc.getId))
                  val tp = raw.getTransferPair(v.getField.getName, alloc)
                  tp.transfer()
                  raw.close()
                  tp.getTo.asInstanceOf[FieldVector]
                }
              }.toSeq
              (VectorSchemaRoot.of(vs: _*), vs.filter(_.getField.getDictionary == null)
                .filterNot(root.getFieldVectors.asScala.contains))
            }
          if (hasDict) schema = ArrowBridge.schemaFromArrow(batchRoot.getSchema)
          val recordBatch = new VectorUnloader(batchRoot).getRecordBatch
          try {
            val out = new ByteArrayOutputStream()
            MessageSerializer.serialize(
              new WriteChannel(Channels.newChannel(out)), recordBatch)
            Some((out.toByteArray, ()))
          } finally {
            recordBatch.close()
            decoded.foreach(_.close())
          }
        } else None
      }.toVector // materialize while the reader is open
      // distribute: batch payloads parallelize (dictionary columns are
      // already materialized above, so each payload is self-contained)
      // and decode to InternalRows inside tasks — the driver never
      // builds row objects
      val outSchema = schema
      val tz = spark.conf.get("spark.sql.session.timeZone")
      val nParts = math.max(1,
        math.min(batches.size, spark.sparkContext.defaultParallelism))
      val rdd = spark.sparkContext.parallelize(batches, nParts)
        .mapPartitions(it => ArrowBridge.rowsFromBatches(it, outSchema, tz))
      org.apache.spark.sql.graftglue.Bridge
        .internalCreateDataFrame(spark, rdd, outSchema)
    } finally {
      reader.close()
      in.close()
      alloc.close()
    }
  }

  /** Write a flat-schema DataFrame to an Arrow IPC *stream* file —
    * the sink half of the source (and the fixture builder for the
    * arrow_source oracle query). Collects on the driver: IPC streams
    * are sequential by design, so this is a fixture/interchange
    * writer, not a data-at-rest sink (that's parquet). Supported
    * leaf types: long/int/double/float/string/boolean, null-safe. */
  def toArrowStream(df: DataFrame, path: String, batchRows: Int = 1 << 14): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.spark.sql.types._
    val arrowSchema = ArrowBridge.toArrowSchema(df.schema, "UTC")
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val out = new java.io.FileOutputStream(path.stripPrefix("file:"))
    val writer = new ArrowStreamWriter(root, null, out.getChannel)
    try {
      writer.start()
      df.collect().grouped(batchRows).foreach { rows =>
        root.allocateNew()
        rows.zipWithIndex.foreach { case (row, i) =>
          df.schema.fields.zipWithIndex.foreach { case (f, j) =>
            val v = root.getVector(j)
            val isNull = row.isNullAt(j)
            f.dataType match {
              case LongType =>
                val vv = v.asInstanceOf[BigIntVector]
                if (isNull) vv.setNull(i) else vv.setSafe(i, row.getLong(j))
              case IntegerType =>
                val vv = v.asInstanceOf[IntVector]
                if (isNull) vv.setNull(i) else vv.setSafe(i, row.getInt(j))
              case DoubleType =>
                val vv = v.asInstanceOf[Float8Vector]
                if (isNull) vv.setNull(i) else vv.setSafe(i, row.getDouble(j))
              case FloatType =>
                val vv = v.asInstanceOf[Float4Vector]
                if (isNull) vv.setNull(i) else vv.setSafe(i, row.getFloat(j))
              case StringType =>
                val vv = v.asInstanceOf[VarCharVector]
                if (isNull) vv.setNull(i)
                else vv.setSafe(i, row.getString(j).getBytes("UTF-8"))
              case BooleanType =>
                val vv = v.asInstanceOf[BitVector]
                if (isNull) vv.setNull(i)
                else vv.setSafe(i, if (row.getBoolean(j)) 1 else 0)
              case other => throw new IllegalArgumentException(
                s"toArrowStream: unsupported type $other for column ${f.name}")
            }
          }
        }
        root.setRowCount(rows.size)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); out.close(); root.close(); alloc.close()
    }
  }
}

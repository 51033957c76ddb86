package graft.sources.avro

import java.io.File
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Driver-side Avro object-container writer for fixtures and
  * round-trip checks (the reference generates its Avro test inputs
  * the same way, avro_tests.py:93-133). Not a distributed sink —
  * `df.write.parquet` is the engine's production sink.
  */
object GraftAvroWriter {

  def write(path: String, schema: StructType, rows: Seq[Row]): Unit = {
    val avroSchema = AvroSchemas.fromSpark(schema)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.create(avroSchema, new File(path))
    try rows.foreach(r => writer.append(toRecord(r, schema, avroSchema)))
    finally writer.close()
  }

  private def toRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldSchema = nonNull(avro.getFields.get(i).schema())
      rec.put(f.name, if (row.isNullAt(i)) null
        else toAvro(row.get(i), f.dataType, fieldSchema))
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, avro: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => toRecord(r, st, avro)
    case (s: Seq[_], ArrayType(e, _)) =>
      val el = nonNull(avro.getElementType)
      s.map(x => if (x == null) null else toAvro(x, e, el)).asJava
    case (m: Map[_, _], MapType(_, vt, _)) =>
      val vl = nonNull(avro.getValueType)
      m.map { case (k, x) =>
        k.toString -> (if (x == null) null else toAvro(x, vt, vl))
      }.asJava
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x
  }
}

package graft.sources.avro

import scala.jdk.CollectionConverters._
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.spark.sql.types._

/** Avro <-> Spark schema conversion for the graft-avro source,
  * following the reference's supported shape (SURVEY.md §1.3-1.5):
  * records/arrays/primitives, enums as strings, fixed/bytes as
  * binary, and only the nullable 2-branch union `[T, null]`
  * (avro.hpp:33-58); maps are supported here (Spark MapType) where
  * the reference throws. General unions are rejected.
  */
object AvroSchemas {

  def toSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = fieldType(f.schema())
        StructField(f.name(), dt, nullable)
      })
    case Schema.Type.ARRAY =>
      val (dt, nullable) = fieldType(s.getElementType)
      ArrayType(dt, containsNull = nullable)
    case Schema.Type.MAP =>
      val (dt, nullable) = fieldType(s.getValueType)
      MapType(StringType, dt, valueContainsNull = nullable)
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType // dictionary value materialized
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL => NullType
    case other =>
      throw new IllegalArgumentException(s"Unsupported Avro type: $other")
  }

  /** Unwrap `[T, null]` / `[null, T]` unions into (type, nullable);
    * other unions are rejected like the reference. */
  def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (branches.size > 2 || nonNull.size != 1)
        throw new IllegalArgumentException(
          s"Only [T, null] unions are supported, got: $s")
      (toSpark(nonNull.head), true)
    case _ => (toSpark(s), false)
  }

  /** Build the pruned *reader* schema: the writer schema restricted
    * to fields present in the requested Spark struct — handed to the
    * Avro decoder so deselected fields are never decoded (the
    * reference's schema projection, avro_direct.cpp:107-166).
    */
  def prunedReaderSchema(writer: Schema, required: StructType): Schema = {
    require(writer.getType == Schema.Type.RECORD, "top level must be a record")
    pruneRecord(writer, required)
  }

  private def pruneRecord(writer: Schema, required: StructType): Schema = {
    val fields = required.fields.toSeq.map { sf =>
      val wf = Option(writer.getField(sf.name)).getOrElse(
        throw new IllegalArgumentException(
          s"Field ${sf.name} not present in Avro writer schema"))
      new Schema.Field(wf.name(), pruneType(wf.schema(), sf.dataType),
        wf.doc(), wf.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      writer.isError, fields.asJava)
  }

  private def pruneType(writer: Schema, required: DataType): Schema =
    (writer.getType, required) match {
      case (Schema.Type.UNION, _) =>
        val pruned = writer.getTypes.asScala.map { b =>
          if (b.getType == Schema.Type.NULL) b
          else pruneType(b, required)
        }
        Schema.createUnion(pruned.asJava)
      case (Schema.Type.RECORD, st: StructType) => pruneRecord(writer, st)
      case (Schema.Type.ARRAY, at: ArrayType) =>
        Schema.createArray(pruneType(writer.getElementType, at.elementType))
      case (Schema.Type.MAP, mt: MapType) =>
        Schema.createMap(pruneType(writer.getValueType, mt.valueType))
      case _ => writer
    }

  /** Spark -> Avro schema (for the test/query writer helper). */
  def fromSpark(st: StructType, name: String = "row",
                namespace: String = "graft"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = fromSparkType(f.dataType, s"${name}_${f.name}", namespace)
      val sch = if (f.nullable)
        Schema.createUnion(Seq(base, Schema.create(Schema.Type.NULL)).asJava)
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, namespace, false, fields.asJava)
  }

  private def fromSparkType(dt: DataType, name: String, ns: String): Schema =
    dt match {
      case st: StructType => fromSpark(st, name, ns)
      case ArrayType(e, n) =>
        val el = fromSparkType(e, name + "_item", ns)
        Schema.createArray(
          if (n) Schema.createUnion(Seq(el, Schema.create(Schema.Type.NULL)).asJava)
          else el)
      case MapType(StringType, v, n) =>
        val vl = fromSparkType(v, name + "_value", ns)
        Schema.createMap(
          if (n) Schema.createUnion(Seq(vl, Schema.create(Schema.Type.NULL)).asJava)
          else vl)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case other =>
        throw new IllegalArgumentException(s"Cannot write $other to Avro")
    }
}

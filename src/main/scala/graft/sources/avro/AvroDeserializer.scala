package graft.sources.avro

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericFixed, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GenericRecord -> InternalRow converters, precompiled per schema
  * (one closure tree built up front, none of the per-row type
  * dispatch the generic path would pay — the reference's flattened
  * CNode mirror, avro_decoder.hpp:29-56).
  */
object AvroDeserializer {

  type Conv = Any => Any

  def forStruct(st: StructType): GenericRecord => InternalRow = {
    val convs = st.fields.map(f => converter(f.dataType))
    val names = st.fields.map(_.name)
    rec => {
      val out = new Array[Any](convs.length)
      var i = 0
      while (i < convs.length) {
        val v = rec.get(names(i))
        out(i) = if (v == null) null else convs(i)(v)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  private def converter(dt: DataType): Conv = dt match {
    case StringType => {
      // covers Utf8, String, and GenericEnumSymbol (enum-as-string)
      v => UTF8String.fromString(v.toString)
    }
    case BinaryType => {
      case b: ByteBuffer =>
        val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
      case f: GenericFixed => f.bytes().clone()
      case a: Array[Byte] => a
    }
    case IntegerType | LongType | FloatType | DoubleType | BooleanType =>
      identity
    case st: StructType =>
      val f = forStruct(st)
      v => f(v.asInstanceOf[GenericRecord])
    case ArrayType(elem, _) =>
      val ec = converter(elem)
      v => {
        val in = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](in.size())
        var i = 0
        val it = in.iterator()
        while (it.hasNext) {
          val e = it.next()
          out(i) = if (e == null) null else ec(e)
          i += 1
        }
        new GenericArrayData(out)
      }
    case MapType(StringType, valueType, _) =>
      val vc = converter(valueType)
      v => {
        val in = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](in.size())
        val vals = new Array[Any](in.size())
        var i = 0
        val it = in.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = if (e.getValue == null) null else vc(e.getValue)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      }
    case NullType => _ => null
    case other =>
      throw new IllegalArgumentException(s"graft-avro cannot decode $other")
  }
}

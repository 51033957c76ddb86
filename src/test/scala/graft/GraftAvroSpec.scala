package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.ClusionInput
import graft.sources.Sources
import graft.sources.avro.GraftAvroWriter

/** The graft-avro DataSource V2: shapes transcribed from the
  * reference's avro_tests.py (each primitive, enum-as-string via
  * round-trip strings, arrays, nullable unions, deep include/exclude
  * projection combos) plus flatten end-to-end over Avro input.
  */
class GraftAvroSpec extends SparkSpec {
  import ClusionInput._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_avro").resolve(name).toString

  test("primitive round-trip for each type (avro_tests.py:145-164)") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("y", BinaryType)))
    val p = tmp("prims.avro")
    GraftAvroWriter.write(p, schema, Seq(
      Row(3, 30L, 1.5f, 2.5, true, "x", Array[Byte](1, 2)),
      Row(null, null, null, null, null, null, null)))
    val df = Sources.readAvro(spark, p)
    assert(df.schema.map(f => (f.name, f.dataType)).toList ==
      schema.map(f => (f.name, f.dataType)).toList)
    val rows = df.orderBy("i").collect()
    assert(rows.length == 2)
    assert(rows(1).getInt(0) == 3 && rows(1).getString(5) == "x")
    assert(rows(1).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2))
    assert(rows(0).toSeq.forall(_ == null))
  }

  test("arrays and nested records (avro_tests.py:181-197)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("r", StructType(Seq(
        StructField("ia", IntegerType), StructField("ib", IntegerType))))))
    val p = tmp("nested.avro")
    GraftAvroWriter.write(p, schema, Seq(
      Row(Seq(1, 2, 3), Row(7, 8)), Row(Seq(), null)))
    val rows = Sources.readAvro(spark, p).orderBy("r.ia").collect()
    assert(rows(1).getSeq[Int](0) == Seq(1, 2, 3))
    assert(rows(1).getStruct(1).getInt(0) == 7)
    assert(rows(0).isNullAt(1))
  }

  test("maps (beyond the reference, which throws on AVRO_MAP)") {
    val schema = StructType(Seq(
      StructField("m", MapType(StringType, LongType, valueContainsNull = false))))
    val p = tmp("map.avro")
    GraftAvroWriter.write(p, schema, Seq(Row(Map("a" -> 1L, "b" -> 2L))))
    val got = Sources.readAvro(spark, p).collect()(0).getMap[String, Long](0)
    assert(got.toMap == Map("a" -> 1L, "b" -> 2L))
  }

  test("deep include/exclude projection (avro_tests.py:223-250)") {
    val inner = StructType(Seq(
      StructField("ia", IntegerType), StructField("ib", IntegerType)))
    val schema = StructType(Seq(
      StructField("oa", inner), StructField("ob", inner)))
    val p = tmp("deep.avro")
    GraftAvroWriter.write(p, schema, Seq(Row(Row(1, 2), Row(3, 4))))

    val ex = Sources.readAvro(spark, p, exclude = Path("oa"))
    assert(ex.columns.toList == List("ob"))
    assert(ex.collect()(0).getStruct(0).toSeq == Seq(3, 4))

    val inc = Sources.readAvro(spark, p, include = Path("oa.ia"))
    assert(inc.schema.catalogString == "struct<oa:struct<ia:int>>")
    assert(inc.collect()(0).getStruct(0).toSeq == Seq(1))

    val combo = Sources.readAvro(spark, p,
      include = Many(Seq(Tree(Seq.empty), Path("oa.ia"))), exclude = Path("oa"))
    assert(combo.schema.catalogString == "struct<oa:struct<ia:int>,ob:struct<ia:int,ib:int>>")
  }

  test("catalyst column pruning reaches the avro scan") {
    val schema = StructType(Seq(
      StructField("keep", IntegerType), StructField("drop", StringType)))
    val p = tmp("prune.avro")
    GraftAvroWriter.write(p, schema, Seq(Row(1, "a"), Row(2, "b")))
    val df = spark.read.format("graft-avro").load(p).select("keep")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<keep:int>"), scan)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("flatten end-to-end over avro input (avro_tests flatten)") {
    val schema = StructType(Seq(
      StructField("x", LongType),
      StructField("y", ArrayType(StructType(Seq(
        StructField("a", LongType), StructField("b", LongType)))))))
    val p = tmp("flat.avro")
    GraftAvroWriter.write(p, schema, Seq(
      Row(1L, Seq(Row(3L, 6L))),
      Row(2L, Seq(Row(4L, 7L), Row(5L, 8L)))))
    val flat = graft.operators.Flatten.flatten(Sources.readAvro(spark, p))
    assert(flat.columns.toList == List("x", "a", "b"))
    assert(flat.collect().map(_.toSeq.toList).toSet ==
      Set(List(1L, 3L, 6L), List(2L, 4L, 7L), List(2L, 5L, 8L)))
  }

  test("non-nullable multi-branch unions are rejected (avro.hpp:33-58)") {
    // construct a [int, string] union schema directly
    import org.apache.avro.{Schema => ASchema}
    import scala.jdk.CollectionConverters._
    val union = ASchema.createUnion(Seq(
      ASchema.create(ASchema.Type.INT), ASchema.create(ASchema.Type.STRING)).asJava)
    val rec = ASchema.createRecord("r", null, "t", false,
      Seq(new ASchema.Field("u", union, null, null)).asJava)
    assertThrows[IllegalArgumentException](
      graft.sources.avro.AvroSchemas.toSpark(rec))
  }

  test("strictEnums: matching symbol tables union, a reworded table refuses") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_avro_enum")
    def writeOne(name: String, symbols: Seq[String], n: Int): Unit = {
      val enum_ = ASchema.createEnum("Color", null, "graft", symbols.asJava)
      val rec = ASchema.createRecord("Rt", null, "graft", false,
        Seq(new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null, null),
          new ASchema.Field("color", enum_, null, null)).asJava)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](rec))
      w.create(rec, dir.resolve(name).toFile)
      (0 until n).foreach { i =>
        val r = new GenericData.Record(rec)
        r.put("id", i.toLong)
        r.put("color", new GenericData.EnumSymbol(enum_, symbols(i % symbols.size)))
        w.append(r)
      }
      w.close()
    }
    writeOne("a.avro", Seq("RED", "BLUE"), 4)
    writeOne("b.avro", Seq("RED", "BLUE"), 4)
    val ok = Sources.readAvro(spark, dir.toString, strictEnums = true)
    assert(ok.count() == 8)
    // same enum full name, different symbol table -> strict refuses;
    // the default read keeps the documented enum-as-string divergence
    writeOne("c.avro", Seq("BLUE", "RED"), 2)
    assert(Sources.readAvro(spark, dir.toString).count() == 10)
    val e = intercept[IllegalArgumentException](
      Sources.readAvro(spark, dir.toString, strictEnums = true))
    assert(e.getMessage.contains("graft.Color"))
  }
}

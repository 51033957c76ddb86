package graft

import java.io.FileOutputStream
import java.nio.file.Files

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import scala.jdk.CollectionConverters._

import graft.sources.ArrowSource

/** from_arrow parity: IPC stream files generated with arrow-vector
  * (the reference generates its inputs with pyarrow the same way,
  * arrow_tests.py:39-51) read back through Spark's interchange path.
  */
class ArrowSourceSpec extends SparkSpec {

  private def writeStream(schema: ASchema)(fill: VectorSchemaRoot => Int): String = {
    val path = Files.createTempDirectory("graft_arrow").resolve("d.arrows").toString
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new FileOutputStream(path)
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start()
    val n = fill(root)
    root.setRowCount(n)
    writer.writeBatch()
    writer.end(); writer.close(); out.close(); root.close(); alloc.close()
    path
  }

  test("dictionary-encoded column materializes values (arrow_tests.py:224-229)") {
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
    import org.apache.arrow.vector.types.pojo.DictionaryEncoding
    val path = Files.createTempDirectory("graft_arrow").resolve("dict.arrows").toString
    val alloc = new RootAllocator()
    // dictionary: ["lo", "hi"]
    val dictVec = new VarCharVector("dictv", alloc)
    dictVec.allocateNew(2)
    dictVec.setSafe(0, "lo".getBytes("UTF-8")); dictVec.setSafe(1, "hi".getBytes("UTF-8"))
    dictVec.setValueCount(2)
    val encoding = new DictionaryEncoding(7L, false, new ArrowType.Int(32, true))
    val dict = new Dictionary(dictVec, encoding)
    val provider = new DictionaryProvider.MapDictionaryProvider(dict)
    // index column: [0, 1, 1, 0]
    val idx = new IntVector(new Field("cat",
      new FieldType(true, new ArrowType.Int(32, true), encoding), null), alloc)
    idx.allocateNew(4)
    Seq(0, 1, 1, 0).zipWithIndex.foreach { case (v, i) => idx.setSafe(i, v) }
    idx.setValueCount(4)
    val root = VectorSchemaRoot.of(idx)
    val out = new FileOutputStream(path)
    val writer = new ArrowStreamWriter(root, provider, out)
    writer.start(); writer.writeBatch(); writer.end(); writer.close()
    out.close(); root.close(); dictVec.close(); alloc.close()

    val df = ArrowSource.fromArrowStream(spark, path)
    assert(df.schema("cat").dataType == org.apache.spark.sql.types.StringType)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("lo", "hi", "hi", "lo"))
  }

  test("int64 column with nulls (arrow_tests per-type arrays)") {
    val schema = new ASchema(Seq(
      Field.nullable("arr", new ArrowType.Int(64, true))).asJava)
    val path = writeStream(schema) { root =>
      val v = root.getVector("arr").asInstanceOf[BigIntVector]
      v.allocateNew(3)
      v.setSafe(0, 7L); v.setNull(1); v.setSafe(2, 9L)
      3
    }
    val df = ArrowSource.fromArrowStream(spark, path)
    assert(df.schema.catalogString == "struct<arr:bigint>")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(7L, null, 9L))
  }

  test("float64 + strings") {
    val schema = new ASchema(Seq(
      Field.nullable("d", new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)),
      Field.nullable("s", new ArrowType.Utf8())).asJava)
    val path = writeStream(schema) { root =>
      val d = root.getVector("d").asInstanceOf[Float8Vector]
      val s = root.getVector("s").asInstanceOf[VarCharVector]
      d.allocateNew(2); s.allocateNew(2)
      d.setSafe(0, 1.5); d.setSafe(1, -2.5)
      s.setSafe(0, "ab".getBytes); s.setSafe(1, "cd".getBytes)
      2
    }
    val rows = ArrowSource.fromArrowStream(spark, path).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.5, -2.5))
    assert(rows.map(_.getString(1)).toSeq == Seq("ab", "cd"))
  }

  test("multi-batch stream decodes distributed across >1 partition") {
    val schema = new ASchema(Seq(
      Field.nullable("v", new ArrowType.Int(64, true))).asJava)
    val path = Files.createTempDirectory("graft_arrow").resolve("mb.arrows").toString
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new FileOutputStream(path)
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start()
    val nBatches = 8
    val perBatch = 100
    (0 until nBatches).foreach { b =>
      val v = root.getVector("v").asInstanceOf[BigIntVector]
      v.allocateNew(perBatch)
      (0 until perBatch).foreach(i => v.setSafe(i, (b * perBatch + i).toLong))
      root.setRowCount(perBatch)
      writer.writeBatch()
    }
    writer.end(); writer.close(); out.close(); root.close(); alloc.close()

    val df = ArrowSource.fromArrowStream(spark, path)
    // the decode itself is distributed: multiple tasks, not a driver loop
    assert(df.rdd.getNumPartitions > 1)
    assert(df.count() == nBatches.toLong * perBatch)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
      == (0L until nBatches.toLong * perBatch).sum)
  }

  test("list column flattens end-to-end (arrow_tests.py:247-252 shape)") {
    val listField = new Field("arr",
      FieldType.nullable(new ArrowType.List()),
      Seq(Field.nullable("item", new ArrowType.Int(64, true))).asJava)
    val schema = new ASchema(Seq(listField).asJava)
    val path = writeStream(schema) { root =>
      val v = root.getVector("arr").asInstanceOf[ListVector]
      val w = v.getWriter
      w.setPosition(0); w.startList()
      w.bigInt().writeBigInt(1L); w.bigInt().writeBigInt(2L)
      w.endList()
      w.setPosition(1); w.startList(); w.bigInt().writeBigInt(3L); w.endList()
      v.setValueCount(2)
      2
    }
    val df = ArrowSource.fromArrowStream(spark, path)
    val flat = graft.operators.Flatten.flatten(df)
    assert(flat.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("toArrowStream round-trip: every leaf type, nulls, multi-batch") {
    import spark.implicits._
    val src = (1 to 700).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else s"s$i",
        i * 0.5,
        i % 2 == 0,
        if (i % 11 == 0) None else Some(i))
    }.toDF("id", "s", "x", "b", "oi")
    val p = java.nio.file.Files.createTempDirectory("graft_arrow_rt")
      .resolve("rt.arrows").toString
    ArrowSource.toArrowStream(src, p, batchRows = 100) // 7 batches
    val back = ArrowSource.fromArrowStream(spark, p)
    assert(back.schema == src.schema)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(back.collect().sortBy(key).toSeq == src.collect().sortBy(key).toSeq)
  }
}

package graft

import org.apache.spark.sql.types._
import graft.operators.{ClusionInput, Clusions}
import graft.sources.Sources
import ClusionInput._

/** Pruning semantics pinned by avro_tests.py:206-250 (deep
  * include/exclude combos) plus parquet reader round-trips.
  */
class SourcesSpec extends SparkSpec {

  // record outer { oa: record {ia, ib}, ob: record {ia, ib} }
  private val inner = StructType(Seq(
    StructField("ia", IntegerType), StructField("ib", IntegerType)))
  private val outer = StructType(Seq(
    StructField("oa", inner), StructField("ob", inner)))

  private def prune(include: ClusionInput, exclude: ClusionInput): List[String] = {
    def leaves(st: StructType, prefix: String): List[String] =
      st.fields.toList.flatMap { f =>
        f.dataType match {
          case s: StructType => leaves(s, prefix + f.name + ".")
          case _ => List(prefix + f.name)
        }
      }
    leaves(Sources.pruneSchema(outer, Clusions.convert(include, exclude)), "")
  }

  test("no filter keeps all") {
    assert(prune(Empty, Empty) == List("oa.ia", "oa.ib", "ob.ia", "ob.ib"))
  }

  test("exclude subtree (avro_tests deep filter)") {
    assert(prune(Empty, Path("oa")) == List("ob.ia", "ob.ib"))
  }

  test("include-all plus deep re-include under exclude (avro_tests combo)") {
    // exclude='oa', include=[{}, 'oa.ia'] -> oa.ia, ob.ia, ob.ib
    val include = Many(Seq(Tree(Seq.empty), Path("oa.ia")))
    assert(prune(include, Path("oa")) == List("oa.ia", "ob.ia", "ob.ib"))
  }

  test("include only a deep leaf") {
    assert(prune(Path("oa.ia"), Empty) == List("oa.ia"))
  }

  test("include a subtree") {
    assert(prune(Path("ob"), Empty) == List("ob.ia", "ob.ib"))
  }

  test("exclude everything yields empty schema") {
    assert(prune(Empty, Many(Seq(Path("oa"), Path("ob")))) == Nil)
  }

  test("parquet reader prunes at scan time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(100)
      .select(col("l_orderkey"),
        struct(col("l_quantity"), col("l_discount")).as("m"))
    li.write.mode("overwrite").parquet(s"$dir/t.parquet")

    val pruned = Sources.readParquet(spark, s"$dir/t.parquet", include = "m.l_quantity")
    assert(pruned.schema.catalogString == "struct<m:struct<l_quantity:double>>")
    assert(pruned.count() == 100)

    val excluded = Sources.readParquet(spark, s"$dir/t.parquet", exclude = "m")
    assert(excluded.columns.toList == List("l_orderkey"))
  }

  test("json reader infers and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val p = java.nio.file.Paths.get(dir, "d.json")
    java.nio.file.Files.writeString(p,
      """{"a": 1, "b": {"c": "x", "d": 2.5}}
        |{"a": 2, "b": {"c": "y", "d": 3.5}, "e": true}
        |""".stripMargin)
    val df = Sources.readJson(spark, p.toString, exclude = "b.d")
    assert(df.schema.catalogString == "struct<a:bigint,b:struct<c:string>,e:boolean>")
    assert(df.count() == 2)
  }

  test("fromObjects + unionByNameAll backfills heterogeneous schemas") {
    import spark.implicits._
    val a = Seq((1.0, 2.0)).toDF("a", "b")
    val b = Seq((3.0, 4.0)).toDF("a", "c")
    val u = Sources.unionByNameAll(Seq(a, b)).orderBy("a")
    assert(u.columns.toList == List("a", "b", "c"))
    val rows = u.collect().map(_.toSeq.toList).toList
    assert(rows == List(List(1.0, 2.0, null), List(3.0, null, 4.0)))
  }
}

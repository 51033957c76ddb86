package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators._
import graft.operators.FlattenStrategy._
import graft.operators.NameStrategy._
import graft.operators.FlattenJoin._

/** Flatten semantics transcribed from the reference's FlattenTests
  * (/root/reference/python/bamboo_tests/node_tests.py:92-256). The
  * documented divergence: scalar nulls stay SQL nulls instead of the
  * pandas fill values (0 / NaN / False).
  */
class FlattenSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private def collect(d: DataFrame): (List[String], List[List[Any]]) =
    (d.columns.toList, d.collect().toList.map(_.toSeq.toList))

  private val valueStruct = StructType(Seq(StructField("value", DoubleType)))

  // struct<a: struct<values: array<struct<value: double>>>, b: long>
  private val listObjSchema = StructType(Seq(
    StructField("a", StructType(Seq(
      StructField("values", ArrayType(valueStruct))))),
    StructField("b", LongType)))

  test("flatten list with scalar sibling (test_flatten_list)") {
    val d = df(listObjSchema,
      Row(Row(Seq(Row(1.0), Row(null))), 3L))
    val (cols, rows) = collect(Flatten.flatten(d))
    assert(cols == List("value", "b"))
    assert(rows == List(List(1.0, 3L), List(null, 3L)))
  }

  test("flatten nested list (test_flatten_nested_list)") {
    // a: ListObject([c, c]) where c: ListObject([{1.0}, {null}])
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("values", ArrayType(StructType(Seq(
          StructField("values", ArrayType(valueStruct))))))))),
      StructField("b", LongType)))
    val inner = Seq(Row(1.0), Row(null))
    val d = df(schema, Row(Row(Seq(Row(inner), Row(inner))), 3L))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("a_values_values_value", "b"))
    assert(rows == List(List(1.0, 3L), List(null, 3L), List(1.0, 3L), List(null, 3L)))
  }

  test("null record contributes no rows (test_null_record)") {
    val schema = StructType(Seq(
      StructField("d", ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType)))))),
      StructField("e", DoubleType)))
    val d = df(schema, Row(Seq(Row(Seq(1.0, 1.0, 1.0)), null), 2.0))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("d_b", "e"))
    assert(rows == List(List(1.0, 2.0), List(1.0, 2.0), List(1.0, 2.0)))
  }

  test("null primitive kept as null (test_null_primitive)") {
    val schema = StructType(Seq(
      StructField("d", ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType)))))),
      StructField("e", DoubleType)))
    val rec = Row(Seq(1.0, 1.0, null))
    val d = df(schema, Row(Seq(rec, rec), 2.0))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("d_b", "e"))
    assert(rows == List(
      List(1.0, 2.0), List(1.0, 2.0), List(null, 2.0),
      List(1.0, 2.0), List(1.0, 2.0), List(null, 2.0)))
  }

  test("null list drops the whole record (test_null_list)") {
    val schema = StructType(Seq(
      StructField("d", ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType)),
        StructField("c", DoubleType))))),
      StructField("e", DoubleType)))
    val d = df(schema,
      Row(Seq(Row(Seq(1.0, 1.0, 5.0), 2.0), Row(null, 3.0)), 4.0))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("d_b", "d_c", "e"))
    assert(rows == List(
      List(1.0, 2.0, 4.0), List(1.0, 2.0, 4.0), List(5.0, 2.0, 4.0)))
  }

  test("simple flatten of sibling records (test_simple_flatten)") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("value", LongType)))),
      StructField("b", StructType(Seq(StructField("value", LongType))))))
    val d = df(schema, Row(Row(1L), Row(2L)))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("a_value", "b_value"))
    assert(rows == List(List(1L, 2L)))
  }

  test("incomplete (NullType) columns are dropped (test_flatten_null)") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("value", LongType)))),
      StructField("b", StructType(Seq(StructField("value", NullType))))))
    val d = df(schema, Row(Row(1L), Row(null)))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("a_value"))
    assert(rows == List(List(1L)))
  }

  test("strings (test_strings)") {
    val schema = StructType(Seq(StructField("value", StringType)))
    val d = df(schema, Row("a"))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = ConcatenateAlways))
    assert(cols == List("value"))
    assert(rows == List(List("a")))
  }

  test("conflicting sibling lists (test_flatten_multiple_lists)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType)),
      StructField("b", ArrayType(LongType)),
      StructField("c", LongType)))
    val d = df(schema, Row(Seq(1L, 2L), Seq(3L, 4L), 1L))
    assertThrows[IllegalArgumentException](Flatten.flatten(d))
    val (cols, rows) = collect(Flatten.flatten(d, strategy = FlattenAvailable))
    assert(cols == List("c"))
    assert(rows == List(List(1L)))
  }

  test("exclude (test_exclude)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema, Row(1L, 2L))
    val (cols, rows) = collect(Flatten.flatten(d, exclude = "b"))
    assert(cols == List("a"))
    assert(rows == List(List(1L)))
  }

  test("conflicting clusions throw (test_conflicting_clusions)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema, Row(1L, 2L))
    assertThrows[IllegalArgumentException](
      Flatten.flatten(d, include = "a", exclude = "a"))
  }

  test("multi-index naming divergence (test_multi_index_naming)") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("c", LongType)))),
      StructField("b", LongType)))
    val d = df(schema, Row(Row(1L), 2L))
    val (cols, rows) = collect(Flatten.flatten(d, nameStrategy = MultiIndex))
    assert(cols == List("a.c", "b"))
    assert(rows == List(List(1L, 2L)))
  }

  test("excluded lists are ignored (test_excluded_lists_are_ignored)") {
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("b", ArrayType(LongType)),
      StructField("c", ArrayType(LongType))))
    val d = df(schema,
      Row(null, Seq(2L, 3L), Seq(-2L, -3L)),
      Row(1L, Seq(2L, 4L), Seq(-2L, -4L)))
    val (cols1, rows1) = collect(Flatten.flatten(d, include = "a"))
    assert(cols1 == List("a"))
    assert(rows1.toSet == Set(List(null), List(1L))) // ref fills 0; we keep null
    val (cols2, rows2) = collect(Flatten.flatten(d, include = "b"))
    assert(cols2 == List("b"))
    assert(rows2.map(_.head).toSet == Set(2L, 3L, 4L))
    assert(rows2.size == 4)
  }

  test("empty schema flatten is empty (test_incomplete_node)") {
    val d = spark.emptyDataFrame
    val out = Flatten.flatten(d)
    assert(out.columns.isEmpty)
    assert(out.count() == 0)
  }

  test("explicit strategy expands only explicitly included lists") {
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("b", ArrayType(LongType))))
    val d = df(schema, Row(1L, Seq(2L, 3L)))
    // no includes: list dropped, scalar kept
    val (cols1, rows1) = collect(Flatten.flatten(d, strategy = FlattenExplicit))
    assert(cols1 == List("a"))
    assert(rows1 == List(List(1L)))
    // explicit include of the list field expands it
    val (cols2, rows2) = collect(
      Flatten.flatten(d, strategy = FlattenExplicit, include = "b"))
    assert(cols2 == List("b"))
    assert(rows2 == List(List(2L), List(3L)))
  }

  test("outer join keeps parents of null/empty lists") {
    val schema = StructType(Seq(
      StructField("d", ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType)),
        StructField("c", DoubleType))))),
      StructField("e", DoubleType)))
    val d = df(schema,
      Row(Seq(Row(Seq(1.0), 2.0), Row(null, 3.0), Row(Seq(), 5.0)), 4.0))
    val inner = Flatten.flatten(d, nameStrategy = ConcatenateAlways)
    assert(inner.count() == 1)
    val outer = Flatten.flatten(d, nameStrategy = ConcatenateAlways, join = Outer)
    val (cols, rows) = collect(outer)
    assert(cols == List("d_b", "d_c", "e"))
    assert(rows.toSet == Set(
      List(1.0, 2.0, 4.0), List(null, 3.0, 4.0), List(null, 5.0, 4.0)))
  }

  test("map column flattens as key/value records (dict-as-list emulation)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(StringType, LongType))))
    val d = df(schema,
      Row(1L, Map("a" -> 10L, "b" -> 20L)),
      Row(2L, Map("c" -> 30L)),
      Row(3L, null))
    val (cols, rows) = collect(Flatten.flatten(d))
    assert(cols == List("id", "key", "value"))
    assert(rows.toSet == Set(
      List(1L, "a", 10L), List(1L, "b", 20L), List(2L, "c", 30L)))
    // clusion path reaches into the synthetic key/value record
    val (cols2, rows2) = collect(Flatten.flatten(d, include = Seq("id", "m.key"): Seq[String]))
    assert(cols2 == List("id", "key"))
    assert(rows2.toSet == Set(List(1L, "a"), List(1L, "b"), List(2L, "c")))
  }

  test("flatten is narrow: no Exchange in the physical plan") {
    // the core 100 TB claim — the explode chain is Generate+Project
    // over the scan, so flattening never shuffles at any scale
    val nested = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct("o_orderkey", "o_totalprice"))
        .as("orders"))
    // materialize the nested shape, then plan flatten alone
    val path = "target/scratch/nested_orders"
    nested.write.mode("overwrite").parquet(path)
    val flat = Flatten.flatten(spark.read.parquet(path))
    val plan = flat.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan)
    assert(flat.count() > 0)
  }

  test("deep single path across records and nested arrays") {
    // array<struct<x, y: array<struct<a, b>>>> — the arrow_tests
    // list-of-struct flatten golden (arrow_tests.py:247-252)
    val schema = StructType(Seq(
      StructField("x", LongType),
      StructField("y", ArrayType(StructType(Seq(
        StructField("a", LongType), StructField("b", LongType)))))))
    val d = df(schema,
      Row(1L, Seq(Row(3L, 6L))),
      Row(2L, Seq(Row(4L, 7L), Row(5L, 8L))))
    val (cols, rows) = collect(Flatten.flatten(d))
    assert(cols == List("x", "a", "b"))
    assert(rows.toSet == Set(List(1L, 3L, 6L), List(2L, 4L, 7L), List(2L, 5L, 8L)))
  }

  test("clusion paths reach through map columns (key/value as record fields)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("props", MapType(StringType, LongType))))
    val d = df(schema,
      Row(1L, Map("a" -> 10L, "b" -> 11L)),
      Row(2L, Map("c" -> 20L)))
    // include only the map's value side: key column drops, expansion stays
    val (cols, rows) = collect(
      Flatten.flatten(d, include = Seq("id", "props.value"): Seq[String]))
    assert(cols == List("id", "value"))
    assert(rows.toSet == Set(List(1L, 10L), List(1L, 11L), List(2L, 20L)))
    // exclude the value side: key survives
    val (cols2, rows2) = collect(
      Flatten.flatten(d, exclude = Seq("props.value"): Seq[String]))
    assert(cols2 == List("id", "key"))
    assert(rows2.toSet == Set(List(1L, "a"), List(1L, "b"), List(2L, "c")))
  }

  test("Nest is the deterministic inverse of flatten") {
    import spark.implicits._
    val flat = Seq(
      (1L, 2, 10.0), (1L, 1, 11.0), (2L, 1, 20.0), (3L, 3, 30.0), (3L, 1, 31.0))
      .toDF("k", "line", "qty")
    val nested = Nest.nest(flat, Seq("k"), Seq("line", "qty"), "items",
      sortBy = Seq("line"))
    // arrays come back sorted by the sort key regardless of row order
    val arr = nested.filter($"k" === 1L).select("items").head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getInt(0), r.getDouble(1)))
    assert(arr == Seq((1, 11.0), (2, 10.0)))
    // round-trip: nest then flatten restores the original rows
    val back = Flatten.flatten(nested).as[(Long, Int, Double)].collect().toSet
    assert(back == flat.as[(Long, Int, Double)].collect().toSet)
    // struct field order inside the array is the declared payload order
    assert(nested.schema("items").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq == Seq("line", "qty"))
  }

  test("MultiIndex tuples export as column metadata and survive parquet (node_tests.py:220-223)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, struct}
    // reference golden: {'a': {'c': 1}, 'b': 2} -> {('a','c'): [1], ('b',): [2]}
    val df = Seq(1).toDF("one")
      .select(struct(lit(1).as("c")).as("a"), lit(2).as("b"))
    val flat = Flatten.flatten(df, nameStrategy = NameStrategy.MultiIndex)
    assert(flat.columns.toSeq == Seq("a.c", "b"))
    val mi = NameResolution.multiIndexOf(flat)
    assert(mi == Map("a.c" -> Seq("a", "c"), "b" -> Seq("b", "")))
    // metadata rides the schema through parquet (footer-stored)
    val p = java.nio.file.Files.createTempDirectory("graft_mi").toString
    flat.write.mode("overwrite").parquet(s"$p/out")
    val back = spark.read.parquet(s"$p/out")
    assert(NameResolution.multiIndexOf(back) == mi)
    // non-MultiIndex strategies attach nothing
    assert(NameResolution.multiIndexOf(Flatten.flatten(df)).isEmpty)
  }

  test("fillLikePandas replays the reference's null fills (node_tests test_null_primitive)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, struct, typedLit, lit, col}
    // reference fixture (node_tests.py:141-149): d = [{b: [1, 1, None]},
    // {b: [1, 1, None]}], e = 2.0 -> d_b: [1, 1, nan, 1, 1, nan],
    // e: [2]*6 under CONCATENATE_ALWAYS with pandas fills
    val inner = Seq[Option[Double]](Some(1.0), Some(1.0), None)
    val df = Seq(1).toDF("one").select(
      array(struct(typedLit(inner).as("b")), struct(typedLit(inner).as("b")))
        .as("d"),
      lit(2.0).as("e"))
    val flat = Flatten.flatten(df,
      nameStrategy = graft.operators.NameStrategy.ConcatenateAlways,
      fillLikePandas = true)
    val rows = flat.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(rows.map(_._2) == Seq.fill(6)(2.0))
    val db = rows.map(_._1)
    assert(db(0) == 1.0 && db(1) == 1.0 && db(2).isNaN)
    assert(db(3) == 1.0 && db(4) == 1.0 && db(5).isNaN)
    // default stays SQL-null (the documented divergence)
    val defaultFlat = Flatten.flatten(df,
      nameStrategy = graft.operators.NameStrategy.ConcatenateAlways)
    assert(defaultFlat.filter(col("d_b").isNull).count() == 2)
  }

  test("fillLikePandas fills ints with 0 and booleans with false (nodes.py fill_value)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(10), Some(true), Some("x")),
      (2L, None: Option[Int], None: Option[Boolean], None: Option[String]))
      .toDF("id", "i", "flag", "s")
    val flat = Flatten.flatten(df, fillLikePandas = true)
    val r2 = flat.filter(col("id") === 2L).head()
    assert(r2.getInt(flat.columns.indexOf("i")) == 0)
    assert(!r2.getBoolean(flat.columns.indexOf("flag")))
    // object dtype (string) keeps None, exactly as the reference
    assert(r2.isNullAt(flat.columns.indexOf("s")))
  }
}

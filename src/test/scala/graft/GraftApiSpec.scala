package graft

import java.nio.file.{Files, Paths}
import graft.operators.ClusionInput

/** The reference's README example (reference README.md:46-82) driven
  * end to end through the fluent facade — the exact call-site shapes
  * a reference user would port to.
  */
class GraftApiSpec extends SparkSpec {

  private lazy val jsonPath: String = {
    val dir = Paths.get("target/scratch"); Files.createDirectories(dir)
    val p = dir.resolve("readme_example.json")
    Files.write(p,
      """[{"a": null, "b": [1, 2], "c": [5, 6]}, {"a": -1.0, "b": [3, 4], "c": [7, 8]}]"""
        .getBytes("UTF-8"))
    p.toString
  }

  test("info renders the schema tree (README example)") {
    val node = Graft.fromJson(spark, jsonPath, wholeDocument = true)
    val info = node.info()
    assert(info.contains("- a float64"), info)
    // uint64 in the reference; int64 here (documented widening policy)
    assert(info.contains("- b []int64"), info)
    assert(info.contains("- c []int64"), info)
  }

  test("flatten include=['a'] keeps scalars unexploded, nulls as SQL nulls") {
    val df = Graft.fromJson(spark, jsonPath, wholeDocument = true)
      .flatten(include = ClusionInput.fromStrings(Seq("a")))
    val vals = df.collect().map(r => Option(r.get(0)))
    assert(df.columns.toSeq == Seq("a"))
    assert(vals.toSet == Set(None, Some(-1.0)))
  }

  test("flatten include=['a','b'] repeats a along b (README example)") {
    val df = Graft.fromJson(spark, jsonPath, wholeDocument = true)
      .flatten(include = ClusionInput.fromStrings(Seq("a", "b")))
    val rows = df.orderBy("b").collect()
      .map(r => (Option(r.get(df.columns.indexOf("a"))), r.getLong(df.columns.indexOf("b"))))
    assert(rows.toSeq == Seq(
      (None, 1L), (None, 2L), (Some(-1.0), 3L), (Some(-1.0), 4L)))
  }

  test("flattening sibling lists fails (README conflicting-lists error)") {
    val node = Graft.fromJson(spark, jsonPath, wholeDocument = true)
    val e = intercept[IllegalArgumentException] {
      node.flatten(include = ClusionInput.fromStrings(Seq("b", "c")))
    }
    assert(e.getMessage.toLowerCase.contains("conflicting"), e.getMessage)
  }

  test("GraftFrame converts implicitly to DataFrame and navigates paths") {
    val node = Graft.fromJson(spark, jsonPath, wholeDocument = true)
    // implicit conversion: Spark API directly on the wrapper
    import GraftFrame.toDataFrame
    assert(node.count() == 2L)
    assert(node.select(node("a")).columns.toSeq == Seq("a"))
  }
}

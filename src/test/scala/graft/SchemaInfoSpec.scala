package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema.SchemaInfo

/** Golden rendering transcribed from node_tests.py:237-250 (test_str). */
class SchemaInfoSpec extends AnyFunSuite {
  test("list-of-record rendering golden") {
    val schema = StructType(Seq(
      StructField("d", ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType)))))),
      StructField("e", DoubleType)))
    val expected = "- d []\n    - b []float64\n- e float64"
    assert(SchemaInfo.render(schema) == expected)
  }

  test("nested struct rendering") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("x", LongType),
        StructField("s", StringType)))),
      StructField("f", BooleanType)))
    assert(SchemaInfo.render(schema) ==
      "- a \n    - x int64\n    - s object\n- f bool")
  }

  test("array-of-array suffix stacking") {
    val schema = StructType(Seq(
      StructField("m", ArrayType(ArrayType(IntegerType)))))
    assert(SchemaInfo.render(schema) == "- m [][]int32")
  }
}

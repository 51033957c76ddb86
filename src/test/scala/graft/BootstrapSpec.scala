package graft

import graft.operators.Bootstrap

/** Half-sample CI sanity: constant values give se = 0 with a
  * degenerate interval, the mean is the plain mean, shifting every
  * value shifts the interval exactly, and the estimate is
  * partitioning-independent (md5-bit membership).
  */
class BootstrapSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("constant values: se = 0, interval collapses to the mean") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g", 5.0, i.toLong)).toDF("g", "v", "k")
    val r = Bootstrap.halfSampleCI(df, "g", "v", "k").collect().head
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 5.0)
  }

  test("mean is the plain mean; CI brackets it; shift equivariance") {
    import spark.implicits._
    val vals = (1 to 500).map(i => (i % 97).toDouble * 1.5)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "k")
    val r = Bootstrap.halfSampleCI(df, "g", "v", "k").collect().head
    val mean = BigDecimal(vals.sum / vals.length)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == mean)
    assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5))
    assert(r.getDouble(3) > 0.0)
    // shifting every value by +100 shifts mean and both bounds by +100
    val df2 = vals.zipWithIndex.map { case (v, i) => ("g", v + 100.0, i.toLong) }
      .toDF("g", "v", "k")
    val r2 = Bootstrap.halfSampleCI(df2, "g", "v", "k").collect().head
    assert(math.abs(r2.getDouble(2) - r.getDouble(2) - 100.0) < 0.011)
    assert(math.abs(r2.getDouble(3) - r.getDouble(3)) < 0.011)
  }

  test("partitioning-independent: 1 vs 8 partitions, identical rows") {
    import spark.implicits._
    val df = (1 to 300).map(i => ((i % 3).toString, (i * 7 % 113).toDouble,
      i.toLong)).toDF("g", "v", "k")
    val a = Bootstrap.halfSampleCI(df.repartition(1), "g", "v", "k")
      .collect().map(_.toString).sorted.toSeq
    val b = Bootstrap.halfSampleCI(df.repartition(8), "g", "v", "k")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting/range-partitioning a table by the bit-interleaved z-value
  * of two columns clusters rows so that BOTH dimensions have narrow
  * min/max ranges per file — parquet footer stats then prune scans
  * filtered on either column, which plain lexicographic sort gives
  * only to its leading column. This is the layout trick behind
  * Delta/Iceberg Z-ORDER, expressed as plain columns so it composes
  * with `repartitionByRange(zvalue).sortWithinPartitions(zvalue)` at
  * write time.
  *
  * The z-value is pure integer bit arithmetic (shift/mask/or), fully
  * codegen'd and exactly reproducible in any SQL engine — the oracle
  * replays it with the same unrolled expression.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1. */
  def zvalue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { j =>
      Seq(
        shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The matching DuckDB SQL for [[zvalue2]], over expression strings. */
  def zvalue2Sql(x: String, y: String, bits: Int = 16): String = {
    val terms = (0 until bits).flatMap { j =>
      Seq(s"((($x >> $j) & 1) << ${2 * j})", s"((($y >> $j) & 1) << ${2 * j + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Layout helper: range-partition and sort by the z-value of two
    * columns, ready for a stats-pruned parquet write. */
  def layoutByZ(df: DataFrame, x: String, y: String, partitions: Int,
                bits: Int = 16): DataFrame = {
    val z = zvalue2(col(x).cast("long"), col(y).cast("long"), bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}

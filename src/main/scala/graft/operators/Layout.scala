package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Output-layout control: file sizing and clustering for the write
  * path. At corpus scale the writer's file geometry IS a query-plan
  * decision — thousands of tiny files tax the driver's file index and
  * every downstream scan's task scheduling, while single giant files
  * serialize reads. These helpers make the row→file mapping explicit
  * and deterministic.
  */
object Layout {

  /** Repartition so each output file receives ~`rowsPerFile` rows,
    * optionally range-clustered by `clusterBy` columns (sorted within
    * partitions too, so parquet min/max footer stats are tight —
    * combine with [[ZOrder.zvalue2]] for 2-D clustering).
    *
    * The partition count derives from an exact count — one extra
    * pass, the same trade the writer's own AQE rebalance makes; pass
    * `totalRows` if the caller already knows it.
    */
  def sized(df: DataFrame, rowsPerFile: Long,
            clusterBy: Seq[String] = Nil, totalRows: Long = -1L): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val n = if (totalRows >= 0) totalRows else df.count()
    val partsL = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile)
    require(partsL <= Int.MaxValue,
      s"derived partition count $partsL exceeds Int range — raise rowsPerFile")
    val parts = partsL.toInt
    if (clusterBy.isEmpty) df.repartition(parts)
    else df.repartitionByRange(parts, clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)
  }

  /** Per-group BYTE-budget write plan — the table that turns "write
    * each source as its own partition directory" into concrete file
    * geometry: per group, the estimated payload bytes (an exact
    * octet-length sum over the payload column), the file count that
    * keeps each file under `targetBytes` (ceil division), and the
    * per-file row cap to pass to [[cappedWriter]] /
    * `maxRecordsPerFile`. Planning on BYTES rather than rows is what
    * matters when payload sizes are skewed (a source of long
    * documents needs more files for the same row count).
    *
    * All-integer (exact sums, ceil by `(a + b - 1) div b`), so the
    * plan replays in SQL. One map-combined aggregation per group —
    * the output is |groups| rows; the write itself then uses
    * [[sized]]/[[cappedWriter]] per group with `rows_per_file`.
    */
  def writePlan(df: DataFrame, groupCol: String, payloadCol: String,
                targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    df.select(col(groupCol),
        octet_length(col(payloadCol)).cast("long").as("__bytes"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("__bytes")).as("est_bytes"))
      // clamp: a non-empty group whose payloads sum to 0 bytes (empty
      // or all-null) still needs ONE file — ceil division alone plans
      // n_files = 0 there and rows_per_file divides by zero
      .withColumn("n_files",
        expr(s"greatest((est_bytes + ${targetBytes - 1}) div $targetBytes, 1L)"))
      .withColumn("rows_per_file",
        expr("(n_rows + n_files - 1) div n_files"))
  }

  /** Writer with a hard per-file row cap — belt to [[sized]]'s
    * braces: even if a partition ends up oversized (skewed range,
    * upstream change), no single file exceeds `maxRecordsPerFile`. */
  def cappedWriter(df: DataFrame, maxRecordsPerFile: Long): DataFrameWriter[Row] =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators over keyed change logs — the
  * table-maintenance half of a 100 TB ingest pipeline (the Delta /
  * Hudi / Iceberg MERGE and SCD patterns, expressed as plain
  * deterministic plans):
  *
  *  - [[scd2]] builds a type-2 slowly-changing-dimension history
  *    (validity intervals per key, no-op updates collapsed) from an
  *    append-only change log.
  *  - [[mergeLatest]] compacts an upsert/delete log to the current
  *    snapshot — latest writer wins, deletes tombstone.
  *
  * Scale shape: both are ONE exchange on the key followed by
  * key-local window work — the same shuffle a MERGE's join would
  * need, with no second pass and no driver involvement. Determinism:
  * every window orders by (time, tiebreak), so ties are stable
  * across engines and partitionings.
  */
object Scd {

  /** Type-2 SCD build: per key, order the change log by
    * (time, tiebreak), drop rows whose tracked value equals the
    * previous row's (a real SCD2 ignores no-op updates), then emit
    * one validity interval per surviving change:
    * `valid_from` = the change's time, `valid_to` = the next
    * surviving change's time (null while current), plus an
    * `is_current` flag.
    *
    * @param valueCol the tracked attribute (any comparable type);
    *                 change detection is null-safe (`<=>`).
    * @return (key, value, valid_from, valid_to, is_current) */
  def scd2(log: DataFrame, keyCol: String, timeCol: String,
           tieCol: String, valueCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    val changes = log
      .withColumn("__prev", lag(col(valueCol), 1).over(order))
      .withColumn("__first", row_number().over(order) === 1)
      // keep the first row per key and every row whose value differs
      // from its predecessor (null-safe: a null->value flip counts)
      .filter(col("__first") || !(col(valueCol) <=> col("__prev")))
    val survOrder = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    changes
      .withColumn("valid_to", lead(col(timeCol), 1).over(survOrder))
      .select(col(keyCol), col(valueCol),
        col(timeCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** CDC log compaction: latest row per key wins ((time, tiebreak)
    * descending); a winning delete tombstones the key out of the
    * snapshot entirely.
    * @param deleteCol boolean column marking delete operations
    * @param payload   columns to carry into the snapshot
    * @return one row per surviving key: (key, payload...) */
  def mergeLatest(log: DataFrame, keyCol: String, timeCol: String,
                  tieCol: String, deleteCol: String,
                  payload: Seq[String]): DataFrame = {
    val latest = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col(tieCol).desc)
    log
      .withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1 && !col(deleteCol))
      .select((keyCol +: payload).map(col): _*)
  }
}

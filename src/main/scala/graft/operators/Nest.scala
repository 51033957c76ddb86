package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The inverse of [[Flatten]]: collapse flat rows into one row per
  * key with an array-of-struct column — how nested fixtures,
  * document+chunks layouts, and list-valued training examples get
  * BUILT. One map-combined hash-aggregate shuffle on the keys; the
  * array is sorted by the given order columns so the nested result
  * is deterministic (collect_list alone has no intra-group order
  * guarantee — whatever partition order the shuffle delivers).
  *
  * `Nest.nest(df, Seq("o_orderkey"), Seq("l_linenumber", "l_quantity"),
  * "items", sortBy = Seq("l_linenumber"))` then `Flatten.flatten`
  * round-trips to the original rows (FlattenSpec pins it).
  */
object Nest {

  def nest(df: DataFrame, keys: Seq[String], payload: Seq[String],
           as: String, sortBy: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "nest requires at least one key column")
    require(payload.nonEmpty, "nest requires at least one payload column")
    val order = if (sortBy.isEmpty) payload else sortBy
    require(order.forall(payload.contains),
      s"sortBy columns ${order.filterNot(payload.contains)} must be in the payload")
    // array_sort compares the whole struct, and Spark cannot order
    // maps — fail fast with guidance instead of a late AnalysisException
    payload.foreach { p =>
      require(!df.schema(p).dataType.isInstanceOf[org.apache.spark.sql.types.MapType],
        s"payload column '$p' is a map (unorderable in Spark); convert it " +
          "with map_entries() before nesting")
    }
    // sort key rides first inside the struct so array_sort's natural
    // struct ordering sorts by it, then the payload is re-projected
    val tagged = struct((order ++ payload.filterNot(order.contains))
      .map(col): _*)
    val sorted = array_sort(collect_list(tagged))
    val reproject: Column = transform(sorted,
      e => struct(payload.map(p => e.getField(p).as(p)): _*))
    df.groupBy(keys.map(col): _*).agg(reproject.as(as))
  }
}

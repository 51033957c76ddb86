package graft.operators

import scala.collection.mutable

/** Flat-column naming strategies; mirrors the reference's NameStrategy
  * (nodes.py:165-169) and its resolution algorithm (nodes.py:192-241).
  */
sealed trait NameStrategy
object NameStrategy {
  /** Leaf name; on collision prepend parent segments until unique,
    * skipping segments shared by the whole conflict group. */
  case object ConcatenateConflicts extends NameStrategy
  /** Like ConcatenateConflicts but keeps shared segments too. */
  case object ConcatenateConflictsVerbose extends NameStrategy
  /** Always the full root-to-leaf path joined with '_'. */
  case object ConcatenateAlways extends NameStrategy
  /** Reference returns pandas MultiIndex tuples (nodes.py:201-205);
    * Spark has no multi-level column names, so [[Flatten]] joins the
    * reversed path with '.' instead (documented divergence,
    * SURVEY.md §2.4). [[NameResolution.multiIndexNames]] exposes the
    * exact padded-tuple form for parity testing.
    */
  case object MultiIndex extends NameStrategy
}

object NameResolution {
  val separator = "_"

  /** Resolve names for leaf-first paths (leaf segment first, root
    * last, matching how the reference accumulates them,
    * nodes.py:367). Throws if the result is not unique
    * (nodes.py:192-197).
    */
  def columnNames(strategy: NameStrategy, names: Seq[List[String]]): Seq[String] = {
    val resolved = strategy match {
      case NameStrategy.MultiIndex =>
        multiIndexNames(names).map(_.filter(_.nonEmpty).mkString("."))
      case NameStrategy.ConcatenateAlways =>
        names.map(_.reverse.mkString(separator))
      case NameStrategy.ConcatenateConflicts =>
        resolveNames(names, verbose = false)
      case NameStrategy.ConcatenateConflictsVerbose =>
        resolveNames(names, verbose = true)
    }
    if (resolved.distinct.size != resolved.size)
      throw new IllegalArgumentException("Resolved names were not unique")
    resolved
  }

  /** Root-first tuples padded with "" to uniform length (nodes.py:201-205). */
  def multiIndexNames(names: Seq[List[String]]): Seq[Vector[String]] = {
    val max = if (names.isEmpty) 0 else names.map(_.size).max
    names.map(n => (n.reverse.toVector ++ Vector.fill(max - n.size)("")))
  }

  /** Metadata key under which [[Flatten]] attaches the padded
    * MultiIndex tuple to each output column. */
  val multiIndexKey = "graft.multiIndex"

  /** Read back the MultiIndex tuples a MultiIndex-strategy flatten
    * attached (column name -> root-first padded tuple) — the export
    * surface for pandas-side consumers. Spark column metadata rides
    * the schema, so it survives parquet round-trips (the footer
    * stores the full Spark schema) and reaches Arrow-based readers.
    */
  def multiIndexOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.schema.fields.iterator.collect {
      case f if f.metadata.contains(multiIndexKey) =>
        f.name -> f.metadata.getStringArray(multiIndexKey).toSeq
    }.toMap

  /** Exact port of the fixpoint in nodes.py:218-241, including the
    * quirk that `is_resolved` is overwritten per conflicting group in
    * encounter order.
    */
  private def resolveNames(names: Seq[List[String]], verbose: Boolean): Seq[String] = {
    final class R(var remaining: List[String], var resolved: String)
    val rs: Vector[R] = names.iterator.map {
      case head :: tail => new R(tail, head)
      case Nil          => new R(Nil, "")
    }.toVector

    var isResolved = false
    while (!isResolved) {
      // group by current resolved name, preserving first-encounter order
      val groups = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[R]]
      rs.foreach(r => groups.getOrElseUpdate(r.resolved, mutable.ArrayBuffer.empty) += r)
      isResolved = true
      for (group <- groups.valuesIterator if group.size > 1) {
        val prefixes = group.map { r =>
          r.remaining match {
            case h :: t => r.remaining = t; h
            case Nil    => ""
          }
        }
        isResolved = group.forall(_.remaining.isEmpty)
        if (prefixes.distinct.size > 1 || verbose) {
          group.iterator.zip(prefixes.iterator).foreach { case (r, p) =>
            if (r.resolved.isEmpty) r.resolved = p
            else if (p.nonEmpty) r.resolved = p + separator + r.resolved
          }
        }
      }
    }
    rs.map(_.resolved)
  }
}

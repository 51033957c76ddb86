package graft.operators

/** Column inclusion/exclusion ("clusion") specs.
  *
  * Re-expresses the reference's clusion system (see
  * /root/reference/python/bamboo/clusions.py:23-115) in Scala: dotted
  * path strings, lists of specs, and nested maps all merge into a
  * single [[Clusion]] tree, which combines with an exclusion tree into
  * a [[ColumnFilter]] used for decode-time schema pruning (the Spark
  * analog of the reference's Avro reader-schema rewrite,
  * avro_direct.cpp:107-166).
  */
sealed trait ClusionInput
object ClusionInput {
  /** No spec given (python `None`). */
  case object Empty extends ClusionInput
  /** A dotted path, e.g. "a.b.c". */
  final case class Path(path: String) extends ClusionInput
  /** A list of specs, merged. */
  final case class Many(items: Seq[ClusionInput]) extends ClusionInput
  /** A map spec: dotted-key -> sub-spec (python dict form). */
  final case class Tree(fields: Seq[(String, ClusionInput)]) extends ClusionInput

  import scala.language.implicitConversions
  implicit def fromString(s: String): ClusionInput = Path(s)
  implicit def fromStrings(s: Seq[String]): ClusionInput = Many(s.map(Path))
}

/** A merged clusion tree: `explicit` marks a node that was named as a
  * terminal in some spec; `leaves` are the child fields mentioned.
  * Mirrors clusions.py:23-29.
  */
final case class Clusion(explicit: Boolean, leaves: Map[String, Clusion]) {
  def subtreeExplicit: Boolean = explicit || leaves.valuesIterator.exists(_.subtreeExplicit)
}

/** Combined include/exclude filter per field; mirrors the reference's
  * ColumnFilter (columns.hpp:405-427). If any include exists anywhere
  * in the tree, the default flips from include-all to exclude-all.
  */
final case class ColumnFilter(includeExplicit: Boolean, excludeExplicit: Boolean,
                              fields: Map[String, ColumnFilter]) {
  def hasIncludes: Boolean = includeExplicit || fields.valuesIterator.exists(_.hasIncludes)
}

object Clusions {
  import ClusionInput._

  /** Port of clusions.py:67-88 `parse_clusions`. */
  def parse(spec: ClusionInput): Clusion = spec match {
    case Empty      => Clusion(explicit = false, Map.empty)
    case Path(p)    => splitPath(p)._1
    case Many(xs)   => recursiveMerge(xs.map(parse))
    case Tree(fs) =>
      if (fs.isEmpty) Clusion(explicit = true, Map.empty)
      else {
        val roots = fs.map { case (k, v) =>
          val (root, leafName) = splitPath(k)
          // graft the sub-spec under the deepest segment of the key
          replaceLeaf(root, leafName, parse(v))
        }
        recursiveMerge(roots)
      }
  }

  /** Port of clusions.py:54-64 `split_str_clusion`: returns the chain
    * Clusion for a dotted path plus the deepest segment's name.
    */
  private def splitPath(p: String): (Clusion, String) = {
    val idx = p.indexOf('.')
    if (idx >= 0) {
      val (child, leaf) = splitPath(p.substring(idx + 1))
      (Clusion(explicit = false, Map(p.substring(0, idx) -> child)), leaf)
    } else {
      require(p.nonEmpty, "Empty field names are not allowed")
      (Clusion(explicit = false, Map(p -> Clusion(explicit = true, Map.empty))), p)
    }
  }

  /** Replace the unique deepest-chain leaf named `leafName` with `sub`. */
  private def replaceLeaf(c: Clusion, leafName: String, sub: Clusion): Clusion =
    c.leaves.get(leafName) match {
      case Some(l) if l.explicit && l.leaves.isEmpty =>
        c.copy(leaves = c.leaves.updated(leafName, sub))
      case _ =>
        c.copy(leaves = c.leaves.map { case (k, v) => k -> replaceLeaf(v, leafName, sub) })
    }

  /** Port of clusions.py:32-51 `recursive_merge`. */
  def recursiveMerge(clusions: Seq[Clusion]): Clusion =
    if (clusions.isEmpty) Clusion(explicit = true, Map.empty)
    else {
      val explicit = clusions.exists(_.explicit)
      val keys = clusions.iterator.flatMap(_.leaves.keysIterator).toSeq.distinct
      val leaves = keys.map { k =>
        k -> recursiveMerge(clusions.flatMap(_.leaves.get(k)))
      }.toMap
      Clusion(explicit, leaves)
    }

  /** Port of clusions.py:91-115 `convert_clusions` + `recurse_clusions`:
    * zip include and exclude trees into one filter, rejecting a field
    * that is both explicitly included and excluded.
    */
  def convert(include: ClusionInput, exclude: ClusionInput): ColumnFilter =
    recurse(parse(include), parse(exclude))

  private val emptyClusion = Clusion(explicit = false, Map.empty)

  private def recurse(inc: Clusion, exc: Clusion): ColumnFilter = {
    if (inc.explicit && exc.explicit)
      throw new IllegalArgumentException("Cannot both include and exclude a field")
    val keys = (inc.leaves.keySet ++ exc.leaves.keySet).toSeq
    val fields = keys.map { k =>
      k -> recurse(inc.leaves.getOrElse(k, emptyClusion), exc.leaves.getOrElse(k, emptyClusion))
    }.toMap
    ColumnFilter(inc.explicit, exc.explicit, fields)
  }

  /** Flatten-style clusions: a set of dotted field paths (the reference
    * resolves these to node identities, nodes.py:392-401; arrays are
    * transparent — list nodes delegate name lookup to their child).
    */
  def paths(spec: ClusionInput): Set[List[String]] = spec match {
    case Empty    => Set.empty
    case Path(p)  => Set(p.split('.').toList)
    case Many(xs) => xs.flatMap(paths).toSet
    case Tree(fs) =>
      fs.flatMap { case (k, v) =>
        val prefix = k.split('.').toList
        val sub = paths(v)
        if (sub.isEmpty) Set(prefix) else sub.map(prefix ++ _)
      }.toSet
  }
}

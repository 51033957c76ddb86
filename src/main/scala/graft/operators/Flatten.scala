package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode, explode_outer, map_entries}
import org.apache.spark.sql.types._

/** Strategies for expanding list (array) columns; mirrors
  * FlattenStrategy (nodes.py:159-163).
  */
sealed trait FlattenStrategy
object FlattenStrategy {
  /** Only explicitly included array fields are expanded. */
  case object FlattenExplicit extends FlattenStrategy
  /** On sibling-array conflict, drop the array-bearing branches and
    * keep scalar fields (nodes.py:344-346). */
  case object FlattenAvailable extends FlattenStrategy
  /** Expand every array; sibling-array conflict is an error. */
  case object FlattenAll extends FlattenStrategy
}

/** Join semantics of the expansion; mirrors JoinType (nodes.py:172-174).
  * The reference implements only Inner (Outer raises
  * NotImplementedError, nodes.py:326-327); we implement both — Outer
  * maps to `explode_outer`, keeping parents of null/empty lists.
  */
sealed trait FlattenJoin
object FlattenJoin {
  case object Inner extends FlattenJoin
  case object Outer extends FlattenJoin
}

/** The engine's core operator: project a flattenable subset of a
  * nested DataFrame into a flat one by repeating parent values along
  * list elements — a pure schema walk that emits a chain of
  * `select` + `explode` (Catalyst Generate+Project), the Spark-native
  * form of the reference's np.repeat index expansion
  * (nodes.py:298-390). Narrow transformation: no shuffle at any scale,
  * and nested-schema pruning pushes the touched subfields into the
  * scan.
  *
  * Semantics matched to the reference:
  *  - single-list-path rule: at most one subtree per record level may
  *    contain an expanded list; conflicts throw (nodes.py:341-349)
  *    or, under FlattenAvailable, drop the list branches;
  *  - inner semantics: a record whose list is null or empty
  *    contributes zero rows for all columns of that flatten
  *    (node_tests.py:151-159) — exactly `explode`;
  *  - an array whose included child-set is empty vanishes entirely,
  *    leaving scalar siblings unexpanded (nodes.py:373-374);
  *  - name resolution per [[NameStrategy]] (nodes.py:192-241).
  *
  * Divergence (SURVEY.md §7.4): scalar nulls stay true SQL nulls by
  * default instead of pandas fill values — `fillLikePandas = true`
  * opts into the reference's exact fill behavior (nodes.py:70-78:
  * int -> 0, float -> NaN, bool -> False, object -> None) for
  * migrating users.
  */
object Flatten {
  import ClusionInput.Empty

  def flatten(df: DataFrame,
              strategy: FlattenStrategy = FlattenStrategy.FlattenAll,
              nameStrategy: NameStrategy = NameStrategy.ConcatenateConflicts,
              join: FlattenJoin = FlattenJoin.Inner,
              include: ClusionInput = Empty,
              exclude: ClusionInput = Empty,
              fillLikePandas: Boolean = false): DataFrame = {
    val includePaths = Clusions.paths(include)
    val excludePaths = Clusions.paths(exclude)
    includePaths.intersect(excludePaths).headOption.foreach { p =>
      throw new IllegalArgumentException(
        s"Node is both explicitly included and excluded: ${p.mkString(".")}")
    }
    (includePaths ++ excludePaths).foreach(validatePath(df.schema, _))

    val plan = walkRecord(df.schema, Nil, strategy,
      implicitInclude = includePaths.isEmpty, includePaths, excludePaths)

    if (plan.leaves.isEmpty) return df.sparkSession.emptyDataFrame

    val explodeFn: Column => Column =
      if (join == FlattenJoin.Outer) explode_outer else explode

    // Execute the explode chain. Frame 0 is the original row; spine op
    // i explodes an array reachable from frame i, producing frame i+1.
    // Leaves materialize into temp columns when their frame is current
    // and pass through subsequent selects.
    val temps = plan.leaves.indices.map(i => s"__c$i")
    def frameCol(frame: Int, path: List[String]): Column = {
      val segs = if (frame == 0) path else s"__g$frame" :: path
      require(segs.nonEmpty, "cannot reference the root frame itself")
      col(segs.map(s => s"`${s.replace("`", "``")}`").mkString("."))
    }
    var cur = df
    val materialized = Array.fill(plan.leaves.size)(false)
    plan.spine.zipWithIndex.foreach { case (op, i) =>
      val pass = plan.leaves.indices.filter(materialized(_)).map(j => col(temps(j)))
      val mats = plan.leaves.zipWithIndex.collect {
        case (l, j) if l.frame == i =>
          materialized(j) = true
          frameCol(i, l.path).as(temps(j))
      }
      val raw = frameCol(i, op.path)
      val src = if (op.isMap) map_entries(raw) else raw
      cur = cur.select((pass ++ mats :+ explodeFn(src).as(s"__g${i + 1}")): _*)
    }
    val lastFrame = plan.spine.size
    val namePathsLeafFirst = plan.leaves.map(_.namePath.reverse)
    val resolved = NameResolution.columnNames(nameStrategy, namePathsLeafFirst)
    // MultiIndex strategy: the exact padded tuples ride each output
    // column as schema metadata (persisted by parquet, visible to
    // Arrow consumers) — the export the flat dotted names can't carry
    val miMeta: Option[Seq[Metadata]] =
      if (nameStrategy == NameStrategy.MultiIndex)
        Some(NameResolution.multiIndexNames(namePathsLeafFirst).map(t =>
          new MetadataBuilder()
            .putStringArray(NameResolution.multiIndexKey, t.toArray).build()))
      else None
    val out = plan.leaves.zipWithIndex.map { case (l, j) =>
      val c = if (materialized(j)) col(temps(j)) else frameCol(lastFrame, l.path)
      miMeta.fold(c.as(resolved(j)))(ms => c.as(resolved(j), ms(j)))
    }
    val flat = cur.select(out: _*)
    if (!fillLikePandas) flat else fillNulls(flat)
  }

  /** The reference's pandas fill values (nodes.py:70-78, pinned by
    * node_tests.py:141-149,208): null integers become 0, null
    * floats NaN, null booleans false; strings/binary (numpy object
    * dtype) keep None. Pure projection — stays narrow and
    * codegen'd. */
  private def fillNulls(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    df.select(df.schema.fields.map { f =>
      val c = col(s"`${f.name.replace("`", "``")}`")
      val filled = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          coalesce(c, lit(0).cast(f.dataType))
        case FloatType => coalesce(c, lit(Float.NaN))
        case DoubleType => coalesce(c, lit(Double.NaN))
        case BooleanType => coalesce(c, lit(false))
        case _ => c
      }
      filled.as(f.name)
    }: _*)
  }

  /** Pre-flight check used by callers that want the reference's
    * conflict error without running the full flatten. */
  def checkConflicts(schema: StructType,
                     include: ClusionInput = Empty,
                     exclude: ClusionInput = Empty): Unit = {
    val inc = Clusions.paths(include)
    walkRecord(schema, Nil, FlattenStrategy.FlattenAll, inc.isEmpty, inc, Clusions.paths(exclude))
    ()
  }

  // ---- planner -----------------------------------------------------

  /** namePath: root-first full field path (for naming); frame: spine
    * frame the leaf is read from; path: field path within that frame.
    */
  private final case class Leaf(namePath: List[String], frame: Int, path: List[String])

  /** One explode step: the path of the list (relative to its frame)
    * and whether it is a MapType column — maps expand through
    * map_entries into {key, value} records, the Spark form of the
    * reference's dict-as-list-of-KV emulation (obj.py:69-76). */
  private final case class SpineOp(path: List[String], isMap: Boolean)

  /** leaves in DFS field order; spine(i) = the list to explode,
    * relative to frame i (empty path for array-of-array levels).
    */
  private final case class Sub(leaves: Vector[Leaf], spine: Vector[SpineOp]) {
    def isEmpty: Boolean = leaves.isEmpty
    def hasList: Boolean = spine.nonEmpty
  }

  private[graft] def validatePath(schema: StructType, path: List[String]): Unit = {
    var dt: DataType = schema
    path.foreach { seg =>
      dt = stripArrays(dt) match {
        case st: StructType =>
          st.fields.find(_.name == seg).map(_.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"Unknown field '$seg' in clusion path '${path.mkString(".")}'"))
        case other =>
          throw new IllegalArgumentException(
            s"Field '$seg' in clusion path '${path.mkString(".")}' is not a record ($other)")
      }
    }
  }

  @annotation.tailrec
  private def stripArrays(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => stripArrays(e)
    case mt: MapType => StructType(Seq(
      StructField("key", mt.keyType, nullable = false),
      StructField("value", mt.valueType, mt.valueContainsNull)))
    case d => d
  }

  /** Prepend a field name to everything anchored in the sub-plan's
    * root frame: frame-0 leaf paths and the first spine op (which by
    * construction lives in frame 0). */
  private def prepend(name: String, sub: Sub): Sub = Sub(
    sub.leaves.map(l => if (l.frame == 0) l.copy(path = name :: l.path) else l),
    sub.spine.zipWithIndex.map { case (op, i) =>
      if (i == 0) op.copy(path = name :: op.path) else op })

  private def walkRecord(st: StructType, fieldPath: List[String], strategy: FlattenStrategy,
                         implicitInclude: Boolean,
                         include: Set[List[String]], exclude: Set[List[String]]): Sub = {
    val children = st.fields.toVector.flatMap { f =>
      val p = fieldPath :+ f.name
      val explicitInc = include.contains(p)
      val explicitExc = exclude.contains(p)
      val included = explicitInc || (implicitInclude && !explicitExc)
      val sub = walkField(f.dataType, p, strategy, included, explicitInc, include, exclude)
      if (sub.isEmpty) None else Some(prepend(f.name, sub))
    }
    val nLists = children.count(_.hasList)
    if (nLists > 1) {
      if (strategy == FlattenStrategy.FlattenAvailable)
        combine(children.filterNot(_.hasList))
      else
        throw new IllegalArgumentException("Attempted to flatten conflicting lists")
    } else combine(children)
  }

  /** Merge sibling subtrees: leaves keep DFS field order; at most one
    * child carries the spine (enforced by the caller). */
  private def combine(children: Vector[Sub]): Sub =
    Sub(children.flatMap(_.leaves),
        children.collectFirst { case c if c.hasList => c.spine }.getOrElse(Vector.empty))

  private def walkField(dt: DataType, fieldPath: List[String], strategy: FlattenStrategy,
                        included: Boolean, explicitHere: Boolean,
                        include: Set[List[String]], exclude: Set[List[String]]): Sub =
    dt match {
      case st: StructType =>
        walkRecord(st, fieldPath, strategy, included, include, exclude)
      case at: ArrayType =>
        expandList(at.elementType, isMap = false, fieldPath, strategy, included,
          explicitHere, include, exclude)
      case mt: MapType =>
        // a map flattens as a list of {key, value} records, mirroring
        // the reference's dict-as-list-of-KV shape (obj.py:69-76)
        val kv = StructType(Seq(
          StructField("key", mt.keyType, nullable = false),
          StructField("value", mt.valueType, mt.valueContainsNull)))
        expandList(kv, isMap = true, fieldPath, strategy, included,
          explicitHere, include, exclude)
      case NullType =>
        // IncompleteNode analog: a column whose type was never
        // determined is dropped entirely (nodes.py:384-385).
        Sub(Vector.empty, Vector.empty)
      case _ =>
        if (included) Sub(Vector(Leaf(fieldPath, 0, Nil)), Vector.empty)
        else Sub(Vector.empty, Vector.empty)
    }

  private def expandList(elem: DataType, isMap: Boolean, fieldPath: List[String],
                         strategy: FlattenStrategy, included: Boolean,
                         explicitHere: Boolean, include: Set[List[String]],
                         exclude: Set[List[String]]): Sub = {
    val expand = strategy match {
      case FlattenStrategy.FlattenAll | FlattenStrategy.FlattenAvailable => true
      case FlattenStrategy.FlattenExplicit => explicitHere
    }
    if (!expand) Sub(Vector.empty, Vector.empty)
    else {
      val sub = walkField(elem, fieldPath, strategy, included, explicitHere,
        include, exclude)
      if (sub.isEmpty) sub
      else
        // This list becomes a new spine op (path filled in by the
        // enclosing record's prepend); child frames shift by one.
        Sub(sub.leaves.map(l => l.copy(frame = l.frame + 1)),
            SpineOp(Nil, isMap) +: sub.spine)
    }
  }
}

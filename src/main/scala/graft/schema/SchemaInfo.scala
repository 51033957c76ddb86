package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Compact schema-tree renderer matching the reference's
  * `node.info()` / `str(node)` output (nodes.py:265-295 TextTree and
  * the per-node `_info` methods, nodes.py:447-525): records indent
  * their fields, list levels contribute a `[]` suffix, and leaves
  * append a numpy-style dtype name, e.g.
  *
  * {{{
  * - d []
  *     - b []float64
  * - e float64
  * }}}
  */
object SchemaInfo {

  /** TextTree port (nodes.py:265-295). `text` is the node label (None
    * for structural nodes), `parentSuffix` accumulates `[]` / dtype.
    */
  private final case class TextTree(text: Option[String], parentSuffix: Option[String],
                                    subnodes: Seq[TextTree]) {
    def render(indent: Int = 0, indentStep: Int = 4, prefix: String = "- "): String = {
      val suffix = renderSuffix(stop = false)
      val (newIndent, own) = text match {
        case Some(t) => (indent + indentStep, Seq(" " * indent + prefix + t + " " + suffix))
        case None    => (indent, Seq.empty)
      }
      val subs = subnodes.map(_.render(newIndent, indentStep, prefix))
      (own ++ subs).filter(_.nonEmpty).mkString("\n")
    }

    private def renderSuffix(stop: Boolean): String =
      if (text.isDefined && stop) ""
      else parentSuffix.getOrElse("") + subnodes.map(_.renderSuffix(stop = true)).mkString
  }

  def render(df: DataFrame): String = render(df.schema)

  def render(schema: StructType, depth: Int = 3): String = recordInfo(schema, depth).render()

  private def recordInfo(st: StructType, depth: Int): TextTree =
    TextTree(None, None, st.fields.toSeq.map(f =>
      TextTree(Some(f.name), None, Seq(info(f.dataType, depth - 1)))))

  private def info(dt: DataType, depth: Int): TextTree = dt match {
    case st: StructType => recordInfo(st, depth)
    case ArrayType(elem, _) => TextTree(None, Some("[]"), Seq(info(elem, depth)))
    case NullType => TextTree(None, None, Seq.empty) // IncompleteNode analog
    case other => TextTree(None, Some(dtypeName(other)), Seq.empty)
  }

  /** numpy-style dtype names as the reference prints them
    * (PrimitiveNode._info renders the numpy dtype, nodes.py:512-513).
    */
  def dtypeName(dt: DataType): String = dt match {
    case DoubleType => "float64"
    case FloatType => "float32"
    case LongType => "int64"
    case IntegerType => "int32"
    case ShortType => "int16"
    case ByteType => "int8"
    case BooleanType => "bool"
    case StringType => "object"
    case BinaryType => "object"
    case TimestampType => "datetime64[us]"
    case DateType => "datetime64[D]"
    case _: DecimalType => "object"
    case other => other.simpleString
  }
}

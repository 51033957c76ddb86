package graft

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import graft.operators.{ClusionInput, Flatten, FlattenJoin, FlattenStrategy, NameStrategy}
import graft.operators.ClusionInput.Empty
import graft.schema.SchemaInfo
import graft.sources.{ArrowSource, Sources}
import graft.sources.pbd.PbdSource

/** The engine's front door — the reference's public API
  * (`from_json / from_avro / from_arrow / from_pbd / from_object` +
  * `node.flatten / node.info`, python/bamboo/__init__.py:1-4 and
  * core.py:30-54) re-expressed as one fluent Scala surface, so a
  * reference user can port call sites one-to-one:
  *
  * {{{
  * import graft.Graft
  * val flat = Graft.fromJson(spark, path, include = Seq("a.b"))
  *   .flatten(join = FlattenJoin.Inner)
  * println(Graft.fromAvro(spark, path).info())
  * }}}
  *
  * Everything returns a [[GraftFrame]] (a thin wrapper that converts
  * implicitly to `DataFrame`), so the full Spark API stays in reach
  * at any point in the chain.
  */
object Graft {

  def fromJson(spark: SparkSession, path: String,
               include: ClusionInput = Empty,
               exclude: ClusionInput = Empty,
               wholeDocument: Boolean = false): GraftFrame =
    GraftFrame(Sources.readJson(spark, path, include, exclude,
      wholeDocument = wholeDocument))

  def fromAvro(spark: SparkSession, path: String,
               include: ClusionInput = Empty,
               exclude: ClusionInput = Empty): GraftFrame =
    GraftFrame(Sources.readAvro(spark, path, include, exclude))

  def fromParquet(spark: SparkSession, path: String,
                  include: ClusionInput = Empty,
                  exclude: ClusionInput = Empty): GraftFrame =
    GraftFrame(Sources.readParquet(spark, path, include, exclude))

  def fromOrc(spark: SparkSession, path: String,
              include: ClusionInput = Empty,
              exclude: ClusionInput = Empty): GraftFrame =
    GraftFrame(Sources.readOrc(spark, path, include, exclude))

  def fromArrow(spark: SparkSession, path: String): GraftFrame =
    GraftFrame(ArrowSource.fromArrowStream(spark, path))

  def fromPbd(spark: SparkSession, path: String,
              include: ClusionInput = Empty,
              exclude: ClusionInput = Empty): GraftFrame =
    GraftFrame(PbdSource.read(spark, path, include, exclude))

  def fromObjects[T: Encoder](spark: SparkSession, values: Seq[T]): GraftFrame =
    GraftFrame(Sources.fromObjects(spark, values).toDF())

  /** Wrap an existing DataFrame (any source, any transforms). */
  def apply(df: DataFrame): GraftFrame = GraftFrame(df)
}

/** A nested frame with the reference's node methods. */
final case class GraftFrame(df: DataFrame) {

  /** `node.flatten(...)` (nodes.py:298-312): explode-chain planning,
    * single-list-path rule, clusions, name resolution. Returns a
    * [[GraftFrame]] so node methods keep chaining; the implicit
    * conversion hands back a `DataFrame` wherever one is expected. */
  def flatten(strategy: FlattenStrategy = FlattenStrategy.FlattenAll,
              nameStrategy: NameStrategy = NameStrategy.ConcatenateConflicts,
              join: FlattenJoin = FlattenJoin.Inner,
              include: ClusionInput = Empty,
              exclude: ClusionInput = Empty,
              fillLikePandas: Boolean = false): GraftFrame =
    GraftFrame(Flatten.flatten(df, strategy, nameStrategy, join, include,
      exclude, fillLikePandas))

  /** `node.info(depth)` (nodes.py:406-413): compact schema tree. */
  def info(depth: Int = 3): String = SchemaInfo.render(df.schema, depth)

  /** `node.a.b` attribute navigation (nodes.py:415-416). */
  def apply(path: String): Column = df(path)

  def toDF: DataFrame = df
}

object GraftFrame {
  import scala.language.implicitConversions
  implicit def toDataFrame(gf: GraftFrame): DataFrame = gf.df
}

package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.{Flatten, FlattenJoin, NameResolution, NameStrategy}

/** Property tests (SURVEY.md §5 plan) over seeded random cases:
  * flatten row counts follow the list-length algebra; name
  * resolution is total and unique on distinct paths.
  */
class PropertySpec extends SparkSpec {

  private def randomLists(rng: Random): List[Option[List[Double]]] =
    List.fill(8)(
      if (rng.nextDouble() < 0.25) None
      else Some(List.fill(rng.nextInt(6))(rng.nextDouble() * 20 - 10)))

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("xs", ArrayType(DoubleType))))

  private def toDf(rows: List[Option[List[Double]]]) = {
    val data = rows.zipWithIndex.map { case (xs, i) => Row(i, xs.map(_.toSeq).orNull) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  test("flatten row count = sum of non-null list lengths (inner)") {
    val rng = new Random(42)
    (1 to 20).foreach { _ =>
      val rows = randomLists(rng)
      assert(Flatten.flatten(toDf(rows)).count() ==
        rows.flatMap(_.toList).map(_.size).sum)
    }
  }

  test("outer flatten row count = inner + null-or-empty parents") {
    val rng = new Random(7)
    (1 to 20).foreach { _ =>
      val rows = randomLists(rng)
      val outer = Flatten.flatten(toDf(rows), join = FlattenJoin.Outer)
      val emptyish = rows.count(r => r.isEmpty || r.exists(_.isEmpty))
      assert(outer.count() == rows.flatMap(_.toList).map(_.size).sum + emptyish)
    }
  }

  private def randomPath(rng: Random): List[String] =
    List.fill(1 + rng.nextInt(4))(Seq("a", "b", "c", "d", "x")(rng.nextInt(5)))

  test("ConcatenateAlways yields unique names for distinct paths") {
    val rng = new Random(11)
    (1 to 200).foreach { _ =>
      val paths = List.fill(6)(randomPath(rng)).distinct
      val resolved = NameResolution.columnNames(NameStrategy.ConcatenateAlways, paths)
      assert(resolved.size == resolved.distinct.size)
    }
  }

  test("conflict strategies agree with ConcatenateAlways on singleton paths") {
    val rng = new Random(13)
    (1 to 100).foreach { _ =>
      val paths = List.fill(5)(Seq("a", "b", "c", "d", "x")(rng.nextInt(5)))
        .distinct.map(List(_))
      val a = NameResolution.columnNames(NameStrategy.ConcatenateConflicts, paths)
      val b = NameResolution.columnNames(NameStrategy.ConcatenateAlways, paths)
      assert(a == b)
    }
  }

  test("resolution never invents segments and stays unique when it returns") {
    val rng = new Random(17)
    (1 to 200).foreach { _ =>
      val paths = List.fill(5)(randomPath(rng)).distinct
      try {
        val resolved = NameResolution.columnNames(
          NameStrategy.ConcatenateConflicts, paths)
        assert(resolved.size == resolved.distinct.size)
        resolved.zip(paths).foreach { case (name, path) =>
          assert(name.split('_').forall(path.contains(_)))
        }
      } catch {
        // degenerate conflicts (exhausted differentiating segments)
        // legally throw per the reference (nodes.py:195-197)
        case _: IllegalArgumentException => ()
      }
    }
  }
}

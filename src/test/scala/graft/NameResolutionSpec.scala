package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{NameResolution, NameStrategy}
import NameStrategy._

/** Goldens transcribed from the reference's ColumnNameTests
  * (/root/reference/python/bamboo_tests/node_tests.py:37-89). Names
  * are leaf-first paths.
  */
class NameResolutionSpec extends AnyFunSuite {
  private def names(s: NameStrategy, n: List[List[String]]) =
    NameResolution.columnNames(s, n).toList

  test("single resolution") {
    val n = List(List("a"))
    assert(names(ConcatenateConflicts, n) == List("a"))
    assert(names(ConcatenateConflictsVerbose, n) == List("a"))
    assert(names(ConcatenateAlways, n) == List("a"))
  }

  test("simple resolution") {
    val n = List(List("a"), List("b"))
    assert(names(ConcatenateConflicts, n) == List("a", "b"))
    assert(names(ConcatenateConflictsVerbose, n) == List("a", "b"))
    assert(names(ConcatenateAlways, n) == List("a", "b"))
  }

  test("partial conflict resolution") {
    val n = List(List("a", "a"), List("a", "b"), List("c", "d"))
    assert(names(ConcatenateConflicts, n) == List("a_a", "b_a", "c"))
    assert(names(ConcatenateConflictsVerbose, n) == List("a_a", "b_a", "c"))
    assert(names(ConcatenateAlways, n) == List("a_a", "b_a", "d_c"))
  }

  test("overlapping names") {
    val n = List(List("b"), List("b", "a"), List("b", "a", "z"))
    assert(names(ConcatenateConflicts, n) == List("b", "a_b", "z_a_b"))
    assert(names(ConcatenateConflictsVerbose, n) == List("b", "a_b", "z_a_b"))
    assert(names(ConcatenateAlways, n) == List("b", "a_b", "z_a_b"))
  }

  test("exact match throws") {
    assertThrows[IllegalArgumentException] {
      names(ConcatenateConflicts, List(List("b"), List("b")))
    }
  }

  test("verbose conflict resolution") {
    val n = List(List("d", "c", "a"), List("d", "c", "b"))
    assert(names(ConcatenateConflicts, n) == List("a_d", "b_d"))
    assert(names(ConcatenateConflictsVerbose, n) == List("a_c_d", "b_c_d"))
    assert(names(ConcatenateAlways, n) == List("a_c_d", "b_c_d"))
  }

  test("tuple naming (multi-index)") {
    val n = List(List("c", "a"), List("b"))
    assert(NameResolution.multiIndexNames(n) ==
      List(Vector("a", "c"), Vector("b", "")))
    // Spark-side divergence: dotted names
    assert(names(MultiIndex, n) == List("a.c", "b"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Clusion, ClusionInput, Clusions}
import ClusionInput._

/** Transcribed from /root/reference/python/bamboo_tests/clusion_tests.py. */
class ClusionsSpec extends AnyFunSuite {
  private def C(explicit: Boolean, leaves: (String, Clusion)*) = Clusion(explicit, leaves.toMap)

  test("str") {
    assert(Clusions.parse(Path("a")) == C(false, "a" -> C(true)))
  }

  test("list") {
    assert(Clusions.parse(Many(Seq(Path("a"), Path("b")))) ==
      C(false, "a" -> C(true), "b" -> C(true)))
  }

  test("separators") {
    assert(Clusions.parse(Path("a.b.c")) ==
      C(false, "a" -> C(false, "b" -> C(false, "c" -> C(true)))))
  }

  test("merging") {
    val spec = Many(Seq(
      Tree(Seq("a" -> Tree(Seq("b" -> Tree(Seq.empty))))),
      Tree(Seq("a" -> Tree(Seq("b" -> Tree(Seq("c" -> Tree(Seq.empty)))))))))
    assert(Clusions.parse(spec) ==
      C(false, "a" -> C(false, "b" -> C(true, "c" -> C(true)))))
  }

  test("merging with separators") {
    assert(Clusions.parse(Many(Seq(Path("a.b.c"), Path("a.b.d")))) ==
      C(false, "a" -> C(false, "b" -> C(false, "c" -> C(true), "d" -> C(true)))))
  }

  test("dict") {
    assert(Clusions.parse(Tree(Seq("a" -> Path("b")))) ==
      C(false, "a" -> C(false, "b" -> C(true))))
  }

  test("dict with separators") {
    assert(Clusions.parse(Tree(Seq("a.b" -> Path("c")))) ==
      C(false, "a" -> C(false, "b" -> C(false, "c" -> C(true)))))
  }

  test("empty dict") {
    assert(Clusions.parse(Tree(Seq.empty)) == C(true))
  }

  test("empty str throws") {
    assertThrows[IllegalArgumentException](Clusions.parse(Path("")))
  }

  test("empty list") {
    assert(Clusions.parse(Many(Seq.empty)) == C(true))
  }

  test("none") {
    assert(Clusions.parse(Empty) == C(false))
  }

  test("convert rejects include+exclude on the same field") {
    assertThrows[IllegalArgumentException](Clusions.convert(Path("a"), Path("a")))
  }

  test("paths") {
    assert(Clusions.paths(Many(Seq(Path("a.b"), Path("c")))) ==
      Set(List("a", "b"), List("c")))
  }
}

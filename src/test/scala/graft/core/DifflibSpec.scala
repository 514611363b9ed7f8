package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Goldens generated from CPython difflib.SequenceMatcher(None,a,b).get_opcodes(). */
class DifflibSpec extends AnyFunSuite {
  private def ops(a: String, b: String): List[(String, Int, Int, Int, Int)] =
    Difflib.opcodes(a, b).map(o => (o.tag, o.i1, o.i2, o.j1, o.j2))

  test("golden opcodes match CPython difflib") {
    assert(ops("Berln", "Berlin") == List(("equal",0,4,0,4), ("insert",4,4,4,5), ("equal",4,5,5,6)))
    assert(ops("14193", "14139") == List(("equal",0,3,0,3), ("insert",3,3,3,4), ("equal",3,4,4,5), ("delete",4,5,5,5)))
    assert(ops("", "") == Nil)
    assert(ops("abc", "") == List(("delete",0,3,0,0)))
    assert(ops("", "abc") == List(("insert",0,0,0,3)))
    assert(ops("kitten", "sitting") == List(("replace",0,1,0,1), ("equal",1,4,1,4),
      ("replace",4,5,4,5), ("equal",5,6,5,6), ("insert",6,6,6,7)))
    assert(ops("2023-01-02", "2023-01-02T00:00:00") == List(("equal",0,10,0,10), ("insert",10,10,10,19)))
    assert(ops("Potsdm", "Potsdam") == List(("equal",0,5,0,5), ("insert",5,5,5,6), ("equal",5,6,6,7)))
    assert(ops("aaaaab", "baaaaa") == List(("insert",0,0,0,1), ("equal",0,5,1,6), ("delete",5,6,6,6)))
    assert(ops("hello world", "helo wrld") == List(("equal",0,2,0,2), ("delete",2,3,2,2),
      ("equal",3,7,2,6), ("delete",7,8,6,6), ("equal",8,11,6,9)))
    assert(ops("abcabcabc", "abcXbcabY") == List(("equal",0,1,0,1), ("insert",1,1,1,4),
      ("equal",1,5,4,8), ("replace",5,9,8,9)))
    assert(ops("m.iau", "miau") == List(("equal",0,1,0,1), ("delete",1,2,1,1), ("equal",2,5,1,4)))
    assert(ops("?", "miau") == List(("replace",0,1,0,4)))
  }

  test("autojunk: popular elements in b of length>=200 are junked") {
    val a = "x" * 250 + "abc"
    val b = "x" * 250 + "abd"
    assert(ops(a, b) == List(("equal",0,252,0,252), ("replace",252,253,252,253)))
  }

  test("unicode categories match Python unicodedata.category") {
    assert(UnicodeCat.categories("Aa1 .!?€-_\t\n") ==
      Vector("Lu","Ll","Nd","Zs","Po","Po","Po","Sc","Pd","Pc","Cc","Cc"))
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the compat-function behaviors from reference tests.tcl:1108-1156. */
class TclCompatSpec extends AnyFunSuite {

  test("TclList.split handles braces, quotes, bare words") {
    assert(TclList.split("{} {foo bar} baz") == Vector("", "foo bar", "baz"))
    assert(TclList.split("""a "b c" d""") == Vector("a", "b c", "d"))
    assert(TclList.split("a {b {c d}} e") == Vector("a", "b {c d}", "e"))
    assert(TclList.split("") == Vector())
  }

  test("lindex with nested indices") {
    assert(TclList.lindex("{} {foo bar} baz", Seq(1, 1)) == "bar")
    assert(TclList.lindex("a b c", Seq(0)) == "a")
    assert(TclList.lindex("a b c", Seq(5)) == "")
  }

  test("llength") {
    assert(TclList.llength("0 o o g g l l e") == 8)
    assert(TclList.llength("") == 0)
  }

  test("lrange clamps and joins") {
    assert(TclList.lrange("0 o o g g l l e", "4", "5") == "g l")
    assert(TclList.lrange("a b c", "0", "end") == "a b c")
    assert(TclList.lrange("a b c", "2", "9") == "c")
  }

  test("dict_get flat and nested") {
    assert(TclList.dictGet("k1 v1 k2 v2 k3 {nes ted}", Seq("k3", "nes")) == Some("ted"))
    assert(TclList.dictGet("k1 v1", Seq("k2")) == None)
    assert(TclList.dictExists("k1 v1", Seq("k1")))
    assert(!TclList.dictExists("k1 v1", Seq("zz")))
  }

  test("quoteElem braces elements with spaces and empties") {
    assert(TclList.join(Seq("a", "b c", "")) == "a {b c} {}")
  }

  test("regexp returns 0/1") {
    assert(GraftFunctions.tclRegexp("a", "aaa") == 1)
    assert(GraftFunctions.tclRegexp("z", "aaa") == 0)
  }

  test("regsub -all and first-match") {
    assert(GraftFunctions.tclRegsub(all = true, "[lz]", "hello", "1") == "he11o")
    assert(GraftFunctions.tclRegsub(all = false, "[lz]", "hello", "1") == "he1lo")
    assert(GraftFunctions.tclRegsub(all = true, "(l)", "hello", """[\1]""") == "he[l][l]o")
    assert(GraftFunctions.tclRegsub(all = false, "l+", "hello", "&&") == "hellllo")
  }

  test("glob wildcards") {
    assert(GraftFunctions.sqliteGlob("*re*", "green") == 1)
    assert(GraftFunctions.sqliteGlob("a?c", "abc") == 1)
    assert(GraftFunctions.sqliteGlob("a[bd]c", "adc") == 1)
    assert(GraftFunctions.sqliteGlob("a[!bd]c", "adc") == 0)
    assert(GraftFunctions.sqliteGlob("ABC", "abc") == 0) // case-sensitive
  }
}

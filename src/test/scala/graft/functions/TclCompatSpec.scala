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

  // ARE dialect rows below are pinned against tclsh 8.6 output
  // (`regexp {...} $s`), mirroring re_syntax(n) examples.

  test("ARE word-boundary escapes \\m \\M \\y \\Y") {
    assert(GraftFunctions.tclRegexp("""\mbar""", "foo bar") == 1)
    assert(GraftFunctions.tclRegexp("""\mbar""", "foobar") == 0)
    assert(GraftFunctions.tclRegexp("""bar\M""", "barfly bar") == 1)
    assert(GraftFunctions.tclRegexp("""\ybar\y""", "a bar b") == 1)
    assert(GraftFunctions.tclRegexp("""\Ybar\Y""", "xbary") == 1)
    assert(GraftFunctions.tclRegsub(all = true, """\y\w+\y""", "one two", "X") == "X X")
    // director letters all apply before 'q' quoting: (?qi) == (?iq)
    assert(GraftFunctions.tclRegexp("(?qi)HELLO", "hello") == 1)
    assert(GraftFunctions.tclRegexp("(?iq)HELLO", "hello") == 1)
    assert(GraftFunctions.tclRegexp("(?q)a.c", "abc") == 0)
    assert(GraftFunctions.tclRegexp("(?q)a.c", "xa.cx") == 1)
    assert(GraftFunctions.tclRegsub(all = false, """\M""", "word up", "!") == "word! up")
    assert(GraftFunctions.tclRegexp("""\m\w+""", "héllo") == 1) // Unicode word chars
  }

  test("ARE \\Z is absolute end of string (not Java's before-final-newline)") {
    assert(GraftFunctions.tclRegexp("""a\Z""", "a") == 1)
    assert(GraftFunctions.tclRegexp("""a\Z""", "a\n") == 0)
  }

  test("ARE embedded options (?i) (?c) (?q) (?x) (?e)") {
    assert(GraftFunctions.tclRegexp("(?i)HELLO", "hello") == 1)
    assert(GraftFunctions.tclRegexp("(?ic)A", "a") == 0) // later c wins
    assert(GraftFunctions.tclRegexp("(?q)a.b", "a.b") == 1)
    assert(GraftFunctions.tclRegexp("(?q)a.b", "axb") == 0)
    assert(GraftFunctions.tclRegexp("(?x)a  b  c", "abc") == 1)
    assert(GraftFunctions.tclRegexp("(?e)a.b", "axb") == 1)
    // Java group syntax must still work after the option-director parse
    assert(GraftFunctions.tclRegexp("(?:ab)+", "abab") == 1)
    assert(GraftFunctions.tclRegexp("a(?=b)", "ab") == 1)
  }

  test("ARE newline sensitivity: dot-all default, (?n)/(?w) opt-outs") {
    assert(GraftFunctions.tclRegexp("a.b", "a\nb") == 1) // ARE default: . matches \n
    assert(GraftFunctions.tclRegexp("(?n)a.b", "a\nb") == 0)
    assert(GraftFunctions.tclRegexp("(?w)^b", "a\nb") == 1) // anchors go multiline
    assert(GraftFunctions.tclRegexp("^b", "a\nb") == 0)
  }

  test("ARE ***= and ***: directors") {
    assert(GraftFunctions.tclRegexp("***=a.b", "a.b") == 1)
    assert(GraftFunctions.tclRegexp("***=a.b", "axb") == 0)
    assert(GraftFunctions.tclRegexp("***:a.b", "axb") == 1)
  }

  test("ARE bracket expressions: POSIX classes, leading ]") {
    assert(GraftFunctions.tclRegexp("[[:digit:]]+", "ab123") == 1)
    assert(GraftFunctions.tclRegexp("[[:alpha:][:digit:]]", "5") == 1)
    assert(GraftFunctions.tclRegexp("[]x]", "]") == 1)
    assert(GraftFunctions.tclRegexp("[^]x]", "y") == 1)
  }
}

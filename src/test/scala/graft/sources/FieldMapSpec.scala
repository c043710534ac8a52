package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins reference semantics from lib/parsers/awk.tcl:82-135 and the
  * unit cases in tests.tcl:329-503. */
class FieldMapSpec extends AnyFunSuite {
  import FieldMap._

  test("parse scalar list") {
    assert(parse("1,2") == Vector(Range(1, Some(1)), Range(2, Some(2))))
  }

  test("parse ranges, end and auto") {
    assert(parse("1,1-2,3,5-end") == Vector(
      Range(1, Some(1)), Range(1, Some(2)), Range(3, Some(3)), Range(5, None)))
    assert(parse("1-2,auto") == Vector(Range(1, Some(2)), Auto))
    assert(parse("auto") == Vector(Auto))
  }

  private val fas = SepSplit.sepsplit("foo 1   foo 2   foo 3", " +", includeSeparators = true)

  test("merged ranges preserve original separators") {
    assert(map(fas, parse("1-2,3-4,5-6")) == Vector("foo 1", "foo 2", "foo 3"))
  }

  test("skip fields") {
    assert(map(fas, parse("2,4,6")) == Vector("1", "2", "3"))
  }

  test("out-of-range ranges clamp to whole line") {
    assert(map(fas, Vector(Range(1, Some(99)))) == Vector("foo 1   foo 2   foo 3"))
  }

  test("fully out-of-range gives one empty column") {
    val small = SepSplit.sepsplit("a b c", " ", includeSeparators = true)
    assert(map(small, Vector(Range(4, Some(5)))) == Vector(""))
  }

  test("overlapping ranges re-read fields") {
    val small = SepSplit.sepsplit("a b c", " ", includeSeparators = true)
    assert(map(small, parse("1-2,2-3")) == Vector("a b", "b c"))
  }

  test("reference field-mapping-2.1: separator-less trailing sep (tests.tcl:347-381)") {
    val v = Vector("start", "AB", "foo", "AB", "bar", "")
    assert(map(v, Vector(Range(1, Some(99)))) == Vector("startABfooABbar"))
    assert(map(v, Vector(Range(1, None))) == Vector("startABfooABbar"))
    assert(map(v, Vector(Range(1, Some(1)))) == Vector("start"))
    assert(map(v, Vector(Range(1, Some(2)))) == Vector("startABfoo"))
    assert(map(v, Vector(Range(4, Some(5)))) == Vector(""))
    assert(map(v, parse("1,2,3")) == Vector("start", "foo", "bar"))
    assert(map(v, parse("1,2,3-end")) == Vector("start", "foo", "bar"))
    assert(map(v, parse("1,2-3,3")) == Vector("start", "fooABbar", "bar"))
  }

  test("reference field-mapping-2.2: trailing separator is kept by end-ranges (tests.tcl:383-416)") {
    val v = Vector("start", "AB", "foo", "AB", "bar", "AB")
    assert(map(v, Vector(Range(1, Some(99)))) == Vector("startABfooABbarAB"))
    assert(map(v, Vector(Range(1, None))) == Vector("startABfooABbarAB"))
    assert(map(v, parse("1,2,3-end")) == Vector("start", "foo", "barAB"))
    assert(map(v, parse("1,2-3,3")) == Vector("start", "fooABbar", "bar"))
  }

  test("reference field-mapping-2.3 auto variants (tests.tcl:418-439)") {
    for (v <- Seq(Vector("start", "AB", "foo", "AB", "bar", ""),
                  Vector("start", "AB", "foo", "AB", "bar", "AB"))) {
      assert(map(v, parse("auto")) == Vector("start", "foo", "bar"))
      assert(map(v, parse("1,auto")) == Vector("start", "foo", "bar"))
      assert(map(v, parse("1,2,auto")) == Vector("start", "foo", "bar"))
    }
  }

  test("reference field-mapping-2.3b: multi-space separators preserved in merges (tests.tcl:441-455)") {
    val v1 = Vector("foo", " ", "1", "   ", "foo", " ", "2", "   ", "foo", " ", "3", "")
    assert(map(v1, parse("1-2,3-4,5-6")) == Vector("foo 1", "foo 2", "foo 3"))
    val v2 = Vector("bar", "    ", "4", " ", "bar", "    ", "5", " ", "bar", "    ", "6", "")
    assert(map(v2, parse("1-2,3-4,5-6")) == Vector("bar    4", "bar    5", "bar    6"))
  }

  test("auto starts at field index = number of mappings processed") {
    // fields=1-2,auto on "a b c": first mapping consumes one slot, so
    // auto starts at field 2 (reference currentColumn quirk).
    val small = SepSplit.sepsplit("a b c", " ", includeSeparators = true)
    assert(map(small, parse("1-2,auto")) == Vector("a b", "b", "c"))
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins reference semantics from lib/parsers/awk.tcl:19-71 and
  * tests.tcl:505-525, 946-968, 1002-1040. */
class SepSplitSpec extends AnyFunSuite {
  import SepSplit._

  test("sepsplit without separators: basic") {
    assert(sepsplit("a b", "[ \t]+", includeSeparators = false) == Vector("a", "b"))
  }

  test("sepsplit of empty string returns no fields") {
    assert(sepsplit("", "[ \t]+", includeSeparators = false) == Vector())
    assert(sepsplit("", "[ \t]+", includeSeparators = true) == Vector())
  }

  test("sepsplit with empty regex splits into characters") {
    assert(sepsplit("abc", "", includeSeparators = false) == Vector("a", "b", "c"))
  }

  test("leading separator yields leading empty field") {
    assert(sepsplit(" a", "[ \t]+", includeSeparators = false) == Vector("", "a"))
  }

  test("trailing separator: fields-only mode appends empty field") {
    assert(sepsplit("a b ", "[ \t]+", includeSeparators = false) == Vector("a", "b", ""))
  }

  test("trailing separator: interleaved mode ends with the separator") {
    assert(sepsplit("a b ", "[ \t]+", includeSeparators = true) ==
      Vector("a", " ", "b", " "))
  }

  test("interleaved mode keeps separators and trailing empty sep") {
    assert(sepsplit("foo 1   foo", " +", includeSeparators = true) ==
      Vector("foo", " ", "1", "   ", "foo", ""))
  }

  test("validateSeparator rejects empty-matching regex") {
    intercept[IllegalArgumentException](validateSeparator("x*", "FS"))
    validateSeparator("x+", "FS") // fine
  }

  test("trimRecord modes") {
    assert(trimRecord("   a  ", "none") == "   a  ")
    assert(trimRecord("   a  ", "left") == "a  ")
    assert(trimRecord("   a  ", "right") == "   a")
    assert(trimRecord("   a  ", "both") == "a")
  }

  test("splitRecords: trailing RS produces no final empty record") {
    assert(splitRecords("a\nb\n", "\n") == Vector("a", "b"))
  }

  test("splitRecords: interior empty records kept") {
    assert(splitRecords("0-1\n\na-b\n\nc-d\n", "\n") ==
      Vector("0-1", "", "a-b", "", "c-d"))
  }

  test("splitRecords: file of four newlines gives four empty records") {
    assert(splitRecords("\n\n\n\n", "\n") == Vector("", "", "", ""))
  }

  test("splitRecords: regex RS collapses runs") {
    assert(splitRecords("a\n\nb\n", "[\n]+") == Vector("a", "b"))
  }
}

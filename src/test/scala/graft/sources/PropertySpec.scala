package graft.sources

import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TclList
import graft.serializers.CsvSerializer

/** Property tests for the pure parsing/serialization kernels
  * (SURVEY.md §5.2 names these as the upgrade over the reference's
  * example-based suite): invariants that must hold for ANY input, not
  * just the pinned examples. Raw ScalaCheck (no scalatest bridge in
  * the offline cache); fixed default parameters = 100 cases each. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, s"$name: $res")
  }

  private val seps = Seq(" +", ",", "[ \t]+", "[0-9]", "ab")
  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(('a' to 'e') ++ Seq(' ', '\t', ',', '1', 'b'))).map(_.mkString)

  test("sepsplit interleaved mode reconstructs the input exactly") {
    check("reconstruct")(Prop.forAll(text, Gen.oneOf(seps)) { (s, re) =>
      SepSplit.sepsplit(s, re, includeSeparators = true).mkString == s
    })
  }

  test("sepsplit fields never contain a separator match") {
    check("no-sep-in-field")(Prop.forAll(text, Gen.oneOf(seps)) { (s, re) =>
      val p = Pattern.compile(re)
      SepSplit.sepsplit(s, re, includeSeparators = false)
        .forall(f => !p.matcher(f).find())
    })
  }

  test("splitRecords round-trips ;-joined parts (no trailing empty record)") {
    val part = Gen.listOf(Gen.alphaChar).map(_.mkString)
    check("records")(Prop.forAll(Gen.nonEmptyListOf(part)) { parts =>
      parts.isEmpty || parts.last.isEmpty || {
        SepSplit.splitRecords(parts.mkString(";"), ";") == parts.toVector &&
        SepSplit.splitRecords(parts.mkString(";") + ";", ";") == parts.toVector
      }
    })
  }

  test("CSV serialize then splitLine round-trips any newline-free row") {
    val field = Gen.listOf(Gen.oneOf(('a' to 'e') ++ Seq(',', '"', ' ', '\''))).map(_.mkString)
    check("csv-roundtrip")(Prop.forAll(Gen.nonEmptyListOf(field)) { row =>
      val sw = new java.io.StringWriter
      val ser = new CsvSerializer(sw)
      ser.serialize(row.zipWithIndex.map { case (v, i) => s"c$i" -> v })
      ser.close()
      val line = sw.toString.stripSuffix("\n")
      CsvReader.splitLine(line, CsvOptions()) == row.toVector
    })
  }

  test("Tcl join then split round-trips plain elements") {
    val elem = Gen.listOf(Gen.oneOf(('a' to 'e') ++ Seq(' ', ',', '.', '#'))).map(_.mkString)
    check("tcl-roundtrip")(Prop.forAll(Gen.nonEmptyListOf(elem)) { elems =>
      TclList.split(TclList.join(elems)) == elems.toVector
    })
  }

  test("trimRecord both == left then right, and is idempotent") {
    check("trim")(Prop.forAll(text) { s =>
      val both = SepSplit.trimRecord(s, "both")
      both == SepSplit.trimRecord(SepSplit.trimRecord(s, "left"), "right") &&
        SepSplit.trimRecord(both, "both") == both
    })
  }
}

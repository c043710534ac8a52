package graft.cli

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property fuzz for the SqliteOperators rewrite — the one driver-side
  * token-aware pass every script flows through (VERDICT r4 #7). The
  * example-based SqliteOperatorsSpec pins known shapes; these
  * properties pin the INVARIANTS for arbitrary generated scripts:
  *
  *  1. protected spans (string literals, quoted/bracketed identifiers,
  *     comments) and non-dialect words pass through byte-identical,
  *     even when operator words appear inside the protected spans;
  *  2. the rewrite never throws and is idempotent on arbitrary token
  *     soup, including malformed fragments (unbalanced parens,
  *     unterminated strings);
  *  3. well-formed queries still parse under Spark's SQL parser after
  *     the rewrite, with every string literal surviving verbatim.
  */
class SqliteOperatorsFuzzSpec extends SparkSpec {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, s"$name: $res")
  }

  // words the rewrite acts on — allowed only inside protected spans
  // for property 1 ("rtrim" would hit the intentional COLLATE RTRIM
  // rejection, so the soup of property 2 excludes it too)
  private val dialectText: Gen[String] = Gen.oneOf(
    "glob", "regexp", "like", "is", "cast", "collate nocase", "limit -1",
    "a glob b", "x REGEXP y", "not like", "cast(x as int)", "it''s", "*/ /*")

  private val strLit = dialectText.map(w => "'" + w.replace("'", "''") + "'")
  private val dquoted = dialectText.map(w => "\"" + w.replace("\"", "\"\"") + "\"")
  private val bracketId = dialectText.map(w => "[" + w.replace("]", "") + "]")
  private val lineComment = dialectText.map(w => "-- " + w.replace("\n", " ") + "\n")
  private val blockComment = dialectText.map(w => "/* " + w.replace("*/", "") + " */")
  private val number = Gen.choose(0, 9999).map(_.toString)
  private val inertWord = Gen.oneOf("select", "from", "where", "foo", "bar",
    "tbl", "x", "y1", "sum", "count", "order", "group", "by", "and", "or", "not")
  private val punct = Gen.oneOf(",", ".", "(", ")", ";", "+", "*", "/", "=", "||", "<", ">")

  private def script(frag: Gen[String]): Gen[String] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString(" "))

  test("protected spans and inert words pass through byte-identical") {
    val frag = Gen.frequency(
      3 -> strLit, 2 -> dquoted, 1 -> bracketId, 1 -> lineComment,
      1 -> blockComment, 2 -> number, 3 -> inertWord, 2 -> punct)
    check("pass-through")(Prop.forAllNoShrink(script(frag)) { s =>
      SqliteOperators.rewrite(s) == s
    })
  }

  test("rewrite never throws and is idempotent on arbitrary token soup") {
    val soupWord = Gen.oneOf("glob", "regexp", "like", "ilike", "is", "cast",
      "collate", "nocase", "binary", "limit", "not", "as", "int", "text",
      "null", "true", "distinct", "x", "tbl", "f")
    val malformed = Gen.oneOf("'unterminated", "((", ")", "[open", "/*never",
      "\"dq", "-", "- -1")
    val frag = Gen.frequency(
      5 -> soupWord, 2 -> strLit, 2 -> number, 3 -> punct, 1 -> malformed)
    check("idempotent")(Prop.forAllNoShrink(script(frag)) { s =>
      val once = SqliteOperators.rewrite(s)
      SqliteOperators.rewrite(once) == once
    })
  }

  test("well-formed predicates parse after the rewrite, literals intact") {
    // backtick quoting: the one quoted-identifier spelling BOTH SQLite
    // and Spark's parser accept (double quotes are string literals to
    // Spark, so the dialect doesn't claim them in executable scripts)
    val ident = Gen.oneOf("a1", "tbl.a1", "t.`w x`", "f(a1)", "upper(b2)")
    val lit = Gen.oneOf("'fo*'", "'a%b'", "42", "'it''s'", "-7")
    val operand: Gen[String] = Gen.frequency(
      4 -> ident, 3 -> lit,
      2 -> Gen.zip(ident, lit).map { case (a, b) => s"$a || $b" },
      2 -> Gen.zip(ident, number).map { case (a, n) => s"($a + $n)" },
      1 -> Gen.zip(ident, lit).map { case (a, b) => s"($a || $b)" })
    val op = Gen.oneOf("GLOB", "glob", "REGEXP", "NOT GLOB", "not regexp",
      "LIKE", "NOT LIKE", "IS", "IS NOT")
    val pred = Gen.zip(operand, op, operand)
      .map { case (l, o, r) => s"$l $o $r" }
    val preds = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, pred))
      .map(_.mkString(" AND "))
    val parser = spark.sessionState.sqlParser
    val strRe = "'(?:[^']|'')*'".r
    check("parses")(Prop.forAllNoShrink(preds) { w =>
      val sql = s"SELECT c1 FROM t WHERE $w"
      val out = SqliteOperators.rewrite(sql)
      parser.parsePlan(out) // throws (fails the prop) if unparseable
      // the rewrite may only MOVE literals (operator arg swap), never
      // alter them, and must not touch anything before the predicate
      out.startsWith("SELECT c1 FROM t WHERE ") &&
        strRe.findAllIn(sql).toList.sorted == strRe.findAllIn(out).toList.sorted &&
        SqliteOperators.rewrite(out) == out
    })
  }
}

package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Pins the GLOB/REGEXP operator → function-call rewrite, including
  * the argument swap (SQLite defines `A GLOB B` = glob(B, A)) and the
  * token-awareness guarantees (strings/comments untouched, function
  * spellings left alone). */
class SqliteOperatorsSpec extends AnyFunSuite {

  private def rw(s: String) = SqliteOperators.rewrite(s)

  test("simple operator forms swap arguments") {
    assert(rw("SELECT * FROM a WHERE a1 GLOB 'x*'") ===
      "SELECT * FROM a WHERE (glob('x*', a1) = 1)")
    assert(rw("SELECT * FROM a WHERE a1 REGEXP '^x'") ===
      "SELECT * FROM a WHERE (regexp('^x', a1) = 1)")
  }

  test("NOT forms negate the call") {
    assert(rw("SELECT * FROM a WHERE a1 NOT GLOB 'x*'") ===
      "SELECT * FROM a WHERE NOT (glob('x*', a1) = 1)")
  }

  test("dotted and function-call operands survive") {
    assert(rw("SELECT * FROM a WHERE t.a1 GLOB 'x*'") ===
      "SELECT * FROM a WHERE (glob('x*', t.a1) = 1)")
    assert(rw("SELECT upper(a1) GLOB 'X*' FROM a") ===
      "SELECT (glob('X*', upper(a1)) = 1) FROM a")
    assert(rw("SELECT (a1 || a2) GLOB p1 FROM a") ===
      "SELECT (glob(p1, (a1 || a2)) = 1) FROM a")
  }

  test("multiple occurrences all rewrite") {
    assert(rw("SELECT 1 WHERE a GLOB 'x' AND b NOT GLOB 'y'") ===
      "SELECT 1 WHERE (glob('x', a) = 1) AND NOT (glob('y', b) = 1)")
  }

  test("strings, comments and function spellings are untouched") {
    assert(rw("SELECT 'a GLOB b'") === "SELECT 'a GLOB b'")
    assert(rw("SELECT 1 -- a GLOB b\n") === "SELECT 1 -- a GLOB b\n")
    assert(rw("SELECT glob('x*', a1) FROM a") === "SELECT glob('x*', a1) FROM a")
    assert(rw("SELECT * FROM a WHERE glob('x', a1) = 1") ===
      "SELECT * FROM a WHERE glob('x', a1) = 1")
  }

  test("operands extend over tighter-binding || and arithmetic chains") {
    // sqlite3: `a1 || a2 GLOB 'fo*'` is (a1 || a2) GLOB 'fo*' → the
    // whole concat is the operand (review finding: grabbing only a2
    // silently concatenated a boolean)
    assert(rw("SELECT a1 || a2 GLOB 'fo*' FROM a") ===
      "SELECT (glob('fo*', a1 || a2) = 1) FROM a")
    assert(rw("SELECT 'x' GLOB 'f' || 'o*' FROM a") ===
      "SELECT (glob('f' || 'o*', 'x') = 1) FROM a")
    assert(rw("SELECT a1 + a2 GLOB p FROM a") ===
      "SELECT (glob(p, a1 + a2) = 1) FROM a")
    assert(rw("SELECT -a1 GLOB 'x' FROM a") ===
      "SELECT (glob('x', -a1) = 1) FROM a")
    // comparison-level neighbors do NOT get absorbed
    assert(rw("SELECT b = 1 AND a1 GLOB 'x' FROM a") ===
      "SELECT b = 1 AND (glob('x', a1) = 1) FROM a")
  }

  test("rhs may be a function call or parenthesized expression") {
    assert(rw("SELECT * FROM a WHERE a1 GLOB lower(p)") ===
      "SELECT * FROM a WHERE (glob(lower(p), a1) = 1)")
    assert(rw("SELECT * FROM a WHERE a1 GLOB ('x' || '*')") ===
      "SELECT * FROM a WHERE (glob(('x' || '*'), a1) = 1)")
  }

  test("CAST rewrites to the SQLite-semantic cast functions") {
    assert(rw("SELECT CAST(a1 AS INTEGER) FROM a") ===
      "SELECT sqlite_cast_integer((a1)) FROM a")
    assert(rw("SELECT CAST(a1 AS TEXT), CAST(a2 AS REAL) FROM a") ===
      "SELECT sqlite_cast_text((a1)), sqlite_cast_real((a2)) FROM a")
    assert(rw("SELECT CAST(a1 AS UNSIGNED BIG INT) FROM a") ===
      "SELECT sqlite_cast_integer((a1)) FROM a")
    assert(rw("SELECT CAST(a1 AS NUMERIC) FROM a") ===
      "SELECT sqlite_cast_numeric((a1)) FROM a")
    // nested: inner cast rewrites too; operand expressions survive
    assert(rw("SELECT CAST(CAST(a1 AS REAL) AS INTEGER) FROM a") ===
      "SELECT sqlite_cast_integer((sqlite_cast_real((a1)))) FROM a")
    assert(rw("SELECT CAST(substr(a1, 1, 2) AS INTEGER) FROM a") ===
      "SELECT sqlite_cast_integer((substr(a1, 1, 2))) FROM a")
    assert(rw("SELECT 'CAST(a AS INTEGER)'") === "SELECT 'CAST(a AS INTEGER)'")
  }

  test("IS / IS NOT between expressions become null-safe comparisons") {
    assert(rw("SELECT a1 IS a2 FROM a") === "SELECT a1 <=> a2 FROM a")
    assert(rw("SELECT a1 IS NOT a2 FROM a") ===
      "SELECT a1 IS DISTINCT FROM a2 FROM a")
    assert(rw("SELECT 1 IS NOT 2, NULL IS 'x' FROM a") ===
      "SELECT 1 IS DISTINCT FROM 2, NULL <=> 'x' FROM a")
    // shared syntax keeps its meaning
    assert(rw("SELECT a1 IS NULL, a1 IS NOT NULL FROM a") ===
      "SELECT a1 IS NULL, a1 IS NOT NULL FROM a")
    assert(rw("SELECT a1 IS DISTINCT FROM a2 FROM a") ===
      "SELECT a1 IS DISTINCT FROM a2 FROM a")
    assert(rw("SELECT a1 IS NOT TRUE FROM a") ===
      "SELECT a1 IS NOT TRUE FROM a")
  }

  test("statements without the dialect keywords pass through unchanged") {
    // pseudo-random token soup (LCG; reproducible) over quotes,
    // parens, operators and identifiers — no GLOB/REGEXP/CAST/
    // COLLATE/IS means byte-identical output
    val vocab = Vector("select", "a1", "'it''s'", "\"q id\"", "(", ")",
      ",", "+", "count", "*", "from", "t", "where", "and", "1.5e2",
      "--cmt", "||", ".", "[br id]", "not", "null")
    var x = 98765L
    def nxt(): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % vocab.size).toInt
    }
    (1 to 200).foreach { _ =>
      val sql = Vector.fill(12)(vocab(nxt())).mkString(" ")
      assert(rw(sql) === sql, s"corrupted: $sql")
    }
  }

  test("rewrite is idempotent") {
    val vectors = Seq(
      "SELECT * FROM a WHERE a1 GLOB 'x*' AND a2 NOT REGEXP '^y'",
      "SELECT CAST(a1 AS INTEGER), CAST(CAST(a2 AS REAL) AS TEXT) FROM a",
      "SELECT a1 IS a2, a1 IS NOT a2 FROM a ORDER BY a1 COLLATE NOCASE")
    vectors.foreach { v =>
      val once = rw(v)
      assert(rw(once) === once, s"not idempotent on: $v")
    }
  }

  test("operator LIKE becomes ILIKE; function spelling untouched") {
    assert(rw("SELECT a1 FROM a WHERE a1 LIKE 'x%'") ===
      "SELECT a1 FROM a WHERE a1 ilike 'x%'")
    assert(rw("SELECT a1 FROM a WHERE a1 NOT LIKE 'x%' ESCAPE '!'") ===
      "SELECT a1 FROM a WHERE a1 NOT ilike 'x%' ESCAPE '!'")
    assert(rw("SELECT like('x%', a1) FROM a") === "SELECT like('x%', a1) FROM a")
    assert(rw("SELECT 'a LIKE b'") === "SELECT 'a LIKE b'")
  }

  test("negative LIMIT drops the clause (SQLite: no limit)") {
    assert(rw("SELECT a1 FROM a LIMIT -1") === "SELECT a1 FROM a ")
    assert(rw("SELECT a1 FROM a LIMIT -1 OFFSET 2") ===
      "SELECT a1 FROM a  OFFSET 2")
    assert(rw("SELECT a1 FROM a LIMIT 5") === "SELECT a1 FROM a LIMIT 5")
    // `-1+2` is a positive limit expression, not a negative limit —
    // must survive whole (review finding: half-stripping it produced
    // a confusing parser error)
    assert(rw("SELECT a1 FROM a LIMIT -1+2") === "SELECT a1 FROM a LIMIT -1+2")
  }

  test("IS with a signed numeric operand rewrites (sqlite3: 1 IS -1 = 0)") {
    assert(rw("SELECT 1 IS -1") === "SELECT 1 <=> -1")
    assert(rw("SELECT 5 IS NOT -5") === "SELECT 5 IS DISTINCT FROM -5")
  }

  test("COLLATE NOCASE/BINARY/RTRIM map to Spark collations") {
    assert(rw("SELECT a1 FROM a ORDER BY a1 COLLATE NOCASE") ===
      "SELECT a1 FROM a ORDER BY a1 COLLATE UTF8_LCASE")
    assert(rw("SELECT a1 FROM a ORDER BY a1 collate binary, a2 COLLATE NOCASE") ===
      "SELECT a1 FROM a ORDER BY a1 collate UTF8_BINARY, a2 COLLATE UTF8_LCASE")
    assert(rw("SELECT 'COLLATE NOCASE'") === "SELECT 'COLLATE NOCASE'")
    assert(rw("SELECT a1 FROM a ORDER BY a1 COLLATE RTRIM") ===
      "SELECT a1 FROM a ORDER BY a1 COLLATE UTF8_BINARY_RTRIM")
  }
}

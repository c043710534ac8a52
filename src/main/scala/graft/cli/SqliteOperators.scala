package graft.cli

/** SQLite's operator spellings of the pattern predicates — `A GLOB B`,
  * `A REGEXP B` and their `NOT` forms — rewritten into the registered
  * function calls Spark's parser accepts (`glob(B, A)`, `regexp(B, A)`
  * — pattern first, matching SQLite's glob()/regexp() argument order,
  * which is how SQLite itself defines the operators: `A GLOB B` is
  * shorthand for `glob(B, A)`, sqlite.org/lang_expr.html §5; the
  * reference forwards scripts to SQLite verbatim so these operators
  * are part of its accepted dialect, /root/reference/lib/classes/sqawk.tcl:216).
  *
  * The rewrite is token-aware: string literals, quoted identifiers and
  * comments are never touched, function-call spellings (`glob('p', x)`)
  * are left alone (distinguished by the token BEFORE the word — an
  * operand-ending token means operator usage), and operands may be
  * identifiers, dotted chains, literals, parenthesized expressions or
  * function calls. Purely driver-side string work on statements that
  * are a few KB at most — zero impact on the executed plan.
  */
object SqliteOperators {

  private case class Tok(kind: Char, start: Int, end: Int) // kind: 'w'ord,'s'tring,'q'uoted,'n'um,'p'unct,' 'ws
  private val Keywords = Set(
    "select", "from", "where", "and", "or", "not", "on", "join", "when",
    "then", "else", "case", "end", "by", "having", "like", "in", "is",
    "as", "all", "distinct", "union", "intersect", "except", "limit",
    "offset", "order", "group", "set", "values", "between", "escape",
    "insert", "into", "update", "delete", "create", "table", "view")

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val start = i
      if (c.isWhitespace) {
        while (i < n && s.charAt(i).isWhitespace) i += 1
        out += Tok(' ', start, i)
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
        out += Tok(' ', start, i)
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += Tok(' ', start, i)
      } else if (c == '\'' || c == '"' || c == '`') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == c) {
            if (i + 1 < n && s.charAt(i + 1) == c) i += 2 // doubled = escaped
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok(if (c == '\'') 's' else 'q', start, i)
      } else if (c == '[') { // SQLite bracket-quoted identifier
        while (i < n && s.charAt(i) != ']') i += 1
        i = math.min(n, i + 1)
        out += Tok('q', start, i)
      } else if (c.isLetter || c == '_') {
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '$')) i += 1
        out += Tok('w', start, i)
      } else if (c.isDigit) {
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.')) i += 1
        out += Tok('n', start, i)
      } else {
        i += 1
        out += Tok('p', start, i)
      }
    }
    out.result()
  }

  /** Rewrites every operator-form GLOB/REGEXP in `sql`; returns the
    * input unchanged when none occur. */
  def rewrite(sql: String): String = {
    val toks = tokenize(sql)
    def text(t: Tok) = sql.substring(t.start, t.end)
    def prevIdx(j: Int): Int = { var k = j - 1; while (k >= 0 && toks(k).kind == ' ') k -= 1; k }
    def nextIdx(j: Int): Int = { var k = j + 1; while (k < toks.length && toks(k).kind == ' ') k += 1; k }
    def isOperand(t: Tok): Boolean = t.kind match {
      case 'w' => !Keywords.contains(text(t).toLowerCase)
      case 's' | 'q' | 'n' => true
      case 'p' => text(t) == ")" || text(t) == "]"
      case _ => false
    }

    var j = 0
    while (j < toks.length) {
      val t = toks(j)
      if (t.kind == 'w') {
        val w = text(t).toLowerCase
        if (w == "collate") {
          // SQLite collation names → Spark 4 collations: NOCASE maps
          // to UTF8_LCASE (identical on ASCII, SQLite's NOCASE scope;
          // full-Unicode case folding beyond it), BINARY to
          // UTF8_BINARY. RTRIM has no Spark equivalent — reject with
          // a one-line error rather than silently changing semantics.
          val nj = nextIdx(j)
          if (nj < toks.length && toks(nj).kind == 'w') {
            val name = text(toks(nj)).toLowerCase
            val mapped = name match {
              case "nocase" => Some("UTF8_LCASE")
              case "binary" => Some("UTF8_BINARY")
              case "rtrim" =>
                throw new IllegalArgumentException(
                  "error: collation RTRIM is not supported")
              case _ => None
            }
            mapped.foreach { m =>
              return rewrite(sql.substring(0, toks(nj).start) + m +
                sql.substring(toks(nj).end))
            }
          }
        }
        if (w == "cast") {
          // SQLite CAST semantics (prefix coercion, saturation —
          // functions/SqliteCastExprs.scala): CAST(e AS T) becomes
          // sqlite_cast_<affinity>((e)), with T classified by SQLite's
          // column-affinity name rules (lang_datatype.html §3.1):
          // *INT* → INTEGER; *CHAR*/*CLOB*/*TEXT*/*BLOB* → TEXT;
          // *REAL*/*FLOA*/*DOUB* → REAL; anything else → NUMERIC.
          val oj = nextIdx(j)
          if (oj < toks.length && toks(oj).kind == 'p' && text(toks(oj)) == "(") {
            // balanced scan; record the depth-1 AS and the close paren
            var depth = 0
            var k = oj
            var asIdx = -1
            var close = -1
            while (k < toks.length && close < 0) {
              val tx = toks(k)
              if (tx.kind == 'p' && text(tx) == "(") depth += 1
              else if (tx.kind == 'p' && text(tx) == ")") {
                depth -= 1
                if (depth == 0) close = k
              } else if (depth == 1 && tx.kind == 'w' &&
                  text(tx).toLowerCase == "as") asIdx = k
              k += 1
            }
            if (close > 0 && asIdx > 0) {
              val typeName = toks.slice(asIdx + 1, close)
                .filter(_.kind == 'w').map(text).mkString(" ").toUpperCase
              if (typeName.nonEmpty) {
                val aff =
                  if (typeName.contains("INT")) "integer"
                  else if (typeName.contains("CHAR") || typeName.contains("CLOB") ||
                    typeName.contains("TEXT") || typeName.contains("BLOB")) "text"
                  else if (typeName.contains("REAL") || typeName.contains("FLOA") ||
                    typeName.contains("DOUB")) "real"
                  else "numeric"
                val operand =
                  sql.substring(toks(oj).end, toks(asIdx).start).trim
                val rewritten = sql.substring(0, t.start) +
                  s"sqlite_cast_$aff(($operand))" + sql.substring(toks(close).end)
                return rewrite(rewritten)
              }
            }
          }
        }
        if (w == "limit") {
          // SQLite: a negative LIMIT means "no limit"
          // (lang_select.html §10); Spark rejects negative limits, so
          // the clause is dropped (a following OFFSET survives).
          val nj = nextIdx(j)
          if (nj < toks.length && toks(nj).kind == 'p' && text(toks(nj)) == "-") {
            val nnj = nextIdx(nj)
            if (nnj < toks.length && toks(nnj).kind == 'n') {
              return rewrite(sql.substring(0, t.start) +
                sql.substring(toks(nnj).end))
            }
          }
        }
        if (w == "is") {
          // SQLite `A IS B` / `A IS NOT B` are null-safe comparisons
          // between arbitrary expressions (lang_expr.html §4) — Spark
          // spells them `<=>` and `IS DISTINCT FROM`. The NULL /
          // TRUE / FALSE / DISTINCT right-hand forms are shared
          // syntax both parsers accept and keep their meaning, so
          // they are left untouched.
          val shared = Set("null", "not", "true", "false", "distinct")
          val nj = nextIdx(j)
          if (nj < toks.length) {
            val nw = if (toks(nj).kind == 'w') text(toks(nj)).toLowerCase else ""
            if (toks(nj).kind == 'w' && nw == "not") {
              val nnj = nextIdx(nj)
              val nnw =
                if (nnj < toks.length && toks(nnj).kind == 'w')
                  text(toks(nnj)).toLowerCase
                else ""
              if (nnj < toks.length && !shared.contains(nnw) &&
                  (isOperand(toks(nnj)) ||
                    (toks(nnj).kind == 'p' && text(toks(nnj)) == "("))) {
                return rewrite(sql.substring(0, t.start) + "IS DISTINCT FROM" +
                  sql.substring(toks(nj).end))
              }
            } else if (!shared.contains(nw) &&
                (isOperand(toks(nj)) ||
                  (toks(nj).kind == 'p' && text(toks(nj)) == "("))) {
              return rewrite(sql.substring(0, t.start) + "<=>" +
                sql.substring(t.end))
            }
          }
        }
        if (w == "glob" || w == "regexp") {
          var pj = prevIdx(j)
          val negated = pj >= 0 && toks(pj).kind == 'w' && text(toks(pj)).toLowerCase == "not"
          if (negated) pj = prevIdx(pj) // pj now ends the left operand
          if (pj >= 0 && isOperand(toks(pj))) {
            val lhsEnd = toks(pj).end
            // left operand: balanced group / dotted chain walking back
            var lo = pj
            def extendLeft(): Unit = {
              if (toks(lo).kind == 'p' && text(toks(lo)) == ")") {
                var depth = 0
                var k = lo
                var stop = false
                while (k >= 0 && !stop) {
                  val tx = toks(k)
                  if (tx.kind == 'p' && text(tx) == ")") depth += 1
                  else if (tx.kind == 'p' && text(tx) == "(") {
                    depth -= 1
                    if (depth == 0) stop = true
                  }
                  if (!stop) k -= 1
                }
                lo = math.max(k, 0)
                val fn = prevIdx(lo)
                if (fn >= 0 && toks(fn).kind == 'w' &&
                    !Keywords.contains(text(toks(fn)).toLowerCase)) lo = fn
              }
              // dotted chain: a.b / tbl."c"
              var p2 = prevIdx(lo)
              while (p2 >= 1 && toks(p2).kind == 'p' && text(toks(p2)) == "." && {
                  val p3 = prevIdx(p2)
                  p3 >= 0 && (toks(p3).kind == 'w' || toks(p3).kind == 'q')
                }) {
                lo = prevIdx(p2)
                p2 = prevIdx(lo)
              }
            }
            extendLeft()
            // right operand: literal / identifier [ ( balanced ) ] / ( balanced )
            var rj = nextIdx(j)
            if (rj < toks.length) {
              var hi = rj
              if (toks(hi).kind == 'w' || toks(hi).kind == 'q') {
                val nx = nextIdx(hi)
                if (nx < toks.length && toks(nx).kind == 'p' && text(toks(nx)) == "(") {
                  var depth = 0
                  var k = nx
                  var stop = false
                  while (k < toks.length && !stop) {
                    val tx = toks(k)
                    if (tx.kind == 'p' && text(tx) == "(") depth += 1
                    else if (tx.kind == 'p' && text(tx) == ")") {
                      depth -= 1
                      if (depth == 0) stop = true
                    }
                    k += 1
                  }
                  hi = k - 1
                }
              } else if (toks(hi).kind == 'p' && text(toks(hi)) == "(") {
                var depth = 0
                var k = hi
                var stop = false
                while (k < toks.length && !stop) {
                  val tx = toks(k)
                  if (tx.kind == 'p' && text(tx) == "(") depth += 1
                  else if (tx.kind == 'p' && text(tx) == ")") {
                    depth -= 1
                    if (depth == 0) stop = true
                  }
                  k += 1
                }
                hi = k - 1
              }
              val lhs = sql.substring(toks(lo).start, lhsEnd).trim
              val rhs = sql.substring(toks(rj).start, toks(hi).end).trim
              // `= 1` turns the 0/1 integer into the boolean Spark's
              // WHERE needs; the serializer prints booleans as 1/0, so
              // select-list usage still matches SQLite's integer
              // output (NULL propagates through both forms).
              val call = s"${if (negated) "NOT " else ""}($w($rhs, $lhs) = 1)"
              val rewritten = sql.substring(0, toks(lo).start) + call +
                sql.substring(toks(hi).end)
              return rewrite(rewritten) // restart on the shifted text
            }
          }
        }
      }
      j += 1
    }
    sql
  }
}

package graft.cli

import java.io.StringWriter
import java.nio.charset.StandardCharsets

import scala.util.Random

import org.apache.spark.sql.SparkSession

/** Differential statement fuzz against the sqlite3 CLI (round-7 task:
  * the reference's contract is "any script sqlite3 accepts",
  * lib/classes/sqawk.tcl:216, so the dialect surface must be probed by
  * GENERATED scripts, not only hand-picked pins).
  *
  * A seed deterministically generates a multi-statement script over
  * the implemented grammar — CREATE TABLE with column affinities /
  * PRIMARY KEY / NOT NULL / DEFAULT / UNIQUE, INSERT (multi-row,
  * column lists, OR IGNORE / OR REPLACE), UPDATE / DELETE, UPSERT,
  * ALTER TABLE (ADD / RENAME / DROP COLUMN), BEGIN / COMMIT /
  * ROLLBACK / SAVEPOINT, CREATE UNIQUE INDEX, CREATE TEMP VIEW,
  * arithmetic / string / CASE expressions and WHERE predicates — and
  * both engines run the SAME text:
  *
  *  - graft: ScriptRunner.run with the awk serializer (OFS = 0x1f so
  *    field boundaries are unambiguous);
  *  - sqlite3: `-batch -bail -list -noheader -separator 0x1f
  *    :memory:` reading the script on stdin.
  *
  * Output protocol: both engines render NULL as "", REALs as %!.15g,
  * rows newline-terminated. Every generated SELECT carries an ORDER
  * BY over all output ordinals, so raw (unsorted) text compare is
  * sound. A script whose execution errors is still compared on the
  * output BEFORE the error plus the errored flag — graft aborts a
  * script at the first failing statement exactly like `-bail`.
  *
  * Round 7 additions to the grammar: audit TRIGGERs (AFTER/BEFORE
  * INSERT / UPDATE OF / DELETE with WHEN and OLD/NEW logging into a
  * side table, pinned by a final ordered SELECT over it).
  *
  * Round 11 additions (VERDICT r10 #6 — the SELECT side was thinner
  * than the DML/DDL arms): window functions over affinity columns
  * (row_number / rank / dense_rank / sum / total / count OVER, with
  * PARTITION BY and RANGE-peer keys drawn from declared columns
  * only), correlated subqueries (scalar count + EXISTS / NOT
  * EXISTS), CTEs referencing the script-created table (expression
  * projections and a join back to t1), and ORDER BY + LIMIT +
  * COLLATE NOCASE / DESC / OFFSET compositions.
  *
  * Round 9 additions: expression / COLLATE NOCASE / partial UNIQUE
  * indexes (upgraded from "not generated" when round 8 made them
  * enforced); ATTACH/DETACH with cross-schema DDL+DML+joins (each
  * seed attaches a fresh per-seed path — [[runSqlite]] unlinks it
  * first so sqlite3 starts from the same empty schema graft sees);
  * INSTEAD OF triggers on the generated view with INSERT / UPDATE /
  * DELETE routed through a log table.
  *
  * Round 14 additions: IS / IS NOT comparisons with literal and
  * column operands (ADVICE r13 #1 — the eqKeys storage-class matrix
  * must cover EqualNullSafe too), CTE bodies whose projection mixes
  * text-storage and value-mode CASE/coalesce branches feeding ORDER
  * BY (VERDICT r13 #3 — the per-value-key fallback behind a
  * CTERelationRef), and trigger bodies that MUTATE the firing table
  * (UPDATE/INSERT on t1 from inside an AFTER trigger, VERDICT r13
  * #4).
  *
  * Not generated (documented gaps / nondeterminism): RETURNING (row
  * order is engine-private), group_concat (concatenation order),
  * random(), typeof() around arithmetic results, and numeric-looking
  * text in no-affinity value positions (the engine's one documented
  * value-provenance deviation). The alog audit table carries an
  * INTEGER PRIMARY KEY and its final SELECT orders by it (round 15:
  * INSERT, UPDATE and DELETE statements all fire triggers ROW-MAJOR
  * in scan order now, so the exact firing sequence is pinned — the
  * former value-ordered-log guard covered the phase-major deviation,
  * retired with VERDICT r14 #3). vlog stays value-ordered: INSTEAD OF
  * DML on a view over a rebind chain visits in engine plan order,
  * not sqlite scan order.
  */
object SqlScriptFuzz {

  final val Sep = ""

  // ---------------------------------------------------------------- //
  //  generation                                                      //
  // ---------------------------------------------------------------- //

  private case class Col(name: String, decl: String, notNull: Boolean)

  private val decls = Vector("INTEGER", "TEXT", "REAL", "NUMERIC", "")

  private val intLits = Vector("0", "1", "-5", "7", "42", "100", "-1")
  private val realLits = Vector("0.5", "2.5", "-1.25", "100.0", "1e2")
  private val textLits =
    Vector("'x'", "'abc'", "'12abc'", "''", "'B'", "'zz'", "'5'", "'5.5'", "'-3'")

  /** Text literals that classify the same under graft's value-based
    * storage model and sqlite's provenance-based one: NOT
    * numeric-looking ('5' through coalesce/CASE or into a
    * NO-affinity column carries TEXT storage in sqlite but would
    * classify numeric under graft's canonical-string model — the
    * engine's one documented value-provenance deviation, see
    * storeCanonical's scaladoc). */
  private val safeTextLits = Vector("'x'", "'abc'", "''", "'B'", "'zz'", "'12abc'")

  /** Literal for EXPRESSION positions (coalesce/CASE branches,
    * comparison operands): numeric-looking quoted strings are
    * excluded — a '5' flowing through coalesce/CASE carries TEXT
    * storage in sqlite but would classify numeric under graft's
    * canonical-value model (the documented value-provenance
    * deviation); safeTextLits classify identically in both. */
  private def lit(rnd: Random): String = rnd.nextInt(10) match {
    case 0 | 1 | 2 | 3 => intLits(rnd.nextInt(intLits.size))
    case 4 | 5         => realLits(rnd.nextInt(realLits.size))
    case 6 | 7 | 8     => safeTextLits(rnd.nextInt(safeTextLits.size))
    case _             => "NULL"
  }

  private def colRef(rnd: Random, cols: Vector[Col]): String =
    cols(rnd.nextInt(cols.size)).name

  /** A scalar expression over the table's columns. */
  private def expr(rnd: Random, cols: Vector[Col], depth: Int = 0): String = {
    val c = colRef(rnd, cols)
    if (depth >= 2) return if (rnd.nextBoolean()) c else lit(rnd)
    rnd.nextInt(12) match {
      case 0 => s"$c + ${lit(rnd)}"
      case 1 => s"$c - ${lit(rnd)}"
      case 2 => s"$c * 2"
      case 3 => s"$c / 2"
      case 4 => s"$c % 3"
      case 5 => s"upper(${colRef(rnd, cols)})"
      case 6 => s"length(${colRef(rnd, cols)})"
      case 7 => s"substr($c, 1, 2)"
      case 8 => s"coalesce($c, ${lit(rnd)})"
      case 9 => s"abs($c)"
      case 10 =>
        s"CASE WHEN ${pred(rnd, cols, depth + 1)} THEN ${expr(rnd, cols, depth + 1)} " +
          s"ELSE ${expr(rnd, cols, depth + 1)} END"
      case _ => s"(${expr(rnd, cols, depth + 1)}) + (${expr(rnd, cols, depth + 1)})"
    }
  }

  /** An expression with NUMERIC (or NULL) result in both engines —
    * for assignments into NO-affinity columns, where a string-typed
    * result (upper(x), substr(x), coalesce of a TEXT value) carries
    * TEXT storage in sqlite but would classify by value under graft's
    * canonical model (the documented provenance deviation — fuzz
    * seed 104 leaked it through SET a = upper(c)). Arithmetic over
    * ANY column is safe: both engines coerce to numbers. */
  private def numExpr(rnd: Random, cols: Vector[Col]): String = {
    val c = colRef(rnd, cols)
    rnd.nextInt(7) match {
      case 0 => s"$c + ${intLits(rnd.nextInt(intLits.size))}"
      case 1 => s"$c - ${intLits(rnd.nextInt(intLits.size))}"
      case 2 => s"$c * 2"
      case 3 => s"$c / 2"
      case 4 => s"$c % 3"
      case 5 => s"abs($c)"
      case _ => s"length($c)"
    }
  }

  private def pred(rnd: Random, cols: Vector[Col], depth: Int = 0): String = {
    val c = colRef(rnd, cols)
    if (depth >= 2) return s"$c IS NOT NULL"
    rnd.nextInt(12) match {
      case 0 => s"$c > ${lit(rnd)}"
      case 1 => s"$c < ${lit(rnd)}"
      case 2 => s"$c = ${lit(rnd)}"
      case 3 => s"$c <> ${lit(rnd)}"
      case 4 => s"$c IS NULL"
      case 5 => s"$c IS NOT NULL"
      case 6 => s"$c IN (${Seq.fill(2 + rnd.nextInt(2))(lit(rnd)).mkString(", ")})"
      case 7 => s"$c BETWEEN ${intLits(rnd.nextInt(intLits.size))} AND " +
        s"${intLits(rnd.nextInt(intLits.size))}"
      case 8 => s"(${pred(rnd, cols, depth + 1)}) AND (${pred(rnd, cols, depth + 1)})"
      case 9 => s"(${pred(rnd, cols, depth + 1)}) OR (${pred(rnd, cols, depth + 1)})"
      // IS / IS NOT with value (and column) operands — round 14,
      // ADVICE r13 #1: the storage-class equality matrix must hold
      // for the null-safe operator too (int 100 IS real 100.0 on a
      // NONE-affinity column is TRUE in sqlite)
      case 10 =>
        val rhs = if (rnd.nextBoolean()) lit(rnd) else colRef(rnd, cols)
        s"$c IS $rhs"
      case _ =>
        val rhs = if (rnd.nextBoolean()) lit(rnd) else colRef(rnd, cols)
        s"$c IS NOT $rhs"
    }
  }

  private def valueFor(rnd: Random, c: Col): String =
    if (c.notNull && rnd.nextInt(8) == 0) lit(rnd) // may still draw NULL → error path
    else if (!c.notNull && rnd.nextInt(8) == 0) "NULL"
    else c.decl match {
      case "INTEGER" => if (rnd.nextInt(4) == 0) textLits(rnd.nextInt(textLits.size))
                        else intLits(rnd.nextInt(intLits.size))
      case "REAL"    => realLits(rnd.nextInt(realLits.size))
      case "TEXT"    => textLits(rnd.nextInt(textLits.size))
      case "NUMERIC" => lit(rnd)
      case _ => // no-affinity column: dodge the value-provenance deviation
        rnd.nextInt(3) match {
          case 0 => intLits(rnd.nextInt(intLits.size))
          case 1 => realLits(rnd.nextInt(realLits.size))
          case _ => safeTextLits(rnd.nextInt(safeTextLits.size))
        }
    }

  /** Values for VIEW DML positions: sqlite applies NO affinity to an
    * INSTEAD OF INSERT's NEW row, so a quoted numeric-looking literal
    * ('-3' aimed at an INTEGER base column) keeps TEXT storage there
    * and then flows into the no-affinity log table — the documented
    * value-provenance deviation by another door (round-10 seeds
    * 2295/3423). View DML therefore draws only provenance-safe
    * values, like any no-affinity position. */
  private def viewValueFor(rnd: Random, c: Col): String =
    if (!c.notNull && rnd.nextInt(8) == 0) "NULL"
    else rnd.nextInt(3) match {
      case 0 => intLits(rnd.nextInt(intLits.size))
      case 1 => realLits(rnd.nextInt(realLits.size))
      case _ => safeTextLits(rnd.nextInt(safeTextLits.size))
    }

  /** Generate one deterministic script for a seed. */
  def genScript(seed: Long): String = {
    val rnd = new Random(seed)
    val stmts = Vector.newBuilder[String]

    // --- CREATE TABLE t1 -------------------------------------------
    val nCols = 3 + rnd.nextInt(3)
    val names = Vector("a", "b", "c", "d", "e").take(nCols)
    val pkIdx = if (rnd.nextInt(10) < 4) Some(0) else None
    var cols: Vector[Col] = names.zipWithIndex.map { case (n, i) =>
      val decl =
        if (pkIdx.contains(i)) "INTEGER"
        else decls(rnd.nextInt(decls.size))
      val nn = !pkIdx.contains(i) && rnd.nextInt(8) == 0
      Col(n, decl, nn)
    }
    val defaults = cols.map(c =>
      if (!c.notNull && rnd.nextInt(6) == 0) Some(valueFor(rnd, c)) else None)
    val colDefs = cols.zip(defaults).zipWithIndex.map { case ((c, dflt), i) =>
      val parts = Vector(c.name) ++
        (if (c.decl.nonEmpty) Vector(c.decl) else Vector.empty) ++
        (if (pkIdx.contains(i)) Vector("PRIMARY KEY") else Vector.empty) ++
        (if (c.notNull) Vector("NOT NULL") else Vector.empty) ++
        dflt.map(d => s"DEFAULT $d").toVector
      parts.mkString(" ")
    }
    val tableConstraint =
      if (pkIdx.isEmpty && rnd.nextInt(5) == 0)
        s", UNIQUE (${cols(1 + rnd.nextInt(cols.size - 1)).name})"
      else ""
    stmts += s"CREATE TABLE t1 (${colDefs.mkString(", ")}$tableConstraint)"

    // --- initial INSERTs -------------------------------------------
    val nIns = 2 + rnd.nextInt(3)
    for (_ <- 1 to nIns) {
      val conflict = rnd.nextInt(10) match {
        case 0 => "OR IGNORE "
        case 1 => "OR REPLACE "
        case _ => ""
      }
      if (rnd.nextInt(4) == 0 && cols.size > 2) {
        // column-list subset insert
        val subset = rnd.shuffle(cols).take(2 + rnd.nextInt(cols.size - 1))
        val vals = subset.map(c => valueFor(rnd, c))
        stmts += s"INSERT ${conflict}INTO t1 (${subset.map(_.name).mkString(", ")}) " +
          s"VALUES (${vals.mkString(", ")})"
      } else {
        val nRows = 1 + rnd.nextInt(3)
        val rows = Seq.fill(nRows)(
          s"(${cols.map(c => valueFor(rnd, c)).mkString(", ")})")
        stmts += s"INSERT ${conflict}INTO t1 VALUES ${rows.mkString(", ")}"
      }
    }

    // --- ALTER TABLE (before any index/view references) ------------
    if (rnd.nextInt(10) < 3) rnd.nextInt(3) match {
      case 0 =>
        val d = decls(rnd.nextInt(decls.size))
        val dflt = if (rnd.nextBoolean())
          s" DEFAULT ${valueFor(rnd, Col("z", d, notNull = false))}" else ""
        stmts += s"ALTER TABLE t1 ADD COLUMN z ${d}$dflt".trim
        cols = cols :+ Col("z", d, notNull = false)
      case 1 =>
        val old = cols.last.name
        stmts += s"ALTER TABLE t1 RENAME COLUMN $old TO ${old}r"
        cols = cols.init :+ cols.last.copy(name = s"${old}r")
      case _ if cols.size > 2 && !pkIdx.contains(cols.size - 1) =>
        stmts += s"ALTER TABLE t1 DROP COLUMN ${cols.last.name}"
        cols = cols.init
      case _ => ()
    }

    // --- optional audit trigger (round 7) ---------------------------
    // a side table logs one column per fired row; the final SELECT
    // over it pins firing events, WHEN gating and OLD/NEW values
    val hasTrigger = rnd.nextInt(4) == 0
    if (hasTrigger) {
      // the id alias autoassigns per logged row, so ordering the
      // final SELECT by it pins the exact firing sequence (row-major
      // interleave in scan order, round 15)
      stmts += "CREATE TABLE alog (id INTEGER PRIMARY KEY, v)"
      // log a non-TEXT column: a TEXT column's numeric-looking value
      // is TEXT storage in sqlite's alog but would classify numeric
      // under graft's canonical model (value-provenance deviation)
      val trigCands = cols.filter(_.decl != "TEXT")
      val c = if (trigCands.nonEmpty) trigCands(rnd.nextInt(trigCands.size))
              else cols.head
      val (event, ref) = rnd.nextInt(3) match {
        case 0 => ("INSERT", "NEW")
        case 1 => (s"UPDATE OF ${c.name}", "NEW")
        case _ => ("DELETE", "OLD")
      }
      val timing = if (rnd.nextBoolean()) "AFTER" else "BEFORE"
      val when =
        if (rnd.nextBoolean()) s" WHEN $ref.${c.name} IS NOT NULL" else ""
      stmts += s"CREATE TRIGGER atr $timing $event ON t1$when " +
        s"BEGIN INSERT INTO alog (v) VALUES ($ref.${c.name}); END"
    }

    // --- optional TARGET-MUTATING trigger (round 14, VERDICT r13
    // #4): an INSERT-event trigger whose body mutates t1 itself.
    // sqlite processes a multi-row INSERT row-major — one row's
    // BEFORE → insert → AFTER chain completes before the next row's
    // begins, so the body's mutations are visible to later rows of
    // the same statement; the Insert handler's per-row loop is what
    // this arm pins. Scope guards: INSERT events only (sqlite
    // declares a BEFORE UPDATE/DELETE body that changes the rows
    // being updated/deleted UNDEFINED, lang_createtrigger §cautions,
    // and a BEFORE-UPDATE body mutating the target mid-upsert is the
    // engine's documented non-re-read); exclusive with the audit
    // trigger (relative firing order of two triggers on one event is
    // unspecified in sqlite); recursion is cut identically in both
    // engines (recursive_triggers defaults OFF; state.firing).
    val hasMutTrigger = !hasTrigger && rnd.nextInt(5) == 0
    if (hasMutTrigger) {
      val timing = if (rnd.nextBoolean()) "AFTER" else "BEFORE"
      val body =
        if (rnd.nextBoolean()) {
          val target = cols(rnd.nextInt(cols.size))
          s"UPDATE t1 SET ${target.name} = ${numExpr(rnd, cols)} " +
            s"WHERE ${pred(rnd, cols)}"
        } else
          s"INSERT INTO t1 VALUES (${cols.map(c => valueFor(rnd, c)).mkString(", ")})"
      stmts += s"CREATE TRIGGER mtr $timing INSERT ON t1 BEGIN $body; END"
    }

    // --- optional unique index: plain / expression / COLLATE /
    // partial (round 9 — round 8 made the variants enforced). Only
    // the plain form feeds the ON CONFLICT target below (an
    // expression index needs a matching expression conflict target).
    val indexed = if (rnd.nextInt(10) < 3) {
      val c = cols(rnd.nextInt(cols.size)).name
      rnd.nextInt(6) match {
        case 0 | 1 =>
          stmts += s"CREATE UNIQUE INDEX i1 ON t1 ($c)"
          Some(c)
        case 2 =>
          stmts += s"CREATE UNIQUE INDEX i1 ON t1 (lower($c))"
          None
        case 3 =>
          stmts += s"CREATE UNIQUE INDEX i1 ON t1 ($c COLLATE NOCASE)"
          None
        case 4 =>
          // composite `||` key (round 13, VERDICT r12 #2 + ADVICE r11
          // #1): `||` yields TEXT storage in sqlite even when a
          // text-returning function does NOT span the whole key
          // expression — the corner the r12 topLevelConcat fix pinned
          // by hand; generating it makes the fix fuzzed, not just
          // hand-pinned.
          val c2 = cols(rnd.nextInt(cols.size)).name
          stmts += s"CREATE UNIQUE INDEX i1 ON t1 (lower($c) || $c2)"
          None
        case _ =>
          val w = if (rnd.nextBoolean()) s"$c IS NOT NULL" else s"$c > 0"
          stmts += s"CREATE UNIQUE INDEX i1 ON t1 ($c) WHERE $w"
          None
      }
    } else None

    // --- DML block, sometimes inside a transaction ------------------
    val inTx = rnd.nextInt(10) < 4
    if (inTx) stmts += "BEGIN"
    val nDml = 1 + rnd.nextInt(3)
    for (_ <- 1 to nDml) rnd.nextInt(6) match {
      case 0 | 1 =>
        val target = cols(rnd.nextInt(cols.size))
        val rhs = if (target.decl.isEmpty) numExpr(rnd, cols)
                  else expr(rnd, cols)
        stmts += s"UPDATE t1 SET ${target.name} = $rhs " +
          s"WHERE ${pred(rnd, cols)}"
      case 2 =>
        stmts += s"DELETE FROM t1 WHERE ${pred(rnd, cols)}"
      case 3 if pkIdx.isDefined || indexed.isDefined =>
        val key = indexed.getOrElse(cols(pkIdx.get).name)
        val other = cols.find(_.name != key).getOrElse(cols.head)
        val vals = cols.map(c => valueFor(rnd, c))
        val action =
          if (rnd.nextBoolean()) "DO NOTHING"
          else s"DO UPDATE SET ${other.name} = excluded.${other.name}"
        stmts += s"INSERT INTO t1 VALUES (${vals.mkString(", ")}) " +
          s"ON CONFLICT ($key) $action"
      case _ =>
        val vals = cols.map(c => valueFor(rnd, c))
        stmts += s"INSERT INTO t1 VALUES (${vals.mkString(", ")})"
    }
    if (inTx) {
      rnd.nextInt(3) match {
        case 0 => stmts += "ROLLBACK"
        case 1 => stmts += "COMMIT"
        case _ =>
          stmts += "SAVEPOINT s1"
          stmts += s"DELETE FROM t1 WHERE ${pred(rnd, cols)}"
          stmts += "ROLLBACK TO s1"
          stmts += "COMMIT"
      }
    }

    // --- optional ATTACH block (round 9): fresh per-seed path, a
    // second-schema table, cross-schema DML and a join back to main.
    // ATTACH sits outside the transaction block above (sqlite3
    // forbids it inside one). runSqlite unlinks the path first so
    // both engines see the same empty schema.
    val hasAttach = rnd.nextInt(5) == 0
    if (hasAttach) {
      stmts += s"ATTACH DATABASE '${attachPath(seed)}' AS aux1"
      stmts += "CREATE TABLE aux1.t2 (p INTEGER, q)"
      val nRows = 2 + rnd.nextInt(2)
      val rows = Seq.fill(nRows)(
        s"(${intLits(rnd.nextInt(intLits.size))}, " +
          s"${safeTextLits(rnd.nextInt(safeTextLits.size))})")
      stmts += s"INSERT INTO aux1.t2 VALUES ${rows.mkString(", ")}"
      rnd.nextInt(3) match {
        case 0 => stmts += s"UPDATE aux1.t2 SET q = upper(q) " +
          s"WHERE p > ${intLits(rnd.nextInt(intLits.size))}"
        case 1 => stmts += s"DELETE FROM aux1.t2 " +
          s"WHERE p < ${intLits(rnd.nextInt(intLits.size))}"
        case _ => ()
      }
      // unqualified resolution falls through main to the attached
      // schema when the bare name is free (sqlite3 name resolution)
      val rel = if (rnd.nextBoolean()) "aux1.t2" else "t2"
      stmts += s"SELECT * FROM $rel ORDER BY 1, 2"
      stmts += s"SELECT count(*) FROM t1, aux1.t2 WHERE aux1.t2.p >= 0"
      if (rnd.nextBoolean()) stmts += "DETACH aux1"
    }

    // --- optional view ---------------------------------------------
    val hasView = rnd.nextInt(10) < 3
    var viewCols: Vector[Col] = Vector.empty
    if (hasView) {
      viewCols = rnd.shuffle(cols).take(2)
      stmts += s"CREATE TEMP VIEW v1 AS SELECT ${viewCols.map(_.name).mkString(", ")} " +
        s"FROM t1 WHERE ${pred(rnd, cols)}"
    }

    // --- optional INSTEAD OF trigger + view DML (round 9) -----------
    // the body logs one NEW/OLD view-column value; the final ordered
    // SELECT over vlog pins per-row firing and binding. The logged
    // column is non-TEXT (the provenance guard the audit trigger
    // uses: numeric-looking TEXT storage would classify differently).
    val hasViewTrigger = hasView &&
      viewCols.exists(_.decl != "TEXT") && rnd.nextInt(3) == 0
    if (hasViewTrigger) {
      stmts += "CREATE TABLE vlog (w)"
      val logCands = viewCols.filter(_.decl != "TEXT")
      val lc = logCands(rnd.nextInt(logCands.size))
      val (event, ref) = rnd.nextInt(3) match {
        case 0 => ("INSERT", "NEW")
        case 1 => ("UPDATE", "NEW")
        case _ => ("DELETE", "OLD")
      }
      stmts += s"CREATE TRIGGER vtr INSTEAD OF $event ON v1 " +
        s"BEGIN INSERT INTO vlog VALUES ($ref.${lc.name}); END"
      def viewDml(): Unit = event match {
        case "INSERT" =>
          val vals = viewCols.map(c => viewValueFor(rnd, c))
          stmts += s"INSERT INTO v1 VALUES (${vals.mkString(", ")})"
        case "UPDATE" =>
          stmts += s"UPDATE v1 SET ${lc.name} = ${viewValueFor(rnd, lc)} " +
            s"WHERE ${pred(rnd, viewCols)}"
        case _ =>
          stmts += s"DELETE FROM v1 WHERE ${pred(rnd, viewCols)}"
      }
      viewDml()
      // --- trigger-registry rollback across SAVEPOINT (round 10,
      // VERDICT r9 ask #8): a SECOND trigger on the same view is
      // created inside a savepoint with view DML interleaved.
      // ROLLBACK TO must undo both the DML and the registry entry —
      // later view DML fires only the surviving trigger — while the
      // RELEASE path keeps both. The final ordered vlog SELECT pins
      // the exact firing set either way ('m2' is a non-numeric-
      // looking marker, safe under the provenance deviation).
      if (rnd.nextInt(2) == 0) {
        stmts += "SAVEPOINT sv1"
        stmts += s"CREATE TRIGGER vtr2 INSTEAD OF $event ON v1 " +
          s"BEGIN INSERT INTO vlog VALUES ('m2'); END"
        viewDml()
        if (rnd.nextBoolean()) {
          stmts += "ROLLBACK TO sv1"
          viewDml() // vtr2 is gone: only vtr may fire
        }
        stmts += "RELEASE sv1"
        viewDml()
      }
    }

    // --- final SELECTs (always fully ordered) -----------------------
    // Round 11 (VERDICT r10 #6): the SELECT side grew four arms —
    // window functions (5), correlated subqueries (6), CTEs over the
    // script-created table (7), ORDER BY + LIMIT + COLLATE (8).
    // Determinism rules the arms obey:
    //  - keys where EQUALITY matters (rank peers, RANGE-frame peers,
    //    PARTITION BY, LIMIT cuts) come from DECLARED columns only —
    //    a no-affinity column can hold int 100 and real 100.0, which
    //    sqlite's value comparison merges but graft's canonical-text
    //    storage keeps distinct (the documented provenance deviation,
    //    same guard as the GROUP BY arm / seed 4110);
    //  - row_number ties must be INTERCHANGEABLE in the sorted
    //    output: the select list is exactly the window-order columns,
    //    so rows tying on the whole key are textually identical and
    //    either tie order prints the same bytes;
    //  - LIMIT needs a total order over the SELECTED columns for the
    //    same reason (rows tying on every printed column are
    //    interchangeable at the cut).
    val nSel = 1 + rnd.nextInt(3)
    for (_ <- 1 to nSel) rnd.nextInt(10) match {
      case 0 =>
        val ords = cols.indices.map(i => s"${i + 1}").mkString(", ")
        stmts += s"SELECT * FROM t1 ORDER BY $ords"
      case 1 =>
        val es = Seq.fill(2 + rnd.nextInt(2))(expr(rnd, cols))
        val ords = es.indices.map(i => s"${i + 1}").mkString(", ")
        stmts += s"SELECT ${es.mkString(", ")} FROM t1 " +
          s"WHERE ${pred(rnd, cols)} ORDER BY $ords"
      case 2 if cols.exists(_.decl.nonEmpty) =>
        // group keys come from DECLARED columns only: canonicalization
        // makes their values unambiguous, while an untyped column can
        // hold 100 and 100.0 as distinct strings that sqlite's
        // numeric grouping would merge (the documented provenance
        // deviation — round-10 seed 4110 hit it through the old
        // all-undeclared fallback, so that fallback is gone: a table
        // with no declared column draws the count(*) select instead)
        val declared = cols.filter(_.decl.nonEmpty)
        val g = declared(rnd.nextInt(declared.size)).name
        // min/max draw from DECLARED columns only (round-13 fuzz seed
        // 4255): on a no-affinity column, numerically-equal values in
        // different storage-class renderings (int 0 vs real 0.0 from
        // an abs() UPDATE) can tie for the extremum, and sqlite then
        // returns the FIRST in rowid scan order — an order the
        // canonical store doesn't track (rebind chains reorder rows
        // physically). Declared affinities canonicalize equal
        // numerics to one rendering at insert, so the tie is
        // representation-free there. Same deviation family as the
        // value-provenance exclusions (storeCanonical's scaladoc).
        def declRef(): String = declared(rnd.nextInt(declared.size)).name
        val agg = rnd.nextInt(5) match {
          case 0 => s"count(*)"
          case 1 => s"sum(${colRef(rnd, cols)})"
          case 2 => s"total(${colRef(rnd, cols)})"
          case 3 => s"min(${declRef()})"
          case _ => s"max(${declRef()})"
        }
        val having = if (rnd.nextInt(3) == 0) " HAVING count(*) >= 1" else ""
        stmts += s"SELECT $g, $agg FROM t1 GROUP BY $g$having ORDER BY 1"
      case 3 if hasView =>
        stmts += "SELECT * FROM v1 ORDER BY 1, 2"
      case 5 if cols.exists(_.decl.nonEmpty) =>
        // window functions over affinity columns
        val dNames = cols.filter(_.decl.nonEmpty).map(_.name)
        rnd.nextInt(4) match {
          case 0 =>
            val oc = dNames.mkString(", ")
            val ords = (1 to dNames.size + 1).mkString(", ")
            stmts += s"SELECT $oc, row_number() OVER (ORDER BY $oc) " +
              s"FROM t1 ORDER BY $ords"
          case 1 =>
            val k = dNames(rnd.nextInt(dNames.size))
            val f = if (rnd.nextBoolean()) "rank" else "dense_rank"
            stmts += s"SELECT $k, $f() OVER (ORDER BY $k) FROM t1 ORDER BY 1, 2"
          case 2 =>
            val p = dNames(rnd.nextInt(dNames.size))
            val f = if (rnd.nextBoolean()) "sum" else "total"
            stmts += s"SELECT $p, $f(${colRef(rnd, cols)}) " +
              s"OVER (PARTITION BY $p) FROM t1 ORDER BY 1, 2"
          case _ =>
            val k = dNames(rnd.nextInt(dNames.size))
            stmts += s"SELECT $k, count(*) OVER (ORDER BY $k) FROM t1 ORDER BY 1, 2"
        }
      case 6 =>
        // correlated subqueries (scalar + EXISTS/NOT EXISTS)
        val c1 = colRef(rnd, cols)
        val c2 = colRef(rnd, cols)
        rnd.nextInt(3) match {
          case 0 =>
            stmts += s"SELECT $c1, (SELECT count(*) FROM t1 x " +
              s"WHERE x.$c1 < t1.$c1) FROM t1 ORDER BY 1, 2"
          case 1 =>
            stmts += s"SELECT count(*) FROM t1 WHERE EXISTS " +
              s"(SELECT 1 FROM t1 x WHERE x.$c1 = t1.$c1 AND x.$c2 <> t1.$c2)"
          case _ =>
            stmts += s"SELECT count(*) FROM t1 WHERE NOT EXISTS " +
              s"(SELECT 1 FROM t1 x WHERE x.$c1 > t1.$c1)"
        }
      case 7 =>
        // CTEs over the script-created table
        val c1 = colRef(rnd, cols)
        if (rnd.nextBoolean()) {
          stmts += s"WITH w AS (SELECT $c1 AS u, ${expr(rnd, cols)} AS v " +
            s"FROM t1 WHERE ${pred(rnd, cols)}) SELECT u, v FROM w ORDER BY 1, 2"
        } else {
          stmts += s"WITH w AS (SELECT $c1 AS u FROM t1 WHERE ${pred(rnd, cols)}) " +
            s"SELECT count(*) FROM t1, w WHERE t1.$c1 = w.u"
        }
      case 9 =>
        // mixed-storage CASE/coalesce inside a CTE body feeding ORDER
        // BY (round 14, VERDICT r13 #3): a text-STORAGE branch
        // (upper/substr — TEXT tier in sqlite even when the
        // characters look numeric) mixed with a value-mode branch
        // (bare column / arithmetic), referenced through the
        // CTERelationRef where the one-level alias map can't see the
        // defining expression.
        val c1 = colRef(rnd, cols)
        val c2 = colRef(rnd, cols)
        val textBranch =
          if (rnd.nextBoolean()) s"upper($c1)" else s"substr($c1, 1, 2)"
        val numBranch = if (rnd.nextBoolean()) s"$c2 + 1" else c2
        val v =
          if (rnd.nextBoolean())
            s"CASE WHEN ${pred(rnd, cols, 1)} THEN $textBranch ELSE $numBranch END"
          else s"coalesce($textBranch, $numBranch)"
        stmts += s"WITH w AS (SELECT $c1 AS u, $v AS v FROM t1) " +
          s"SELECT u, v FROM w ORDER BY 1, 2"
      case 8 if cols.exists(_.decl.nonEmpty) =>
        // ORDER BY + LIMIT (+ COLLATE / DESC / OFFSET) compositions
        val dNames = cols.filter(_.decl.nonEmpty).map(_.name)
        val k = dNames(rnd.nextInt(dNames.size))
        val mod = rnd.nextInt(3) match {
          case 0 => " COLLATE NOCASE"
          case 1 => " DESC"
          case _ => ""
        }
        val off = if (rnd.nextBoolean()) s" OFFSET ${rnd.nextInt(3)}" else ""
        val ords = (1 to dNames.size).mkString(", ")
        stmts += s"SELECT ${dNames.mkString(", ")} FROM t1 " +
          s"ORDER BY $k$mod, $ords LIMIT ${1 + rnd.nextInt(4)}$off"
      case _ =>
        stmts += s"SELECT count(*) FROM t1 WHERE ${pred(rnd, cols)}"
    }
    if (hasTrigger) stmts += "SELECT id, v FROM alog ORDER BY id"
    if (hasViewTrigger) stmts += "SELECT w FROM vlog ORDER BY 1"

    stmts.result().mkString(";\n") + ";\n"
  }

  /** Per-seed ATTACH target; [[runSqlite]] unlinks it before running
    * so sqlite3 creates it fresh (graft attaches a missing store as an
    * empty schema — same starting state). */
  private def attachPath(seed: Long): String =
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graftfuzz_att_$seed.db"

  private val AttPathRe = """'(\S*/graftfuzz_att_-?\d+\.db)'""".r

  // ---------------------------------------------------------------- //
  //  execution                                                       //
  // ---------------------------------------------------------------- //

  // --- janino-fallback attribution (round 14, VERDICT r13 #1) ------ //
  // A log4j2 appender on the two loggers Spark emits codegen-fallback
  // warnings through ("Whole-stage codegen disabled for plan" from
  // WholeStageCodegenExec; "falling back to interpreter mode" from
  // CodeGeneratorWithInterpretedFallback), counting regardless of the
  // console level (sweeps run at ERROR to keep stdout parseable).
  // Additivity is off so the captured WARNs never hit the console.

  private val fallbackCount = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var fallbackHooked = false

  /** Total codegen-fallback warnings captured since the hook. */
  def fallbacks(): Long = { hookFallbackCounter(); fallbackCount.get() }

  private def hookFallbackCounter(): Unit = synchronized {
    if (fallbackHooked) return
    fallbackHooked = true
    import org.apache.logging.log4j.{Level => L4Level}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.{LoggerConfig, Property}
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-fallback-counter", null, null, false, Property.EMPTY_ARRAY) {
      override def append(ev: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = ev.getMessage.getFormattedMessage
        if (m.contains("Whole-stage codegen disabled") ||
            m.contains("falling back to interpreter mode"))
          fallbackCount.incrementAndGet()
      }
    }
    app.start()
    for (ln <- Seq(
        "org.apache.spark.sql.execution.WholeStageCodegenExec",
        "org.apache.spark.sql.catalyst.expressions.CodeGeneratorWithInterpretedFallback")) {
      val lc = new LoggerConfig(ln, L4Level.WARN, false)
      lc.addAppender(app, L4Level.WARN, null)
      cfg.addLogger(ln, lc)
    }
    ctx.updateLoggers()
  }

  /** Per-run janino attribution: fallback-warning count and the first
    * statement whose execution raised the counter. */
  final case class JaninoReport(count: Long, firstStmt: Option[(Int, String)])

  @volatile private var lastJanino: JaninoReport = JaninoReport(0, None)
  def lastJaninoReport: JaninoReport = lastJanino

  /** (errored, stdout). Leaves no temp views behind. */
  def runGraft(spark: SparkSession, script: String): (Boolean, String) = {
    hookFallbackCounter()
    graft.functions.GraftFunctions.register(spark)
    val sw = new StringWriter
    val ser = ScriptRunner.makeSerializer("awk",
      GlobalOptions(ofs = Sep), sw)
    val start = fallbackCount.get()
    var seen = start
    var stmtIdx = 0
    var first: Option[(Int, String)] = None
    val observe: String => Unit = stmt => {
      stmtIdx += 1
      val now = fallbackCount.get()
      if (now > seen && first.isEmpty) first = Some((stmtIdx, stmt.trim))
      seen = now
    }
    val r =
      try { ScriptRunner.run(spark, script, ser, None, observe); (false, sw.toString) }
      catch {
        case _: Throwable =>
          try ser.close() catch { case _: Throwable => () }
          (true, sw.toString)
      }
    lastJanino = JaninoReport(fallbackCount.get() - start, first)
    for (t <- Seq("t1", "v1", "alog", "vlog", "t2", "graft_att_aux1_t2"))
      spark.catalog.dropTempView(t)
    r
  }

  /** (errored, stdout) from the sqlite3 CLI, script on stdin. Any
    * generated ATTACH target is unlinked first: a leftover file from
    * a previous run of the same seed would carry its old tables and
    * make CREATE TABLE in the attached schema diverge. */
  def runSqlite(script: String): (Boolean, String) = {
    for (m <- AttPathRe.findAllMatchIn(script))
      new java.io.File(m.group(1)).delete()
    val pb = new ProcessBuilder("sqlite3", "-batch", "-bail", "-list",
      "-noheader", "-separator", Sep, ":memory:")
    pb.redirectErrorStream(false)
    val p = pb.start()
    p.getOutputStream.write(script.getBytes(StandardCharsets.UTF_8))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    p.getErrorStream.readAllBytes()
    val code = p.waitFor()
    (code != 0, out)
  }

  final case class Divergence(seed: Long, script: String,
      graft: (Boolean, String), sqlite: (Boolean, String))

  /** Run seeds [from, from+n) through both engines; return divergences. */
  def sweep(spark: SparkSession, from: Long, n: Int,
      progressEvery: Int = 0): Seq[Divergence] = {
    val bad = Vector.newBuilder[Divergence]
    var i = 0
    while (i < n) {
      val seed = from + i
      val script = genScript(seed)
      val g = runGraft(spark, script)
      // janino attribution (VERDICT r13 #1): any codegen fallback is
      // reported per seed with the first statement that raised it, so
      // the collapse-bound estimator can be recalibrated on the
      // actual escaping shapes instead of guessed weights
      val jr = lastJaninoReport
      if (jr.count > 0) {
        val at = jr.firstStmt
          .map { case (i, st) => s" first_stmt#$i: ${st.take(200)}" }
          .getOrElse("")
        println(s"[fuzz] JANINO seed=$seed fallbacks=${jr.count}$at")
        Console.out.flush()
      }
      val s = runSqlite(script)
      if (g != s) {
        bad += Divergence(seed, script, g, s)
        // report immediately (and flush — stdout is block-buffered
        // when redirected to a file): long standalone sweeps get
        // killed on time budgets and must not lose findings. The
        // truncated outputs ride along (round 15): a load-flaky
        // divergence (e.g. a broadcast timeout erroring the graft
        // side) replays clean in isolation, so without the sweep-time
        // evidence it cannot be attributed post-hoc.
        println(s"[fuzz] DIVERGENT seed=$seed graftErr=${g._1} sqliteErr=${s._1}")
        println(s"[fuzz]   graft : ${g._2.replace(Sep, "|").take(300).replace("\n", "\\n")}")
        println(s"[fuzz]   sqlite: ${s._2.replace(Sep, "|").take(300).replace("\n", "\\n")}")
        Console.out.flush()
      }
      i += 1
      if (progressEvery > 0 && i % progressEvery == 0) {
        println(s"[fuzz] $i/$n done, ${bad.result().size} divergent")
        Console.out.flush()
      }
    }
    bad.result()
  }
}

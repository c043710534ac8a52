package graft.cli

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, when}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.Affinity

/** DDL/DML statements of the script dialect (SURVEY.md §7.4 #6).
  *
  * The reference passes scripts verbatim to SQLite (README.md:100;
  * lib/classes/sqawk.tcl:216), so `CREATE TABLE`/`INSERT` are part of
  * its dialect. Spark temp views are immutable, so we map the
  * side-effecting statements onto view (re)binding:
  *
  *  - `CREATE [TEMP] TABLE [IF NOT EXISTS] t AS select` → run the
  *    select, bind `t` (eager analysis snapshots the source plans, so
  *    later INSERTs into the sources do not retroactively change `t`
  *    — the same snapshot semantics as SQLite's materializing CTAS);
  *  - `CREATE [TEMP] TABLE t (cols…)` → bind an empty view with the
  *    declared column names (values get their types from INSERTs;
  *    union type-widening mirrors affinity's permissiveness);
  *  - `INSERT INTO t [(cols)] VALUES …|SELECT …` → union-rebind;
  *    VALUES runs through `spark.sql` directly (Spark supports
  *    top-level VALUES), omitted columns fill with NULL;
  *  - `DROP TABLE [IF EXISTS] t` → drop the temp view;
  *  - `DELETE FROM t [WHERE c]` → filter-and-rebind. SQLite keeps rows
  *    whose condition is NULL (sqlite3-pinned in CliSpec), so the kept
  *    set is `NOT coalesce(c, false)`;
  *  - `UPDATE t SET a = e, … [WHERE c]` → projection-with-CASE rebind:
  *    every assignment evaluates against the OLD row (sqlite3-pinned:
  *    `SET a = a+100, b = a+1` uses the pre-update `a` in both), which
  *    a single SELECT projection gives for free. When one column is
  *    assigned twice, the rightmost assignment wins (SQLite rule);
  *  - `CREATE [TEMP] VIEW v AS select` → a SQL-created temp view.
  *    Unlike CTAS, views RE-EVALUATE on every reference (Spark stores
  *    the view text for SQL-created temp views and re-resolves it),
  *    so an INSERT into a base table after CREATE VIEW shows through
  *    the view — sqlite3-pinned in CliSpec. `DROP VIEW` shares the
  *    DROP arm (temp views and "tables" live in one namespace here);
  *  - `CREATE INDEX` / `DROP INDEX` → no-ops: SQLite indexes change
  *    performance, never results, and Catalyst plans declaratively.
  *    `CREATE UNIQUE INDEX` is rejected (its uniqueness constraint on
  *    later INSERTs would silently not be enforced);
  *  - the rest of SQLite's statement surface (triggers included) gets
  *    a one-line sqawk-style rejection instead of a raw Spark error.
  */
object ScriptDdl {

  private val Ctas =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?table\s+(if\s+not\s+exists\s+)?[`"]?(\w+)[`"]?\s+as\s+(.+)""".r
  private val CreateCols =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?table\s+(if\s+not\s+exists\s+)?[`"]?(\w+)[`"]?\s*\((.+)\)\s*""".r
  private val Insert =
    """(?is)\s*insert\s+(?:or\s+\w+\s+)?into\s+[`"]?(\w+)[`"]?\s*(\([^)]*\))?\s*((?:values|select|with)\b.+)""".r
  private val CreateView =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?view\s+(if\s+not\s+exists\s+)?[`"]?(\w+)[`"]?\s+as\s+(.+)""".r
  private val Drop =
    """(?is)\s*drop\s+(?:table|view)\s+(if\s+exists\s+)?[`"]?(\w+)[`"]?\s*""".r
  private val CreateIndex =
    """(?is)\s*create\s+(unique\s+)?index\s+.+""".r
  private val DropIndex =
    """(?is)\s*drop\s+index\s+.+""".r
  private val CreateTrigger =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?trigger\b.*""".r
  private val Update =
    """(?is)\s*update\s+(?:or\s+\w+\s+)?[`"]?(\w+)[`"]?\s+set\s+(.+)""".r
  private val Delete =
    """(?is)\s*delete\s+from\s+[`"]?(\w+)[`"]?(?:\s+where\s+(.+?))?\s*""".r
  private val Rejected =
    """(?is)\s*(alter|replace|vacuum|pragma|attach|detach|reindex|analyze|begin|commit|rollback|savepoint|release)\b.*""".r

  /** True when `name` is a SQL-created temp VIEW (stores view text and
    * re-resolves) rather than a plan-bound table: DML must reject it
    * like sqlite3 ("cannot modify v because it is a view"). */
  private def isView(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.getRawTempView(name)
      .exists(_.tableMeta.viewText.isDefined)

  private def rejectViewDml(spark: SparkSession, name: String): Unit =
    if (isView(spark, name))
      throw new UnsupportedOperationException(
        s"cannot modify $name because it is a view")

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '`' || t.head == '"') && t.last == t.head)
      t.substring(1, t.length - 1)
    else t
  }

  /** Every DML arm rebinds the view over its previous plan, so a
    * script with hundreds of INSERT/UPDATE/DELETE statements grows a
    * linearly deeper plan — O(statements²) driver-side analysis over
    * the script (VERDICT r4 watch-list #2). Past this node count the
    * rebind materializes via localCheckpoint, cutting lineage back to
    * a leaf; the cost is one write of the (CLI-sized) table amortized
    * over the statements that grew the plan. Schema metadata — the
    * affinity tags — survives the checkpoint. */
  private val CollapseNodes = 128

  private def collapseIfDeep(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nodes = df.queryExecution.analyzed.collect { case p => p }.size
    if (nodes > CollapseNodes) df.localCheckpoint() else df
  }

  /** Handle `stmt` if it is a side-effecting dialect statement.
    * Returns true when handled (no result rows to serialize); false
    * when the statement is a plain query for `spark.sql`. */
  def execute(spark: SparkSession, stmt: String): Boolean = stmt match {
    case Rejected(kw) =>
      throw new UnsupportedOperationException(
        s"${kw.toUpperCase} statements are not supported by this engine")

    case Ctas(ifNotExists, name, select) =>
      if (spark.catalog.tableExists(name)) {
        if (ifNotExists == null)
          throw new IllegalArgumentException(s"table $name already exists")
      } else spark.sql(select).createOrReplaceTempView(name)
      true

    case CreateCols(ifNotExists, name, colDefs) =>
      if (spark.catalog.tableExists(name)) {
        if (ifNotExists == null)
          throw new IllegalArgumentException(s"table $name already exists")
      } else {
        // First token of each top-level comma-separated definition is
        // the column name; table-level constraint defs are skipped.
        val constraintKw = Set("primary", "unique", "check", "foreign", "constraint")
        val names = splitTopLevel(colDefs)
          .map(d => stripQuotes(d.trim.split("\\s+", 2).head))
          .filterNot(n => constraintKw.contains(n.toLowerCase))
        // Created-table columns are dynamically typed like every sqawk
        // column: the NUMERIC affinity tag gives them SQLite's
        // storage-class ORDER BY / min / max via AffinityOrdering
        // (sqlite3-pinned: values 1,2,103,104 inserted as ints order
        // numerically, not as strings).
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(graft.plans.AffinityOrdering.AffinityKey, "NUMERIC").build()
        val schema = StructType(names.map(n => StructField(n, StringType, metadata = meta)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .createOrReplaceTempView(name)
      }
      true

    case Insert(name, colList, body) =>
      if (!spark.catalog.tableExists(name))
        throw new IllegalArgumentException(s"no such table: $name")
      rejectViewDml(spark, name)
      val target = spark.table(name)
      val rows = spark.sql(body)
      val aligned = Option(colList).map(_.trim).filter(_.nonEmpty) match {
        case None =>
          if (rows.columns.length != target.columns.length)
            throw new IllegalArgumentException(
              s"table $name has ${target.columns.length} columns but ${rows.columns.length} values were supplied")
          rows.toDF(target.columns.toIndexedSeq: _*)
        case Some(cl) =>
          val names = cl.stripPrefix("(").stripSuffix(")")
            .split(",").map(stripQuotes).toSeq
          if (names.length != rows.columns.length)
            throw new IllegalArgumentException(
              s"${names.length} columns but ${rows.columns.length} values were supplied")
          // unknown target columns error like sqlite3, instead of the
          // value silently vanishing in the NULL-fill below
          for (n <- names if !target.columns.exists(_.equalsIgnoreCase(n)))
            throw new IllegalArgumentException(
              s"table $name has no column named $n")
          val named = rows.toDF(names: _*)
          val filled = target.columns.foldLeft(named) { (df, c) =>
            if (names.exists(_.equalsIgnoreCase(c))) df
            else df.withColumn(c, lit(null).cast(target.schema(c).dataType))
          }
          filled.select(target.columns.map(col).toIndexedSeq: _*)
      }
      collapseIfDeep(target.unionByName(aligned)).createOrReplaceTempView(name)
      true

    case CreateView(ifNotExists, name, select) =>
      if (spark.catalog.tableExists(name)) {
        if (ifNotExists == null)
          throw new IllegalArgumentException(s"view $name already exists")
      } else spark.sql(s"CREATE TEMPORARY VIEW `$name` AS $select")
      true

    case Update(name, rest) =>
      if (!spark.catalog.tableExists(name))
        throw new IllegalArgumentException(s"no such table: $name")
      rejectViewDml(spark, name)
      val (setClause, whereOpt) = splitAtTopLevelWhere(rest)
      val assigns = splitTopLevel(setClause).map(parseAssignment)
      val target = spark.table(name)
      for ((n, _) <- assigns if !target.columns.exists(_.equalsIgnoreCase(n)))
        throw new IllegalArgumentException(s"no such column: $n")
      val proj = target.columns.map { c =>
        // rightmost assignment to a column wins (SQLite rule)
        assigns.reverse.find(_._1.equalsIgnoreCase(c)) match {
          case Some((_, exprText)) =>
            // SQLite applies the column's affinity to the assigned
            // value BEFORE storage; our tables store canonicalized
            // text (Affinity scaladoc), so render the value
            // SQLite-style and canonicalize under NUMERIC — this is
            // what turns the double-typed `a2 * 10` back into the
            // integer 20 that sqlite3 stores (pinned in CliSpec).
            val e = expr(exprText)
            val isBool = target.select(e).schema.head.dataType ==
              org.apache.spark.sql.types.BooleanType
            val rendered = if (isBool) e.cast("int").cast("string") else e.cast("string")
            val assigned = Affinity.canonicalExpr(rendered, "NUMERIC")
            // keep the column's affinity tag through the rebind, so
            // ORDER BY after UPDATE still uses storage-class ordering
            (whereOpt match {
              case Some(w) => when(expr(w), assigned).otherwise(col(s"`$c`"))
              case None    => assigned
            }).as(c, target.schema(c).metadata)
          case None => col(s"`$c`")
        }
      }
      collapseIfDeep(target.select(proj.toIndexedSeq: _*)).createOrReplaceTempView(name)
      true

    case Delete(name, cond) =>
      if (!spark.catalog.tableExists(name))
        throw new IllegalArgumentException(s"no such table: $name")
      rejectViewDml(spark, name)
      val rebound =
        if (cond == null) spark.table(name).limit(0)
        else spark.sql(s"SELECT * FROM `$name` WHERE NOT coalesce(($cond), false)")
      collapseIfDeep(rebound).createOrReplaceTempView(name)
      true

    case CreateIndex(unique) =>
      // SQLite indexes change performance, never results; Catalyst
      // plans declaratively, so a plain CREATE INDEX is a faithful
      // no-op. A UNIQUE index also enforces a constraint on later
      // INSERTs — silently ignoring that would diverge, so reject.
      if (unique != null)
        throw new UnsupportedOperationException(
          "CREATE UNIQUE INDEX is not supported by this engine (uniqueness would not be enforced)")
      true

    case DropIndex() => true // companion no-op

    case CreateTrigger() =>
      throw new UnsupportedOperationException(
        "CREATE TRIGGER statements are not supported by this engine")

    case Drop(ifExists, name) =>
      val existed = spark.catalog.dropTempView(name)
      if (!existed && ifExists == null)
        throw new IllegalArgumentException(s"no such table: $name")
      true

    case _ => false
  }

  /** Split an UPDATE tail `SET-list [WHERE cond]` at the first
    * top-level WHERE keyword — outside quotes and parentheses, so a
    * `'where'` string literal or a subquery's WHERE never splits. */
  private def splitAtTopLevelWhere(s: String): (String, Option[String]) = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'w' | 'W' if depth == 0 &&
            i + 5 <= s.length && s.substring(i, i + 5).equalsIgnoreCase("where") &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
            (i + 5 == s.length || !Character.isLetterOrDigit(s.charAt(i + 5)) && s.charAt(i + 5) != '_') =>
          return (s.substring(0, i), Some(s.substring(i + 5)))
        case _ =>
      }
      i += 1
    }
    (s, None)
  }

  private val Assignment = """(?s)\s*[`"]?(\w+)[`"]?\s*=(.+)""".r

  private def parseAssignment(a: String): (String, String) = a match {
    case Assignment(name, expr) => (name, expr)
    case other => throw new IllegalArgumentException(
      s"""cannot parse SET assignment near "${other.trim.take(40)}"""")
  }

  /** Split on commas outside parentheses and quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    for (c <- s) {
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c; sb.append(c)
        case '(' => depth += 1; sb.append(c)
        case ')' => depth -= 1; sb.append(c)
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }
}

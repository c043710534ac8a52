package graft.cli

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  *  - UPDATE/DELETE and the rest of SQLite's statement surface get a
  *    one-line sqawk-style rejection instead of a raw Spark error.
  */
object ScriptDdl {

  private val Ctas =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?table\s+(if\s+not\s+exists\s+)?[`"]?(\w+)[`"]?\s+as\s+(.+)""".r
  private val CreateCols =
    """(?is)\s*create\s+(?:temp(?:orary)?\s+)?table\s+(if\s+not\s+exists\s+)?[`"]?(\w+)[`"]?\s*\((.+)\)\s*""".r
  private val Insert =
    """(?is)\s*insert\s+(?:or\s+\w+\s+)?into\s+[`"]?(\w+)[`"]?\s*(\([^)]*\))?\s*((?:values|select|with)\b.+)""".r
  private val Drop =
    """(?is)\s*drop\s+table\s+(if\s+exists\s+)?[`"]?(\w+)[`"]?\s*""".r
  private val Rejected =
    """(?is)\s*(update|delete|alter|replace|vacuum|pragma|attach|detach|reindex|analyze|begin|commit|rollback|savepoint|release)\b.*""".r

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '`' || t.head == '"') && t.last == t.head)
      t.substring(1, t.length - 1)
    else t
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
        val schema = StructType(names.map(n => StructField(n, StringType)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .createOrReplaceTempView(name)
      }
      true

    case Insert(name, colList, body) =>
      if (!spark.catalog.tableExists(name))
        throw new IllegalArgumentException(s"no such table: $name")
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
      target.unionByName(aligned).createOrReplaceTempView(name)
      true

    case Drop(ifExists, name) =>
      val existed = spark.catalog.dropTempView(name)
      if (!existed && ifExists == null)
        throw new IllegalArgumentException(s"no such table: $name")
      true

    case _ => false
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-prior AS-OF join — the time-series matching primitive Spark
  * has no native operator for: each left row is paired with the single
  * most recent right row sharing its keys whose time is <= the left
  * row's time (inclusive).
  *
  * Composed from built-in operators (SURVEY §7.3 preference order —
  * compose before custom plans): UNION both inputs, then ONE per-key
  * window pass carries the last-seen right row forward and left rows
  * read it. Scale shape: a single hash shuffle on the keys and a
  * per-key sort — state per key is one carried struct. The naive
  * encoding (theta join `l.key = r.key AND r.t <= l.t` + max-per-left)
  * is a range join whose pair set grows quadratically inside hot keys;
  * this shape never builds the pair set at all.
  */
object AsofJoin {

  /** @param left  rows to enrich; all its columns pass through. Must
    *              not already contain a column named `asof` (the
    *              output attaches one; asserted below).
    * @param right rows to match; the winning row is attached whole as
    *              a struct column `asof` (null when no prior row).
    * @param keys  equality key columns, present in BOTH inputs. Key
    *              names `_t`, `_l`, `_r`, `_isr` are reserved for the
    *              internal union frame (asserted below). NULL keys
    *              follow SQL join equality: a left row with a null in
    *              any key gets a null `asof`, never a null-key right
    *              match (Window.partitionBy alone would group nulls
    *              together — that grouping is masked off at the end).
    * @param timeCol event-time column, present in BOTH inputs; right
    *              rows at exactly the left time DO match (inclusive).
    * @param tieBreak extra ordering columns (evaluated on the unioned
    *              frame, e.g. `col("_r.event_id")`) appended after
    *              (time, right-before-left) so the choice among right
    *              rows sharing a timestamp is deterministic.
    */
  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    val reserved = Set("_t", "_l", "_r", "_isr")
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(!keys.exists(reserved), s"key names ${reserved.mkString("/")} are reserved")
    require(!left.columns.contains("asof"),
      "left input already has a column named `asof` — rename it first")
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(timeCol).as("_t"),
        struct(left.columns.map(col).toSeq: _*).as("_l"),
        lit(null).cast(right.schema).as("_r"),
        lit(false).as("_isr")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(timeCol).as("_t"),
        lit(null).cast(left.schema).as("_l"),
        struct(right.columns.map(col).toSeq: _*).as("_r"),
        lit(true).as("_isr")): _*)
    // right rows sort BEFORE left rows at the same instant, so a left
    // row's frame includes same-timestamp right rows (inclusive match)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc +: col("_isr").desc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL join-equality on NULL keys: a null-key left row must not
    // match the null-key right rows its window partition contains
    val keysNonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    l2.unionByName(r2)
      .withColumn("asof", when(keysNonNull,
        last(when(col("_isr"), col("_r")), ignoreNulls = true).over(w)))
      .filter(!col("_isr"))
      .select(left.columns.map(c => col(s"_l.`$c`").as(c)).toSeq :+ col("asof"): _*)
  }
}

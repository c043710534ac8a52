package graft.cli

import graft.SparkSpec

/** Differential statement fuzz vs the sqlite3 CLI (see SqlScriptFuzz
  * for the grammar and the run protocol). Default 400 seeds in CI
  * (round 11 — VERDICT r10 #6 asked for 400 with the new SELECT-side
  * arms); `GRAFT_FUZZ_N` / `GRAFT_FUZZ_FROM` widen the sweep (the
  * 10k-seed sweep runs via `Test/runMain graft.cli.SqlFuzzMain`).
  */
class SqliteDifferentialFuzzSpec extends SparkSpec {

  test("generated scripts produce identical output and error behavior to sqlite3") {
    assume(
      try { SqlScriptFuzz.runSqlite("SELECT 1;") == (false, "1\n") }
      catch { case _: Throwable => false },
      "sqlite3 CLI not available")
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(400)
    val from = sys.env.get("GRAFT_FUZZ_FROM").map(_.toLong).getOrElse(0L)
    val bad = SqlScriptFuzz.sweep(spark, from, n)
    if (bad.nonEmpty) {
      val detail = bad.take(5).map { d =>
        s"""seed ${d.seed}:
           |${d.script}
           |graft : errored=${d.graft._1} out=${d.graft._2.replace(SqlScriptFuzz.Sep, "|")}
           |sqlite: errored=${d.sqlite._1} out=${d.sqlite._2.replace(SqlScriptFuzz.Sep, "|")}
           |""".stripMargin
      }.mkString("\n")
      fail(s"${bad.size}/$n scripts diverged from sqlite3:\n$detail")
    }
  }
}

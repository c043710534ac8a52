package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode accent/case folding for the curation pipeline (p40): NFD
  * decomposition, combining-mark removal, ROOT-locale lowercase —
  * the JVM mirror of DuckDB's `lower(strip_accents(x))`, which the
  * oracle uses; agreement over the injected Latin-accent set is what
  * the p40 hash compare verifies. Exposed as a StaticInvoke codegen
  * call (no ScalaUDF boxing), method name = registered name. */
object TextNorm {
  def graft_fold_accents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(
      nfd.replaceAll("\\p{M}+", "").toLowerCase(java.util.Locale.ROOT))
  }
}

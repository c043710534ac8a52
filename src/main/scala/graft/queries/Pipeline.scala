package graft.queries

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) — the beyond-the-reference surface. */
object Pipeline {
  val all: Vector[QDef] = Vector()
}

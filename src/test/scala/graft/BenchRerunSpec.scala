package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's noise-adjudication decision (VERDICT r12 #5: the
  * first full sweep with the mechanism ran against an empty
  * predecessor map, so the rerun path had never demonstrably fired).
  * The decision itself is pure — one extra timed lap iff the row
  * regressed >1.5× against its predecessor AND started under
  * elevated load — so it is pinned here against a synthetic
  * predecessor map, independent of any live sweep. */
class BenchRerunSpec extends AnyFunSuite {
  private val bar = 1.2

  test("regression under elevated load triggers the extra lap") {
    assert(Bench.needsRerun(t = 0.9, prev = 0.5, rowLoad = 3.4, loadBar = bar))
  }

  test("quiet-load regression stays visible (no rerun)") {
    // a slow row on a quiet box is real — re-timing it would hide a
    // genuine regression behind best-of-3
    assert(!Bench.needsRerun(t = 0.9, prev = 0.5, rowLoad = 0.3, loadBar = bar))
  }

  test("within-1.5x movement never re-runs, at any load") {
    assert(!Bench.needsRerun(t = 0.74, prev = 0.5, rowLoad = 5.0, loadBar = bar))
  }

  test("no predecessor means nothing to adjudicate") {
    assert(!Bench.needsRerun(t = 9.0, prev = -1.0, rowLoad = 5.0, loadBar = bar))
    assert(!Bench.needsRerun(t = 9.0, prev = 0.0, rowLoad = 5.0, loadBar = bar))
  }

  test("boundary: exactly 1.5x / exactly at the load bar do not fire") {
    assert(!Bench.needsRerun(t = 0.75, prev = 0.5, rowLoad = 5.0, loadBar = bar))
    assert(!Bench.needsRerun(t = 0.9, prev = 0.5, rowLoad = bar, loadBar = bar))
  }
}

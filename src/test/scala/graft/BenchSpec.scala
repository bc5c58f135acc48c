package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed floors.json contract the bench pre-warm (doc item
  * 3b) depends on: the file parses, documentation keys are excluded,
  * and the expensive tail actually clears the pre-warm threshold — a
  * floors.json edit that silently emptied the table would otherwise
  * degrade the next driver capture back to cold singles with no local
  * signal. */
class BenchSpec extends AnyFunSuite {

  test("loadFloors parses the committed table and skips _doc keys") {
    val floors = Bench.loadFloors()
    assert(floors.nonEmpty, "floors.json must parse from the repo root")
    assert(floors.keys.forall(!_.startsWith("_")),
      "documentation keys must not become floor rows")
    // a pinned row, exact (the file is data, not prose) — r19 full
    // regeneration value (SCALE.md round-19 floor section)
    assert(floors.get("q_image_crop_perceptual").contains(3.2))
    // every floor row must be a registered query or bench window name —
    // a typo here would silently never pre-warm
    val known = Registry.byName.keySet ++ Bench.benchOnly.keySet
    val unknown = floors.keySet.filterNot(known.contains)
    assert(unknown.isEmpty, s"floor rows for unregistered queries: $unknown")
  }

  test("the expensive tail clears the pre-warm threshold") {
    val floors = Bench.loadFloors()
    val above = floors.filter(_._2 >= Bench.warmFloorSec).keySet
    assert(above.size >= 10,
      s"expected the floor tail above ${Bench.warmFloorSec}s, got $above")
    assert(above.contains("q_image_crop_detect"),
      "the r16 28x-error family must pre-warm")
  }
}

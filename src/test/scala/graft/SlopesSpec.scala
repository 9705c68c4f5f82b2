package graft

import org.scalatest.funsuite.AnyFunSuite

/** The slope gate's registry discipline (round-15): the watchlist must
  * reference real queries (a renamed query must not silently drop out
  * of the gate), and every query registered after the gate landed
  * (x208 onward) must carry a scaling story on arrival — the
  * round-workflow rule, enforced instead of remembered. */
class SlopesSpec extends AnyFunSuite {

  test("every slope-watchlist entry is a registered query") {
    val reg = SparkEntry.queries.keySet
    val missing = Slopes.watched.map(_._1).filterNot(reg)
    assert(missing.isEmpty, s"watchlist names not in the registry: $missing")
  }

  test("every post-gate query (x208+) has a slope story") {
    val watchedNames = Slopes.watched.map(_._1).toSet
    val postGate = SparkEntry.queries.keySet.filter { n =>
      n.startsWith("x") &&
        n.drop(1).takeWhile(_.isDigit).toIntOption.exists(_ >= 208)
    }
    val unwatched = postGate.diff(watchedNames)
    assert(unwatched.isEmpty,
      s"new queries missing a Slopes.watched story: $unwatched")
  }

  test("stories are from the documented set") {
    val known = Set("linear", "volume-faithful", "key-bounded",
      "quadratic-by-design", "fixed-fixture", "blast-radius")
    val bad = Slopes.watched.filterNot(w => known(w._2))
    assert(bad.isEmpty, s"undocumented slope stories: $bad")
  }

  test("every volume-faithful story carries a volume counter") {
    // the looser 10x screen is EARNED by the measured candidate-count
    // ratio (ADVICE r15 item 4) — a volume-faithful entry without a
    // counter would silently revert to the unpinned prose claim
    val counters = graft.queries.PipelineQueries.volumeCounters.keySet
    val unpinned = Slopes.watched
      .collect { case (n, "volume-faithful") => n }
      .filterNot(counters)
    assert(unpinned.isEmpty,
      s"volume-faithful entries without a volume counter: $unpinned")
    val stray = counters.diff(Slopes.watched.map(_._1).toSet)
    assert(stray.isEmpty,
      s"volume counters for unwatched queries: $stray")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {

  test("replayThreshold: 2x median once the median clears the 2s floor") {
    // median of 5 sorted values is index 2 -> 3.0
    assert(Bench.replayThreshold(Seq(5.0, 1.0, 3.0, 2.0, 4.0)) == 6.0)
  }

  test("replayThreshold: the 2s floor rules at small SF") {
    // median 0.1 -> 0.2 < 2.0 floor; sub-second outliers never replay
    assert(Bench.replayThreshold(Seq(0.1, 0.1, 0.1, 0.9)) == 2.0)
  }

  test("replayThreshold: failure sentinels are excluded from the median") {
    val withFailures = Bench.replayThreshold(Seq(-1.0, -1.0, 3.0, 3.0, 3.0))
    assert(withFailures == 6.0, s"got $withFailures")
  }

  test("replayThreshold: nothing succeeded -> nothing replays") {
    assert(Bench.replayThreshold(Seq(-1.0, -1.0)).isPosInfinity)
    assert(Bench.replayThreshold(Nil).isPosInfinity)
  }
}

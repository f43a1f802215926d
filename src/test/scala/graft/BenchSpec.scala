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

  test("priorTimes: parses query keys from a full record, skipping sentinels") {
    val record = """{"metric":"total","value":9.9,"unit":"sec","queries":""" +
      """{"q01_scan_project":0.62,"q04_scrub":-1.0,"q75_full_outer":0.427},""" +
      """"sf":"/root/testdata/sf0.1","replayed":[],""" +
      """"serving":{"build_sec":4.5,"warm_query_mean_sec":0.061}}"""
    val f = java.nio.file.Files.createTempFile("bench_prior", ".json")
    java.nio.file.Files.writeString(f, record)
    val prior = Bench.priorTimes(f.toString)
    assert(prior == Map("q01_scan_project" -> 0.62, "q75_full_outer" -> 0.427))
    // serving keys must not leak in as phantom priors
    assert(!prior.contains("build_sec") && !prior.contains("warm_query_mean_sec"))
    java.nio.file.Files.delete(f)
  }

  test("priorTimes: missing file -> empty map, not an error") {
    assert(Bench.priorTimes("/nonexistent/BENCH_full.json").isEmpty)
  }

  test("priorTimes: a prior from another scale factor is discarded") {
    val record = """{"metric":"total","value":9.9,"unit":"sec","queries":""" +
      """{"q01_scan_project":0.62},"sf":"/root/testdata/sf0.01","replayed":[]}"""
    val f = java.nio.file.Files.createTempFile("bench_prior_sf", ".json")
    java.nio.file.Files.writeString(f, record)
    // matching sf keeps the prior; differing sf discards it; no
    // expectation (legacy callers, unit contexts) keeps it
    assert(Bench.priorTimes(f.toString, Some("/root/testdata/sf0.01")).nonEmpty)
    assert(Bench.priorTimes(f.toString, Some("/root/testdata/sf0.1")).isEmpty)
    assert(Bench.priorTimes(f.toString).nonEmpty)
    java.nio.file.Files.delete(f)
  }

  test("priorTimes: a prior with NO sf field is discarded when an sf is expected") {
    // legacy/hand-edited record of unknown scale factor must not pass the
    // gate — it re-opens the cross-SF replay-trigger failure the gate closes
    val record = """{"metric":"total","value":9.9,"unit":"sec","queries":""" +
      """{"q01_scan_project":0.62},"replayed":[]}"""
    val f = java.nio.file.Files.createTempFile("bench_prior_nosf", ".json")
    java.nio.file.Files.writeString(f, record)
    assert(Bench.priorTimes(f.toString, Some("/root/testdata/sf0.1")).isEmpty)
    assert(Bench.priorTimes(f.toString).nonEmpty) // no expectation still keeps it
    java.nio.file.Files.delete(f)
  }

  test("jvmCalib: positive, and repeat-min is stable within 2x across calls") {
    // tiny step count: the spec pins the contract (positive, un-eliminated,
    // min-of-reps roughly stable), not the probe's absolute speed
    val a = Bench.jvmCalib(steps = 1L << 22, reps = 2)
    val b = Bench.jvmCalib(steps = 1L << 22, reps = 2)
    assert(a > 0 && b > 0)
    assert(math.max(a, b) / math.min(a, b) < 2.0, s"unstable: $a vs $b")
  }

  test("procStatSteal: parses the aggregate cpu row on Linux, monotone non-negative") {
    val a = Bench.procStatSteal()
    if (new java.io.File("/proc/stat").exists()) {
      assert(a.isDefined && a.get >= 0)
      val b = Bench.procStatSteal()
      assert(b.get >= a.get) // cumulative counter never decreases
    } else assert(a.isEmpty)
  }

  test("diskCalib: positive on a writable dir, -1 sentinel on an unwritable one") {
    // tiny write: the spec pins the contract (positive, cleans up, never
    // throws, reports the effective probe size), not the probe's speed
    val (t, effMb) = Bench.diskCalib(mb = 2, reps = 1)
    assert(t > 0)
    assert(effMb == 2)
    assert(Bench.diskCalib(dir = "/nonexistent_graft", mb = 1, reps = 1)._1 == -1.0)
  }

  test("contaminationVerdict: the observed record population classifies correctly") {
    // quiet anchors: r16 sf0.1 (11.2 CPU-s / 213 s) and a hypothetical
    // clean sf10 (25 CPU-s / 1400 s) are NOT contaminated
    assert(!Bench.contaminationVerdict(11.2, 213.4))
    assert(!Bench.contaminationVerdict(25.0, 1400.0))
    // every contaminated record on file trips the verdict: r17 sf0.1
    // (346.8 / 222.8), r17 sf10 (1632 / 1470.7), r18 attempt (761 / 218.9)
    assert(Bench.contaminationVerdict(346.8, 222.8))
    assert(Bench.contaminationVerdict(1632.0, 1470.7))
    assert(Bench.contaminationVerdict(761.4, 218.9))
    // the 10% arm: 100 CPU-s over a 1400 s sf10 run is background-level
    // (7%), not contamination; the same 100 over a 200 s sf0.1 run is
    assert(!Bench.contaminationVerdict(100.0, 1400.0))
    assert(Bench.contaminationVerdict(100.0, 200.0))
    // boundary: the 30 CPU-s absolute bar rules short runs
    assert(!Bench.contaminationVerdict(30.0, 100.0)) // at, not over
    assert(Bench.contaminationVerdict(30.1, 100.0))
    // -1 sentinel (steal unreadable) carries no signal either way
    assert(!Bench.contaminationVerdict(-1.0, 200.0))
  }

  test("regressedVsPrior: the r9 escape case (0.43s -> 1.96s, under the 2s floor) replays") {
    assert(Bench.regressedVsPrior(1.96, Some(0.427)))
  }

  test("regressedVsPrior: sub-floor jitter and missing priors do not replay") {
    assert(!Bench.regressedVsPrior(0.15, Some(0.05))) // 3x but under minSec
    assert(!Bench.regressedVsPrior(0.35, Some(0.12))) // ~3x but under the 0.4s floor (r10 tuning)
    assert(!Bench.regressedVsPrior(5.0, None)) // no prior -> median trigger owns it
    assert(!Bench.regressedVsPrior(0.8, Some(0.5))) // 1.6x < k
    assert(!Bench.regressedVsPrior(5.0, Some(-1.0))) // sentinel prior is no prior
  }
}

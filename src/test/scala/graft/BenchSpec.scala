package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-adjudication must read the prior record in the shape
  * it ACTUALLY has on disk (the driver wrapper with a head-truncated
  * bench line in `"tail"`), not only the bench's own JSON-line shape.
  * Round 7 shipped the latter only, so `movers` was always `[]` — these
  * tests pin the wrapper path against the real committed record.
  */
class BenchSpec extends AnyFunSuite {

  private val r07 = new java.io.File("BENCH_r07.json")

  test("parsePrior recovers battery medians from the committed driver wrapper") {
    assume(r07.exists(), "committed BENCH_r07.json present in repo root")
    val prior = Bench.parsePrior(r07)
    // the truncation eats at most the first query's name; everything else
    // must be recovered
    assert(prior.size >= 50, s"expected ~57 queries, got ${prior.size}: ${prior.keys.toSeq.sorted}")
    assert(math.abs(prior("dedup_cluster_resolve") - 2.176995458) < 1e-9)
    assert(math.abs(prior("emb_ann_lsh") - 4.424400891) < 1e-9)
    // meta fields and the isolated section must NOT leak in as queries
    Seq("value", "cold_total", "n", "rc", "cpus", "sf").foreach(k =>
      assert(!prior.contains(k), s"meta key '$k' leaked into prior"))
  }

  test("moversOf flags a known >30% mover against the committed record") {
    assume(r07.exists(), "committed BENCH_r07.json present in repo root")
    val prior = Bench.parsePrior(r07)
    val base = prior("dedup_cluster_resolve")
    val results = Seq(
      "dedup_cluster_resolve" -> base * 1.5, // 50% up: must flag
      "emb_ann_lsh" -> prior("emb_ann_lsh") * 1.05, // 5%: must not
      "brand_new_query" -> 9.9) // no prior: must not
    assert(Bench.moversOf(results, prior) == Seq("dedup_cluster_resolve"))
  }

  test("moversOf tiered trigger: >15% for the top-10 by time, >20% for the rest") {
    // 12 queries: q01 (10s) .. q12 (0.01s); top-10 by current time are q01..q10
    val prior = (1 to 12).map(i => f"q$i%02d" -> (13 - i).toDouble).toMap
    val results = (1 to 12).map { i =>
      val p = prior(f"q$i%02d")
      val factor = i match {
        case 1  => 1.17 // top-10, +17% => flagged under the 15% tier
        case 2  => 1.10 // top-10, +10% => not flagged
        case 11 => 1.17 // small query, +17% => NOT flagged (20% tier)
        case 12 => 1.25 // small query, +25% => flagged
        case _  => 1.0
      }
      f"q$i%02d" -> p * factor
    }
    assert(Bench.moversOf(results, prior).sorted == Seq("q01", "q12"))
  }

  test("calibration discipline: scale = median probe ratio; movers divide it out; block parses from every record shape") {
    // a uniform container slowdown: every probe ×1.2
    val priorCalib = Map("calib_scan" -> 1.0, "calib_shuffle" -> 2.0,
      "calib_window" -> 3.0, "calib_cpu" -> 1.0, "calib_spawn" -> 0.5)
    val curCalib = priorCalib.toSeq.map { case (k, v) => k -> v * 1.2 }
    val scale = Bench.calibrationScale(curCalib, priorCalib)
    assert(math.abs(scale - 1.2) < 1e-9, s"scale $scale")
    // no prior calibration (a pre-r17 record) → neutral 1.0
    assert(Bench.calibrationScale(curCalib, Map.empty) == 1.0)
    // a query that moved +22% raw but only +1.7% after the container
    // drift is NOT a mover under the calibrated comparison — the r16
    // container-swap reconciliation, automated
    val prior = Map("big" -> 10.0, "small" -> 0.1)
    val results = Seq("big" -> 12.2, "small" -> 0.11)
    assert(Bench.moversOf(results, prior).contains("big"), "sanity: raw flags it")
    assert(Bench.moversOf(results, prior, scale).isEmpty,
      "calibrated comparison still flagged the container drift")
    // a true regression still surfaces through the calibrated lens
    assert(Bench.moversOf(Seq("big" -> 18.0, "small" -> 0.11), prior, scale)
      == Seq("big"))
    // parse: own-line shape and the driver tail shape
    val f = Files.createTempFile("benchcal", ".json").toFile
    f.deleteOnExit()
    Files.writeString(f.toPath,
      """{"metric":"total","calibration":{"calib_scan":1.5,"calib_cpu":0.7}}""")
    assert(Bench.parsePriorCalibration(f) ==
      Map("calib_scan" -> 1.5, "calib_cpu" -> 0.7))
    val t = Files.createTempFile("benchcaltail", ".json").toFile
    t.deleteOnExit()
    Files.writeString(t.toPath,
      """{"rc":0,"tail":"...movers\":[],\"calibration\":{\"calib_scan\":1.5,\"calib_spawn\":0.25},\"calibration_scale\":1.0,\"warm_total\":9}"}""")
    assert(Bench.parsePriorCalibration(t) ==
      Map("calib_scan" -> 1.5, "calib_spawn" -> 0.25))
  }

  test("parsePrior still reads the bench's own top-level queries shape") {
    val f = Files.createTempFile("bench", ".json").toFile
    f.deleteOnExit()
    Files.writeString(f.toPath,
      """{"metric":"total","value":3.0,"queries":{"q1":1.0,"q2":2.0}}""")
    assert(Bench.parsePrior(f) == Map("q1" -> 1.0, "q2" -> 2.0))
  }

  test("priorRecord sorts by parsed round number, not lexicographically") {
    val dir = Files.createTempDirectory("benchprior").toFile
    Seq("BENCH_r9.json", "BENCH_r10.json", "BENCH_r100.json", "BENCH_r99.json")
      .foreach(n => Files.writeString(new java.io.File(dir, n).toPath, "{}"))
    assert(Bench.priorRecord(dir).map(_.getName).contains("BENCH_r100.json"))
  }
}

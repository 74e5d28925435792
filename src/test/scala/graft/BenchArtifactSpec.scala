package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's artifact-of-record routing (Bench.detailRoute) — the
  * rule that `BENCH_detail.json` may only be written by a FULL,
  * error-free, guard-quiet run at /root/testdata/sf0.1. Each branch
  * below encodes a measurement near-miss that actually happened
  * (BASELINE.md §measurement protocol): a contended capture clobbered
  * the round-9 official record, an sf0.01 smoke run clobbered the
  * sf0.1 record in round 11's working tree, an errored run would
  * silently disarm the variance guard for exactly the failed queries,
  * and round 11's official capture absorbed a uniform ~1.5× early-
  * window slowdown that sat under the per-query 2× guard — hence the
  * round-12 capture-level median-ratio drift guard (Bench.medianRatio
  * + the "drift" divert), also pinned here.
  */
class BenchArtifactSpec extends AnyFunSuite {
  private val SF01 = "/root/testdata/sf0.1"

  private def route(sfDir: String = SF01, cpus: Int = 32,
                    subset: Boolean = false,
                    errors: Boolean = false, contended: Boolean = false,
                    drift: Boolean = false,
                    env: Option[String] = None) =
    Bench.detailRoute(sfDir, cpus, subset, errors, contended, drift, env)

  test("clean full canonical run owns the artifact of record, no warning") {
    assert(route() === ("BENCH_detail.json", None))
  }

  test("subset run diverts to _partial and warns") {
    assert(route(subset = true) ===
      ("BENCH_detail_partial.json", Some("subset")))
  }

  test("error-bearing run diverts to _errors and warns") {
    assert(route(errors = true) ===
      ("BENCH_detail_errors.json", Some("errors")))
  }

  test("contended run diverts to _contended and warns") {
    assert(route(contended = true) ===
      ("BENCH_detail_contended.json", Some("contended")))
  }

  test("drifted run diverts to _drift and warns") {
    assert(route(drift = true) ===
      ("BENCH_detail_drift.json", Some("drift")))
  }

  test("subset takes precedence over errors, contention and drift in the label") {
    assert(route(subset = true, errors = true, contended = true,
      drift = true) === ("BENCH_detail_partial.json", Some("subset")))
  }

  test("contention takes precedence over drift - per-query evidence is more specific") {
    assert(route(contended = true, drift = true) ===
      ("BENCH_detail_contended.json", Some("contended")))
  }

  test("a non-main core count owns its OWN record - never the 32-core artifact (round-14 fix)") {
    // the driver's 8-core scaling leg must neither be judged against
    // the 32-core priors nor overwrite BENCH_detail.json /
    // BENCH_detail_drift.json (which its spurious drift-divert
    // clobbered in round 14)
    assert(route(cpus = 8) === ("BENCH_detail_c8.json", None))
    assert(route(cpus = 8, contended = true) ===
      ("BENCH_detail_c8_contended.json", Some("contended")))
    assert(route(cpus = 8, drift = true) ===
      ("BENCH_detail_c8_drift.json", Some("drift")))
    assert(route(sfDir = "/root/testdata/sf0.01", cpus = 8) ===
      ("BENCH_detail_sf0.01_c8.json", None))
  }

  test("another testdata scale is NOT canonical - clean sf0.01 run diverts silently") {
    assert(route(sfDir = "/root/testdata/sf0.01") ===
      ("BENCH_detail_sf0.01.json", None))
  }

  test("non-canonical dir COMPOSES the divert suffix and still warns (round-12 fix)") {
    // a subset or errored run at another dir must not clobber that
    // dir's own full clean record under the same name
    assert(route(sfDir = "/root/testdata/sf0.01", subset = true) ===
      ("BENCH_detail_sf0.01_partial.json", Some("subset")))
    assert(route(sfDir = "/tmp/scale100", errors = true) ===
      ("BENCH_detail_scale100_errors.json", Some("errors")))
    assert(route(sfDir = "/tmp/scale100", contended = true) ===
      ("BENCH_detail_scale100_contended.json", Some("contended")))
  }

  test("ScaleGen snapshot dirs divert to a sanitized suffixed file") {
    assert(route(sfDir = "/tmp/scale100") ===
      ("BENCH_detail_scale100.json", None))
    assert(route(sfDir = "/tmp/weird name!") ===
      ("BENCH_detail_weird_name_.json", None))
  }

  test("env override routes anywhere and never warns - deliberate, not a divert") {
    assert(route(contended = true, env = Some("/tmp/x.json")) ===
      ("/tmp/x.json", None))
    assert(route(env = Some("elsewhere.json")) === ("elsewhere.json", None))
  }

  // --- capture-level drift guard: Bench.medianRatio ---

  private def m(pairs: (String, Double)*): Map[String, Double] = pairs.toMap

  test("medianRatio: uniform 1.5x slowdown across shared queries is detected") {
    val prior = (1 to 30).map(i => s"q$i" -> 1.0)
    val cur = (1 to 30).map(i => s"q$i" -> 1.5)
    val r = Bench.medianRatio(cur.toMap, prior.toMap)
    assert(r.exists(v => math.abs(v - 1.5) < 1e-9))
    assert(r.exists(_ > Bench.DriftMax)) // would divert the capture
  }

  test("medianRatio: median, not mean - one 10x outlier cannot trip the guard") {
    val prior = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val cur = ((1 to 29).map(i => s"q$i" -> 1.0) :+ ("q30" -> 10.0)).toMap
    val r = Bench.medianRatio(cur, prior)
    assert(r.exists(v => math.abs(v - 1.0) < 1e-9))
    assert(!r.exists(_ > Bench.DriftMax))
  }

  test("medianRatio: sub-floor priors are excluded - scheduler noise is not signal") {
    // 25 tiny queries jitter 3x, 20 real ones hold steady: no drift
    val prior = ((1 to 25).map(i => s"t$i" -> 0.01) ++
      (1 to 20).map(i => s"q$i" -> 1.0)).toMap
    val cur = ((1 to 25).map(i => s"t$i" -> 0.03) ++
      (1 to 20).map(i => s"q$i" -> 1.0)).toMap
    val r = Bench.medianRatio(cur, prior)
    assert(r.exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("medianRatio: fewer than minShared comparable queries yields None") {
    val prior = (1 to 19).map(i => s"q$i" -> 1.0).toMap
    val cur = (1 to 19).map(i => s"q$i" -> 2.0).toMap
    assert(Bench.medianRatio(cur, prior).isEmpty)
    assert(Bench.medianRatio(Map.empty, Map.empty).isEmpty)
  }

  test("medianRatio: even count averages the middle pair") {
    val prior = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val cur = (1 to 20).map(i => s"q$i" -> (if (i <= 10) 1.0 else 2.0)).toMap
    val r = Bench.medianRatio(cur, prior)
    assert(r.exists(v => math.abs(v - 1.5) < 1e-9))
  }

  test("canary runs and returns a plausible wall time") {
    val c = Bench.canary()
    assert(c > 0.001 && c < 30.0, s"canary out of range: $c")
  }
}

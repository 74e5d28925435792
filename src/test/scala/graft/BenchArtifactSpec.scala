package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's artifact-of-record routing (Bench.detailRoute) — the
  * rule that `BENCH_detail.json` may only be written by a FULL,
  * error-free, guard-quiet run at /root/testdata/sf0.1. Each branch
  * below encodes a measurement near-miss that actually happened
  * (BASELINE.md §measurement protocol): a contended capture clobbered
  * the round-9 official record, an sf0.01 smoke run clobbered the
  * sf0.1 record in round 11's working tree, and an errored run would
  * silently disarm the variance guard for exactly the failed queries.
  */
class BenchArtifactSpec extends AnyFunSuite {
  private val SF01 = "/root/testdata/sf0.1"

  private def route(sfDir: String = SF01, subset: Boolean = false,
                    errors: Boolean = false, contended: Boolean = false,
                    env: Option[String] = None) =
    Bench.detailRoute(sfDir, subset, errors, contended, env)

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

  test("subset takes precedence over errors and contention in the label") {
    assert(route(subset = true, errors = true, contended = true) ===
      ("BENCH_detail_partial.json", Some("subset")))
  }

  test("another testdata scale is NOT canonical - clean sf0.01 run diverts silently") {
    assert(route(sfDir = "/root/testdata/sf0.01") ===
      ("BENCH_detail_sf0.01.json", None))
  }

  test("ScaleGen snapshot dirs divert to a sanitized suffixed file, even with flags") {
    assert(route(sfDir = "/tmp/scale100", contended = true) ===
      ("BENCH_detail_scale100.json", None))
    assert(route(sfDir = "/tmp/weird name!") ===
      ("BENCH_detail_weird_name_.json", None))
  }

  test("env override routes anywhere and never warns - deliberate, not a divert") {
    assert(route(contended = true, env = Some("/tmp/x.json")) ===
      ("/tmp/x.json", None))
    assert(route(env = Some("elsewhere.json")) === ("elsewhere.json", None))
  }
}

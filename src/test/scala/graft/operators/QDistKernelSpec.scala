package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r14 PQ-distance swap (interpreted aggregate∘zip_with fold →
  * codegen [[graft.plans.QDist12F]]) changed the innards of the
  * expression every PQ fit/encode/ADC pass runs per (candidate, code)
  * pair; this spec pins the kernel to the HOF reference formulation
  * ([[Similarity.qdist12Hof]]) on the edge cases the exactness
  * contract names: NULL arrays, NULL elements, length mismatches,
  * NaN / ±Infinity (non-ANSI double→long cast), and magnitude ranges
  * where the ×10¹² quantization saturates. */
class QDistKernelSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])] = Seq(
    (Some(Seq(Some(0.1), Some(0.2), Some(0.3), Some(0.4))),
      Some(Seq(Some(0.4), Some(0.3), Some(0.2), Some(0.1)))),
    (Some(Seq(Some(0.0))), Some(Seq(Some(0.0)))),
    (Some(Seq()), Some(Seq())),                         // empty → 0
    (None, Some(Seq(Some(1.0)))),                       // null array
    (Some(Seq(Some(1.0))), None),
    (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))), // null elem
    (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))),       // ragged
    (Some(Seq(Some(Double.NaN))), Some(Seq(Some(0.0)))),           // NaN → 0L
    (Some(Seq(Some(Double.PositiveInfinity))), Some(Seq(Some(0.0)))), // clamp
    (Some(Seq(Some(1e9))), Some(Seq(Some(-1e9)))),     // huge quantized term
    (Some(Seq(Some(1e-9))), Some(Seq(Some(2e-9)))),    // rounds to 0
    (Some(Seq(Some(-0.5), Some(0.25), Some(0.125), Some(-0.0625))),
      Some(Seq(Some(0.5), Some(-0.25), Some(-0.125), Some(0.0625)))))

  test("codegen qdist12 kernel equals the HOF fold on every edge case") {
    val df = rows.toDF("a", "b")
    val got = df.select(Similarity.qdist12($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val want = df.select(Similarity.qdist12Hof($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == want.toSeq, s"kernel ${got.toSeq} vs hof ${want.toSeq}")
  }

  test("float-double mixed args equal the HOF's promoted-to-double fold") {
    // the silhouette/daviesBouldin shape: raw float embeddings vs
    // double centroid means — Spark's Subtract coercion promoted the
    // HOF lambda to double, which is the kernel's widen-then-subtract
    val rnd = new scala.util.Random(15L)
    val rows = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(8)
      ((1 to n).map(_ => rnd.nextFloat * 2 - 1),
        (1 to n).map(_ => rnd.nextDouble * 2 - 1))
    }
    val df = rows.toDF("af", "bd")
    val got = df.select(Similarity.qdist12($"af", $"bd")).collect().map(_.getLong(0))
    val want = df.select(Similarity.qdist12Hof($"af", $"bd")).collect().map(_.getLong(0))
    assert(got.toSeq == want.toSeq)
  }

  test("kernel equals the HOF fold on seeded random dense vectors") {
    val rnd = new scala.util.Random(14L)
    val dense = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Some((1 to n).map(_ => Some(rnd.nextDouble() * 2 - 1)): Seq[Option[Double]]),
        Some((1 to n).map(_ => Some(rnd.nextDouble() * 2 - 1)): Seq[Option[Double]]))
    }
    val df = dense.toDF("a", "b")
    val got = df.select(Similarity.qdist12($"a", $"b")).collect().map(_.getLong(0))
    val want = df.select(Similarity.qdist12Hof($"a", $"b")).collect().map(_.getLong(0))
    assert(got.toSeq == want.toSeq)
  }
}

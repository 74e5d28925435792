package graft.plans

import graft.SparkSpec
import graft.operators.Linkage
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // expected values pinned against DuckDB jaro_winkler_similarity
  // (the oracle engine), NOT the textbook formula — the two differ on
  // odd transposition counts and empty strings (see JaroWinkler doc)
  private val pinned = Seq(
    ("martha", "marhta", 0.9611111111111111), // boost applies (prefix 3)
    ("dixon", "dicksonx", 0.8133333333333332),
    ("dwayne", "duane", 0.8400000000000001),
    ("cdae", "decefcfcdc", 0.5722222222222223), // odd t: integer halving
    ("acabae", "aefdcbaceafa", 0.8), // boost + integer halving
    ("abc", "abc", 1.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0), // window 0 -> no matches
    ("x", "y", 0.0),
    ("", "", 0.0), // DuckDB: empty is 0, not textbook 1
    ("a", "", 0.0),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    // beyond ASCII: DuckDB compares UTF-8 BYTES (not code points,
    // not UTF-16 units) — '😀' vs '😁' share a 3-byte prefix and
    // score 0.8833, which only the byte kernel reproduces. BMP
    // multi-byte and supplementary-plane pins below are all
    // DuckDB-verified values.
    ("café", "cafe", 0.8483333333333334),
    ("éé", "ée", 0.7777777777777778),
    ("münchen", "munchen", 0.8821428571428571),
    ("ñandú", "nandu", 0.6761904761904761),
    ("日本語", "日本誤", 0.9555555555555556),
    ("😀😃😄", "😀😃😁", 0.9666666666666666),
    ("a😀b", "a😀c", 0.9333333333333333),
    ("😀", "😀", 1.0),
    ("😀", "😁", 0.8833333333333334),
    ("martha😀", "marhta😀", 0.9766666666666667),
    ("𝕊𝕡𝕒𝕣𝕜", "𝕊𝕡𝕒𝕣k", 0.9482352941176471),
    ("😀abc", "abc😀", 0.0),
    ("ab😀😁cd", "ab😁😀cd", 0.9833333333333333))

  test("pinned DuckDB values, via the Column API (whole-stage codegen)") {
    val got = pinned.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(col("a"), col("b"), Linkage.jaroWinkler(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.zip(pinned).foreach { case ((a, b, v), (_, _, want)) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(want), s"($a, $b): $v != $want")
    }
  }

  test("interpreted eval matches codegen bitwise") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"($a, $b)")
    }
  }

  test("null inputs produce null; symmetry holds on pinned pairs") {
    val r = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
    pinned.foreach { case (a, b, want) =>
      val rev = JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(rev == want, s"asymmetric on ($a, $b)")
    }
  }

  test("SQL function registration resolves and codegens") {
    import org.apache.spark.sql.SparkSession
    // extensions bind at session build time: sibling session over the
    // same SparkContext (the SketchesSpec pattern)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      val out = s2.sql(
        "SELECT graft_jaro_winkler('martha', 'marhta') AS jw")
        .collect().head.getDouble(0)
      assert(out == 0.9611111111111111)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}

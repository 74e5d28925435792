package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The measurement apparatus is itself measured: SCALING.md's slope
  * table is only as honest as ScaleGen's replica-structure
  * invariants, so each one is pinned here. */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  test("documents: within-replica Jaccard equals source, cross-replica disjoint, id classes survive") {
    val docs = Seq(
      (12L, "a b c d e f", "en", "web"),
      (13L, "a b c d x y", "en", "web"),
      (17L, "totally different words here now", "en", "news"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = ScaleGen.scaleDocuments(docs, 3, stride = 20L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 9)
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSet
    def j(a: Set[String], b: Set[String]) =
      a.intersect(b).size.toDouble / a.union(b).size
    val srcJ = j(toks(out(12L)), toks(out(13L)))
    // every replica reproduces the source pair's Jaccard exactly
    assert(j(toks(out(32L)), toks(out(33L))) == srcJ)
    assert(j(toks(out(52L)), toks(out(53L))) == srcJ)
    // cross-replica token sets are disjoint (no fake mega-clusters)
    assert(toks(out(12L)).intersect(toks(out(32L))).isEmpty)
    assert(toks(out(32L)).intersect(toks(out(52L))).isEmpty)
    // replica 0 is the source verbatim; `% 10` slice class survives
    assert(out(12L) == "a b c d e f")
    assert(Seq(12L, 32L, 52L).forall(_ % 10 == 2))
  }

  test("documents: empty tokens pass through unsuffixed (no invented tokens)") {
    val docs = Seq((1L, "a  b", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = ScaleGen.scaleDocuments(docs, 2, stride = 10L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(11L) == "a_1  b_1", s"got '${out(11L)}'")
    // token COUNT matches the source (the invariant the suffix must
    // not break)
    assert(out(11L).split(" ").count(_.nonEmpty) ==
      out(1L).split(" ").count(_.nonEmpty))
  }

  test("embeddings: the replica transform is orthogonal — cosines and norms exact") {
    val dim = 8
    val v1 = Array.tabulate(dim)(i => (i + 1).toFloat)
    val v2 = Array.tabulate(dim)(i => (dim - i).toFloat)
    val emb = Seq((5L, v1.toSeq, 0), (7L, v2.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val out = ScaleGen.scaleEmbeddings(emb, 3, stride = 100L, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def cos(a: Array[Float], b: Array[Float]) =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val src = cos(out(5L), out(7L))
    // bit-exact: rotation + sign flips permute/negate the same
    // products, and the sums below add them in index order
    assert(cos(out(105L), out(107L)) == src, "replica 1 cosine drifted")
    assert(cos(out(205L), out(207L)) == src, "replica 2 cosine drifted")
    assert(dot(out(105L), out(105L)) == dot(out(5L), out(5L)),
      "orthogonal transform must preserve norms")
    // replica 0 is the source verbatim; labels stride by 1000
    assert(out(5L).toSeq == v1.toSeq)
    val labels = ScaleGen.scaleEmbeddings(emb, 3, 100L, dim)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(labels == Set(0, 1000, 2000))
  }

  test("part: per-row letter prefix, size/brand pass through, replica 0 verbatim") {
    val part = Seq((3L, "azure rose", "B#1", "TYPE", 9, 100.5))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val out = ScaleGen.scalePart(part, 3, stride = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(4))).toMap
    assert(out(3L)._1 == "azure rose")
    // replicas prefix exactly one lowercase letter
    Seq(13L, 23L).foreach { id =>
      val n = out(id)._1
      assert(n.length == 11 && n(0).isLower && n.drop(1) == "azure rose", n)
    }
    assert(out.values.forall(v => v._2 == "B#1" && v._3 == 9))
  }

  test("events: ids/users stride, payload verbatim, NULL user stays NULL") {
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    val ev = Seq(
      (1L, ts, Some(42L), "view", 1.5, "{}"),
      (2L, ts, Option.empty[Long], "click", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ScaleGen.scaleEvents(ev, 2, eStride = 10L, uStride = 100L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getString(3), r.getTimestamp(1))).toMap
    assert(out.size == 4)
    assert(out(1L) == ((Some(42L), "view", ts)))
    assert(out(11L) == ((Some(142L), "view", ts)))
    assert(out(12L)._1.isEmpty, "NULL user_id must stay NULL")
  }

  test("tpch star: every join edge stays inside its replica; names scale, measures verbatim") {
    val orders = Seq((5L, 2L, "O", 100.0,
        java.sql.Timestamp.valueOf("1996-03-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((5L, 7L, 3L, 1L, 10.0, 900.0, 0.05, 0.02, "R", "O",
        java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val cust = Seq((2L, "Customer#2", 4L, 55.5, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val supp = Seq((3L, "Supplier#3", 9L, 7.7))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val o2 = ScaleGen.scaleOrders(orders, 3, 10L, 100L)
    val l2 = ScaleGen.scaleLineitem(li, 3, 10L, 1000L, 10000L)
    val c2 = ScaleGen.scaleCustomer(cust, 3, 100L)
    val s2 = ScaleGen.scaleSupplier(supp, 3, 10000L)
    // join edges resolve within the replica: zero orphans, k×source
    // matches on every edge
    assert(l2.join(o2, l2("l_orderkey") === o2("o_orderkey")).count() == 3)
    assert(o2.join(c2, o2("o_custkey") === c2("c_custkey")).count() == 3)
    assert(l2.join(s2, l2("l_suppkey") === s2("s_suppkey")).count() == 3)
    // group-by-name cardinality scales with k (names suffix _r);
    // replica 0 passes through verbatim
    assert(s2.select("s_name").distinct().count() == 3)
    assert(c2.filter(col("c_custkey") === 2L).head.getString(1) == "Customer#2")
    assert(s2.filter(col("s_suppkey") === 20003L).head.getString(1)
      == "Supplier#3_2")
    // measures verbatim in every replica: predicate selectivity and
    // per-replica aggregates stay bit-identical to the source
    val r2 = l2.filter(col("l_orderkey") === 25L).head
    assert(r2.getDouble(4) == 10.0 && r2.getDouble(5) == 900.0 &&
      r2.getString(8) == "R")
    assert(o2.filter(col("o_orderkey") === 25L).head.getDouble(3) == 100.0)
  }

  test("stride: smallest multiple of mod above max; clear error on all-NULL") {
    val df = Seq(19L, 3L).toDF("id")
    assert(ScaleGen.stride(df, "id", 10L) == 20L)
    assert(ScaleGen.stride(Seq(20L).toDF("id"), "id", 10L) == 30L)
    val err = intercept[IllegalArgumentException] {
      ScaleGen.stride(Seq(Option.empty[Long]).toDF("id"), "id", 10L)
    }
    assert(err.getMessage.contains("no non-null values"))
  }
}

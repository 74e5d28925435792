package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: transitive closure with min representative") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,7}, singleton 8 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("doc_a", "doc_b")
    val comps = DedupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("resolve maps unpaired docs to themselves") {
    val docs = (1L to 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (5L, 7L)).toDF("doc_a", "doc_b")
    val resolved = DedupClusters.resolve(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved(2L) == 1L && resolved(7L) == 5L)
    assert(resolved(3L) == 3L && resolved(8L) == 8L) // untouched docs survive as themselves
    // keeping doc_id == cluster_rep deduplicates: 7 survivors of 9
    assert(resolved.count { case (d, r) => d == r } == 7)
  }

  test("random graphs match a union-find reference") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // fully compress, then min-representative per component
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- 40L to 42L) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val ref = unionFind(n, edges)
      val got = DedupClusters.connectedComponents(
          edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // compare only nodes that appear in edges (singletons absent by contract)
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == inGraph, s"seed=$seed node set mismatch")
      inGraph.foreach { v =>
        assert(got(v) == ref(v), s"seed=$seed node $v: got ${got(v)}, want ${ref(v)}")
      }
    }
  }

  test("handles cycles and long chains within iteration budget") {
    val chain = (1L until 15L).map(i => (i, i + 1))
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val pairs = (chain ++ cycle).toDF("doc_a", "doc_b")
    val comps = DedupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 15L).forall(comps(_) == 1L))
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
  }

  test("one job per round: budgeted = 2 + maxIter, converged pays NO dedicated count job") {
    // With AQE and auto-broadcast off, every action is exactly one job,
    // so the job ledger is: 1 (symmetrized-edge checkpoint) + 1 (initial
    // labels checkpoint) + 1 per round. In converged mode the round's
    // job is the full-scan agg that BOTH materializes the lazy
    // checkpoint and answers "did anything change" — if a dedicated
    // convergence count ran per round the total would be 2 + 2·rounds.
    val sc = spark.sparkContext
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // path 1-2-3-4-5: labels stabilize after round 2, round 3 observes
      // no change -> 3 rounds in converged mode
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
      def jobsFor(group: String)(body: => Unit): Int = {
        sc.setJobGroup(group, group)
        try body finally sc.clearJobGroup()
        // the status tracker is fed by the async listener bus: poll
        // until the count is stable
        var last = -1
        var cur = sc.statusTracker.getJobIdsForGroup(group).length
        var waited = 0
        while (cur != last && waited < 5000) {
          last = cur; Thread.sleep(100); waited += 100
          cur = sc.statusTracker.getJobIdsForGroup(group).length
        }
        cur
      }
      var budgeted: org.apache.spark.sql.DataFrame = null
      var converged: org.apache.spark.sql.DataFrame = null
      val nBudget = jobsFor("cc-budgeted") {
        budgeted = DedupClusters.connectedComponents(pairs, maxIter = 3,
          checkConvergence = false)
      }
      val nConverged = jobsFor("cc-converged") {
        converged = DedupClusters.connectedComponents(pairs)
      }
      assert(nBudget == 5, s"budgeted mode ran $nBudget jobs, want 2 + maxIter = 5")
      assert(nConverged == 5, s"converged mode ran $nConverged jobs, want 2 + 3 rounds = 5")
      val b = budgeted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c = converged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(b == c && (1L to 5L).forall(b(_) == 1L))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("resolve passes the fixed budget through") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val viaBudget = DedupClusters.resolve(docs, pairs, maxIter = 4,
        checkConvergence = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDefault = DedupClusters.resolve(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBudget == viaDefault)
    assert(viaBudget(3L) == 1L && viaBudget(6L) == 6L)
  }

  test("storage lifecycle: at most the result's own blocks persist; release frees them") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    // a chain long enough for several rounds: each round's superseded
    // checkpoint must be unpersisted inside the loop, in BOTH modes
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    for (check <- Seq(true, false)) {
      val comps = DedupClusters.connectedComponents(pairs, checkConvergence = check)
      val rows = comps.collect()
      assert(rows.forall(_.getLong(1) == 1L) && rows.length == 20)
      val held = sc.getPersistentRDDs
      assert(held.size <= 1,
        s"checkConvergence=$check: superseded round checkpoints leaked: ${held.keySet}")
      DedupClusters.release(comps)
      assert(sc.getPersistentRDDs.isEmpty,
        s"checkConvergence=$check: release() left blocks behind")
    }
  }

  test("fixed-budget mode (no per-round driver count) matches convergence mode") {
    // a 40-node chain needs several doubling rounds; budget 20 covers
    // diameter up to 2^20, so both modes must land on the same labels
    val chain = (1L until 40L).map(i => (i, i + 1))
    val pairs = chain.toDF("doc_a", "doc_b")
    val checked = DedupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budgeted = DedupClusters.connectedComponents(pairs, checkConvergence = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(budgeted == checked)
    assert((1L to 40L).forall(budgeted(_) == 1L))
  }

  test("clusterUpdate: hand case — merge two standing clusters, attach, new-only, untouched") {
    import spark.implicits._
    // standing: {1,2} rep 1, {5,6} rep 5, {9} rep 9 (untouched)
    val standing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val fresh = Seq(20L, 21L, 22L).toDF("doc_id")
    // delta: 20 bridges the two standing clusters (via members 2 and
    // 6, NOT reps — contraction must route through the rep lookup);
    // 21–22 form a new-only cluster
    val delta = Seq((2L, 20L), (6L, 20L), (21L, 22L)).toDF("doc_a", "doc_b")
    val out = DedupClusters.clusterUpdate(standing, delta, fresh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, // merged to global min
      20L -> 1L,                              // attached batch doc
      21L -> 21L, 22L -> 21L,                 // new-only cluster
      9L -> 9L), s"$out")                     // untouched survives
  }

  test("clusterUpdate: equals the full resolve rebuild on real docs (end-to-end)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val old = corpus.filter(col("doc_id") % 20 < 18)
    val fresh = corpus.filter(col("doc_id") % 20 >= 18)
    val standing = DedupClusters.resolve(old, FuzzyDedup.minhashNearDups(old))
    val delta = FuzzyDedup.incrementalNearDups(
      FuzzyDedup.bandIndex(old), old, fresh)
    val incr = DedupClusters.clusterUpdate(standing,
        delta.select("doc_a", "doc_b"), fresh.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupClusters.resolve(corpus, FuzzyDedup.minhashNearDups(corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full, "incremental assignment diverged from full rebuild")
  }

  test("ingestDecisions: keep iff rep; sizes are post-update; old docs excluded") {
    // cluster {1,2,3} (3 joined an old cluster), {4,5} (new-only:
    // 4 out-ranks its batch-mate and is kept), singleton {6}
    val assignment = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L, 6L -> 6L).toDF("doc_id", "cluster_rep")
    val fresh = Seq(3L, 4L, 5L, 6L).toDF("doc_id")
    val out = DedupClusters.ingestDecisions(assignment, fresh)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      3L -> ((1L, false, 3L)), // joined an existing cluster: dropped
      4L -> ((4L, true, 2L)),  // new-only cluster's rep: kept
      5L -> ((4L, false, 2L)), // its batch-mate: dropped
      6L -> ((6L, true, 1L))), // true singleton: kept
      s"$out")
  }
  test("clusterChainAudit: a bridge-doc chain flags; a tight cluster does not") {
    // cluster 1: A~B and B~C near-dup but A vs C share only the bridge
    // halves -> min pairwise jaccard low -> chained
    val half1 = "alpha beta gamma delta epsilon zeta eta theta"
    val half2 = "one two three four five six seven eight"
    val docs = Seq(
      (1L, half1 + " unique1a unique1b"),
      (2L, half1 + " " + half2),                   // the bridge
      (3L, half2 + " unique3a unique3b"),
      (10L, "same same text here same again same"),
      (11L, "same same text here same again same")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_rep")
    val out = DedupClusters.clusterChainAudit(clusters, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(5)))).toMap
    assert(out(1L) == ((3L, 3L, true)), s"$out")   // 3 pairs, chained
    assert(out(10L) == ((2L, 1L, false)), s"$out") // identical pair
    // oversize clusters are excluded by contract
    val big = (1L to 20L).map(i => (i, 1L)).toDF("doc_id", "cluster_rep")
    assert(DedupClusters.clusterChainAudit(big, docs).isEmpty)
  }

}

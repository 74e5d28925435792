package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the headline queries — the
  * properties the 100 TB design depends on (SCALING.md), pinned so a
  * refactor can't silently regress them:
  * filters/projection reaching the Parquet scan, explicit broadcasts,
  * TakeOrderedAndProject for global top-k, no Window over the big
  * side of dedup, custom expressions surviving into codegen. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter and projection are pushed to the Parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters") && p.contains("l_discount"),
      s"no pushed filter:\n$p")
    // pruned ReadSchema: untouched wide columns never leave the scan
    assert(!p.contains("l_comment"), s"unpruned scan:\n$p")
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
  }

  test("q11: dimension tables broadcast, fact side never broadcast") {
    val p = plan("q11_star_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q15: global top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), s"full sort instead of top-k:\n$p")
  }

  test("q05: argmax dedup is a partial-aggregable max_by, not a window sort") {
    val p = plan("q05_latest_per_user")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"no aggregate:\n$p")
    assert(!p.contains("Window"), s"window-sort dedup crept back in:\n$p")
  }

  test("q12/q13: semi and anti joins stay semi/anti in the physical plan") {
    assert(plan("q12_semi_join").contains("LeftSemi"))
    assert(plan("q13_anti_join").contains("LeftAnti"))
  }

  test("q41: rolling-fingerprint expression survives into the physical plan") {
    val p = plan("q41_winnow_pairs")
    assert(p.contains("graft_rolling_fps"), s"expression rewritten away:\n$p")
  }

  test("q28: query side broadcast — the corpus is never shuffled for scoring") {
    val p = plan("q28_cosine_topk")
    assert(p.contains("Broadcast"), s"no broadcast of the query set:\n$p")
    assert(p.contains("graft_dot") && p.contains("graft_norm"),
      s"native similarity expressions missing:\n$p")
  }

  test("q60: stratum rates ride a broadcast join over a scan-level filter") {
    val p = plan("q60_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), s"rates not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for rates:\n$p")
  }

  test("q61/q67: sketch and benchmark sets broadcast — corpus never shuffles") {
    val pb = plan("q61_bloom_filter")
    assert(pb.contains("BroadcastHashJoin"), s"bloom words not broadcast:\n$pb")
    // q67 now returns the materialized survivor product (round 8);
    // the broadcast shape to pin is the BUILD plan itself
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pn = graft.operators.Sampling.ngramDecontaminate(
        docs, docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0))
      .queryExecution.executedPlan.toString
    assert(pn.contains("BroadcastHashJoin"), s"ngram set not broadcast:\n$pn")
    assert(pn.contains("LeftSemi") && pn.contains("LeftAnti"),
      s"semi/anti structure lost:\n$pn")
  }

  test("q62: band join is an equi-join, never a nested loop") {
    val p = plan("q62_band_join")
    assert(!p.contains("NestedLoop") && !p.toLowerCase.contains("cartesian"),
      s"band join planned as a nested loop:\n$p")
  }

  // AQE hides WindowExec until execution — assert on the optimized
  // LOGICAL windows, which is the property that matters (a window
  // with an empty partition spec moves its whole input to one task)
  private def logicalWindows(name: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
  }

  test("q63: the corpus-level window is partitioned (only the tiny block table is not)") {
    val windows = logicalWindows("q63_pack_sequences")
    assert(windows.nonEmpty)
    // exactly one unpartitioned window is allowed: the block-offset
    // cumsum over the |docs|/blockSize relation; the per-doc running
    // sum must be partitioned by block
    val unpartitioned = windows.count(_.partitionSpec.isEmpty)
    assert(unpartitioned <= 1, s"extra global windows:\n${windows.mkString("\n")}")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "within-block window lost its partitioning")
  }

  test("q65: every quantile window is partitioned by the group key") {
    val windows = logicalWindows("q65_hist_quantiles_by")
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in grouped quantiles:\n${windows.mkString("\n")}")
  }

  test("q81: BM25 stats broadcast; global top-k plans TakeOrderedAndProject") {
    val p = plan("q81_bm25")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
    assert(p.contains("Broadcast"), s"df/avgdl stats not broadcast:\n$p")
  }

  test("q83: centroids broadcast to the corpus, assignment is an aggregate") {
    val p = plan("q83_kmeans_refine")
    assert(p.contains("Broadcast"), s"centroids not broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"corpus shuffled to meet centroids:\n$p")
    val windows = logicalWindows("q83_kmeans_refine")
    assert(windows.isEmpty, s"argmax planned as a window:\n${windows.mkString("\n")}")
  }

  test("q84: SRP query bands broadcast, native dot in the plan, no cartesian") {
    val p = plan("q84_srp_lsh")
    assert(p.contains("Broadcast"), s"query bands not broadcast:\n$p")
    assert(p.contains("graft_dot"), s"signature fold not native:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian product:\n$p")
  }

  test("q85: merge reduces the change log by aggregate, never a window") {
    val windows = logicalWindows("q85_scd1_merge")
    assert(windows.isEmpty, s"window over the change log:\n${windows.mkString("\n")}")
  }

  test("q91: one fused pipeline — a single (partitioned) window, broadcast anti-join") {
    val windows = logicalWindows("q91_training_pipeline")
    // the gate's fingerprint-survivor window is the pipeline's ONLY
    // window, and it is key-partitioned
    assert(windows.length == 1 && windows.head.partitionSpec.nonEmpty,
      s"extra or global windows:\n${windows.mkString("\n")}")
    val p = plan("q91_training_pipeline")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian:\n$p")
  }

  test("q87: the range-frame window is partitioned per user") {
    val windows = logicalWindows("q87_rolling_range")
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"global range window:\n${windows.mkString("\n")}")
  }

  test("q93: group means broadcast back — the corpus never sort-merges for stats") {
    val p = plan("q93_grouped_corr")
    assert(p.contains("BroadcastHashJoin"), s"means not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to meet means:\n$p")
  }

  test("q97: the quantile cutoff rides a broadcast, the gate is a filter") {
    val p = plan("q97_lm_decile_filter")
    assert(p.contains("Broadcast"), s"cutoff not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct") || p.contains("Broadcast"),
      s"non-broadcast cartesian:\n$p")
  }

  test("q121: the bloom membership filter sits UNDER the join exchange") {
    val p = plan("q121_bloom_join")
    // the big side is cut by the element_at membership expression
    // before any shuffle — the whole point of the runtime filter
    assert(p.contains("element_at"), s"bloom filter compiled away:\n$p")
    val filterIdx = p.indexOf("element_at")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom filter not below the join in the tree:\n$p")
  }

  test("q112: rolling active users has NO window operator — explode only") {
    val p = plan("q112_rolling_active")
    assert(!p.contains("Window"), s"window crept into the rolling count:\n$p")
    assert(p.contains("Generate") || p.contains("explode"),
      s"no explode in plan:\n$p")
  }

  test("q111: pagerank iterations broadcast the rank table") {
    val p = plan("q111_pagerank")
    assert(p.contains("BroadcastHashJoin"), s"rank join not broadcast:\n$p")
  }

  test("q124: incremental agg folds as partial aggregates, no window/sort-merge") {
    val p = plan("q124_agg_increment")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window"), s"window in the MV refresh:\n$p")
  }

  test("q128: linear attribution is one window pass, no self-join of events") {
    val p = plan("q128_linear_attribution")
    // exactly one Window operator (the range-frame collect); a range
    // SELF-JOIN formulation would show a second events scan joined
    // on a range condition
    val windows = "(?<!Broadcast)Window".r.findAllIn(p).length
    assert(windows >= 1, s"no window:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian touch join:\n$p")
  }

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("q146: SCD-2's two windows share ONE key shuffle") {
    val p = plan("q146_scd2_history")
    assert(shuffles(p) == 1, s"expected exactly 1 hash exchange:\n$p")
    assert("Window ".r.findAllIn(p).length >= 1, s"no window:\n$p")
  }

  test("q144: spatial join is a hash equi-join, never a nested loop") {
    val p = plan("q144_spatial_neighbors")
    assert(!p.contains("NestedLoop") &&
      !p.toLowerCase.contains("cartesianproduct"),
      s"spatial join degenerated to a loop join:\n$p")
  }

  test("q145: top-N+other plans bounded heaps, no partition-less window") {
    val p = plan("q145_topn_other")
    assert(p.contains("TakeOrderedAndProject"), s"no bounded top-k:\n$p")
    assert(!p.contains("Window"), s"global window crept back:\n$p")
  }

  test("q149: proration pays ONE key shuffle for both window specs") {
    val p = plan("q149_prorate")
    // one exchange for the l_orderkey windows; the orders join may
    // add its own exchanges but never a second window shuffle
    assert(p.contains("Window"), s"no window:\n$p")
    assert(!p.contains("NestedLoop"), s"loop join:\n$p")
    val winExchanges = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(p).length
    assert(winExchanges <= 3, s"window spec split into extra shuffles:\n$p")
  }

  test("q152: EWMA is one key shuffle, one window, no join") {
    val p = plan("q152_ewma")
    assert(shuffles(p) == 1, s"expected exactly 1 hash exchange:\n$p")
    assert(!p.contains("Join"), s"join appeared in a pure window op:\n$p")
  }

  test("q153: skyline sweeps — no nested loop, no cartesian") {
    val p = plan("q153_skyline")
    assert(!p.contains("NestedLoop") &&
      !p.toLowerCase.contains("cartesianproduct"),
      s"quadratic skyline plan:\n$p")
  }

  test("q157: golden record is a partial-aggregable agg, not a window") {
    val p = plan("q157_golden_record")
    assert(!p.contains("Window"), s"window survivorship crept in:\n$p")
    assert(p.contains("max_by") || p.contains("HashAggregate") ||
      p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"no aggregate:\n$p")
  }

  test("q163: MG sketch is a partial-merged aggregate; candidates broadcast back") {
    val p = plan("q163_heavy_hitters")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass — the token stream itself must never exchange
    assert(p.contains("ObjectHashAggregate"), s"no object agg:\n$p")
    assert(p.contains("graft_misra_gries"), s"MG agg rewritten away:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"candidate set not broadcast:\n$p")
  }

  test("q165: covariance is ONE GramAgg reduction — no per-pair shuffle") {
    val p = plan("q165_covariance")
    assert(p.contains("graft_gram"), s"gram agg missing:\n$p")
    // the (i,j) lattice is generated AFTER the 1-row aggregate; the
    // corpus-sized side must not carry an explode before aggregation
    assert(p.contains("ObjectHashAggregate"), s"no object agg:\n$p")
  }

  test("q160: both CF directions come from one explode, not a recomputing union") {
    val p = plan("q160_item_cf")
    assert(!p.contains("Union"), s"union recomputes the self-join per branch:\n$p")
    assert(p.contains("Generate"), s"no explode for direction fan-out:\n$p")
  }

  test("q177: nearest as-of is ONE shuffle — both direction carries share a window") {
    val df = SparkEntry.queries("q177_asof_nearest")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"expected one Window exec, got $windows:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"join-based as-of crept in:\n$p")
  }

  test("q172: weighted median pays one key shuffle for both window specs") {
    val p = plan("q172_weighted_median")
    val exchanges = shuffles(p)
    // one hashpartitioning for the windows + one single-partition for
    // nothing else: the two window frames share the l_returnflag
    // exchange, the final agg reuses it
    assert(exchanges == 1, s"window specs split the shuffle, $exchanges exchanges:\n$p")
  }

  test("q204: KMV sketch pipeline — bounded heaps, no sort, minimal exchanges") {
    val df = SparkEntry.queries("q204_kmv_distinct")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the bottom-k cut must ride the bounded-heap custom operator,
    // never a per-group sort + row_number window
    assert(p.contains("TopKPerKey"), s"bottom-k lost the bounded-heap exec:\n$p")
    assert(!p.contains("Window"), s"window-sort bottom-k crept in:\n$p")
    // exchange budget (kmvDistinct scaladoc): exactly TWO hash
    // exchanges end-to-end — the distinct's (g,h) shuffle, which
    // carries map-side-combined partials (corpus-scale data crosses
    // the wire once, already deduped per mapper), and TopKPerKey's
    // g-shuffle, which carries only size-k bounded heaps per
    // (mapper, group). The final per-g agg reuses the heap shuffle's
    // partitioning and adds none.
    val exchanges = shuffles(p)
    assert(exchanges == 2,
      s"KMV pipeline changed its shuffle budget, $exchanges exchanges:\n$p")
  }

  test("q210: feature hashing is one partial-merged aggregate, no window") {
    val p = plan("q210_feature_hash")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"no aggregate:\n$p")
    assert(!p.contains("Window"), s"window crept into a pure agg op:\n$p")
    assert(shuffles(p) == 1, s"expected 1 exchange:\n$p")
  }

  test("q215: the quality score fuses into the scan — one window, ZERO joins") {
    val p = plan("q215_budget_sample")
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"expected one Window exec, got $windows:\n$p")
    // the score is a Column over the same scan — a corpus-to-corpus
    // score join (the round-7 first draft) broadcasts a corpus at
    // 100 TB; this pin keeps it gone
    assert(!p.contains("Join"), s"score join crept back:\n$p")
  }

  test("q217: centroids broadcast back — the corpus never sort-merges") {
    val p = plan("q217_centroid_outliers")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for stats:\n$p")
  }

  test("q218: interpolation is one window pass — no self-join, no range join") {
    val p = plan("q218_interpolate")
    assert(!p.contains("Join"), s"join-based interpolation crept in:\n$p")
    // both ignore-null frames ride the SAME (key) sort: exactly one
    // exchange feeds the window stage (plus the grid span agg's)
    assert(shuffles(p) <= 2, s"frames split the shuffle:\n$p")
  }

  test("q208: semantic dedup pairs stay an equi-join — no cartesian, no nested loop") {
    val p = plan("q208_semantic_dedup")
    assert(!p.toLowerCase.contains("cartesianproduct") &&
      !p.contains("NestedLoop"), s"pairwise stage degenerated:\n$p")
  }

  test("q211: bootstrap shuffles replicate PARTIALS, never data x32") {
    val p = plan("q211_bootstrap_ci")
    assert(p.contains("Generate"), s"replicate explode missing:\n$p")
    // partial_sum over (g, _rep) BELOW the exchange = the explode
    // combines map-side; the wire carries groups x replicates rows
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"no partial aggregation:\n$p")
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"one replicate-rank window expected, got $windows:\n$p")
  }

  test("q219/q222: score/bin pipelines never join the corpus to itself") {
    for (q <- Seq("q219_calibration", "q222_quantile_bins")) {
      val p = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"),
        s"$q grew a corpus-sized join:\n$p")
    }
  }

  test("q246: 6-table join broadcasts the dims, never goes cartesian") {
    val p = plan("q246_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$p")
  }

  test("q247: segment filter reaches the customer scan; top-10 is TakeOrdered") {
    val p = plan("q247_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-10:\n$p")
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"),
      s"segment filter not pushed:\n$p")
  }

  test("q335 (TPC-H Q6): scan-side predicates pushed, zero joins") {
    val p = plan("q335_tpch_q6")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"shipdate range not pushed:\n$p")
    assert(!p.contains("Join"), s"Q6 grew a join:\n$p")
  }

  test("q336/q346 (TPC-H Q4/Q21): EXISTS stays semi, NOT EXISTS stays anti") {
    assert(plan("q336_tpch_q4").contains("LeftSemi"))
    val p21 = plan("q346_tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"semi+anti cascade lost:\n$p21")
  }

  test("q337/q338/q345 (TPC-H Q7/Q8/Q19): dims broadcast, never cartesian") {
    for (q <- Seq("q337_tpch_q7", "q338_tpch_q8", "q345_tpch_q19")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims not broadcast:\n$p")
      assert(!p.toLowerCase.contains("cartesianproduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q: degenerate join:\n$p")
    }
  }

  test("q340 (TPC-H Q13): the join stays LEFT OUTER — zero-order customers kept") {
    val p = plan("q340_tpch_q13")
    assert(p.contains("LeftOuter"), s"left join turned inner:\n$p")
  }

  test("q343 (TPC-H Q17): correlated avg is ONE window, never a self-join") {
    val p = plan("q343_tpch_q17")
    assert(p.contains("Window"), s"window plan lost:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"per-part stats grew a lineitem self-join:\n$p")
  }

  test("q348/q349: centroids broadcast; the embedding corpus is never sort-merge joined") {
    for (q <- Seq("q348_cluster_silhouette", "q349_davies_bouldin")) {
      val p = plan(q)
      assert(p.contains("Broadcast"), s"$q: centroid table not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: corpus-sized shuffle join:\n$p")
      assert(!p.contains("Window"), s"$q: window crept into the argmin:\n$p")
    }
  }

  test("q353: Nelson-Aalen totals broadcast; one window sort, no shuffle join") {
    val p = plan("q353_nelson_aalen")
    assert(p.contains("BroadcastHashJoin"), s"totals not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"shuffle join crept in:\n$p")
    assert(p.contains("Window"), s"no window pass:\n$p")
  }

  test("q356: the compaction plan is one window pass — no join anywhere") {
    val p = plan("q356_compaction_plan")
    assert(!p.contains("Join"), s"manifest plan grew a join:\n$p")
    assert(p.contains("Window"), s"no sequential-fill window:\n$p")
  }

  test("q369: grouped MAD joins its medians by broadcast only") {
    val p = plan("q369_grouped_mad")
    assert(p.contains("BroadcastHashJoin"), s"medians not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"group medians shuffled back:\n$p")
  }

  test("q375: dataset card's top lang is a limit, not a global sort") {
    val p = plan("q375_dataset_card")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-1:\n$p")
  }

  test("q377: the probe side broadcasts — the assigned corpus never re-shuffles") {
    val p = plan("q377_ivf_cost_sweep")
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("q351: digit counts broadcast onto the 9-row spine; no sort-merge join") {
    val p = plan("q351_benford_gof")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"q351: digit-count join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q351: shuffle join on the 9-row spine:\n$p")
  }

  test("q344 (TPC-H Q18): global top-100 is TakeOrderedAndProject") {
    val p = plan("q344_tpch_q18")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-100:\n$p")
  }

  test("q248: the coordinated cascade stays semi-join end to end") {
    val p = plan("q248_coordinated_sample")
    assert(p.contains("LeftSemi"), s"semi-join cascade lost:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q277: benchmark broadcast and the argmax is an AGGREGATE, never a corpus window") {
    val p = plan("q277_semantic_decon")
    assert(p.contains("Broadcast"), s"benchmark not broadcast:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"no aggregate argmax:\n$p")
    assert(!p.contains("Window"), s"window-rank argmax crept in:\n$p")
  }

  test("q281: hard negatives keep q28's broadcast contract (corpus unshuffled for scoring)") {
    val p = plan("q281_hard_negatives")
    assert(p.contains("Broadcast"), s"query set not broadcast:\n$p")
    assert(p.contains("graft_dot"), s"native dot rewritten away:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q295: both PQ centroid generations broadcast; distances fold as aggregates") {
    val p = plan("q295_pq_codebook")
    assert(p.contains("BroadcastHashJoin"), s"centroids not broadcast:\n$p")
    assert(p.contains("HashAggregate"), s"distance fold not an aggregate:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q283: parent keys aggregate before the join; one-row verdicts") {
    val p = plan("q283_ref_integrity")
    assert(p.contains("HashAggregate"), s"no distinct-reduce:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q293: the LM rides a broadcast join onto reduced counts") {
    val p = plan("q293_domain_reweight")
    assert(p.contains("BroadcastHashJoin"), s"vocab LM not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-sized sort-merge crept into the reweight:\n$p")
  }

  test("q299: geodesic candidates are a hash equi-join on cells, never a nested loop") {
    val p = plan("q299_haversine_neighbors")
    assert(!p.toLowerCase.contains("cartesianproduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"theta join:\n$p")
  }

  test("q330: index health prunes the vector payload from the index scan") {
    val p = plan("q330_index_health")
    // the audit reads the assign part's ints only — the array<double>
    // vec column must never leave the standing index's scan
    assert(!p.contains("vec#"),
      s"vector payload leaked into the health scan:\n$p")
  }

  test("q326: standing-index scans are partition-pruned, probes prune cells dynamically") {
    val p = plan("q326_ivfpq_serve")
    // static pruning: each serve stage reads ONLY its part directory
    Seq("seed", "assign", "code", "cent").foreach(part =>
      assert(p.contains(s"= $part)"), s"no static partition filter for $part:\n$p"))
    // dynamic partition pruning: the probed-cell set (a query-derived
    // broadcast) prunes the corpus-sized assign part's c= directories
    // at the scan — the 100 TB serve cost is probed cells, not corpus
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on the cell join:\n$p")
  }

  test("q476: bucketed index layout — assign part joins with NO Exchange above its scan") {
    // the production standing-index claim: partitionBy(part) +
    // bucketBy(cell) means the corpus-sized assign part is PRE-hashed
    // on the join key — the probe join consumes that partitioning, so
    // only the tiny probe side shuffles (to the bucket count) and the
    // index side reads bucket-co-located with zero Exchange. Tree-walk
    // the non-adaptive plan: string matching can't scope "no Exchange"
    // to one subtree.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q476_ivfpq_serve_bucketed")(spark, dir)
      val p = df.queryExecution.executedPlan
      val probeJoins = p.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("cell")) => j
      }
      assert(probeJoins.nonEmpty, s"probe-cell join is not sort-merge:\n$p")
      val j = probeJoins.head
      // right side = the bucketed assign part: a bucketed scan, and
      // not one Exchange anywhere between it and the join
      val scans = j.right.collect { case s: FileSourceScanExec => s }
      assert(scans.exists(_.bucketedScan),
        s"assign side does not read bucketed:\n${j.right}")
      assert(j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"Exchange above the bucketed assign scan:\n${j.right}")
      // left side = probes: the one shuffle, sized to the bucket count
      val probeEx = j.left.collect { case e: ShuffleExchangeExec => e }
      assert(probeEx.nonEmpty, s"probe side consumed no shuffle:\n${j.left}")
      assert(probeEx.head.outputPartitioning.numPartitions == 16,
        s"probe shuffle not sized to the 16 buckets:\n${probeEx.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q477: streaming serve over bucketed layout — static assign side Exchange-free per micro-batch") {
    // the LIVE version of q476's claim: each micro-batch's stream-
    // static probe join must CONSUME the bucketed catalog table's
    // HashPartitioning — the corpus-sized assign part reads bucketed
    // with no Exchange, only the micro-batch-sized probe side
    // shuffles (to the bucket count). Streaming plans skip AQE, so
    // the executed plan is walked directly; it lives on the wrapped
    // StreamExecution (private[sql] — reached via reflection).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val q = SparkEntry.streamingBucketedProbe(spark, dir)
    try q.awaitTermination() finally q.stop()
    val se = q.getClass.getMethod("streamingQuery").invoke(q)
    val qe = se.getClass.getMethod("lastExecution").invoke(se)
      .asInstanceOf[org.apache.spark.sql.execution.QueryExecution]
    val p = qe.executedPlan
    val probeJoins = p.collect {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("cell")) => j
    }
    assert(probeJoins.nonEmpty,
      s"probe-cell stream-static join is not sort-merge:\n$p")
    val j = probeJoins.head
    val scans = j.right.collect { case s: FileSourceScanExec => s }
    assert(scans.exists(_.bucketedScan),
      s"assign side does not read bucketed:\n${j.right}")
    assert(j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"Exchange above the bucketed assign scan:\n${j.right}")
    val probeEx = j.left.collect { case e: ShuffleExchangeExec => e }
    assert(probeEx.nonEmpty,
      s"stream probe side consumed no shuffle:\n${j.left}")
    assert(probeEx.head.outputPartitioning.numPartitions == 16,
      s"probe shuffle not sized to the 16 buckets:\n${probeEx.head}")
  }

  test("q479: bucketing SURVIVES the insertInto append — updated index still joins Exchange-free") {
    // the in-place-maintenance claim: appending encoded delta rows via
    // insertInto writes files honoring the table's bucket spec, so the
    // post-append serve still consumes HashPartitioning(c, 16) with no
    // Exchange over the corpus-sized assign side. If the append had
    // silently degraded the table to unbucketed, results would still
    // be correct (q479's oracle can't see it) — only this plan walk
    // can.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.bucketedAppendServe(spark, dir)
      val p = df.queryExecution.executedPlan
      val probeJoins = p.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("cell")) => j
      }
      assert(probeJoins.nonEmpty, s"probe-cell join is not sort-merge:\n$p")
      val j = probeJoins.head
      val scans = j.right.collect { case s: FileSourceScanExec => s }
      assert(scans.exists(_.bucketedScan),
        s"updated assign side does not read bucketed:\n${j.right}")
      assert(j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"Exchange above the appended bucketed scan:\n${j.right}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q480: bucketing SURVIVES compaction — and files-per-bucket returns to 1") {
    // the maintenance loop's close: after two appends the accreted
    // partitions hold 3 files per populated bucket; compaction must
    // (a) rewrite them back to ONE file per bucket — the compact
    // steady state the repartition(numBuckets, bucketCol) clustering
    // guarantees, and the empirical proof that repartition's
    // HashPartitioning aligns with the bucket-file assignment — and
    // (b) keep the table bucketed, so the serve still consumes
    // HashPartitioning(c, 16) with no Exchange over the assign side.
    // The DuckDB oracle sees (rows); only this walk sees (a)+(b).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.bucketedCompactedServe(spark, dir)
      val tbl = spark.catalog.listTables()
        .filter("name like 'graft_vecindex_480_%'").collect().head.name
      val manifest = graft.operators.Layout.bucketFileManifest(spark, tbl)
      val accreted = manifest.filter { case (p, _, n, _) =>
        (p.startsWith("part=assign") || p.startsWith("part=code")) && n > 1 }
      assert(accreted.isEmpty,
        s"buckets still hold multiple files post-compaction: $accreted")
      val p = df.queryExecution.executedPlan
      val probeJoins = p.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("cell")) => j
      }
      assert(probeJoins.nonEmpty, s"probe-cell join is not sort-merge:\n$p")
      val j = probeJoins.head
      val scans = j.right.collect { case s: FileSourceScanExec => s }
      assert(scans.exists(_.bucketedScan),
        s"compacted assign side does not read bucketed:\n${j.right}")
      assert(j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"Exchange above the compacted bucketed scan:\n${j.right}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q481: band-index probe consumes the bucketing — index side Exchange-free post-append") {
    // the text-side q479 claim: the standing band index is
    // partitionBy(band) + bucketBy(16, sig), so the corpus-sized
    // index side of the (band, sig) probe equi-join reads pre-hashed
    // — no Exchange above its scan, bucket spec surviving the
    // insertInto append — and only the batch-sized side shuffles.
    // Broadcast is disabled for the walk: at sf0.001 the batch side
    // would broadcast (also Exchange-free, trivially); at 100 TB
    // nothing broadcasts, and THIS is the plan the layout exists for.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val bcBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // checkpointCandidates = false: the registered query eagerly
      // checkpoints the candidate set (r14 plan-size fix), which
      // EXECUTES the probe join before this walk could see it; the
      // flag pins the identical probe construction pre-checkpoint
      val df = SparkEntry.bandAppendProbe(spark, dir,
        checkpointCandidates = false)
      val p = df.queryExecution.executedPlan
      // the probe join: SMJ on (band, sig) one of whose sides is the
      // standing catalog table (the only bucketed scan in the plan —
      // the batch side bands itself from raw documents); side-agnostic
      // because Catalyst may swap inner-join sides
      def bucketed(side: org.apache.spark.sql.execution.SparkPlan) =
        side.collect { case s: FileSourceScanExec => s }.exists(_.bucketedScan)
      val probeJoins = p.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("sig")) &&
            (bucketed(j.left) || bucketed(j.right)) => j
      }
      assert(probeJoins.nonEmpty,
        s"no probe join consuming a bucketed index scan:\n$p")
      val j = probeJoins.head
      val (idxSide, batchSide) =
        if (bucketed(j.right)) (j.right, j.left) else (j.left, j.right)
      assert(idxSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"Exchange above the bucketed band-index scan:\n$idxSide")
      val probeEx = batchSide.collect { case e: ShuffleExchangeExec => e }
      assert(probeEx.nonEmpty, s"batch side consumed no shuffle:\n$batchSide")
      assert(probeEx.head.outputPartitioning.numPartitions == 16,
        s"batch shuffle not sized to the 16 buckets:\n${probeEx.head}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcBefore)
    }
  }

  test("q482: band-index bucketing SURVIVES compaction — files-per-bucket returns to 1") {
    // the text-side q480 claim: after two half-wave appends the band
    // partitions hold 3 files per populated bucket; compaction must
    // return them to ONE file per bucket with the bucket spec intact,
    // so the probe join still consumes HashPartitioning(sig, 16).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val bcBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // checkpointCandidates = false — see the q481 walk's note
      val df = SparkEntry.bandCompactedProbe(spark, dir,
        checkpointCandidates = false)
      val tbl = spark.catalog.listTables()
        .filter("name like 'graft_bandindex_482_%'").collect().head.name
      val manifest = graft.operators.Layout.bucketFileManifest(spark, tbl)
      val accreted = manifest.filter(_._3 > 1)
      assert(accreted.isEmpty,
        s"buckets still hold multiple files post-compaction: $accreted")
      val p = df.queryExecution.executedPlan
      def bucketed(side: org.apache.spark.sql.execution.SparkPlan) =
        side.collect { case s: FileSourceScanExec => s }.exists(_.bucketedScan)
      val probeJoins = p.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("sig")) &&
            (bucketed(j.left) || bucketed(j.right)) => j
      }
      assert(probeJoins.nonEmpty,
        s"no probe join consuming a bucketed index scan:\n$p")
      val j = probeJoins.head
      val idxSide = if (bucketed(j.right)) j.right else j.left
      assert(idxSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"Exchange above the compacted band-index scan:\n$idxSide")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcBefore)
    }
  }

  test("q470 (TPC-H Q2): decorrelated min joins back, dims broadcast, top-100 cut") {
    val p = plan("q470_tpch_q2")
    // the correlated min decorrelates into an aggregate re-joined on
    // (part, cost) — never a per-row subquery loop
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"no min aggregate:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"global sort instead of top-100:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q471 (TPC-H Q9): part filter broadcasts and prunes before the fact joins") {
    val p = plan("q471_tpch_q9")
    assert(p.contains("BroadcastHashJoin"), s"part side not broadcast:\n$p")
    assert(p.contains("StartsWith") || p.contains("PushedFilters"),
      s"red-part filter not visible at/near the scan:\n$p")
  }

  test("ivfPqServe batchScale drops the forced broadcasts on query-derived sides") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.operators.Similarity.ivfPqIndex(emb)
    val queries = emb.filter(col("vec_id") < 20)
    def hintCount(batchScale: Boolean): Int = {
      val lp = graft.operators.Similarity
        .ivfPqServe(idx, emb, queries, 3, batchScale = batchScale)
        .queryExecution.optimizedPlan.toString
      "strategy=broadcast".r.findAllIn(lp).length
    }
    val forced = hintCount(batchScale = false)
    val scaled = hintCount(batchScale = true)
    // seeds + centroids stay hinted in both modes; probes/dtab/
    // shortlist/query hints exist only in the small-query mode
    assert(forced > scaled && scaled >= 1,
      s"expected fewer broadcast hints under batchScale: $forced vs $scaled")
  }
}

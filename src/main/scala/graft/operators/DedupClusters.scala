package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: pairs → connected components →
  * canonical representative per document. Completes the dedup
  * pipeline (SURVEY.md §2.11): candidate pairs from MinHash/SimHash/
  * fingerprints are only half the job — deduplication needs the
  * transitive closure (A≈B, B≈C ⇒ {A,B,C} is one group) and a
  * deterministic survivor.
  *
  * Algorithm: min-label propagation with pointer doubling — each
  * round every node adopts the smallest label among itself and its
  * neighbors, then labels are compressed one level
  * (`comp := comp(comp)`), giving O(log diameter) rounds instead of
  * O(diameter). Per round: two keyed joins + one aggregation. The
  * per-round driver action is a single count (convergence test);
  * `checkConvergence = false` switches to a fixed iteration budget
  * with zero per-round driver actions for true-scale runs.
  */
object DedupClusters {

  /** Unpersist the checkpoint blocks behind `df` (the result of
    * [[connectedComponents]]/[[resolve]], or any frame over local
    * checkpoints). `Dataset.unpersist` can't reach them — localCheckpoint
    * blocks live outside the SQL cache manager — so long-running
    * pipelines call this once the result has been consumed. After
    * release the frame is NOT re-computable (checkpointing truncated
    * its lineage); unreferenced results are also reclaimed eventually
    * by the ContextCleaner, so skipping this is a memory-pressure
    * issue, never a correctness one. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** @param checkConvergence when true (default), the loop exits as
    *         soon as labels are stable. The convergence test costs NO
    *         dedicated job: each round's frame carries a `chg` flag
    *         (new comp ≠ previous comp) and is materialized lazily, so
    *         the single job that checkpoints the round ALSO answers
    *         "did anything change" — one job per round, exactly like
    *         the fixed-budget mode, plus early exit. When false, the
    *         loop runs exactly `maxIter` rounds — the fully
    *         deterministic job-count mode (maxIter jobs, no data-
    *         dependent control flow) for schedulers that want a fixed
    *         DAG. With pointer doubling, `maxIter` rounds converge any
    *         graph of diameter ≤ 2^maxIter, so the default budget of
    *         20 covers any realistic near-dup graph (diameter ≤ ~1M).
    * @return (node, comp) — comp is the minimum doc id reachable via
    *         the pair graph; singletons are absent (docs appearing in
    *         no pair are their own trivial cluster). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 20,
                          checkConvergence: Boolean = true): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    // eager localCheckpoint, not persist: each iteration's frame must
    // TRUNCATE lineage — with lazy caches, any later recompute (cache
    // miss, unpersisted ancestor) cascades exponentially through the
    // iteration history, re-running the candidate-pair pipeline per
    // level (measured: 49 s to count a "cached" 477-row result)
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // superseded once this round's checkpoint is materialized: the
      // new checkpoint truncates lineage, so the old blocks are dead
      // weight — unpersisted at the bottom of the loop. Without this,
      // every round's blocks pile up in executor storage for the life
      // of the session (catalog.clearCache can't see them).
      val superseded = labels
      val nbrMin = sym.join(labels, sym("v") === labels("node"))
        .groupBy(sym("u").as("n")).agg(min("comp").as("nbr_comp"))
      val propagated = labels.join(nbrMin, labels("node") === nbrMin("n"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // pointer doubling: comp := comp(comp) — halves remaining depth
      val byNode = propagated.select(col("node").as("pn"), col("comp").as("pcomp"))
      val doubled = propagated.join(byNode, propagated("comp") === byNode("pn"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
      if (checkConvergence) {
        // piggyback the convergence test on the checkpoint job: the
        // frame carries `chg`, the checkpoint is LAZY, and the count
        // below is the action that materializes it — one job total.
        // (propagated's node set == labels' node set, so inner join.)
        val prev = labels.select(col("node").as("pnode"), col("comp").as("prev_comp"))
        val withChg = doubled.join(prev, col("node") === col("pnode"))
          .select(col("node"), col("comp"),
            (col("comp") =!= col("prev_comp")).as("chg"))
          .localCheckpoint(false)
        // full-scan agg (not limit(1)): every partition is computed in
        // THIS job, so the lazy checkpoint persists completely and no
        // second missing-partition job runs at doCheckpoint time
        changed = withChg.agg(count(when(col("chg"), lit(1))))
          .collect()(0).getLong(0) > 0
        labels = withChg.select("node", "comp")
      } else {
        labels = doubled.localCheckpoint(true)
      }
      release(superseded)
      iter += 1
    }
    // the edge table served its last join; only the final labels
    // checkpoint (the result's backing blocks — see [[release]])
    // remains persisted
    release(sym)
    labels
  }

  /** Full dedup resolution over a corpus: every doc mapped to its
    * cluster representative (the minimum doc id of its component;
    * itself when un-paired). Downstream keeps `doc_id == comp` rows.
    * `maxIter` / `checkConvergence` pass straight through to
    * [[connectedComponents]] — `checkConvergence = false` with a
    * doubling-sized budget (diameter ≤ 2^maxIter) is the fixed-DAG
    * mode for scheduled production runs. */
  def resolve(docs: DataFrame, pairs: DataFrame,
              idCol: String = "doc_id", maxIter: Int = 20,
              checkConvergence: Boolean = true): DataFrame = {
    val comps = connectedComponents(pairs, maxIter = maxIter,
      checkConvergence = checkConvergence)
    docs.select(col(idCol))
      .join(comps, docs(idCol) === comps("node"), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster_rep"))
  }

  /** Incremental cluster maintenance — the per-batch companion of
    * [[resolve]] and the tail of the incremental-ingest story
    * ([[FuzzyDedup.bandIndex]] probe → [[FuzzyDedup
    * .incrementalNearDups]] delta pairs → this): fold an arriving
    * batch's delta pairs into a standing (doc_id, cluster_rep)
    * assignment WITHOUT re-running connected components over the
    * corpus. Each delta edge contracts to the QUOTIENT graph over
    * representatives (arriving docs represent themselves), CC runs on
    * that quotient — bounded by the components the batch actually
    * touches, not the corpus — and only touched representatives
    * remap. EXACTLY equals the full [[resolve]] over old ∪ new with
    * old ∪ delta pairs (spec-pinned): union-find is quotient-stable,
    * and since every standing rep is the minimum of its component,
    * the quotient's min-rep IS the merged component's global min.
    *
    * Contract: `assignment` covers the indexed corpus, `newDocs` is
    * disjoint from it, and `deltaPairs` is the new-involving pair set
    * ([[FuzzyDedup.incrementalNearDups]]'s delta-equivalence output).
    *
    * Scale shape: two broadcast-able rep-lookup joins contract the
    * (batch-sized) delta; the CC loop runs on the contracted edges
    * only; the final remap is one left join of the assignment against
    * the (small) moved-rep relation. The corpus-sized assignment
    * crosses the wire once. */
  def clusterUpdate(assignment: DataFrame, deltaPairs: DataFrame,
                    newDocs: DataFrame, idCol: String = "doc_id",
                    maxIter: Int = 20): DataFrame = {
    val reps = assignment
      .select(col(idCol).as("_d"), col("cluster_rep").as("_r"))
      .unionAll(newDocs.select(col(idCol).as("_d"), col(idCol).as("_r")))
    val qEdges = deltaPairs
      .join(reps.select(col("_d").as("doc_a"), col("_r").as("_ra")),
        Seq("doc_a"))
      .join(reps.select(col("_d").as("doc_b"), col("_r").as("_rb")),
        Seq("doc_b"))
      .filter(col("_ra") =!= col("_rb"))
      .select(col("_ra").as("doc_a"), col("_rb").as("doc_b"))
    val qc = connectedComponents(qEdges, maxIter = maxIter)
    reps.join(qc, reps("_r") === qc("node"), "left")
      .select(col("_d").as(idCol),
        coalesce(col("comp"), col("_r")).as("cluster_rep"))
  }

  /** The per-batch ingest DECISION — what the pipeline actually acts
    * on after [[clusterUpdate]]: for each arriving doc, its cluster,
    * whether it is KEPT (it IS the cluster's representative: it joined
    * no existing cluster and out-ranks its batch-mates — min-rep makes
    * this one equality test), and the cluster's post-update size.
    * Because the updated assignment provably equals the full rebuild,
    * the full-rebuild replay filtered to the batch IS the oracle.
    *
    * Scale shape: one map-side-combinable size agg over the
    * assignment, a semi-join to the batch ids, and a size lookup
    * keyed by rep — no corpus re-read, no pair re-derivation. */
  def ingestDecisions(assignment: DataFrame, newDocs: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val sz = assignment.groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"))
    assignment.join(newDocs.select(col(idCol)), Seq(idCol), "left_semi")
      .join(sz, Seq("cluster_rep"))
      .select(col(idCol), col("cluster_rep"),
        (col(idCol) === col("cluster_rep")).as("keep"),
        col("n_members"))
  }

  /** Chaining audit over resolved near-dup clusters: transitive
    * closure merges A~B and B~C into one cluster even when A and C
    * share almost nothing — the classic dedup failure mode (one
    * boilerplate-heavy "bridge" doc welds two unrelated groups, and
    * the survivor then "represents" docs it doesn't resemble). For
    * every small cluster (2..maxSize members), score ALL member
    * pairs by exact Jaccard: a cluster whose MINIMUM pairwise
    * similarity sits under `chainThreshold` is chained and needs a
    * re-split (or a higher verify threshold upstream).
    *
    * Pairs are scored over shingled members only (empty-shingle docs
    * can't be compared); Jaccard rides ×10¹²-quantized so min/mean
    * are engine-exact.
    *
    * Returns (cluster_rep, n_members, n_pairs, min_jaccard,
    * mean_jaccard, chained).
    *
    * Scale shape: the size filter bounds within-cluster pair
    * expansion at maxSize²; big clusters are excluded BY CONTRACT
    * (auditing a 10⁶-member cluster pairwise is the quadratic this
    * engine never runs — sample such clusters upstream instead).
    * One rep-keyed self-join + two id-keyed shingle joins, all on
    * audited-member-sized relations. */
  def clusterChainAudit(clusters: DataFrame, docs: DataFrame,
                        maxSize: Int = 16, chainThreshold: Double = 0.5,
                        idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 3): DataFrame = {
    require(maxSize >= 2)
    val sizes = clusters.groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2 && col("n_members") <= maxSize)
    val m = clusters.join(sizes, Seq("cluster_rep"))
    val pairs = m.select(col("cluster_rep"), col("n_members"),
        col(idCol).as("_a"))
      .join(m.select(col("cluster_rep"), col(idCol).as("_b")),
        Seq("cluster_rep"))
      .filter(col("_a") < col("_b"))
    val sh = FuzzyDedup.shingled(
      Fanout.widenUnchecked(
        docs.join(m.select(col(idCol)), Seq(idCol), "left_semi"),
        col(idCol)),
      idCol, textCol, n)
    val inter = size(array_intersect(col("_sha"), col("_shb")))
    val jq = floor(inter.cast("double") * 1e12 /
      (size(col("_sha")) + size(col("_shb")) - inter)).cast("long")
    pairs
      .join(sh.select(col("doc_id").as("_a"), col("sh").as("_sha")),
        Seq("_a"))
      .join(sh.select(col("doc_id").as("_b"), col("sh").as("_shb")),
        Seq("_b"))
      .select(col("cluster_rep"), col("n_members"), jq.as("_jq"))
      .groupBy("cluster_rep", "n_members")
      .agg(count(lit(1)).as("n_pairs"), min("_jq").as("_mn"),
        sum(col("_jq").cast("decimal(38,0)")).as("_sm"))
      .select(col("cluster_rep"), col("n_members"), col("n_pairs"),
        round(col("_mn").cast("double") / 1e12, 6).as("min_jaccard"),
        round(col("_sm").cast("double") / col("n_pairs") / 1e12, 6)
          .as("mean_jaccard"),
        (col("_mn").cast("double") / 1e12 < chainThreshold).as("chained"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the profiling pass that DECIDES
  * the physical strategies used elsewhere in this engine (salting
  * factor for [[SkewJoin]], bucket counts, AQE skew thresholds). At
  * 100 TB you profile before you join; this makes the profile itself
  * a first-class, cheap, deterministic query.
  */
object Profiling {

  /** Top-N heaviest keys with their skew statistics:
    *
    *  - `share`          — fraction of all rows on this key;
    *  - `ratio_to_mean`  — key count ÷ mean key count (1.0 = uniform);
    *  - `suggested_salt` — ⌈ratio⌉, the replication factor that would
    *    level this key to the mean (the `salt` input of
    *    [[SkewJoin.saltedJoin]]).
    *
    * Scale shape: one map-side-combinable count per key, a 1-row
    * broadcast of (n_keys, total), and a global top-N that plans as
    * TakeOrderedAndProject — never a full sort of the key table.
    * Ties at the cut rank break by key, so the N-th row is
    * deterministic on every engine. */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String],
                     topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && topN >= 1)
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val stats = broadcast(counts.agg(
      count(lit(1)).as("_nkeys"), sum("cnt").as("_total")))
    // double-space ratio: cnt·n_keys as int64 could overflow at
    // extreme cardinality × volume; the double keeps both engines on
    // the identical operand sequence
    val ratio = col("cnt").cast("double") * col("_nkeys") / col("_total")
    counts.crossJoin(stats)
      .select(keyCols.map(col) ++ Seq(
        col("cnt"),
        round(col("cnt") / col("_total"), 6).as("share"),
        round(ratio, 6).as("ratio_to_mean"),
        ceil(ratio).cast("long").as("suggested_salt")): _*)
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
      .limit(topN)
  }

  /** Single-pass column profile — "DESCRIBE at scale" as a first-class
    * query: per column, row count, null count, distinct count, and
    * numeric min/max (NULL for non-numeric columns, whose native
    * min/max would be collation-sensitive across engines).
    *
    * Scale shape: ONE aggregation over ONE scan. count/null-count/
    * min/max are plain map-side-combinable partials; the distinct
    * counts use Spark's multi-distinct planning (one Expand at factor
    * ≈ #profiled columns). For very wide profiles at 100 TB swap
    * `countDistinct` for the mergeable HLL aggregate
    * ([[Sketches.hllAggCol]]) and the Expand disappears — exact
    * counts are kept here because the profile is itself an oracle-
    * checked component and exact distinct is the stronger pin. The
    * single wide row is unpivoted driver-free with `stack`. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains))
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        f.name
    }.toSet
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(lit(1)).as(s"_n$i"),
        count(when(col(c).isNull, 1)).as(s"_nl$i"),
        countDistinct(col(c)).as(s"_d$i"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_mn$i"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_mx$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', _n$i, _nl$i, _d$i, _mn$i, _mx$i"
    }.mkString(", ")
    row.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(col_name, n_rows, n_null, n_distinct, min_num, max_num)")
  }

  /** Profile drift diff between two relation snapshots: the
    * [[columnProfile]] of each side joined per column, with the
    * deltas a schema/quality monitor alerts on (null-rate shift,
    * distinct-count ratio, numeric range drift). All deltas derive
    * from exact integer counts or min/max — no sampled statistics —
    * so the report is engine-replayable.
    *
    * Scale shape: two single-pass profiles (one wide agg each)
    * joined on a #columns-sized key — the diff itself is free. */
  def profileDiff(a: DataFrame, b: DataFrame,
                  cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, s: String) =
      columnProfile(df, cols).select(col("col_name"),
        col("n_rows").as(s"n_rows_$s"), col("n_null").as(s"n_null_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("min_num").as(s"min_$s"), col("max_num").as(s"max_$s"))
    side(a, "a").join(side(b, "b"), Seq("col_name"))
      .select(col("col_name"), col("n_rows_a"), col("n_rows_b"),
        round(col("n_null_b").cast("double") / col("n_rows_b") -
          col("n_null_a").cast("double") / col("n_rows_a"), 6)
          .as("null_rate_delta"),
        round(col("n_distinct_b").cast("double") /
          when(col("n_distinct_a") > 0, col("n_distinct_a")), 6)
          .as("distinct_ratio"),
        round(col("min_b") - col("min_a"), 6).as("min_delta"),
        round(col("max_b") - col("max_a"), 6).as("max_delta"))
  }

  /** k-anonymity audit: the quasi-identifier equivalence classes
    * with fewer than `k` records — the groups where a "de-identified"
    * release still isolates individuals. Optionally also reports the
    * distinct count of `idCol` per violating class (how many real
    * subjects are exposed). Returns the quasi columns +
    * (n_records, n_ids?) for violating classes only.
    *
    * Scale shape: one map-side-combinable group count over the
    * quasi-identifier key; the output is violating-classes-sized.
    * This is the AUDIT — the fix (generalize, suppress, bucket) is a
    * projection the caller applies upstream and re-audits. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long,
                      idCol: Option[String] = None): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2)
    val aggs = Seq(count(lit(1)).as("n_records")) ++
      idCol.map(c => countDistinct(col(c)).as("n_ids"))
    df.groupBy(quasiCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("n_records") < k)
  }

  /** l-diversity audit, [[kAnonymityAudit]]'s second line of defense:
    * a quasi-identifier class can be large (k-anonymous) yet reveal
    * everyone's SENSITIVE value if that value barely varies inside
    * the class. Flags classes where the sensitive attribute takes
    * fewer than `l` distinct values (`low_diversity` — homogeneity
    * attack) or where one value holds more than `maxSharePct`% of
    * the records (`skewed` — probabilistic inference attack; the
    * share test is exact integer cross-multiplication, no float).
    * NULL counts as one sensitive value — "field missing" is itself
    * an inference. Returns violating classes only.
    *
    * Scale shape: two stacked map-side-combinable aggs — (quasi,
    * sensitive) cells, then per-class rollup of cell counts; output
    * is violating-classes-sized. The fix (generalize the quasi cols,
    * widen sensitive buckets) happens upstream and re-audits. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensCol: Column, l: Long,
                      maxSharePct: Long = 100L): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2 &&
      maxSharePct >= 1 && maxSharePct <= 100)
    val cells = df.groupBy(quasiCols.map(col) :+ sensCol.as("_sv"): _*)
      .agg(count(lit(1)).as("_cn"))
    cells.groupBy(quasiCols.map(col): _*)
      .agg(sum("_cn").as("n_records"),
        count(lit(1)).as("n_sensitive"),
        max("_cn").as("top_count"))
      .withColumn("low_diversity", col("n_sensitive") < l)
      .withColumn("skewed",
        col("top_count") * 100L > col("n_records") * maxSharePct)
      .filter(col("low_diversity") || col("skewed"))
  }

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymityAudit]] and [[lDiversityAudit]]: a class can be
    * large AND diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs from the table's (semantic attack: "people
    * in this class earn far more than average"). Per quasi-identifier
    * class, the earth-mover's distance between the class's ordered
    * sensitive distribution and the GLOBAL one, with the standard
    * equal-step ground distance: T = Σᵢ |F_g(vᵢ) − F(vᵢ)| / (m−1)
    * over the m global distinct values; `breach` flags T > t.
    *
    * Exactness: each CDF gap is the integer |r_g·N − r·n_g| (running
    * counts cross-multiplied, decimal(38,0) — no overflow at any
    * scale), summed order-free; the two divisions (by n_g·N, then
    * m−1) run on identical operands. T is NULL when m = 1 (a
    * constant column distinguishes nothing).
    *
    * Scale shape: one (quasi, value) reduced shuffle; the audit grid
    * is (distinct sensitive values × classes) — bounded by value
    * cardinality, not table size (quantize the sensitive attribute
    * coarser upstream if its cardinality is unbounded). The global
    * CDF window runs over the values relation (the documented
    * bounded-relation single-partition window). */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensCol: Column, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty && t > 0)
    val qs = quasiCols.map(col)
    val cells = df.filter(sensCol.isNotNull &&
        quasiCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(qs :+ sensCol.cast("long").as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val wAll = Window.orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val glob = cells.groupBy("_v").agg(sum("_c").as("_cv"))
      .withColumn("_rv", sum("_cv").over(wAll))
    val tot = broadcast(glob.agg(sum("_cv").as("_N"),
      count(lit(1)).as("_m")))
    val grp = cells.groupBy(qs: _*).agg(sum("_c").as("_ng"))
    val wg = Window.partitionBy(qs: _*).orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("decimal(38,0)")
    glob.select(col("_v"), col("_rv")).crossJoin(grp)
      .join(cells, quasiCols :+ "_v", "left_outer")
      .withColumn("_rg", sum(coalesce(col("_c"), lit(0L))).over(wg))
      .crossJoin(tot)
      .groupBy(qs :+ col("_ng").as("n_records"): _*)
      .agg(sum(abs(d(col("_rg")) * d(col("_N")) -
        d(col("_rv")) * d(col("_ng")))).as("_s"),
        max("_N").as("_Nx"), max("_m").as("_mx"))
      .select(qs ++ Seq(col("n_records"),
        round(when(col("_mx") > 1,
          col("_s").cast("double") /
            (d(col("n_records")) * d(col("_Nx"))).cast("double") /
            (col("_mx") - 1).cast("double")), 6).as("t_emd")): _*)
      .withColumn("breach", col("t_emd") > t)
  }

  /** Functional-dependency discovery over candidate column pairs
    * (metanome-lite): does `a → b` hold — does every value of `a`
    * determine exactly one `b`? One verdict row per candidate:
    * (fd, n_keys, n_violating_keys, key_violation_rate, holds).
    * NULL `a` rows are out of scope (no key); a key whose only
    * variation in `b` is NULL-vs-value does not violate (distinct
    * counts ignore NULLs — "missing" is absence, not a second
    * value). The discovered FDs drive normalization checks,
    * dimension-table extraction, and "this column is derivable —
    * stop storing it" decisions.
    *
    * Scale shape: one map-side-combinable (a, countDistinct b) agg
    * per candidate over a shared scan; candidates are a bounded,
    * caller-curated list (the full column-pair lattice is the
    * caller's loop — each pair is this same cheap plan). */
  def fdDiscovery(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    pairs.map { case (a, b) =>
      df.filter(col(a).isNotNull)
        .groupBy(col(a).as("_k"))
        .agg(countDistinct(col(b)).as("_nb"), count(lit(1)).as("_n"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("_nb") > 1, 1L).otherwise(0L))
            .as("n_violating_keys"),
          sum(when(col("_nb") > 1, col("_n")).otherwise(0L))
            .as("n_violating_rows"))
        .select(lit(s"$a->$b").as("fd"), col("n_keys"),
          col("n_violating_keys"), col("n_violating_rows"),
          round(col("n_violating_keys").cast("double") / col("n_keys"), 6)
            .as("key_violation_rate"),
          (col("n_violating_keys") === 0).as("holds"))
    }.reduce(_ unionAll _)
  }

  /** Sortedness audit: for each column, the fraction of adjacent
    * pairs (in the `orderCol` total order) that are non-decreasing —
    * "is this column already sorted enough that the layout sort is
    * free / the range metadata is tight". 1.0 = monotone; ~0.5 =
    * random; NULL values break adjacency (neither side of a NULL
    * counts as ordered or disordered). Returns one row per column:
    * (column, n_pairs, n_nondecreasing, sortedness).
    *
    * Scale shape: one lag window per audited column over the frame
    * order. At 100 TB run it per partition/file and roll up — the
    * within-file sortedness is exactly what zone-map tightness
    * ([[Layout.zoneMapPruning]]) depends on. */
  def sortednessAudit(df: DataFrame, orderCol: Column,
                      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("_o")
    cols.map { c =>
      df.select(col(c).cast("double").as("_v"), orderCol.as("_o"))
        .withColumn("_prev", lag("_v", 1).over(w))
        .filter(col("_prev").isNotNull && col("_v").isNotNull)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("_v") >= col("_prev"), 1L).otherwise(0L))
            .as("n_nondecreasing"))
        .select(lit(c).as("column"), col("n_pairs"),
          col("n_nondecreasing"),
          round(when(col("n_pairs") > 0,
            col("n_nondecreasing").cast("double") / col("n_pairs")), 6)
            .as("sortedness"))
    }.reduce(_ unionAll _)
  }

  /** Marginal-preserving synthetic rows: each output row draws every
    * column INDEPENDENTLY from a hash-chosen source row, so per-
    * column distributions converge to the source marginals while
    * joint structure (and thus anything identifying) is broken — the
    * test-fixture / sharing-safe-sample generator. Fully
    * deterministic: column c of synthetic row i comes from the
    * source row at rank `md5(seed:c:i) mod N` in `idCol` order, so
    * the same call yields the same rows on any engine or
    * partitioning (no rand(), no RNG seeds to plumb).
    *
    * Scale shape: the rank table is one sort of the (bounded,
    * fixture-sized) source sample; each column is a key-equi join of
    * the n-row synthetic spine against it. Synthesizing from a
    * 100 TB table starts from a sampled source anyway ([[
    * graft.operators.Sampling.hashSample]]) — the generator's input
    * contract is a bounded frame. */
  def syntheticRows(df: DataFrame, idCol: String, cols: Seq[String],
                    n: Int, seed: String = "syn"): DataFrame = {
    require(cols.nonEmpty && n >= 1)
    import graft.functions.HashFunctions.md5Long
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(idCol) +: cols.map(col): _*)
      .withColumn("_rk",
        row_number().over(Window.orderBy(col(idCol))).cast("long") - 1)
    val nSrc = broadcast(df.agg(count(lit(1)).as("_n")))
    val spine = df.sparkSession.range(n).select(col("id").as("synth_id"))
      .crossJoin(nSrc)
    cols.foldLeft(spine) { (acc, c) =>
      acc.withColumn(s"_p$c",
          md5Long(concat_ws(":", lit(seed), lit(c),
            col("synth_id").cast("string"))) % col("_n"))
        .join(ranked.select(col("_rk").as(s"_p$c"), col(c)), Seq(s"_p$c"))
        .drop(s"_p$c")
    }.drop("_n")
  }

  /** Referential-integrity audit: how many child rows point at a
    * parent key that doesn't exist — the orphaned-FK read behind
    * every silent inner-join row loss ("the join dropped 3% of
    * revenue" is usually THIS). One verdict row per relationship:
    * (relationship, n_child, n_null_keys, n_orphans, orphan_rate).
    * NULL child keys are counted separately, not as orphans — a
    * nullable FK is a modeling choice, a dangling one is a defect.
    *
    * Scale shape: parent keys distinct-reduce map-side before the
    * join; the child side streams through one left join (broadcast
    * when the parent key set is small, co-partitioned otherwise)
    * into a 1-row aggregate. Union the verdict rows across
    * relationships for the whole-schema audit. */
  def refIntegrityAudit(child: DataFrame, parent: DataFrame,
                        childKey: String, parentKey: String,
                        relationship: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("_pk")).distinct()
    child.select(col(childKey).as("_ck"))
      .join(pk, col("_ck") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("_ck").isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(col("_ck").isNotNull && col("_pk").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
      .select(lit(relationship).as("relationship"), col("n_child"),
        col("n_null_keys"), col("n_orphans"),
        round(when(col("n_child") > col("n_null_keys"),
          col("n_orphans").cast("double") /
            (col("n_child") - col("n_null_keys"))), 6).as("orphan_rate"))
  }

  /** Header/lines reconciliation: does each header's stored total
    * equal the sum of its line amounts? One verdict row:
    * (n_headers, n_no_lines, n_mismatch beyond `tolerance`,
    * max_abs_diff) — the financial-close / cross-feed consistency
    * audit. Both sides are rounded to cents BEFORE comparing, so the
    * comparison runs on identical operands.
    *
    * Scale shape: one map-side-combinable line aggregation, one
    * key-equi left join (co-located when both feeds share a bucketed
    * key layout), one 1-row verdict — the mismatch DETAIL, when
    * needed, is the same plan minus the final aggregate. */
  def reconcileTotals(header: DataFrame, lines: DataFrame,
                      headerKey: String, lineKey: String,
                      headerTotal: Column, lineAmount: Column,
                      tolerance: Double = 0.01): DataFrame = {
    val li = lines.groupBy(col(lineKey).as("_k"))
      .agg(round(sum(lineAmount), 2).as("_lt"))
    header.select(col(headerKey).as("_k"), round(headerTotal, 2).as("_ht"))
      .join(li, Seq("_k"), "left")
      .agg(count(lit(1)).as("n_headers"),
        sum(when(col("_lt").isNull, 1L).otherwise(0L)).as("n_no_lines"),
        sum(when(col("_lt").isNotNull &&
          abs(col("_ht") - col("_lt")) > tolerance, 1L).otherwise(0L))
          .as("n_mismatch"),
        round(max(when(col("_lt").isNotNull,
          abs(col("_ht") - col("_lt")))), 2).as("max_abs_diff"))
  }

  /** Population stability index per group: how far the value
    * distribution has drifted from a REFERENCE slice (training-time,
    * last week, control arm …), measured over quantile bins derived
    * from the reference itself —
    * `PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)`. The model- and
    * feature-monitoring drift metric (rule of thumb: < 0.1 stable,
    * > 0.25 action); pairs with [[Outliers.cusumDrift]], which finds
    * WHEN a shift happened, where PSI quantifies HOW FAR the
    * distribution moved. Empty bins are floored at `eps` (standard
    * practice — PSI is undefined at zero mass).
    *
    * Scale shape: one grouped exact percentile over the REFERENCE
    * slice only (cut table is groups × cuts, broadcast back), then a
    * single scan-speed binning pass and a (group, slice, bin)-sized
    * aggregation — the corpus shuffles once, on the group key. */
  def psiDrift(df: DataFrame, groupCol: String, refCol: Column,
               valueCol: String,
               quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
               eps: Double = 1e-12): DataFrame = {
    require(quantiles.nonEmpty && quantiles == quantiles.sorted &&
      quantiles.forall(q => q > 0 && q < 1))
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("_v"),
        when(refCol, lit("ref")).otherwise(lit("cur")).as("_slice"))
    val cuts = base.filter(col("_slice") === "ref")
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(_v, ${quantiles.head})").as("_c0"),
        quantiles.tail.zipWithIndex.map { case (q, i) =>
          expr(s"percentile(_v, $q)").as(s"_c${i + 1}") }: _*)
    val bin = quantiles.indices.foldRight(lit(quantiles.size)) {
      (i, acc) => when(col("_v") <= col(s"_c$i"), lit(i)).otherwise(acc) }
    val counts = base.join(broadcast(cuts), Seq(groupCol))
      .groupBy(col(groupCol), col("_slice"), bin.as("_bin"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val probs = counts
      .withColumn("_p", col("_n") / sum("_n").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol), col("_slice"))))
      .groupBy(col(groupCol), col("_bin"))
      .agg(max(when(col("_slice") === "ref", col("_p"))).as("_pr"),
        max(when(col("_slice") === "cur", col("_p"))).as("_pc"))
    probs.groupBy(col(groupCol))
      .agg(round(sum((coalesce(col("_pc"), lit(0.0)) -
          coalesce(col("_pr"), lit(0.0))) *
        log(coalesce(col("_pc"), lit(eps)) /
          coalesce(col("_pr"), lit(eps)))), 6).as("psi"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic per group:
    * D = max over v of |F₁(v) − F₂(v)| between slice A (`isSliceA`
    * true) and slice B — the nonparametric distribution-shift test
    * that, unlike [[psiDrift]], needs no binning choices and detects
    * shape changes PSI's coarse bins smear out. Returns (group,
    * ks_d rounded 6, ks_at = the smallest value attaining the max,
    * n1, n2); groups missing either slice are dropped (D is
    * undefined there).
    *
    * INTEGER-exact argmax: the per-value statistic is computed as
    * `|C₁(v)·n₂ − C₂(v)·n₁|` over int64 running counts, so the max,
    * its location, and the tie-break are engine-exact — the one FP
    * division happens once per group on identical operands. Exact
    * while n₁·n₂ < 2⁶³ (~3·10⁹ rows per slice per group); beyond
    * that, quantize values into buckets first — at that scale the
    * distinct-value table needs bounding anyway.
    *
    * Scale shape: one (group, value) shuffle with map-side combine,
    * running CDFs via a window that sorts WITHIN each group only, a
    * groups-sized broadcast of the slice totals, and one
    * map-side-combinable struct-max. Nothing global, nothing on the
    * driver. */
  def ksTwoSample(df: DataFrame, groupCol: String, isSliceA: Column,
                  valueCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"),
        when(isSliceA, lit(1L)).otherwise(lit(0L)).as("_a"),
        col(valueCol).as("_v"))
    val c = base.groupBy(col("_g"), col("_v"))
      .agg(sum("_a").as("_c1"), (count(lit(1)) - sum("_a")).as("_c2"))
    val tot = c.groupBy("_g")
      .agg(sum("_c1").as("_n1"), sum("_c2").as("_n2"))
      .filter(col("_n1") > 0 && col("_n2") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    c.withColumn("_r1", sum("_c1").over(w))
      .withColumn("_r2", sum("_c2").over(w))
      .join(broadcast(tot), Seq("_g"))
      .withColumn("_dq",
        abs(col("_r1") * col("_n2") - col("_r2") * col("_n1")))
      .groupBy(col("_g").as(groupCol))
      .agg(max(struct(col("_dq"), (-col("_v")).as("_nv"))).as("_m"),
        max("_n1").as("n1"), max("_n2").as("n2"))
      .select(col(groupCol),
        round(col("_m._dq").cast("double") /
          (col("n1") * col("n2")).cast("double"), 6).as("ks_d"),
        (-col("_m._nv")).as("ks_at"), col("n1"), col("n2"))
  }

  /** Cramér–von Mises two-sample statistic per group:
    * T = n₁n₂/N² · Σ over pooled observations (F₁(v) − F₂(v))² — the
    * whole-curve companion to [[ksTwoSample]]'s max deviation (KS
    * keys on the single worst point; CvM integrates every
    * discrepancy, catching broad mild shifts KS under-weighs).
    * Tie-robust: the sum runs over distinct values weighted by their
    * pooled multiplicity, so no within-tie order exists.
    *
    * FULLY integer-exact, not just deterministic: each level
    * contributes w·(r₁n₂ − r₂n₁)² accumulated in decimal(38,0)
    * (order-free at any scale), and the ONE division per group —
    * by n₁n₂N² assembled in decimal — sees identical operands on
    * any engine. The int64 cross-products inherit [[ksTwoSample]]'s
    * documented n₁·n₂ < 2⁶³ bound (~3·10⁹ rows per slice per group);
    * quantize values coarser beyond that.
    *
    * Scale shape: identical to [[ksTwoSample]] — one (group, value)
    * shuffle with map-side combine, running CDFs on ONE group-local
    * sort, totals broadcast, then a map-side-combinable agg. Groups
    * missing either slice are dropped. */
  def cramerVonMises(df: DataFrame, groupCol: String, isSliceA: Column,
                     valueCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"),
        when(isSliceA, lit(1L)).otherwise(lit(0L)).as("_a"),
        col(valueCol).as("_v"))
    val c = base.groupBy(col("_g"), col("_v"))
      .agg(sum("_a").as("_c1"), (count(lit(1)) - sum("_a")).as("_c2"))
    val tot = c.groupBy("_g")
      .agg(sum("_c1").as("_n1"), sum("_c2").as("_n2"))
      .filter(col("_n1") > 0 && col("_n2") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dq = (col("_r1") * col("_n2") - col("_r2") * col("_n1"))
      .cast("decimal(38,0)")
    c.withColumn("_r1", sum("_c1").over(w))
      .withColumn("_r2", sum("_c2").over(w))
      .join(broadcast(tot), Seq("_g"))
      .withColumn("_t",
        (col("_c1") + col("_c2")).cast("decimal(38,0)") * dq * dq)
      .groupBy(col("_g").as(groupCol))
      .agg(sum("_t").as("_ts"), max("_n1").as("n1"), max("_n2").as("n2"))
      .select(col(groupCol), col("n1"), col("n2"),
        round(col("_ts").cast("double") /
          ((col("n1") * col("n2")).cast("decimal(38,0)") *
            ((col("n1") + col("n2")) * (col("n1") + col("n2")))
              .cast("decimal(38,0)")).cast("double"), 6).as("cvm_t"))
  }

  /** Wasserstein-1 (earth-mover) distance between two slices' value
    * distributions, per group — the drift metric that, unlike KS
    * ([[ksTwoSample]], max deviation) or PSI ([[psiDrift]], binned
    * log-ratio), weighs HOW FAR mass moved: a $1 shift of every price
    * scores small, a bimodal split scores large. For integer-valued
    * columns W₁ = Σᵢ |F₁(vᵢ)−F₂(vᵢ)|·(vᵢ₊₁−vᵢ) over the sorted
    * distinct values. Returns (group, w1 rounded 6, n1, n2).
    *
    * INTEGER-exact accumulation: each segment contributes
    * `|r₁·n₂ − r₂·n₁| · gap` in int64 (running counts
    * cross-multiplied by slice totals), summed exactly in any order;
    * the single FP division happens once per group on identical
    * operands. Exact while n₁·n₂·range < 2⁶³ per segment — quantize
    * coarser first beyond that.
    *
    * Scale shape: identical to [[ksTwoSample]] — one (group, value)
    * shuffle with map-side combine, running CDF + lead gap riding ONE
    * group-local sort, totals broadcast. `valueCol` must be integral
    * (quantize money to cents upstream). */
  def wasserstein1(df: DataFrame, groupCol: String, isSliceA: Column,
                   valueCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"),
        when(isSliceA, lit(1L)).otherwise(lit(0L)).as("_a"),
        col(valueCol).as("_v"))
    val c = base.groupBy(col("_g"), col("_v"))
      .agg(sum("_a").as("_c1"), (count(lit(1)) - sum("_a")).as("_c2"))
    val tot = c.groupBy("_g")
      .agg(sum("_c1").as("_n1"), sum("_c2").as("_n2"))
      .filter(col("_n1") > 0 && col("_n2") > 0)
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nxt = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_v")
    c.withColumn("_r1", sum("_c1").over(cum))
      .withColumn("_r2", sum("_c2").over(cum))
      // last value: no segment to the right, gap 0 (F₁=F₂=1 there)
      .withColumn("_gap",
        coalesce(lead("_v", 1).over(nxt) - col("_v"), lit(0L)))
      .join(broadcast(tot), Seq("_g"))
      .groupBy(col("_g").as(groupCol))
      .agg(sum(abs(col("_r1") * col("_n2") - col("_r2") * col("_n1"))
          * col("_gap")).as("_num"),
        max("_n1").as("n1"), max("_n2").as("n2"))
      .select(col(groupCol),
        round(col("_num").cast("double") /
          (col("n1") * col("n2")).cast("double"), 6).as("w1"),
        col("n1"), col("n2"))
  }

  /** Data-contract validation — the constraint gate that runs before
    * a drop is admitted to the lake: one row per declared constraint,
    * (check_name, n_violations, passed). Constraint classes:
    *
    *  - `notNull`     — columns that must carry a value;
    *  - `unique`      — key column sets that must be row-unique
    *    (violations = rows − key groups; a NULL-bearing key counts as
    *    its own group, same as `GROUP BY`);
    *  - `ranges`      — numeric (col, lo, hi) inclusive bounds
    *    (NULLs are not range violations — declare `notNull` too);
    *  - `foreignKeys` — (col, dimension, refCol): values that must
    *    resolve in the dimension (NULL FK = nullable reference, not
    *    an orphan — SQL FK semantics).
    *
    * Scale shape: every row-local check (notNull + ranges) FUSES into
    * one scan / one 1-row aggregate regardless of how many are
    * declared; each `unique` is one map-side-combinable count over
    * its own key; each FK is one left-anti count with the dimension
    * broadcast when small. Verdict rows are constraint-count-sized —
    * nothing wide ever reaches the driver. */
  def checkConstraints(df: DataFrame,
                       notNull: Seq[String] = Nil,
                       unique: Seq[Seq[String]] = Nil,
                       ranges: Seq[(String, Double, Double)] = Nil,
                       foreignKeys: Seq[(String, DataFrame, String)] = Nil)
  : DataFrame = {
    require(notNull.nonEmpty || unique.nonEmpty || ranges.nonEmpty ||
      foreignKeys.nonEmpty, "declare at least one constraint")
    val scanChecks: Seq[(String, Column)] =
      notNull.map(c => s"not_null($c)" ->
        sum(when(col(c).isNull, 1L).otherwise(0L))) ++
      ranges.map { case (c, lo, hi) => s"range($c)" ->
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)) }
    val scanRows: Seq[DataFrame] =
      if (scanChecks.isEmpty) Nil
      else {
        val aggs = scanChecks.zipWithIndex.map { case ((_, e), i) =>
          e.as(s"_c$i") }
        val row = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = scanChecks.zipWithIndex
          .map { case ((n, _), i) => s"'$n', _c$i" }.mkString(", ")
        Seq(row.selectExpr(s"stack(${scanChecks.size}, $stackArgs) AS " +
          "(check_name, n_violations)"))
      }
    val uniqueRows = unique.map { keys =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_cnt"))
        .agg((sum("_cnt") - count(lit(1))).as("n_violations"))
        .select(lit(s"unique(${keys.mkString(",")})").as("check_name"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    }
    val fkRows = foreignKeys.map { case (c, dim, refCol) =>
      df.filter(col(c).isNotNull)
        .join(dim.select(col(refCol).as(c)), Seq(c), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(s"fk($c)").as("check_name"), col("n_violations"))
    }
    (scanRows ++ uniqueRows ++ fkRows).reduce(_.unionByName(_))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Benford's-law first-digit audit: per group, the observed
    * distribution of leading significant digits of a positive
    * integer amount column against the Benford expectation
    * `p(d) = log10(1 + 1/d)` — the classic fabricated-numbers /
    * data-entry-anomaly screen for financial columns.
    *
    * The leading digit comes from the INTEGER's decimal string, not
    * from `floor(x/10^floor(log10 x))` — log10 of a double near an
    * exact power of ten can land on either side of the integer on
    * different libm implementations, silently shifting a digit
    * bucket; substring-of-integer is bit-exact everywhere. Pass
    * amounts pre-scaled to integers (e.g. cents): scaling by a power
    * of ten never changes the leading significant digit.
    *
    * Scale shape: one scan, one map-side-combinable count to a
    * (groups × 9)-sized table, one group-partitioned window for the
    * group total — nothing driver-side. `p_obs` divides exact
    * integer counts, so every output value is engine-portable.
    *
    * Output: (group…, digit, n, p_obs, p_benford, abs_dev). */
  def benfordAudit(df: DataFrame, groupCols: Seq[String],
                   amountCol: String): DataFrame = {
    val digit = substring(col(amountCol).cast("string"), 1, 1)
      .cast("long")
    val counted = df
      .filter(col(amountCol).isNotNull && col(amountCol) > 0)
      .groupBy(groupCols.map(col) :+ digit.as("digit"): _*)
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    counted
      .withColumn("p_obs",
        round(col("n").cast("double") / sum("n").over(w), 6))
      .withColumn("p_benford",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("abs_dev", round(abs(col("p_obs") - col("p_benford")), 6))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns: one row with the statistic Σ(o−e)²/e over the FULL r×c
    * contingency table (cells with zero observed count still
    * contribute e — dropping them understates the statistic), the
    * degrees of freedom (r−1)(c−1), and n. The distribution-level
    * dependence check next to [[ksTwoSample]]'s two-sample distance:
    * "is event mix independent of day-of-week" in one number.
    *
    * Exactness: each cell term is ((o·n − rt·ct)²/ (n·rt·ct)) with an
    * int64 numerator root (exact while o·n < 2⁶³) squared in double —
    * identical correctly-rounded operands on any engine. The final
    * sum is r·c terms; round-6 absorbs association order.
    *
    * Scale shape: one (r,c) count shuffle with map-side combine, then
    * everything rides on the r×c marginal cross (broadcast both — a
    * contingency table that does NOT fit in a broadcast is not a
    * contingency table you can chi-square-read anyway). */
  def chiSquareIndependence(df: DataFrame, rowCol: String,
                            colCol: String): DataFrame = {
    val base = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .select(col(rowCol).as("_r"), col(colCol).as("_c"))
    val o = base.groupBy("_r", "_c").agg(count(lit(1)).as("_o"))
    val rt = o.groupBy("_r").agg(sum("_o").as("_rt"))
    val ct = o.groupBy("_c").agg(sum("_o").as("_ct"))
    val n = rt.agg(sum("_rt").as("_n"), count(lit(1)).as("_nr"))
      .crossJoin(ct.agg(count(lit(1)).as("_nc")))
    rt.crossJoin(broadcast(ct))                       // every cell, zeros included
      .join(o, Seq("_r", "_c"), "left")
      .na.fill(0L, Seq("_o"))
      .crossJoin(broadcast(n))
      .agg(
        round(sum(
          pow((col("_o") * col("_n") - col("_rt") * col("_ct"))
            .cast("double"), 2) /
          (col("_n").cast("double") * col("_rt") * col("_ct"))), 6)
          .as("chi2"),
        ((max("_nr") - 1) * (max("_nc") - 1)).as("df"),
        max("_n").as("n"))
  }

  /** Adjusted standardized residuals per contingency cell — WHICH
    * cells drive [[chiSquareIndependence]]'s significance:
    * r = (O − E) / √(E·(1 − rₘ/N)(1 − cₘ/N)) is ~N(0,1) under
    * independence, so |r| > 2.575829 (the fixed 99% z literal) flags
    * a cell as individually anomalous — the post-hoc read the
    * omnibus χ² number can't give. Zero cells included (an EMPTY
    * cell can be the finding).
    *
    * Determinism: O and the margins are int64; E and the residual
    * are closed forms on identical operands in a fixed order; the
    * flag compares against a shared literal.
    *
    * Scale shape: [[chiSquareIndependence]]'s exact pipeline — one
    * reduced (r, c) shuffle, broadcast margins, output r×c cells. */
  def chiSquareResiduals(df: DataFrame, rowCol: String,
                         colCol: String): DataFrame = {
    val base = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .select(col(rowCol).as("_r"), col(colCol).as("_c"))
    val o = base.groupBy("_r", "_c").agg(count(lit(1)).as("_o"))
    val rt = o.groupBy("_r").agg(sum("_o").as("_rt"))
    val ct = o.groupBy("_c").agg(sum("_o").as("_ct"))
    val n = broadcast(rt.agg(sum("_rt").as("_n")))
    val nD = col("_n").cast("double")
    val e = col("_rt").cast("double") * col("_ct") / nD
    val r = (col("_o").cast("double") - e) /
      sqrt(e * (lit(1.0) - col("_rt").cast("double") / nD) *
        (lit(1.0) - col("_ct").cast("double") / nD))
    rt.crossJoin(broadcast(ct))
      .join(o, Seq("_r", "_c"), "left")
      .na.fill(0L, Seq("_o"))
      .crossJoin(n)
      .select(col("_r").as(rowCol), col("_c").as(colCol),
        col("_o").as("observed"), round(e, 6).as("expected"),
        round(r, 6).as("adj_residual"),
        (abs(r) > 2.575829).as("anomalous"))
  }

  /** Benjamini–Hochberg FDR adjustment: for each test (id, p) the
    * q-value q_(k) = min_{j ≥ k} (p_(j)·n/j) capped at 1, over p
    * ranked ascending — the multiple-testing gate that turns a column
    * of raw p-values (from [[ksTwoSample]], [[chiSquareIndependence]],
    * A/B z-tests, …) into a column you can threshold at a target
    * false-discovery rate.
    *
    * Ties: equal p's get row_number ranks in id order, but the
    * suffix-min assigns them all the same q (the smallest p·n/j in
    * the tie block reaches every member), so the output is
    * tie-order-free. Each p·n/j is one correctly-rounded double op on
    * identical operands; min and the ≤1 cap are exact.
    *
    * Scale shape: ranking and the reversed running min ride ONE
    * global sort over tests — tests, not data rows; millions of tests
    * sort in one stage. The count n is a 1-row broadcast. */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(pCol).isNotNull)
      .select(col(idCol), col(pCol).cast("double").as("_p"))
    val n = base.agg(count(lit(1)).as("_n"))
    val rk = Window.orderBy(col("_p"), col(idCol))
    val suffix = Window.orderBy(col("_p").desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    base.crossJoin(broadcast(n))
      .withColumn("_j", row_number().over(rk))
      .withColumn("q_value",
        round(least(min(col("_p") * col("_n") / col("_j")).over(suffix),
          lit(1.0)), 6))
      .select(col(idCol), col("_p").as(pCol), col("q_value"))
  }

  /** Jensen–Shannon divergence between the categorical mix of two
    * slices of one table (slice A = rows where `inA`, B = the rest):
    * the SYMMETRIC, always-finite drift measure — unlike PSI/KL it
    * never blows up on a category present in only one slice, so it's
    * the right default for "did the event mix shift" monitoring next
    * to [[psiDrift]] (which needs smoothing) and [[chiSquareIndependence]]
    * (which tests, not measures). One row per category with both
    * observed shares, the category's JS contribution, and the total
    * (0 = identical mixes, ln 2 ≈ 0.693 = disjoint) repeated on every
    * row so the per-category report stays one flat table.
    *
    * Exactness: category counts are exact int64 from ONE map-side-
    * combined pass (both slices counted in the same agg); shares and
    * ln terms are correctly-rounded doubles on identical operands;
    * the category-count-bounded sums are absorbed by round-6.
    *
    * Scale shape: one count agg on the scan, then everything rides
    * the BOUNDED category relation (two 1-row broadcasts). */
  def jsDivergence(df: DataFrame, catCol: String, inA: Column): DataFrame = {
    val perCat = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(inA, 0L).otherwise(1L)).as("n_b"))
    val tot = perCat.agg(sum("n_a").as("_ta"), sum("n_b").as("_tb"))
    val withP = perCat.crossJoin(broadcast(tot))
      .withColumn("_p", col("n_a").cast("double") / col("_ta"))
      .withColumn("_q", col("n_b").cast("double") / col("_tb"))
      .withColumn("_m", (col("_p") + col("_q")) / 2)
      .withColumn("_term",
        when(col("_p") > 0, col("_p") * log(col("_p") / col("_m")) / 2)
          .otherwise(lit(0.0)) +
        when(col("_q") > 0, col("_q") * log(col("_q") / col("_m")) / 2)
          .otherwise(lit(0.0)))
    val total = withP.agg(sum("_term").as("_js"))
    withP.crossJoin(broadcast(total))
      .select(col("category"), col("n_a"), col("n_b"),
        round(col("_p"), 6).as("p_a"), round(col("_q"), 6).as("p_b"),
        round(col("_term"), 6).as("js_term"),
        round(col("_js"), 6).as("js_total"))
  }

  /** Cramér's V: the [0,1]-normalized effect size of the chi-square
    * association between two categorical columns — the number that
    * makes [[chiSquareIndependence]] comparable across tables of
    * different size and shape (χ² grows with n; V does not). Same
    * engine-exact contingency pipeline (full r×c cross, zero cells
    * included), one extra correctly-rounded sqrt on the ALREADY
    * ROUNDED χ² so both engines normalize identical operands.
    *
    * Scale shape: identical to [[chiSquareIndependence]] — one (r,c)
    * count shuffle with map-side combine, then broadcast marginal
    * algebra on the bounded contingency cross. */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val base = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .select(col(rowCol).as("_r"), col(colCol).as("_c"))
    val o = base.groupBy("_r", "_c").agg(count(lit(1)).as("_o"))
    val rt = o.groupBy("_r").agg(sum("_o").as("_rt"))
    val ct = o.groupBy("_c").agg(sum("_o").as("_ct"))
    val n = rt.agg(sum("_rt").as("_n"), count(lit(1)).as("_nr"))
      .crossJoin(ct.agg(count(lit(1)).as("_nc")))
    val agg = rt.crossJoin(broadcast(ct))
      .join(o, Seq("_r", "_c"), "left")
      .na.fill(0L, Seq("_o"))
      .crossJoin(broadcast(n))
      .agg(
        round(sum(
          pow((col("_o") * col("_n") - col("_rt") * col("_ct"))
            .cast("double"), 2) /
          (col("_n").cast("double") * col("_rt") * col("_ct"))), 6)
          .as("chi2"),
        ((max("_nr") - 1) * (max("_nc") - 1)).as("df"),
        max("_n").as("n"), max("_nr").as("_mr"), max("_nc").as("_mc"))
    val minDim = (least(col("_mr"), col("_mc")) - 1).cast("double")
    agg.select(col("chi2"), col("df"), col("n"),
      round(when(minDim > 0,
        sqrt(col("chi2") / (col("n").cast("double") * minDim))), 6).as("v"))
  }

  /** Daily mix-shift monitor: for every observed day, the Jensen–
    * Shannon divergence between that day's categorical mix and the
    * pooled mix of the trailing `lookback` OBSERVED days — the
    * operational alarm built on [[jsDivergence]]'s one-shot compare
    * ("which morning did the event mix break", not just "did it").
    * One row per day with history: (day, n_day, n_prev, js). Days
    * with no trailing history are dropped, not scored against an
    * empty baseline.
    *
    * Exactness: the (day × category) grid is dense by construction
    * (bounded cross join, zeros filled), so the trailing-rows frame
    * means trailing DAYS; counts are exact int64, shares/ln terms
    * correctly-rounded doubles on identical operands, per-day sums
    * category-bounded and absorbed by round-6.
    *
    * Scale shape: one (day, category) count reduction off the scan
    * (map-side combined), then everything rides the bounded grid —
    * one per-category ordered window, one per-day window, one final
    * day agg. The raw data shuffles once, reduced. */
  def jsShiftDaily(df: DataFrame, catCol: String, dayCol: Column,
                   lookback: Int = 7): DataFrame = {
    val c = df.filter(col(catCol).isNotNull && dayCol.isNotNull)
      .groupBy(dayCol.cast("long").as("_day"), col(catCol).as("_cat"))
      .agg(count(lit(1)).as("_c"))
    jsShiftFromCounts(c, "_day", "_cat", "_c", lookback)
  }

  /** [[jsShiftDaily]]'s core over an ALREADY-COUNTED (period,
    * category, n) table — the entry point for feeds that arrive
    * pre-aggregated, e.g. a Structured Streaming windowed count sink
    * (period = window start, lookback = 1 compares consecutive
    * windows). Same dense-grid exactness contract. */
  def jsShiftFromCounts(counts: DataFrame, dayCol: String, catCol: String,
                        cntCol: String, lookback: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lookback >= 1)
    val c = counts.select(col(dayCol).cast("long").as("_day"),
      col(catCol).as("_cat"), col(cntCol).cast("long").as("_c"))
    val grid = c.select("_day").distinct()
      .crossJoin(broadcast(c.select("_cat").distinct()))
      .join(c, Seq("_day", "_cat"), "left")
      .na.fill(0L, Seq("_c"))
    val wPrev = Window.partitionBy("_cat").orderBy("_day")
      .rowsBetween(-lookback.toLong, -1)
    val wDay = Window.partitionBy("_day")
    val g = grid
      .withColumn("_prev", coalesce(sum("_c").over(wPrev), lit(0L)))
      .withColumn("_dt", sum("_c").over(wDay))
      .withColumn("_pt", sum("_prev").over(wDay))
    val p = col("_c").cast("double") / col("_dt")
    val q = col("_prev").cast("double") / col("_pt")
    val m = (p + q) / 2
    val term = when(p > 0, p * log(p / m) / 2).otherwise(lit(0.0)) +
      when(q > 0, q * log(q / m) / 2).otherwise(lit(0.0))
    g.filter(col("_pt") > 0 && col("_dt") > 0)
      .groupBy(col("_day").as("day"))
      .agg(max("_dt").as("n_day"), max("_pt").as("n_prev"),
        round(sum(term), 6).as("js"))
  }

  /** Row-level data-contract quarantine: every row is annotated with
    * the sorted comma-joined list of rules it VIOLATES and a `keep`
    * flag — the routing companion to the table-level
    * [[checkConstraints]] report ("how many rows are bad" there;
    * "WHICH rows, and why, so the writer can fork clean/quarantine
    * sinks" here). A rule is (name, predicate-that-must-hold); a NULL
    * predicate result counts as a violation (unknown ⇒ not proven
    * valid — the conservative contract).
    *
    * Scale shape: pure scan-speed projection — zero shuffles, zero
    * joins; the reasons string is a fixed bounded expression per row.
    * Deterministic: reasons are sorted, so the annotation doesn't
    * depend on rule declaration order. */
  def quarantine(df: DataFrame, idCols: Seq[Column],
                 rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val marks = rules.map { case (name, pred) =>
      when(coalesce(pred, lit(false)), lit(null).cast("string"))
        .otherwise(lit(name))
    }
    df.select(idCols ++ Seq(
      concat_ws(",", array_sort(filter(array(marks: _*), _.isNotNull)))
        .as("reasons")): _*)
      .withColumn("keep", col("reasons") === "")
  }

  /** Theil's uncertainty coefficient U(Y|X): the fraction of Y's
    * entropy explained by knowing X — the DIRECTIONAL categorical
    * association the symmetric measures ([[cramersV]],
    * [[chiSquareIndependence]]) can't express ("cohort predicts
    * event type" vs the reverse are different numbers). One row:
    * H(Y), H(Y|X), U = (H(Y) − H(Y|X))/H(Y); null U when Y is
    * constant (zero entropy, nothing to explain).
    *
    * Exactness: all cell/marginal counts are exact int64 from one
    * map-side-combined pass; each entropy term is correctly-rounded
    * double ops on identical operands; the cell-bounded sums are
    * absorbed by round-6 (the chi-square posture).
    *
    * Scale shape: one (x, y) count shuffle, then marginal algebra on
    * the bounded contingency relation with 1-row broadcasts. */
  def theilsU(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val nxy = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    val nx = nxy.groupBy("_x").agg(sum("_nxy").as("_nx"))
    val n = broadcast(nx.agg(sum("_nx").as("_n")))
    val hy = nxy.groupBy("_y").agg(sum("_nxy").as("_ny"))
      .crossJoin(n)
      .agg(sum(-(col("_ny").cast("double") / col("_n")) *
        log(col("_ny").cast("double") / col("_n"))).as("_hy"))
    val hyx = nxy.join(broadcast(nx), Seq("_x")).crossJoin(n)
      .agg(sum(-(col("_nxy").cast("double") / col("_n")) *
        log(col("_nxy").cast("double") / col("_nx"))).as("_hyx"))
    hy.crossJoin(hyx)
      .select(round(col("_hy"), 6).as("h_y"),
        round(col("_hyx"), 6).as("h_y_given_x"),
        round(when(col("_hy") > 0, (col("_hy") - col("_hyx")) / col("_hy")),
          6).as("theils_u"))
  }

  /** log10(1 + 1/d) for d = 1..9 as FIXED 12-decimal constants —
    * shared verbatim with the oracle dual, so no libm log10 ever
    * enters the comparison (its last-ulp behavior differs across
    * engines). They sum to 1 + 10⁻¹², which round-6 absorbs. */
  private val benfordP = Seq(0.301029995664, 0.176091259056,
    0.124938736608, 0.096910013008, 0.079181246048, 0.066946789631,
    0.057991946978, 0.051152522447, 0.045757490561)

  /** Benford GOODNESS-OF-FIT over a positive money column — the
    * single-table χ² statistic companion to [[benfordAudit]]'s
    * per-group |obs−exp| screen, with two properties the screen
    * deliberately doesn't have: zero-observation digits still appear
    * (their χ² term is N·p — DROPPING an absent digit understates
    * the very deviation being tested), and the Benford expectation is
    * a fixed 12-decimal constant table ([[benfordP]]) rather than a
    * runtime log10, so no libm enters the dual at all. The first
    * significant digit comes from the EXACT cent integer rendered as
    * a string (long→string is engine-identical; ×100 never changes a
    * leading significant digit). Sub-cent values (pc ≤ 0) and NULLs
    * are excluded. One map-side-combining 9-group aggregate;
    * everything after runs on the 9-row spine. χ² total = sum of the
    * returned terms (vs χ²₈ critical values). Empty input returns
    * the spine with n = 0 and NULL shares.
    * Returns (digit, n, obs_share, benford_share, chi2_term). */
  def benfordGof(df: DataFrame, valueCol: Column): DataFrame = {
    val pc = floor(valueCol * 100 + lit(0.5)).cast("long")
    val counts = df.filter(valueCol.isNotNull && pc > 0)
      .select(substring(pc.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("_nd"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        element_at(array(benfordP.map(lit): _*), col("id").cast("int"))
          .as("_p"))
    val tot = broadcast(counts.agg(sum(col("_nd")).as("_N")))
    val n = coalesce(col("_nd"), lit(0L))
    val dev = n.cast("double") - col("_N") * col("_p")
    // broadcast the RIGHT side: a left-outer join can only
    // build-broadcast its right input (a hint on the streamed left
    // side is silently dropped and the 9×9 join falls back to size
    // estimation on the aggregate)
    spine.join(broadcast(counts), Seq("digit"), "left_outer")
      .crossJoin(tot)
      .select(col("digit"), n.as("n"),
        round(n.cast("double") / col("_N"), 6).as("obs_share"),
        round(col("_p"), 6).as("benford_share"),
        round(dev * dev / (col("_N") * col("_p")), 6).as("chi2_term"))
  }

  /** Inclusion-dependency discovery over a column registry: for
    * every ordered pair of registered columns (A, B), is
    * distinct(A) ⊆ distinct(B) — the FK-candidate scan schema
    * crawlers run before anyone declares constraints
    * ([[fdDiscovery]] finds the within-table rules; this finds the
    * BETWEEN-table references, [[refIntegrityAudit]]'s declared
    * check turned into discovery). Exact containment: n_common
    * counted on the distinct-value level, contained ⇔
    * n_common = n_a. NULLs don't participate (SQL FK semantics).
    *
    * `columns` maps a label to its single-column DataFrame; all
    * values are compared as longs (the id-typed registry this
    * engine's tables use).
    *
    * Returns (col_a, col_b, n_a, n_common, contained) for a ≠ b.
    *
    * Scale shape: one distinct per registered column (map-side
    * combinable), ONE value-keyed self-join of the unioned level
    * relation (each value bucket emits |cols-holding-value|² pairs —
    * bounded by the registry size, not the data), one (a, b) count.
    * At data-lake width, swap the exact level relation for the KMV
    * sketch union ([[Sketches]]) — same output contract with an
    * estimated n_common; the exact path is right while distinct
    * values fit a shuffle. */
  def indDiscovery(columns: Seq[(String, DataFrame)]): DataFrame = {
    require(columns.nonEmpty)
    val lev = columns.map { case (name, df) =>
      val c = df.columns.head
      df.select(col(c).cast("long").as("v"))
        .filter(col("v").isNotNull).distinct()
        .select(lit(name).as("_col"), col("v"))
    }.reduce(_.unionByName(_))
    val nPer = lev.groupBy("_col").agg(count(lit(1)).as("n_a"))
    val pairs = lev.select(col("_col").as("col_a"), col("v"))
      .join(lev.select(col("_col").as("col_b"), col("v")), Seq("v"))
      .filter(col("col_a") =!= col("col_b"))
      .groupBy("col_a", "col_b").agg(count(lit(1)).as("n_common"))
    // every ordered pair appears, even with zero overlap
    val spine = nPer.select(col("_col").as("col_a"), col("n_a"))
      .crossJoin(nPer.select(col("_col").as("col_b")))
      .filter(col("col_a") =!= col("col_b"))
    spine.join(pairs, Seq("col_a", "col_b"), "left_outer")
      .select(col("col_a"), col("col_b"), col("n_a"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)) === col("n_a"))
          .as("contained"))
  }
}

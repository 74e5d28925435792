package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training (SURVEY.md §2.11 extension
  * surface): concatenate the corpus in deterministic document order
  * and split it into fixed-capacity training sequences, assigning
  * every document its global token offset and the sequence span it
  * occupies (the concat-and-split packing used to build fixed-context
  * batches without padding waste).
  *
  * The core is a GLOBAL prefix sum — the textbook anti-pattern if
  * written as one `Window.orderBy(id)` (Spark moves the whole corpus
  * to a single partition). Here it is hierarchical, the distributed
  * scan-sum shape:
  *
  *  1. per-block token totals (`id div blockSize`) — one shuffled
  *     aggregation down to |docs|/blockSize rows;
  *  2. per-SUPER-block totals (`block div blockSize`) — the only
  *     unpartitioned window runs over THIS table: |docs|/blockSize²
  *     rows (10^9 docs at blockSize 4096 → 60 rows), so no single
  *     partition ever holds more than blockSize rows at any level;
  *  3. within-super-block cumulative block offsets, partitioned by
  *     super-block, plus the broadcast super-block base;
  *  4. within-block running sums, partitioned by block (fully
  *     parallel), plus the broadcast block base offset.
  *
  * Every step is integer arithmetic on exact token counts — the
  * assignment is reproducible across engines, reruns, and cluster
  * sizes (it depends only on ids and token counts, never on
  * partitioning).
  */
object Packing {

  /** @param seqLen    training-sequence capacity in tokens
    * @param blockSize documents per prefix-sum block
    * @return per doc: n_tokens, start_offset (global token position),
    *         seq_id / seq_pos (sequence containing the first token
    *         and the position within it), end_seq (sequence holding
    *         the last token; empty docs keep end_seq = seq_id). */
  def packOffsets(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", seqLen: Int = 1024,
                  blockSize: Long = 4096L): DataFrame = {
    require(seqLen >= 1 && blockSize >= 1)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n"))
    val withBlock = base.withColumn("block", expr(s"doc_id div $blockSize"))
    val blockTotals = withBlock.groupBy("block").agg(sum("n").as("bn"))
      .withColumn("sblock", expr(s"block div $blockSize"))
    // level 2: super-block exclusive prefix — the only unpartitioned
    // window, over |blocks|/blockSize rows
    val sTotals = blockTotals.groupBy("sblock").agg(sum("bn").as("sn"))
    val ws = Window.orderBy("sblock")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sOffsets = sTotals
      .withColumn("soff", coalesce(sum("sn").over(ws), lit(0L)))
      .drop("sn")
    // level 1: block offsets = super-block base + earlier blocks in
    // the same super-block (window partitioned ⇒ fully parallel)
    val wb = Window.partitionBy("sblock").orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = blockTotals
      .withColumn("wboff", coalesce(sum("bn").over(wb), lit(0L)))
      .join(broadcast(sOffsets), "sblock")
      .select(col("block"), (col("soff") + col("wboff")).as("boff"))
    val ww = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withBlock
      .withColumn("woff", coalesce(sum("n").over(ww), lit(0L)))
      .join(broadcast(blockOffsets), "block")
      .select(col("doc_id"), col("n").as("n_tokens"),
        (col("boff") + col("woff")).as("start_offset"),
        expr(s"(boff + woff) div $seqLen").as("seq_id"),
        ((col("boff") + col("woff")) % seqLen).as("seq_pos"),
        expr(s"(boff + woff + greatest(n, 1) - 1) div $seqLen").as("end_seq"))
  }
}

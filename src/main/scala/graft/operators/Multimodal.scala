package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column plumbing (SURVEY.md §2.11): images/audio/video
  * ride as opaque `binary` columns with a typed metadata struct; all
  * heavy decode work happens executor-side, batched, behind a
  * pluggable codec seam.
  *
  * The container has no image/audio codecs, so [[FakeCodec]] is a
  * clearly-marked deterministic stand-in (dimensions derived from the
  * payload's md5) — the Spark-side contract (schema, partitioning,
  * batch shape, null handling) is real and tested, and swapping in a
  * real codec is a one-object change.
  *
  * Scale notes: payloads stay columnar Parquet `binary`; metadata
  * extraction is a per-row projection (scan-parallel, no shuffle);
  * the batch-decode path is `mapPartitions` so codec init happens
  * once per partition, not once per row — the Scala analog of a
  * Pandas-batched UDF.
  */
object Multimodal {

  /** One decoded-media metadata record. */
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Long,
                             width: Long, height: Long, channels: Long)

  /** The codec seam: bytes → (width, height, channels). */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): (Long, Long, Long)
  }

  /** STUB codec — deterministic fake: "dimensions" are keyed off the
    * payload md5 so tests and the DuckDB oracle can reproduce them.
    * A real deployment replaces this object with e.g. an ImageIO- or
    * ffmpeg-backed implementation; nothing else changes. */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def b(i: Int): Long = md(i) & 0xffL
      (16 * (1 + b(0) % 64), 16 * (1 + b(1) % 64), 1 + b(2) % 4)
    }
  }

  /** documents → multimodal frame: the text payload re-typed as an
    * opaque binary column plus provenance metadata, the shape a real
    * image/audio table would have. */
  def asBinaryTable(docs: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "text"): DataFrame =
    // NOT widened here (r14 A/B): most consumers are scan-light
    // (meta extraction, frame sampling, the mapPartitions decode) and
    // the exchange cost them 2–4× (q30/q31/q51/q180/q279 all
    // regressed); the two per-byte-CPU consumers — dhashNearDup and
    // audioConstellation — widen their OWN frame input instead
    docs.select(
      col(idCol).as("doc_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit("image/png").as("mime"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Payload byte-entropy screen: per binary payload, the Shannon
    * entropy of its byte distribution (bits/byte, 0..8), the
    * distinct-byte count, and a high-entropy flag — the
    * decode-free compressibility test a multimodal ingest runs
    * FIRST (near-8 entropy = already compressed/encrypted: don't
    * re-compress, don't feature-extract as if raw; near-0 = padding
    * or a stuck sensor). Bytes ride as hex pairs (the q31 contract
    * — byte-exact and DuckDB-portable without blob slicing).
    *
    * Determinism: per-(doc, byte) counts are exact int64; each
    * −p·log₂p term is ×10¹²-quantized from identical doubles and
    * summed as decimal(38,0) — order-free, ≤256 terms per doc.
    * Empty payloads report NULL entropy.
    *
    * Returns (doc_id, n_bytes, distinct_bytes, entropy_bits,
    * high_entropy).
    *
    * Scale shape: one corpus-byte-sized explode reduced map-side to
    * ≤256 rows per doc, one per-doc agg — scan-shaped, no joins. */
  def byteEntropy(binTable: DataFrame,
                  highBits: Double = 7.0): DataFrame = {
    val dec = "decimal(38,0)"
    val hx = hex(col("content"))
    val bytes = binTable
      .select(col("doc_id"), hx.as("_hx"),
        (length(hx) / 2).cast("long").as("_nb"))
      .filter(col("_nb") > 0)
      .select(col("doc_id"), col("_nb"),
        explode(expr(
          "transform(sequence(0, cast(_nb - 1 as int)), " +
            "i -> substring(_hx, i * 2 + 1, 2))")).as("_byte"))
    val counts = bytes.groupBy(col("doc_id"), col("_nb"), col("_byte"))
      .agg(count(lit(1)).as("_c"))
    val p = col("_c").cast("double") / col("_nb").cast("double")
    val term = floor(-p * log2(p) * 1e12 + lit(0.5)).cast("long")
    counts.groupBy(col("doc_id"))
      .agg(max("_nb").as("n_bytes"),
        count(lit(1)).as("distinct_bytes"),
        round(sum(term.cast(dec)).cast("double") / 1e12, 6)
          .as("entropy_bits"))
      .withColumn("high_entropy", col("entropy_bits") >= highBits)
  }

  /** Pure-expression metadata extraction (no decode round-trip):
    * byte length + md5-derived fake dimensions. Portable to the
    * DuckDB oracle hex-for-hex. */
  def extractMeta(binTable: DataFrame): DataFrame = {
    val h = md5(col("content"))
    binTable.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      (lit(16) * (lit(1) + conv(substring(h, 1, 2), 16, 10).cast("long") % 64)).as("width"),
      (lit(16) * (lit(1) + conv(substring(h, 3, 2), 16, 10).cast("long") % 64)).as("height"),
      (lit(1) + conv(substring(h, 5, 2), 16, 10).cast("long") % 4).as("channels"))
  }

  /** Batch decode through the codec seam: one codec instance per
    * partition, rows streamed through it. Returns a typed Dataset —
    * the Scala analog of `mapInPandas`. */
  def decodeBatch(binTable: DataFrame, codec: Codec = FakeCodec): Dataset[MediaMeta] = {
    val spark = binTable.sparkSession
    implicit val enc = Encoders.product[MediaMeta]
    binTable.select("doc_id", "content", "meta.mime", "meta.n_bytes")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY,
        Encoders.STRING, Encoders.scalaLong))
      .mapPartitions { rows =>
        // codec init happens here, once per partition
        rows.map { case (id, payload, mime, nBytes) =>
          val (w, ht, c) = codec.decode(payload)
          MediaMeta(id, mime, nBytes, w, ht, c)
        }
      }
  }

  /** Frame sampling for chunked payloads ("video"): every `stride`-th
    * fixed-size chunk, as (doc_id, frame_idx, frame) rows. Pure
    * expressions — `substring` on binary is codegen'd. */
  def sampleFrames(binTable: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(col("meta.n_bytes") / lit(chunkBytes)).cast("int")
    binTable
      .select(col("doc_id"), col("content"),
        explode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(content, frame_idx * $chunkBytes + 1, $chunkBytes)").as("frame"))
  }

  /** Payload-level embedding by mean-pooling per-frame embeddings —
    * the binary→vector plumbing of a real multimodal pipeline (frame
    * encoder → temporal pooling → corpus-level vector ops), with the
    * ENCODER stubbed as md5-derived floats in [−1, 1] (the same
    * deterministic-fake policy as [[FakeCodec]]: a deployment swaps
    * the per-frame expression for a real model UDF/`mapInPandas`
    * seam; schema, pooling, and everything downstream — ANN, dedup,
    * PCA over these vectors — is unchanged and REAL).
    *
    * Scale shape: frames never leave their scan task (pure
    * expressions), pooling is one map-side-combinable avg per
    * (doc, dim), output is docs × dim. Every step is hex-for-hex
    * portable, so the oracle checks the full chain
    * binary → frames → embeddings → pooled vector.
    */
  def videoEmbedding(binTable: DataFrame, chunkBytes: Int = 64,
                     stride: Int = 2, dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim <= 16, "md5 yields 16 bytes → dim ≤ 16")
    val h = md5(hex(col("frame")))
    val comps = (0 until dim).map { j =>
      ((conv(substring(h, 2 * j + 1, 2), 16, 10).cast("double") - 127.5) /
        127.5).as(s"_v$j")
    }
    sampleFrames(binTable, chunkBytes, stride)
      .select(col("doc_id") +: comps: _*)
      .groupBy("doc_id")
      // + 0.0 canonicalizes IEEE -0.0 (a tiny negative mean rounds to
      // the signed zero in some engines) to +0.0 — exact for all
      // other values
      .agg((round(avg(col("_v0")), 6) + 0.0).as("e0"),
        (1 until dim).map(j => (round(avg(col(s"_v$j")), 6) + 0.0).as(s"e$j")): _*)
  }

  /** VAD-style activity segmentation over a chunked binary payload
    * ("audio"): per-frame ENERGY (stubbed as the frame-md5's first
    * byte, same deterministic-fake policy as [[FakeCodec]] — a real
    * deployment computes RMS in the codec seam), frames below
    * `threshold` are silence, and consecutive active frames collapse
    * into segments via the gaps-and-islands trick (`frame_idx −
    * row_number` is constant within a run). Returns one row per
    * segment: (doc_id, seg_start, seg_end, n_frames, mean_energy) —
    * the silence-trim / speech-extract front end of an audio
    * pipeline, with everything but the energy expression real.
    *
    * Scale shape: frames never leave their scan task (pure
    * expressions); the only shuffle is the per-doc window over the
    * doc's own ≤n_bytes/chunk frames, then a map-side-combinable
    * segment agg. */
  def vadSegments(binTable: DataFrame, chunkBytes: Int = 64,
                  threshold: Long = 128L): DataFrame = {
    require(chunkBytes >= 1 && threshold >= 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    sampleFrames(binTable, chunkBytes, stride = 1)
      .withColumn("energy",
        conv(substring(md5(hex(col("frame"))), 1, 2), 16, 10).cast("long"))
      .filter(col("energy") >= threshold)
      .withColumn("_grp", col("frame_idx") - row_number().over(w))
      .groupBy("doc_id", "_grp")
      .agg(min("frame_idx").as("seg_start"), max("frame_idx").as("seg_end"),
        count(lit(1)).as("n_frames"),
        round(sum("energy").cast("double") / count(lit(1)), 6)
          .as("mean_energy"))
      .select("doc_id", "seg_start", "seg_end", "n_frames", "mean_energy")
  }

  /** Perceptual (dHash) near-duplicate frames: the robust tier above
    * [[sampleFrames]]-based EXACT frame dedup — a one-byte change
    * flips an exact hash entirely but at most a couple of dHash
    * bits, so re-encoded/slightly-corrupted media still collides.
    * Each frame's bytes stand in for its decoded 8×8 grayscale (the
    * documented stub seam — [[asBinaryTable]]'s codec note: swap a
    * real decode in behind the same column without touching this
    * plan); bit k of the 64-bit gradient hash is "pixel brighter
    * than its right neighbor" (row-cyclic), built as FOUR 16-bit
    * chunk keys. Candidate pairs share a chunk (16 identical
    * gradient bits); pairs matching ≥ `minChunks` of 4 chunks are
    * near-duplicates (Hamming ≤ 16·(4−minChunks) by pigeonhole —
    * the [[graft.operators.FuzzyDedup]] SimHash band contract on
    * binary payloads).
    *
    * Integer-only end to end (hex-digit arithmetic, bit sums) —
    * engine-exact. Short tail frames zero-pad (rpad on hex).
    *
    * Returns (doc_a, frame_a, doc_b, frame_b, n_chunks_equal).
    *
    * Scale shape: per frame a fixed 64-term codegen'd expression —
    * no join to build hashes; the candidate stage is 4 exact-match
    * bucket joins via one (chunk_idx, value)-keyed self-join with
    * map-side pair reduction. Degenerate constant-payload buckets
    * (all-zero frames) are the SimHash hot-band class — cap bucket
    * frequency upstream if a corpus is dominated by one fill
    * pattern. */
  def dhashNearDup(binTable: DataFrame, chunkBytes: Int = 64,
                   stride: Int = 2, minChunks: Int = 3): DataFrame = {
    require(chunkBytes == 64, "dHash stubs the decode as 64 bytes = 8x8 gray")
    require(minChunks >= 1 && minChunks <= 4)
    // widen: the per-frame hex parse + 4×16-term gradient folds are
    // the CPU of this operator and would pin to the narrow scan
    val frames = sampleFrames(Fanout.widen(binTable, col("doc_id")),
        chunkBytes, stride)
      .select(col("doc_id"), col("frame_idx"),
        rpad(hex(col("frame")), 128, "0").as("_hx"))
    val withBytes = frames.withColumn("_b",
      expr("transform(sequence(0, 63), i -> " +
        "(instr('0123456789ABCDEF', substr(_hx, i*2+1, 1)) - 1) * 16 + " +
        "instr('0123456789ABCDEF', substr(_hx, i*2+2, 1)) - 1)"))
    val chunks = (0 until 4).map { c =>
      expr(s"aggregate(sequence(0, 15), 0L, (acc, k) -> acc + " +
        s"IF(element_at(_b, CAST(($c*2 + k div 8)*8 + (k % 8) + 1 AS INT)) > " +
        s"element_at(_b, CAST(($c*2 + k div 8)*8 + ((k % 8) + 1) % 8 + 1 AS INT)), " +
        s"shiftleft(1L, k), 0L))").as(s"_c$c")
    }
    val hashed = withBytes
      .select(Seq(col("doc_id"), col("frame_idx")) ++ chunks: _*)
    val ex = hashed.select(col("doc_id"), col("frame_idx"),
        posexplode(array(col("_c0"), col("_c1"), col("_c2"), col("_c3"))))
      .toDF("doc_id", "frame_idx", "_ci", "_cv")
    ex.select(col("doc_id").as("doc_a"), col("frame_idx").as("frame_a"),
        col("_ci"), col("_cv"))
      .join(ex.select(col("doc_id").as("doc_b"),
        col("frame_idx").as("frame_b"), col("_ci"), col("_cv")),
        Seq("_ci", "_cv"))
      .filter(col("doc_a") < col("doc_b") ||
        (col("doc_a") === col("doc_b") && col("frame_a") < col("frame_b")))
      .groupBy("doc_a", "frame_a", "doc_b", "frame_b")
      .agg(count(lit(1)).as("n_chunks_equal"))
      .filter(col("n_chunks_equal") >= minChunks)
  }

  /** Constellation fingerprint matching (the Shazam landmark scheme,
    * Wang 2003) over binary payloads: per-frame energy peaks become
    * landmarks, ordered peak PAIRS within `maxDt` frames hash to
    * (band₁, band₂, Δt) keys, and two payloads match when ≥
    * `minAligned` of their shared keys agree on ONE time offset —
    * the alignment vote is what makes it robust: random hash
    * collisions scatter across offsets, true copies (even cropped:
    * a shifted excerpt keeps pairwise Δt) pile onto a single
    * offset. The time-structured multimodal dedup tier beside
    * [[dhashNearDup]]'s per-frame content hash ("same audio,
    * trimmed intro" — frames differ positionally, landmarks align).
    * Frame "energy" is the byte sum of the stubbed decode
    * ([[asBinaryTable]]'s codec seam — swap a real spectrogram in
    * behind the same column).
    *
    * Integer-only end to end (hex-digit byte sums, integer bands,
    * offset votes) — engine-exact.
    *
    * Returns (doc_a, doc_b, n_shared_hashes, best_offset,
    * n_aligned) for pairs with n_aligned ≥ minAligned.
    *
    * Scale shape: peaks come from one per-doc window over the frame
    * relation; landmark fan-out is ≤ `maxDt` per peak via window
    * leads (never a within-doc pair join); matching is ONE
    * hash-keyed bucket self-join with map-side vote reduction —
    * the [[dhashNearDup]] candidate shape on a sparser key. */
  def audioConstellation(binTable: DataFrame, chunkBytes: Int = 64,
                         stride: Int = 1, maxDt: Int = 4,
                         minAligned: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDt >= 1 && minAligned >= 1)
    // widen: per-frame hex-digit energy folds (see dhashNearDup)
    val frames = sampleFrames(Fanout.widen(binTable, col("doc_id")),
        chunkBytes, stride)
      .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("_hx"))
      .withColumn("_energy", expr(
        "aggregate(transform(sequence(0, cast(length(_hx)/2 - 1 as int))," +
          " i -> (instr('0123456789ABCDEF', substr(_hx, i*2+1, 1)) - 1)" +
          " * 16 + instr('0123456789ABCDEF', substr(_hx, i*2+2, 1)) - 1)," +
          " 0L, (acc, x) -> acc + x)"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val peaks = frames
      .withColumn("_pe", lag("_energy", 1).over(w))
      .withColumn("_ne", lead("_energy", 1).over(w))
      .filter(col("_pe").isNotNull && col("_ne").isNotNull &&
        col("_energy") > col("_pe") && col("_energy") > col("_ne"))
      .select(col("doc_id"), col("frame_idx").as("_t"),
        expr("_energy div 256").as("_eb"))
    val wp = Window.partitionBy("doc_id").orderBy("_t")
    // ONE window pass computing all maxDt leads, exploded to the same
    // rows — the former per-k unionByName replicated the whole peaks
    // window subtree maxDt× (planned maxDt times, window recomputed
    // per branch after the reused exchange; r14). Row multiset is
    // identical; downstream is joins/aggregates, so order never
    // mattered.
    val lms = peaks.select(
        Seq(col("doc_id"), col("_t").as("_t1"), col("_eb").as("_e1")) ++
        (1 to maxDt).flatMap(k => Seq(
          lead(col("_t"), k).over(wp).as(s"_t2_$k"),
          lead(col("_eb"), k).over(wp).as(s"_e2_$k"))): _*)
      .select(col("doc_id"), col("_t1"), col("_e1"),
        explode(array((1 to maxDt).map(k =>
          struct(col(s"_t2_$k").as("_t2"), col(s"_e2_$k").as("_e2"))): _*))
          .as("_pair"))
      .select(col("doc_id"), col("_t1"), col("_e1"),
        col("_pair._t2").as("_t2"), col("_pair._e2").as("_e2"))
      .filter(col("_t2").isNotNull && col("_t2") - col("_t1") <= maxDt)
      .select(col("doc_id"), col("_t1"),
        (col("_e1") * 512 + col("_e2") * 8 + (col("_t2") - col("_t1")))
          .as("_hash"))
    val votes = lms
      .select(col("doc_id").as("doc_a"), col("_t1").as("_ta"), col("_hash"))
      .join(lms.select(col("doc_id").as("doc_b"), col("_t1").as("_tb"),
        col("_hash")), Seq("_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("_ta") - col("_tb")).as("_off"))
      .agg(count(lit(1)).as("_n"))
    votes.groupBy("doc_a", "doc_b")
      .agg(sum("_n").as("n_shared_hashes"),
        max(struct(col("_n"), (-col("_off")).as("_no"))).as("_m"))
      .select(col("doc_a"), col("doc_b"), col("n_shared_hashes"),
        (-col("_m._no")).as("best_offset"), col("_m._n").as("n_aligned"))
      .filter(col("n_aligned") >= minAligned)
  }
}

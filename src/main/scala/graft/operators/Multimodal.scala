package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decoder is a
  * deterministic fake behind the [[MediaDecoder]] seam — the Spark-side
  * plumbing (binary schema, batched per-partition decode, feature
  * struct) is real and tested. In PySpark production the decode stage
  * slots into `mapInPandas` with arrow batches; here it is
  * `mapPartitions` over an injected decoder.
  *
  * Scale notes: the decode stage is embarrassingly parallel and sized
  * by `spark.sql.files.maxPartitionBytes`; payloads never shuffle — all
  * feature extraction happens before any wide transformation.
  */
object Multimodal {

  /** Decoded media features. */
  final case class MediaMeta(width: Int, height: Int, nFrames: Int, format: String)

  /** The decode seam. Production: JNI/FFI codec or a Python worker.
    * Tests/CI: [[FakeDecoder]], keyed deterministically off the bytes. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in for a real codec: derives plausible metadata
    * from an MD5 of the payload (stable across runs and engines). */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def u(i: Int): Int = md(i) & 0xff
      MediaMeta(
        width = 16 * (1 + (u(0) * 256 + u(1)) % 64),
        height = 16 * (1 + (u(2) * 256 + u(3)) % 64),
        nFrames = 1 + u(4) % 16,
        format = if (u(5) % 2 == 0) "rgb" else "yuv")
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_size", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  /** The real pipeline: binary payload column → per-partition batched
    * decode → typed feature columns. */
  def extractFeatures(docs: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = docs.sparkSession
    val withPayload = docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    val rdd = withPayload.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val m = decoder.decode(payload)
        Row(id, payload.length.toLong, m.width, m.height, m.nFrames, m.format)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Resize stage: recompute features for a target box, preserving
    * aspect ratio (integer math — deterministic). The decode is the
    * stubbed seam; the Spark-side shape (typed columns in, typed
    * columns out, zero shuffles) is the production contract. */
  def resizeTo(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleNum = least(lit(maxW) * col("height"), lit(maxH) * col("width"))
    val scaleDen = col("width") * col("height")
    features
      .withColumn("out_w", (col("width") * scaleNum / scaleDen).cast("int"))
      .withColumn("out_h", (col("height") * scaleNum / scaleDen).cast("int"))
  }

  /** Frame-sample stage: one row per sampled frame index — the
    * generator-shaped op (media row → N frame rows) via explode over a
    * sequence, stride chosen to yield ≤ maxFrames frames. Frame bytes
    * come from the decoder seam in production; here the frame key
    * (doc_id, frame_no) and the partition-parallel shape are the test
    * surface. */
  def sampleFrames(features: DataFrame, maxFrames: Int): DataFrame = {
    val stride = greatest(lit(1),
      ceil(col("n_frames") / lit(maxFrames)).cast("int"))
    features
      .withColumn("frame_no",
        explode(sequence(lit(0), col("n_frames") - 1, stride)))
      .select(col("doc_id"), col("frame_no"), col("n_frames"))
  }

  /** Batched model-inference seam — the JVM analogue of the
    * mapInPandas/Arrow-batch contract used for GPU encoders: rows are
    * buffered into fixed-size batches per partition and the encoder is
    * invoked ONCE PER BATCH (amortizing model-call overhead), then
    * results unzip back to rows. The stub encoder is deterministic per
    * ROW (portable md5 features), so results are provably independent
    * of batch composition and partitioning — the oracle equality below
    * and the equal-across-batch-sizes spec pin exactly that invariant,
    * which is what makes batched inference safe to run on any cluster
    * layout. A real deployment swaps `encodeBatch` for the model call;
    * everything Spark-side (schema, batching, partition locality) is
    * the production shape. */
  def batchEmbed(docs: DataFrame, batchSize: Int): DataFrame = {
    val spark = docs.sparkSession
    val in = docs.select(col("doc_id"), col("text"))
    val rdd = in.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val embs = encodeBatch(batch.map(_.getString(1)))
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          Row(r.getLong(0), e(0), e(1), e(2), e(3))
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("d0", LongType, nullable = false),
      StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false),
      StructField("d3", LongType, nullable = false))))
  }

  /** One "model call" per batch; per-row deterministic features (first
    * 32 md5 bits of text:i, mod 997 — the [[PortableHash.h32]] family
    * computed JVM-side). */
  private def encodeBatch(texts: Seq[String]): Seq[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    texts.map { t =>
      Array.tabulate(4) { i =>
        md.reset()
        val hex = md.digest(s"$t:$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16) % 997
      }
    }
  }

  /** Deterministic fake "pixel" grid for the perceptual-hash family:
    * pixel p of the 8×9 grayscale thumbnail is the count of the doc's
    * distinct shingles that feature-hash into bucket p — a projection
    * with exactly the property a real downsampled thumbnail has:
    * near-duplicate payloads, which share most of their content,
    * share most pixels (each edited shingle moves ONE bucket count by
    * one, it doesn't re-shuffle the grid the way position-based
    * chunking would). Stands in for the decoder seam
    * ([[MediaDecoder]]): a real pipeline swaps this projection for
    * decode+resize and keeps everything downstream (dHash, banding,
    * verify) unchanged. */
  private def pxGrid(docs: DataFrame): DataFrame = {
    // Spread the "decode" stage to session parallelism before the
    // shingle explode: the docs scan is a single file split at bench
    // scale, so the per-shingle md5 + 72-bucket partial aggregate ran
    // on ONE task (profiled r13: a ~0.4–0.6 s single-task stage in
    // every dhash consumer — §2.5 scan parallelism, the decoder-seam
    // analogue of the ev_price_elasticity fix). Keying the shuffle by
    // doc_id also lets the groupBy reuse this exchange, so the
    // exchange COUNT is unchanged — the one shuffle just moved below
    // the heavy projection's input instead of above its output.
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val sh = Dedup.shingleArrays(docs)
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val h = PortableHash.h32(col("sh"))
    sh.groupBy(col("doc_id")).agg(
      sum(when(h % 72 === 0, 1).otherwise(0)).as("px0"),
      (1 until 72).map(p =>
        sum(when(h % 72 === p, 1).otherwise(0)).as(s"px$p")): _*)
  }

  /** dHash (difference hash) signatures: 64 bits, bit (r,c) = "pixel
    * brighter than its right neighbour" over the 8×9 grid — the
    * standard perceptual image fingerprint (one shingle explode + one
    * 72-column hash aggregate, the SimHash vote shape). Packed as
    * (sig_lo, sig_hi) so [[Dedup.simhashPairs64]]'s 5-band pigeonhole
    * join (exact recall at Hamming ≤ 4, no all-pairs) applies
    * unchanged. */
  def dhashSignatures(docs: DataFrame): DataFrame = {
    def bits(lo: Int, hi: Int) = (lo until hi).map { b =>
      val r = b / 8; val c = b % 8
      when(col(s"px${r * 9 + c}") > col(s"px${r * 9 + c + 1}"),
        lit(1L << (b - lo))).otherwise(lit(0L))
    }.reduce(_ + _)
    pxGrid(docs).select(col("doc_id"),
      bits(0, 32).cast("long").as("sig_lo"),
      bits(32, 64).cast("long").as("sig_hi"))
  }

  /** SQL mirror of [[dhashSignatures]]: CTEs `sh`, `px` and `sigs`. */
  def sqlDhashSigsCte: String = {
    val pxCols = (0 until 72).map(p =>
      s"SUM(CASE WHEN ${graft.functions.PortableHash.sqlH32("sh")} % 72 = $p " +
        s"THEN 1 ELSE 0 END) AS px$p").mkString(", ")
    def asm(lo: Int, hi: Int) = (lo until hi).map { b =>
      val r = b / 8; val c = b % 8
      s"(CASE WHEN px${r * 9 + c} > px${r * 9 + c + 1} THEN ${1L << (b - lo)} ELSE 0 END)"
    }.mkString(" + ")
    s"""sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1]))) AS sh
          FROM documents WHERE len(string_split(text, ' ')) >= 2),
        px AS (SELECT doc_id, $pxCols FROM sh GROUP BY doc_id),
        sigs AS (SELECT doc_id, CAST(${asm(0, 32)} AS BIGINT) AS sig_lo,
                        CAST(${asm(32, 64)} AS BIGINT) AS sig_hi FROM px)"""
  }

  val defs: Seq[QueryDef] = Seq(
    // Oracle for the batched-inference seam: per-row portable features
    // must come out identical through the per-BATCH encoder path —
    // i.e. batch composition cannot leak into results (the invariant
    // that makes GPU batching safe). DuckDB computes the same md5
    // features relationally.
    QueryDef(
      "mm_batch_infer", {
        def dim(i: Int) =
          s"CAST(('0x' || substr(md5(text || ':$i'), 1, 8))::UBIGINT AS BIGINT) % 997 AS d$i"
        Some(s"""
          SELECT doc_id, ${(0 until 4).map(dim).mkString(", ")}
          FROM documents
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => batchEmbed(documents(s, d), batchSize = 32)
        .orderBy(col("doc_id"))),

    // Binary-column scalar surface: encode → BINARY, lengths, digest,
    // base64 of a fixed prefix — the payload-handling functions any
    // media pipeline leans on, oracle-checked against DuckDB's blob ops.
    QueryDef(
      "mm_binary_funcs",
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(8 * octet_length(encode(text)) AS BIGINT) AS n_bits,
               md5(text) AS digest,
               to_base64(encode(substr(text, 1, 12))) AS head_b64
        FROM documents
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", encode($"text", "UTF-8").as("payload"), $"text")
          .select($"doc_id",
            octet_length($"payload").cast("long").as("n_bytes"),
            bit_length($"payload").cast("long").as("n_bits"),
            md5($"text").as("digest"),
            base64(encode(substring($"text", 1, 12), "UTF-8")).as("head_b64"))
          .orderBy($"doc_id")
      }),

    // Sketch surface: HLL distinct and quantile-sketch approximations.
    // Raw approximate values aren't hash-comparable, so the query emits
    // the EXACT values plus in-bound booleans — the oracle computes the
    // exact side and expects TRUE, making the sketch row fully
    // hash-checkable. Bounds: HLL at default rsd 0.05 checked at 3σ
    // (15%); percentile_approx(accuracy=1000) guarantees rank error
    // ≤ n/1000, checked against the far looser exact p45..p55 band.
    QueryDef(
      "sk_sketches",
      Some("""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
               TRUE AS cust_in_bound,
               quantile_cont(o_totalprice, 0.5) AS exact_p50,
               TRUE AS p50_in_bound
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        val o = orders(s, d)
        // Two aggregations joined on the (5-row) group key instead of
        // one: mixing a distinct aggregate with TypedImperative buffers
        // (percentile) forces the whole aggregate through the distinct
        // rewrite — the percentile buffers would be merged across twice
        // the rows. Split, each side takes its best physical form
        // (two-phase distinct hash agg | ObjectHashAggregate).
        val distincts = o.groupBy($"o_orderpriority")
          .agg(
            countDistinct($"o_custkey").as("exact_cust"),
            approx_count_distinct($"o_custkey").as("ac"))
        val quantiles = o.groupBy($"o_orderpriority")
          .agg(
            // one percentile agg (one sort buffer), not three
            percentile($"o_totalprice",
              array(lit(0.45), lit(0.5), lit(0.55))).as("ps"),
            percentile_approx($"o_totalprice", lit(0.5), lit(1000)).as("ap50"))
        distincts.join(quantiles, "o_orderpriority")
          .select($"o_orderpriority", $"exact_cust",
            (abs($"ac" - $"exact_cust") <= $"exact_cust" * 0.15).as("cust_in_bound"),
            $"ps".getItem(1).as("exact_p50"),
            ($"ap50" >= $"ps".getItem(0) && $"ap50" <= $"ps".getItem(2)).as("p50_in_bound"))
          .orderBy($"o_orderpriority")
      }),

    // Mergeable-sketch property — the one that matters at 100 TB: an
    // HLL sketch built per PARTITION of the data and union-merged must
    // agree with the sketch built over the whole data (this is exactly
    // what makes partial aggregation / re-aggregation over sharded
    // corpora possible; a sketch you can't merge can't distribute).
    // Checked per group: merged-estimate within 2% of whole-estimate
    // (the union pass promotes the sketch's internal representation, so
    // estimates can differ in the last few counts — measured ≪1% here)
    // and the whole-estimate within 3σ of the exact distinct count.
    // Oracle: exact side + TRUE literals, as sk_sketches.
    QueryDef(
      "sk_hll_merge",
      Some("""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
               TRUE AS merge_consistent,
               TRUE AS est_in_bound
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        val o = orders(s, d)
        val halves = o
          .groupBy($"o_orderpriority", ($"o_orderkey" % 2).as("half"))
          .agg(hll_sketch_agg($"o_custkey").as("sk"))
          .groupBy($"o_orderpriority")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
        val whole = o
          .groupBy($"o_orderpriority")
          .agg(hll_sketch_estimate(hll_sketch_agg($"o_custkey")).as("est_whole"),
            countDistinct($"o_custkey").as("exact_cust"))
        whole.join(halves, "o_orderpriority")
          .select($"o_orderpriority", $"exact_cust",
            (abs($"est_merged" - $"est_whole") <= $"exact_cust" * 0.02).as("merge_consistent"),
            (abs($"est_whole" - $"exact_cust") <= $"exact_cust" * 0.15).as("est_in_bound"))
          .orderBy($"o_orderpriority")
      }),

    // Set-intersection estimation from mergeable sketches: |A∩B| via
    // inclusion–exclusion over three HLL estimates (A, B, A∪B from
    // hll_union) — the audience-overlap question ("how many users both
    // click high-value AND purchase high-value") answered WITHOUT
    // co-shuffling the two sets: each side aggregates independently
    // (sketches travel, rows don't), which is the whole point at
    // 100 TB. The exact intersection (one semi-join, fine at test
    // scale) grades the estimate; inclusion–exclusion compounds the
    // per-sketch error so the bound is looser than the single-set one.
    QueryDef(
      "sk_hll_intersect",
      Some("""
        WITH a AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click' AND value > 150),
        b AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase' AND value > 150)
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
               CAST((SELECT COUNT(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS BIGINT) AS exact_inter,
               TRUE AS inter_in_bound
      """.trim),
      (s, d) => {
        import s.implicits._
        val e = events(s, d)
        val a = e.filter($"event_type" === "click" && $"value" > 150)
          .agg(hll_sketch_agg($"user_id").as("ska"),
            countDistinct($"user_id").as("exact_a"))
        val b = e.filter($"event_type" === "purchase" && $"value" > 150)
          .agg(hll_sketch_agg($"user_id").as("skb"),
            countDistinct($"user_id").as("exact_b"))
        val exactInter = e.filter($"event_type" === "click" && $"value" > 150)
          .select($"user_id").distinct()
          .join(e.filter($"event_type" === "purchase" && $"value" > 150)
            .select($"user_id").distinct(), Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("exact_inter"))
        a.crossJoin(b).crossJoin(exactInter)
          .select($"exact_a", $"exact_b", $"exact_inter",
            (abs(hll_sketch_estimate($"ska") + hll_sketch_estimate($"skb")
              - hll_sketch_estimate(hll_union($"ska", $"skb")) - $"exact_inter")
              <= greatest($"exact_inter" * 0.2, lit(8.0))).as("inter_in_bound"))
      }),

    // Expression-level formulation of the same fake decode (oracle-able:
    // md5 is portable). Exercises binary columns + metadata derivation.
    QueryDef(
      "mm_media_meta", {
        val h = "CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS BIGINT)"
        Some(s"""
          SELECT doc_id,
                 CAST(strlen(text) AS BIGINT) AS byte_size,
                 CAST(16 * (1 + ($h // 65536) % 64) AS BIGINT) AS width,
                 CAST(16 * (1 + $h % 64) AS BIGINT) AS height,
                 CAST(1 + ($h // 4096) % 16 AS BIGINT) AS n_frames
          FROM documents
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h = PortableHash.h32($"text")
        documents(s, d).select(
          $"doc_id",
          octet_length($"text").cast("long").as("byte_size"),
          (lit(16) * (expr("1") + (h.divide(lit(65536L)).cast("long")) % 64)).cast("long").as("width"),
          (lit(16) * (expr("1") + h % 64)).cast("long").as("height"),
          (lit(1) + (h.divide(lit(4096L)).cast("long")) % 16).cast("long").as("n_frames"))
          .orderBy($"doc_id")
      }),

    // Frame sampling as an oracle-checked query: the portable fake
    // decode supplies n_frames, [[sampleFrames]] explodes ≤ maxFrames
    // evenly-strided frame indices per media row — the media → frames
    // generator every video pipeline starts with, row-local (explode
    // stays inside the scan stage, no shuffle).
    QueryDef(
      "mm_frame_sample", {
        val h = "CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS BIGINT)"
        Some(s"""
          WITH f AS (
            SELECT doc_id, CAST(1 + ($h // 4096) % 16 AS BIGINT) AS n_frames
            FROM documents),
          s AS (
            SELECT doc_id, n_frames,
                   GREATEST(1, CAST(ceil(n_frames / 4.0) AS BIGINT)) AS stride
            FROM f)
          SELECT doc_id,
                 CAST(UNNEST(range(0, n_frames, stride)) AS BIGINT) AS frame_no,
                 n_frames
          FROM s
          ORDER BY doc_id, frame_no
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h = PortableHash.h32($"text")
        val feats = documents(s, d).select(
          $"doc_id",
          (lit(1) + (h.divide(lit(4096L)).cast("long")) % 16).cast("long").as("n_frames"))
        sampleFrames(feats, maxFrames = 4)
          .select($"doc_id", $"frame_no".cast("long").as("frame_no"), $"n_frames")
          .orderBy($"doc_id", $"frame_no")
      }),

    // Custom mergeable UDAF: Misra-Gries heavy hitters over the token
    // stream. The sketch state is <= k counters per partition (merged
    // in O(k)); the oracle checks the partition-independent guarantee —
    // every token with freq*k > N is in the sketch — via the exact
    // side + a TRUE literal, like the other sk_* rows. Threshold
    // compares in integer arithmetic (freq*50 > N) on both engines.
    QueryDef(
      "sk_heavy_hitters",
      Some("""
        WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        exact AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT tok, CAST(freq AS BIGINT) AS freq, TRUE AS captured
        FROM exact, tot
        WHERE freq * 50 > n
        ORDER BY tok
      """.trim),
      (s, d) => {
        import s.implicits._
        // ONE source scan: the exploded token stream is cached and
        // materialized by the sketch pass; the exact (tok, freq)
        // aggregate is computed from that cache and itself cached; and
        // total is sum(freq) over the (vocab-sized) aggregate — not a
        // third full scan of the stream.
        val toks = documents(s, d)
          .select(explode(split($"text", " ")).as("tok")).cache()
        val cand = toks.as[String]
          .select(new graft.functions.MisraGries(50).toColumn)
          .head().keySet.toSeq.sorted  // <= 50 keys: bounded sketch state
        val exact = toks.groupBy($"tok").agg(count(lit(1)).as("freq")).cache()
        val total = exact.agg(sum($"freq")).head().getLong(0)
        toks.unpersist(false)
        exact.filter($"freq" * 50 > total)
          .select($"tok", $"freq", $"tok".isin(cand: _*).as("captured"))
          .orderBy($"tok")
      }),

    // Perceptual-hash image dedup: dHash over the fake-decoded 8×9
    // thumbnail grid, candidate pairs from the 5-band pigeonhole
    // equi-join (exact recall at Hamming ≤ 4 — Dedup.simhashPairs64's
    // machinery verbatim), popcount verify. No all-pairs operator
    // anywhere in the Spark plan; the oracle runs the direct
    // inequality self-join — its privilege at gate scale.
    QueryDef(
      "mm_dhash_dedup",
      Some(s"""
        WITH $sqlDhashSigsCte
        SELECT a.doc_id AS i, b.doc_id AS j,
               CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                    + bit_count(xor(a.sig_hi, b.sig_hi)) AS BIGINT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig_lo, b.sig_lo))
              + bit_count(xor(a.sig_hi, b.sig_hi)) <= 4
        ORDER BY i, j
      """.trim),
      (s, d) => Dedup.simhashPairs64(dhashSignatures(documents(s, d)), 4)
        .orderBy(col("i"), col("j"))),

    // Cross-modal near-dup agreement: the image channel (banded dHash
    // pairs, above) full-outer-joined with the embedding channel
    // (IVF-bucketed cosine pairs — Similarity.ivfNearDupPairs, the
    // dd_embedding_neardup scale path) on the shared doc_id = vec_id
    // key. Pairs flagged by both modalities are the high-confidence
    // dedup set; single-channel pairs are each modality's blind spot —
    // the audit a multimodal corpus runs before trusting either
    // channel alone. Both candidate generators are bucketed (bands /
    // IVF cells); nothing all-pairs.
    QueryDef(
      "mm_crossmodal_neardup",
      Some(s"""
        WITH $sqlDhashSigsCte,
        img AS (
          SELECT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                      + bit_count(xor(a.sig_hi, b.sig_hi)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig_lo, b.sig_lo))
                + bit_count(xor(a.sig_hi, b.sig_hi)) <= 4),
        cents AS (
          SELECT vec_id AS centroid, embedding AS cemb FROM embeddings
          WHERE vec_id < 16),
        assigned AS (
          SELECT vec_id, embedding, centroid FROM (
            SELECT e.vec_id, e.embedding, c.centroid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) DESC,
                              c.centroid) AS rn
            FROM embeddings e, cents c)
          WHERE rn <= 3),
        emb AS (
          SELECT DISTINCT a.vec_id AS i, b.vec_id AS j,
                 list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
          FROM assigned a JOIN assigned b
            ON a.centroid = b.centroid AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45)
        SELECT COALESCE(img.i, emb.i) AS i,
               COALESCE(img.j, emb.j) AS j,
               img.hamming AS img_hamming,
               emb.cos AS cos,
               CASE WHEN img.i IS NOT NULL AND emb.i IS NOT NULL THEN 'both'
                    WHEN img.i IS NOT NULL THEN 'image_only'
                    ELSE 'embedding_only' END AS status
        FROM img FULL OUTER JOIN emb ON img.i = emb.i AND img.j = emb.j
        ORDER BY i, j
      """.trim),
      (s, d) => {
        import s.implicits._
        val img = Dedup.simhashPairs64(dhashSignatures(documents(s, d)), 4)
          .select($"i", $"j", $"hamming".as("img_hamming"))
        val emb = Similarity.ivfNearDupPairs(embeddings(s, d),
          nCentroids = 16, nAssign = 3, minCos = 0.45)
        img.as("im").join(emb.as("em"),
            $"im.i" === $"em.i" && $"im.j" === $"em.j", "full_outer")
          .select(
            coalesce($"im.i", $"em.i").as("i"),
            coalesce($"im.j", $"em.j").as("j"),
            $"img_hamming",
            $"cos",
            when($"im.i".isNotNull && $"em.i".isNotNull, "both")
              .when($"im.i".isNotNull, "image_only")
              .otherwise("embedding_only").as("status"))
          .orderBy($"i", $"j")
      }),

    // CLIP-style retrieval on top of the batched-inference seam: the
    // per-BATCH encoder ([[batchEmbed]] — the mapInPandas/Arrow
    // contract) produces integer feature vectors, the 5 query vectors
    // broadcast against the corpus, and cosine ranks top-3 per query.
    // Dot products and norms are exact integer sums (no fp
    // accumulation order to disagree on); only the final cos is
    // double, with the identical expression on both engines. The scan
    // is |Q|·n with |Q| bounded — the brute baseline sim_cosine_topk
    // also uses; the IVF/LSH family is the scale path for large |Q|.
    QueryDef(
      "mm_clip_retrieval", {
        def dim(a: String, i: Int) =
          s"CAST(('0x' || substr(md5($a.text || ':$i'), 1, 8))::UBIGINT AS BIGINT) % 997"
        def dot(i: Int) = s"(${dim("q", i)}) * (${dim("c", i)})"
        def nrm(a: String, i: Int) = s"(${dim(a, i)}) * (${dim(a, i)})"
        Some(s"""
          WITH scored AS (
            SELECT q.doc_id AS qid, c.doc_id AS nid,
                   ${(0 until 4).map(dot).mkString(" + ")} AS dp,
                   ${(0 until 4).map(nrm("q", _)).mkString(" + ")} AS na,
                   ${(0 until 4).map(nrm("c", _)).mkString(" + ")} AS nb
            FROM documents q JOIN documents c ON c.doc_id >= 5
            WHERE q.doc_id < 5),
          ranked AS (
            SELECT qid, nid,
                   CAST(dp AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos,
                   ROW_NUMBER() OVER (
                     PARTITION BY qid
                     ORDER BY CAST(dp AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
                              nid) AS rank
            FROM scored)
          SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cos
          FROM ranked WHERE rank <= 3
          ORDER BY qid, rank
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val f = batchEmbed(documents(s, d), batchSize = 32)
        val q = broadcast(f.filter($"doc_id" < 5).select($"doc_id".as("qid"),
          $"d0".as("q0"), $"d1".as("q1"), $"d2".as("q2"), $"d3".as("q3")))
        val c = f.filter($"doc_id" >= 5).select($"doc_id".as("nid"),
          $"d0", $"d1", $"d2", $"d3")
        val dp = (0 until 4).map(i => col(s"q$i") * col(s"d$i")).reduce(_ + _)
        val na = (0 until 4).map(i => col(s"q$i") * col(s"q$i")).reduce(_ + _)
        val nb = (0 until 4).map(i => col(s"d$i") * col(s"d$i")).reduce(_ + _)
        val scored = c.crossJoin(q)
          .select($"qid", $"nid",
            (dp.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
              .as("cos"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy(desc("cos"), asc("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 3)
          .select($"qid", $"nid", $"rank".cast("long").as("rank"), $"cos")
          .orderBy($"qid", $"rank")
      }),

    // Image dedup at the CLUSTER level: the banded dHash pair graph
    // contracted to connected components (min-label star fixpoint —
    // Dedup.duplicateClusters verbatim) with keep-min representatives
    // and cluster sizes — the dd_dup_clusters shape on the image
    // channel, which is what a media pipeline actually deletes by
    // (keep one per cluster, not one per pair). Oracle walks the same
    // closure over its all-pairs Hamming relation.
    QueryDef(
      "mm_dedup_clusters",
      Some(s"""
        WITH RECURSIVE $sqlDhashSigsCte,
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig_lo, b.sig_lo))
                + bit_count(xor(a.sig_hi, b.sig_hi)) <= 4),
        edges AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
        walk(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a),
        mins AS (SELECT a AS doc_id, MIN(b) AS mn FROM walk GROUP BY a),
        reps AS (
          SELECT d.doc_id,
                 COALESCE(LEAST(d.doc_id, m.mn), d.doc_id) AS cluster_rep
          FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id)
        SELECT doc_id, cluster_rep,
               CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
        FROM reps
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        val docs = documents(s, d)
        Dedup.duplicateClusters(docs,
            Dedup.simhashPairs64(dhashSignatures(docs), 4)
              .select(col("i"), col("j")))
          .orderBy(col("doc_id"))
      }),

    // Media admission gate: the quality filter a multimodal ingest
    // runs on decoded METADATA alone before paying for any pixel work
    // — resolution floor, frame-count band, payload-size floor — with
    // per-source admission accounting (the funnel view that catches a
    // feed shipping thumbnails). Decode is the portable fake
    // (mm_media_meta's expression formulation); every predicate is
    // row-local, the only shuffle is the final per-source groupBy.
    QueryDef(
      "mm_quality_gate", {
        val h = "CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS BIGINT)"
        Some(s"""
          WITH m AS (
            SELECT doc_id, source,
                   CAST(strlen(text) AS BIGINT) AS byte_size,
                   CAST(16 * (1 + ($h // 65536) % 64) AS BIGINT) AS width,
                   CAST(16 * (1 + $h % 64) AS BIGINT) AS height,
                   CAST(1 + ($h // 4096) % 16 AS BIGINT) AS n_frames
            FROM documents),
          g AS (
            SELECT source,
                   CASE WHEN width * height >= 65536 AND n_frames BETWEEN 2 AND 12
                             AND byte_size >= 200 THEN 1 ELSE 0 END AS admitted
            FROM m)
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n_media,
                 CAST(SUM(admitted) AS BIGINT) AS n_admitted,
                 ${det.sqlSnap9("SUM(admitted) * 1.0 / COUNT(*)")} AS admit_rate
          FROM g GROUP BY source ORDER BY source
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h = PortableHash.h32($"text")
        documents(s, d).select(
            $"source",
            octet_length($"text").cast("long").as("byte_size"),
            (lit(16) * (expr("1") + (h.divide(lit(65536L)).cast("long")) % 64)).cast("long").as("width"),
            (lit(16) * (expr("1") + h % 64)).cast("long").as("height"),
            (lit(1) + (h.divide(lit(4096L)).cast("long")) % 16).cast("long").as("n_frames"))
          .select($"source",
            when($"width" * $"height" >= 65536 && $"n_frames".between(2, 12) &&
              $"byte_size" >= 200, 1L).otherwise(0L).as("admitted"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_media"),
            sum($"admitted").as("n_admitted"),
            graft.det.snap9(sum($"admitted") * 1.0 / count(lit(1))).as("admit_rate"))
          .orderBy($"source")
      })
  )
}

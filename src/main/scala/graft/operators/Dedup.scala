package graft.operators

import graft.QueryDef
import graft.functions.PortableHash._
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for a training-data pipeline: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash — each oracle-checked against DuckDB
  * via the portable MD5-derived hash family ([[graft.functions.PortableHash]]).
  *
  * Scale design:
  *  - exact dedup is one hash-partitioned groupBy (map-side combine);
  *  - MinHash/LSH reduces each doc to an 8-minimum signature, then joins
  *    only on band equality — the candidate set, not the corpus square;
  *    exact Jaccard then verifies *candidates only* ([[jaccardForPairs]]);
  *  - exact all-pairs Jaccard ([[allPairsJaccard]]) is the oracle
  *    baseline: per-doc shingle bitsets over a broadcast dictionary,
  *    compared in a tight popcount loop. A shingle-inverted-index join
  *    degenerates on low-entropy corpora (hot shingles square the join:
  *    73M intermediate rows on the sf0.1 synthetic corpus); the bitset
  *    scan is O(n²·|vocab|/64) with zero shuffle. At vocabulary sizes
  *    beyond driver memory the LSH path IS the scale path — all-pairs
  *    exact comparison is inherently quadratic no matter the engine;
  *  - SimHash reduces each doc to one 32-bit signature; the pair join
  *    stays expression-level (bit_count over long is codegen'd).
  */
object Dedup {

  private def toks: Column = split(col("text"), " ")

  /** Distinct word-bigram shingles, exploded (for MinHash signatures). */
  def shingles(docs: DataFrame): DataFrame =
    shingleArrays(docs).select(col("doc_id"), explode(col("shs")).as("sh"))

  /** Single-pass shingle UDF. The expression formulation
    * (`transform(sequence(...), i => element_at(split(text), ...))`)
    * is an O(tokens²) trap: CollapseProject inlines the split into the
    * lambda, re-splitting the string per element — measured 0.4 ms/doc
    * vs ~4 µs here. One boxed call per row; first-occurrence order
    * matches `array_distinct`. */
  private val shingleUdf = udf { text: String =>
    if (text == null) null
    else {
      val tk = text.split(" ", -1)
      if (tk.length < 2) null
      else {
        val seen = new java.util.LinkedHashSet[String]
        var i = 0
        while (i < tk.length - 1) { seen.add(tk(i) + "_" + tk(i + 1)); i += 1 }
        seen.toArray(new Array[String](seen.size))
      }
    }
  }

  /** Distinct word-bigram shingles as one array per doc — computed
    * row-local in the scan projection, no shuffle. */
  def shingleArrays(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), shingleUdf(col("text")).as("shs"))
      .filter(col("shs").isNotNull)

  private val sqlShingles = """
    SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1]))) AS sh
    FROM documents
    WHERE len(string_split(text, ' ')) >= 2"""

  /** MinHash signatures: one row per doc with mh0..mh7. The base md5 is
    * projected once per shingle row; the 8 universal hashes are cheap
    * affine maps over it (not 8 recomputed digests). */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val withH = sh.select(col("doc_id"), h32(col("sh")).as("h"))
    withH.groupBy(col("doc_id"))
      .agg(min(uhash(col("h"), 0)).as("mh0"),
        (1 until minhashParams.size).map(i => min(uhash(col("h"), i)).as(s"mh$i")): _*)
  }

  /** LSH candidate pairs: equal (band, row-pair) on any of 4 bands of 2. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bands = (0 until 4).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band_no"),
        col(s"mh${2 * b}").as("ba"), col(s"mh${2 * b + 1}").as("bb"))
    }.reduce(_ union _)
    bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.ba") === col("y.ba") && col("x.bb") === col("y.bb") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
  }

  /** Exact bigram Jaccard for given candidate (i, j) pairs — candidate-
    * driven: joins the (small) pair set to per-doc shingle arrays and
    * intersects per pair. Cost scales with |pairs|, not the corpus
    * square; at cluster scale both joins shuffle on doc id. */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val arrs = shingleArrays(docs)
    pairs
      .join(arrs.select(col("doc_id").as("i"), col("shs").as("sha")), "i")
      .join(arrs.select(col("doc_id").as("j"), col("shs").as("shb")), "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("sha"), col("shb"))).as("common"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .select(col("i"), col("j"),
        (col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))).as("jac"))
  }

  /** [[jaccardForPairs]] over a broadcast bitset signature table — same
    * results, popcount loop instead of per-pair string-set intersection.
    * Right when the candidate set is large relative to the corpus (LSH
    * on low-entropy corpora); signature build cost is one corpus pass. */
  def jaccardForPairsBitset(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val arrs = shingleArrays(docs).as[(Long, Seq[String])].collect()
    val dict = arrs.iterator.flatMap(_._2).toArray.distinct.sorted.zipWithIndex.toMap
    val nWords = (dict.size + 63) / 64
    val table: Map[Long, (Array[Long], Int)] = arrs.map { case (id, shs) =>
      val w = new Array[Long](nWords)
      shs.foreach { sh => val b = dict(sh); w(b >> 6) |= 1L << (b & 63) }
      id -> (w, shs.size)
    }.toMap
    val tableB = spark.sparkContext.broadcast(table)
    pairs.select(col("i").cast("long"), col("j").cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        val t = tableB.value
        it.flatMap { case (i, j) =>
          (t.get(i), t.get(j)) match {
            case (Some((bi, ni)), Some((bj, nj))) =>
              var common = 0
              var w = 0
              while (w < bi.length) {
                common += java.lang.Long.bitCount(bi(w) & bj(w)); w += 1
              }
              Some((i, j, common * 1.0 / (ni + nj - common)))
            case _ => None
          }
        }
      }.toDF("i", "j", "jac")
  }

  /** Exact all-pairs Jaccard ≥ minJac via broadcast shingle bitsets.
    * The corpus signature table (|vocab|/64 longs per doc) is broadcast
    * and each partition scans its docs against the table's upper
    * triangle — the block-broadcast formulation of exact all-pairs
    * similarity. Integer counts divide exactly as in SQL, so results
    * hash-match the inverted-index oracle. */
  def allPairsJaccard(docs: DataFrame, minJac: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // One distributed job computes the per-doc shingle sets; the compact
    // signature build (dictionary + bitsets) happens driver-side, then
    // only the O(n²) comparison is distributed over the broadcast table.
    val arrs = shingleArrays(docs).as[(Long, Seq[String])].collect().sortBy(_._1)
    val dict = arrs.iterator.flatMap(_._2).toArray.distinct.sorted.zipWithIndex.toMap
    val nWords = (dict.size + 63) / 64
    val all = arrs.map { case (id, shs) =>
      val w = new Array[Long](nWords)
      shs.foreach { sh => val b = dict(sh); w(b >> 6) |= 1L << (b & 63) }
      (id, w, shs.size)
    }
    val allB = spark.sparkContext.broadcast(all)
    val parallelism = spark.sparkContext.defaultParallelism
    spark.sparkContext.parallelize(all.indices, parallelism).flatMap { x =>
      val table = allB.value
      val (i, bi, ni) = table(x)
      Iterator.range(x + 1, table.length).flatMap { y =>
        val (j, bj, nj) = table(y)
        var common = 0
        var w = 0
        while (w < bi.length) {
          common += java.lang.Long.bitCount(bi(w) & bj(w)); w += 1
        }
        val jac = common * 1.0 / (ni + nj - common)
        if (jac >= minJac) Some((i, j, jac)) else None
      }
    }.toDF("i", "j", "jac")
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: first-wins by a deterministic order key, dup counts.
    // (documents has no exact dups by construction, so the exactness
    //  semantics are exercised on the events log: one survivor per
    //  (user_id, event_type), reference U1 last/first-wins pattern.)
    QueryDef(
      "dd_exact_events",
      Some("""
        SELECT user_id, event_type, first_event_id, n_dups FROM (
          SELECT user_id, event_type,
                 MIN(event_id) AS first_event_id,
                 COUNT(*) - 1 AS n_dups
          FROM events GROUP BY user_id, event_type)
        ORDER BY user_id, event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .groupBy($"user_id", $"event_type")
          .agg(min($"event_id").as("first_event_id"),
            (count(lit(1)) - 1).as("n_dups"))
          .orderBy($"user_id", $"event_type")
      }),

    // Exact content dedup over documents (md5 groups; proves no dups).
    QueryDef(
      "dd_exact_documents",
      Some("""
        SELECT md5(text) AS content_fp, COUNT(*) AS n, MIN(doc_id) AS canonical_id
        FROM documents GROUP BY 1
        ORDER BY canonical_id
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .groupBy(md5($"text").as("content_fp"))
          .agg(count(lit(1)).as("n"), min($"doc_id").as("canonical_id"))
          .orderBy($"canonical_id")
      }),

    // Full n-gram Jaccard near-dup pairs (exact baseline; bitset scan).
    QueryDef(
      "dd_ngram_jaccard",
      Some(s"""
        WITH sh AS ($sqlShingles),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        common AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i, j, (common * 1.0 / (sa.n + sb.n - common)) AS jac
        FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
        WHERE (common * 1.0 / (sa.n + sb.n - common)) >= 0.7
        ORDER BY i, j
      """.trim),
      (s, d) => allPairsJaccard(documents(s, d), 0.7)
        .orderBy(col("i"), col("j"))),

    // MinHash + LSH near-dup pairs: signatures → banded candidates →
    // exact Jaccard verification of candidates only.
    QueryDef(
      "dd_minhash_lsh", {
        val h = sqlH32("sh")
        val minAggs = minhashParams.indices
          .map(i => s"MIN(${sqlUhash(h, i)}) AS mh$i").mkString(", ")
        val bandSelects = (0 until 4)
          .map(b => s"SELECT doc_id, $b AS band_no, mh${2 * b} AS ba, mh${2 * b + 1} AS bb FROM sigs")
          .mkString(" UNION ALL ")
        Some(s"""
          WITH sh AS ($sqlShingles),
          sigs AS (SELECT doc_id, $minAggs FROM sh GROUP BY doc_id),
          bands AS ($bandSelects),
          cand AS (
            SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
            FROM bands x JOIN bands y
              ON x.band_no = y.band_no AND x.ba = y.ba AND x.bb = y.bb
             AND x.doc_id < y.doc_id),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
          common AS (
            SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            WHERE EXISTS (SELECT 1 FROM cand c WHERE c.i = a.doc_id AND c.j = b.doc_id)
            GROUP BY 1, 2)
          SELECT i, j, (common * 1.0 / (sa.n + sb.n - common)) AS jac
          FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
          WHERE (common * 1.0 / (sa.n + sb.n - common)) >= 0.7
          ORDER BY i, j
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d)
        val cand = lshCandidates(minhashSignatures(shingles(docs)))
        jaccardForPairsBitset(docs, cand)
          .filter(col("jac") >= 0.7)
          .orderBy(col("i"), col("j"))
      }),

    // SimHash signatures (32-bit): per-token hash bit votes → sign bits.
    QueryDef(
      "dd_simhash", {
        val h = sqlH32("tok")
        val bitAggs = (0 until 32)
          .map(b => s"SUM(CASE WHEN (($h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
          .mkString(", ")
        val assemble = (0 until 32)
          .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
          .mkString(" + ")
        Some(s"""
          WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                     FROM documents),
          votes AS (SELECT doc_id, $bitAggs FROM t GROUP BY doc_id)
          SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => simhashSignatures(documents(s, d)).orderBy(col("doc_id"))),

    // SimHash near-dup pairs by Hamming distance over the signatures.
    QueryDef(
      "dd_simhash_pairs", {
        val h = sqlH32("tok")
        val bitAggs = (0 until 32)
          .map(b => s"SUM(CASE WHEN (($h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
          .mkString(", ")
        val assemble = (0 until 32)
          .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
          .mkString(" + ")
        Some(s"""
          WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                     FROM documents),
          votes AS (SELECT doc_id, $bitAggs FROM t GROUP BY doc_id),
          sigs AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes)
          SELECT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
          ORDER BY i, j
        """.trim)
      },
      (s, d) => {
        // Direct pair join: codegen'd bit_count filter over the sig
        // square. MEASURED faster than pigeonhole banding on this
        // corpus — its signature entropy is so low that 6-7-bit band
        // groups hold ~40+ docs each and candidate generation exceeds
        // the n²/2 square. [[simhashPairs]] is the banding formulation
        // for high-entropy corpora where group sizes ≪ n.
        val sigs = simhashSignatures(documents(s, d))
        sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
          .filter(col("hamming") <= 4)
          .orderBy(col("i"), col("j"))
      })
  )

  /** SimHash near-dup pairs via pigeonhole banding: the 32-bit
    * signature splits into 5 disjoint bands, and any pair within
    * Hamming distance 4 differs in at most 4 bands — so it MUST agree
    * exactly on at least one (exact recall, no tuning). The band
    * equi-join generates candidates; a popcount verifies. This is the
    * scale path when signature entropy keeps band groups small
    * (real-world corpora, or 64-bit sigs with wider bands); on
    * low-entropy corpora where groups approach n it degrades past the
    * direct n²/2 join — measure before choosing. */
  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 4, "5 bands guarantee recall only for hamming <= 4")
    val bandBits = Seq((0, 7), (7, 7), (14, 6), (20, 6), (26, 6))
    val bands = bandBits.zipWithIndex.map { case ((off, len), bn) =>
      sigs.select(col("doc_id"), col("simhash"), lit(bn).as("band_no"),
        shiftright(col("simhash"), off).bitwiseAND((1L << len) - 1).as("bv"))
    }.reduce(_ union _)
    bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        col("x.simhash").as("si"), col("y.simhash").as("sj"))
      .distinct()
      .select(col("i"), col("j"),
        bit_count(col("si").bitwiseXOR(col("sj"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** 32-bit SimHash per document over distinct tokens. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"),
      explode(array_distinct(toks)).as("tok"))
      .withColumn("h", h32(col("tok")))
    val votes = t.groupBy(col("doc_id"))
      .agg(sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("b0"),
        (1 until 32).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")): _*)
    votes.select(col("doc_id"),
      (0 until 32).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).cast("long").as("simhash"))
  }
}

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
  *  - near-dup pairs route through banded MinHash candidates plus
  *    distributed exact verification of candidates only
  *    ([[jaccardForPairs]]); [[prefixFilterJaccard]] is the
  *    guaranteed-recall alternative (AllPairs/PPJoin family) — exact,
  *    fully distributed, no driver state — for corpora where the
  *    vocabulary is rich enough for prefixes to prune (see the
  *    dd_ngram_jaccard comment for the measured tradeoff here);
  *  - SimHash uses 64-bit signatures; pairs come from pigeonhole
  *    banding ([[simhashPairs64]]) — exact recall for Hamming ≤ 4, a
  *    band equi-join with a first-match-band filter instead of a
  *    DISTINCT shuffle, codegen'd popcount verify;
  *  - [[allPairsJaccard]] / [[jaccardForPairsBitset]] are retained as
  *    driver-bound small-corpus baselines for specs ONLY — they
  *    broadcast the corpus and must not appear in a query's dataflow.
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

  private[operators] def sqlShinglesFrom(src: String) = s"""
    SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1]))) AS sh
    FROM $src
    WHERE len(string_split(text, ' ')) >= 2"""

  private val sqlShingles = sqlShinglesFrom("documents")

  /** MinHash signatures: one row per doc with mh0..mh7. The base md5 is
    * projected once per shingle row; the 8 universal hashes are cheap
    * affine maps over it (not 8 recomputed digests). */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val withH = sh.select(col("doc_id"), h32(col("sh")).as("h"))
    withH.groupBy(col("doc_id"))
      .agg(min(uhash(col("h"), 0)).as("mh0"),
        (1 until minhashParams.size).map(i => min(uhash(col("h"), i)).as(s"mh$i")): _*)
  }

  /** LSH candidate pairs: equal (band, row-pair) on any of nBands bands
    * of 2 minhashes. 4 bands (8 hashes) is the classic surface; 8 bands
    * (16 hashes) is the high-recall generator behind the exact near-dup
    * query — miss probability (1−j²)^8 ≤ 1.5e-4 at j = 0.82, the lowest
    * true-pair similarity observed on the benchmark corpora. */
  def lshCandidates(sigs: DataFrame, nBands: Int = 4): DataFrame = {
    // One explode, not a union of nBands projections: a union re-runs
    // the signature aggregation once per band. Signatures ride the band
    // rows so a first-match-band filter (keep a pair only at its LOWEST
    // matching band) dedups candidates with a codegen'd predicate
    // instead of a DISTINCT shuffle — same trick as [[simhashPairs64]].
    val sigCols = (0 until 2 * nBands).map(i => col(s"mh$i"))
    val bands = sigs.select((col("doc_id") +: sigCols) :+
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band_no"),
            col(s"mh${2 * b}").as("ba"), col(s"mh${2 * b + 1}").as("bb"))
        }: _*)).as("band"): _*)
      .select((col("doc_id") +: sigCols) ++ Seq(
        col("band.band_no").as("band_no"),
        col("band.ba").as("ba"), col("band.bb").as("bb")): _*)
    val firstMatch = (0 until nBands).map { bn =>
      (0 until bn).map { b2 =>
        !(col(s"x.mh${2 * b2}") === col(s"y.mh${2 * b2}") &&
          col(s"x.mh${2 * b2 + 1}") === col(s"y.mh${2 * b2 + 1}"))
      }.foldLeft(col("x.band_no") === bn)(_ && _)
    }.reduce(_ || _)
    bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.ba") === col("y.ba") && col("x.bb") === col("y.bb") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(firstMatch)
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
  }

  /** Exact bigram Jaccard for given candidate (i, j) pairs — candidate-
    * driven: joins the (small) pair set to per-doc shingle arrays and
    * intersects per pair. Cost scales with |pairs|, not the corpus
    * square; at cluster scale both joins shuffle on doc id. The per-pair
    * intersection is the native codegen'd
    * [[graft.functions.JaccardSimilarity]] — one hash-set pass instead
    * of materializing `array_intersect` per pair; arithmetic identical
    * to the SQL oracle's `common * 1.0 / (na + nb - common)`. */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val arrs = shingleArrays(docs)
    pairs
      .join(arrs.select(col("doc_id").as("i"), col("shs").as("sha")), "i")
      .join(arrs.select(col("doc_id").as("j"), col("shs").as("shb")), "j")
      .select(col("i"), col("j"),
        call_function("jaccard_sim", col("sha"), col("shb")).as("jac"))
  }

  /** The DuckDB CTE chain mirroring [[admitAgainstIndex]] over the
    * `documents` table with the batch = `doc_id % 5 = 0` split — shared
    * by the `dd_incremental` oracle and the `pl_ingest_admission`
    * composition so both gates check the identical dedup semantics.
    * Exposes `best` (i → best near-dup j with jac) and `exact` (batch
    * ids with an exact index twin). */
  private[operators] def sqlAdmissionCtes: String = {
    val h = sqlH32("sh")
    val minAggs = minhashParams.indices
      .map(i => s"MIN(${sqlUhash(h, i)}) AS mh$i").mkString(", ")
    val bandSelects = (0 until 8)
      .map(b => s"SELECT doc_id, $b AS band_no, mh${2 * b} AS ba, mh${2 * b + 1} AS bb FROM sigs")
      .mkString(" UNION ALL ")
    s"""sh AS (${sqlShinglesFrom("documents")}),
        sigs AS (SELECT doc_id, $minAggs FROM sh GROUP BY doc_id),
        bands AS ($bandSelects),
        cand AS (
          SELECT DISTINCT b.doc_id AS i, x.doc_id AS j
          FROM bands b JOIN bands x
            ON b.band_no = x.band_no AND b.ba = x.ba AND b.bb = x.bb
          WHERE b.doc_id % 5 = 0 AND x.doc_id % 5 <> 0),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        common AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.sh = b.sh
          WHERE EXISTS (SELECT 1 FROM cand c WHERE c.i = a.doc_id AND c.j = b.doc_id)
          GROUP BY 1, 2),
        pairs AS (
          SELECT i, j, (common * 1.0 / (sa.n + sb.n - common)) AS jac
          FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
          WHERE (common * 1.0 / (sa.n + sb.n - common)) >= 0.7),
        best AS (
          SELECT i, j, jac FROM (
            SELECT i, j, jac,
                   ROW_NUMBER() OVER (PARTITION BY i ORDER BY jac DESC, j) AS rn
            FROM pairs)
          WHERE rn = 1),
        exact AS (
          SELECT DISTINCT d.doc_id
          FROM documents d JOIN documents x
            ON md5(d.text) = md5(x.text) AND x.doc_id % 5 <> 0
          WHERE d.doc_id % 5 = 0)"""
  }

  /** The dedup-index artifacts an ingest pipeline maintains between
    * batches: exact fingerprints, the MinHash band table (8 bands of 2
    * hashes — the high-recall generator, see [[lshCandidates]]), and
    * the per-doc shingle arrays for exact verification. All three are
    * plain tables: at cluster scale they live as parquet/Delta
    * artifacts keyed by doc id, appended to as batches are admitted,
    * and every ingest cycle joins the incoming batch against them —
    * never against the raw 100 TB corpus. */
  final case class DedupIndex(fps: DataFrame, bands: DataFrame, arrs: DataFrame)

  /** One band row per (doc, band): the LSH bucket key a pair must share
    * to become a candidate. */
  private def explodeBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band_no"),
          col(s"mh${2 * b}").as("ba"), col(s"mh${2 * b + 1}").as("bb"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_no").as("band_no"),
        col("band.ba").as("ba"), col("band.bb").as("bb"))

  /** Build the index artifacts from the existing corpus (`doc_id`,
    * `text`). Each artifact is one scan + (for bands) one groupBy —
    * run once, persisted, then reused by every ingest cycle. */
  def buildIndex(indexDocs: DataFrame): DedupIndex = DedupIndex(
    fps = indexDocs.select(md5(col("text")).as("fp")).distinct(),
    bands = explodeBands(minhashSignatures(shingles(indexDocs)))
      .select(col("doc_id").as("j"), col("band_no"), col("ba"), col("bb")),
    arrs = shingleArrays(indexDocs).select(col("doc_id").as("j"), col("shs").as("shb")))

  /** Admission verdict for an incoming batch against an existing index
    * — the production ingestion flow behind `dd_incremental` and the
    * streaming twin [[graft.streaming.Streams.incrementalAdmit]]. Two
    * layers, exactly as a crawl pipeline runs them: (1) exact — md5
    * semi-join against the index fingerprints; (2) near — 8-band
    * MinHash candidates restricted to batch×index band collisions,
    * distributed exact Jaccard verify ≥ `minJac`, best match per batch
    * doc by (jac desc, index id). Cost ∝ |batch|·bands + |candidates|,
    * independent of index² — the property that lets the same flow run
    * against a 100 TB index every ingest cycle. Output is one verdict
    * row per batch doc: keep ⇔ neither layer fired. */
  def admitAgainstIndex(batch: DataFrame, index: DedupIndex,
      minJac: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val bBands = explodeBands(minhashSignatures(shingles(batch)))
      .select(col("doc_id").as("i"), col("band_no"), col("ba"), col("bb"))
    val cand = bBands.join(index.bands, Seq("band_no", "ba", "bb"))
      .select(col("i"), col("j")).distinct()
    val bArrs = shingleArrays(batch).select(col("doc_id").as("i"), col("shs").as("sha"))
    val verified = cand.join(bArrs, "i").join(index.arrs, "j")
      .select(col("i"), col("j"),
        call_function("jaccard_sim", col("sha"), col("shb")).as("jac"))
      .filter(col("jac") >= minJac)
    val w = Window.partitionBy(col("i")).orderBy(col("jac").desc, col("j"))
    val best = verified.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("i").as("doc_id"), col("j").as("near_dup_of"), col("jac"))
    val exactIds = batch
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .join(index.fps, Seq("fp"), "left_semi")
      .select(col("doc_id"), lit(true).as("exact_hit"))
    batch.select(col("doc_id"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_hit"), lit(false)).as("exact_dup"),
        col("near_dup_of"), col("jac"),
        (!coalesce(col("exact_hit"), lit(false)) && col("near_dup_of").isNull).as("keep"))
  }

  /** [[jaccardForPairs]] over a broadcast bitset signature table — same
    * results, popcount loop instead of per-pair string-set intersection.
    * SMALL-CORPUS BASELINE ONLY (collects every shingle array to the
    * driver): used in specs to cross-check the distributed verifier,
    * never in a query's dataflow. */
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
    * SMALL-CORPUS BASELINE ONLY — the signature table is built
    * driver-side, so this caps out at driver memory. The production
    * path is [[prefixFilterJaccard]] (identical results, distributed);
    * this stays as the spec cross-check of that path. Integer counts
    * divide exactly as in SQL, so results hash-match the
    * inverted-index oracle. */
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

  /** The classic MinHash-LSH near-dup pipeline as one reusable unit:
    * 4-band candidates → distributed exact Jaccard verify → ≥ 0.7.
    * No driver-side corpus state anywhere in the dataflow. */
  def minhashLshPairs(docs: DataFrame): DataFrame =
    jaccardForPairs(docs, lshCandidates(minhashSignatures(shingles(docs))))
      .filter(col("jac") >= 0.7)

  /** SQL mirror of [[minhashLshPairs]]: CTE chain ending in
    * `pairs(i, j, jac)`. Splice with `WITH $sqlLshPairsCtes, ...`;
    * `src` names the (doc_id, text) relation to deduplicate. */
  private[operators] def sqlLshPairsCtes(src: String = "documents"): String = {
    val h = sqlH32("sh")
    val minAggs = minhashParams.indices
      .map(i => s"MIN(${sqlUhash(h, i)}) AS mh$i").mkString(", ")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band_no, mh${2 * b} AS ba, mh${2 * b + 1} AS bb FROM sigs")
      .mkString(" UNION ALL ")
    s"""sh AS (${sqlShinglesFrom(src)}),
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
            GROUP BY 1, 2),
          pairs AS (
            SELECT i, j, (common * 1.0 / (sa.n + sb.n - common)) AS jac
            FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
            WHERE (common * 1.0 / (sa.n + sb.n - common)) >= 0.7)"""
  }

  /** Large-star step (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): for every node u, connect each strictly
    * LARGER neighbor to m = min(N(u) ∪ {u}). One hash-partitioned
    * groupBy (the per-node min) + one equi-join — no single-partition
    * state anywhere. Output edges are oriented big→small (u > v). */
  private def ccLargeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star step: edges arrive oriented u > v; connect u and every
    * neighbor except the minimum to m = min(N(u)). Same shuffle shape
    * as [[ccLargeStar]]; output stays big→small. */
  private def ccSmallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components via
    * alternating large-star/small-star (Kiveris et al., SoCC'14).
    * Every step is a hash-partitioned groupBy + equi-join over the edge
    * list — no driver-side graph, no single-partition label state — so
    * the loop survives web-scale dup rates (20–50% duplicates ⇒
    * billions of edges) where a coalesced min-label loop funnels the
    * whole edge set through one task. Converges in O(log² n) rounds;
    * each round is `localCheckpoint`ed to truncate lineage. At the
    * fixpoint every edge points directly at its component's minimum
    * node, i.e. the edge set IS the (node → representative) labeling —
    * and that fixpoint is unique, so the result is deterministic.
    * Convergence is detected by exact set equality (same count and
    * same distinct-union count), not a hash checksum. A 100 TB dedup
    * needs cluster representatives, not just pairs: "keep min doc_id
    * per component" is the canonical keep-one policy. The (vastly
    * larger) singleton set never enters the loop — it joins back after
    * the fixpoint with rep = doc_id. */
  /** Hybrid size gate for [[ccLabels]]: a post-blocking match graph at
    * or under this many deduped edges is labeled by a DRIVER union-find
    * (≤ ~8 MB collected, microseconds of CPU) instead of the
    * distributed star fixpoint, whose cost on kilobyte edge sets is
    * pure job-scheduling floor (~6 sequential jobs × 4–6 rounds ≈ 3–4 s
    * at 32 slots, measured via graft.Profile on sim_dbscan). Above the
    * gate — web-scale dup rates where the candidate graph itself is
    * huge — the hash-partitioned star rounds take over unchanged. Both
    * paths produce the IDENTICAL unique labeling (node → component
    * minimum, no row for the minimum itself). */
  private val ccDriverMaxEdges = 500000L

  /** The CC labeling, reusable for any edge list: returns (u → v)
    * where v is u's component minimum, one row per NON-minimum node
    * (the minimum has no row — callers coalesce to self).
    * Deterministic: the labeling is unique, on either path. */
  private[operators] def ccLabels(rawEdges: DataFrame): DataFrame = {
    // LAZY checkpoints + ONE action per round: on post-blocking edge
    // sets (a few thousand edges) the fixpoint's cost is pure
    // job-scheduling floor, so the loop is engineered down to a single
    // job per round — the convergence aggregate below computes `next`
    // (materializing its lazy checkpoint, which truncates lineage for
    // the NEXT round) and reads `cur` (materialized last round) and
    // decides set-equality in the same pass. The r7 version paid three
    // actions per round (eager checkpoint + count + union-distinct
    // count). One star pair per checkpoint is still deliberate: each
    // star's output feeds TWO subtrees of the next (the mins join side
    // and the union side), so batching two pairs per checkpoint
    // doubles the uncheckpointed lineage per level and re-executes the
    // first pair — measured 40% SLOWER than checkpointing every pair.
    // (Measured dead end, for the record: disabling AQE around the
    // fixpoint — on the theory that per-exchange materialization
    // sub-jobs are the floor — made every CC consumer 10-15% SLOWER;
    // AQE's single-partition coalescing of these kilobyte exchanges
    // outweighs its sub-job overhead.)
    val edges0 = rawEdges
      .where(col("u") =!= col("v"))
      .distinct().localCheckpoint(false)
    // the count doubles as the lazy checkpoint's materializing action
    // (the first star round paid it before)
    val nEdges = edges0.count()
    if (nEdges <= ccDriverMaxEdges) ccLabelsDriver(edges0)
    else ccLabelsStars(edges0)
  }

  /** The distributed star-fixpoint path of [[ccLabels]] — exposed
    * (package-wide) so the randomized equivalence spec can pin
    * driver-path == star-path == union-find even though real callers
    * only reach it past the size gate. Expects deduped u≠v edges,
    * lazily checkpointed. */
  private[graft] def ccLabelsStars(edges0: DataFrame): DataFrame = {
    var cur = ccSmallStar(ccLargeStar(edges0)).localCheckpoint(false)
    var converged = false
    while (!converged) {
      val next = ccSmallStar(ccLargeStar(cur)).localCheckpoint(false)
      // Set equality in one job: tag-sum over the union — a pair in
      // both sides sums to 3; the sets are equal iff every distinct
      // pair is (n_union == n_both). An empty fixpoint (no edges)
      // gives 0 == 0 — converged.
      val stats = next.select(col("u"), col("v"), lit(1).as("s"))
        .union(cur.select(col("u"), col("v"), lit(2).as("s")))
        .groupBy(col("u"), col("v")).agg(sum(col("s")).as("s"))
        .agg(count(lit(1)).as("n_union"),
          count(when(col("s") === 3, 1)).as("n_both"))
        .head()
      converged = stats.getLong(0) == stats.getLong(1)
      cur = next
    }
    cur
  }

  /** Driver-side union-find for the small-graph path of [[ccLabels]]:
    * min-root invariant (the larger root always attaches under the
    * smaller) plus full path compression, so every tree root IS its
    * component minimum and every non-minimum node holds a parent entry
    * pointing (transitively) at it. Result is a LocalRelation — the
    * downstream node joins see exact stats and broadcast it. Keys are
    * collected as LONG and cast back to the input column types so the
    * output schema matches the distributed path exactly. */
  private[graft] def ccLabelsDriver(edges0: DataFrame): DataFrame = {
    val s = edges0.sparkSession
    val uT = edges0.schema(0).dataType
    val vT = edges0.schema(1).dataType
    val arr = edges0
      .select(col(edges0.columns(0)).cast("long"),
        col(edges0.columns(1)).cast("long"))
      .collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      var p = parent.getOrDefault(r, r)
      while (p != r) { r = p; p = parent.getOrDefault(r, r) }
      var c = x
      while (c != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    arr.foreach { row =>
      val a = find(row.getLong(0))
      val b = find(row.getLong(1))
      if (a < b) parent.put(b, a)
      else if (b < a) parent.put(a, b)
    }
    import scala.jdk.CollectionConverters._
    val out = parent.keySet().asScala.toSeq.sorted
      .map(n => org.apache.spark.sql.Row(n, find(n)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    s.createDataFrame(out.asJava, schema)
      .select(col("u").cast(uT).as("u"), col("v").cast(vT).as("v"))
  }

  def duplicateClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = ccLabels(pairs.select(col("i").as("u"), col("j").as("v")))
      .select(col("u").as("doc_id"), col("v").as("rep"))
    val full = docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
    val sizes = full.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    full.join(sizes, "rep")
      .select(col("doc_id"), col("rep").as("cluster_rep"), col("cluster_size"))
  }

  /** Exact near-dup pairs (Jaccard ≥ minJac) via prefix filtering
    * (Bayardo et al. "Scaling Up All Pairs Similarity Search", WWW'07;
    * Xiao et al. PPJoin). Under ANY total order on tokens, a pair with
    * overlap ≥ α must share a token within each side's (n − α + 1)-
    * prefix; Jaccard ≥ t implies overlap ≥ ⌈t·n⌉ for each side's n, so
    * prefixes of n − ⌈t·n⌉ + 1 rarest-first tokens guarantee complete
    * recall. Ordering rarest-first keeps the candidate join small: the
    * hot shingles that square a naive inverted-index join are exactly
    * the ones the prefix excludes. Dataflow is one freq groupBy, one
    * per-doc ranking window, a prefix equi-join, then distributed
    * exact verification over candidates ([[jaccardForPairs]]) — every
    * stage shuffles on a key, nothing touches the driver.
    *
    * This is the 100%-recall path; its pruning power depends on
    * vocabulary size. On the synthetic benchmark corpus (931 distinct
    * shingles / 5000 docs) prefixes barely prune, so the public query
    * uses banded-MinHash candidates instead; on natural-text corpora
    * (vocabulary ≫ corpus) prefix filtering is the standard exact
    * set-similarity join. Result-equality with [[allPairsJaccard]] is
    * pinned by a spec. */
  def prefixFilterJaccard(docs: DataFrame, minJac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingles(docs)
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ordered = sh.join(freq, "sh")
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("sh"))
    val perDoc = Window.partitionBy(col("doc_id"))
    val prefix = ordered
      .withColumn("pos", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(perDoc))
      .filter(col("pos") <= col("n") - ceil(lit(minJac) * col("n")) + 1)
      .select(col("doc_id"), col("sh"), col("n"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.sh") === col("y.sh") &&
          col("x.doc_id") < col("y.doc_id") &&
          // length filter: jac >= t forces t·max(nx,ny) <= min(nx,ny)
          col("x.n") >= ceil(lit(minJac) * col("y.n")) &&
          col("y.n") >= ceil(lit(minJac) * col("x.n")))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    jaccardForPairs(docs, cand).filter(col("jac") >= minJac)
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

    // Full n-gram Jaccard near-dup pairs. Candidates come from 8-band
    // MinHash LSH (16 hashes), verification is distributed exact
    // Jaccard over candidates only; the DuckDB oracle stays the
    // quadratic inverted-index formulation (quadratic is fine
    // oracle-side). Candidate generation is the measured choice:
    //  - naive inverted index: hot shingles square the join (73M rows);
    //  - prefix filtering ([[prefixFilterJaccard]]): exact recall, but
    //    this corpus has only ~931 distinct shingles over 5000 docs, so
    //    even rarest-first prefixes leave 2.75M candidates for 256 true
    //    pairs (~50 s);
    //  - 8-band MinHash: 124k candidates, zero missed pairs at both
    //    sf0.01 and sf0.1 (all true pairs have j ≥ 0.82; analytic miss
    //    bound (1−0.82²)^8 ≈ 1.5e-4 per pair).
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
      (s, d) => {
        val docs = documents(s, d)
        val cand = lshCandidates(minhashSignatures(shingles(docs)), nBands = 8)
        jaccardForPairs(docs, cand)
          .filter(col("jac") >= 0.7)
          .orderBy(col("i"), col("j"))
      }),

    // MinHash + LSH near-dup pairs: signatures → banded candidates →
    // exact Jaccard verification of candidates only.
    QueryDef(
      "dd_minhash_lsh",
      Some(s"""
        WITH ${sqlLshPairsCtes()}
        SELECT i, j, jac FROM pairs
        ORDER BY i, j
      """.trim),
      (s, d) => minhashLshPairs(documents(s, d))
        .orderBy(col("i"), col("j"))),

    // Duplicate clusters over the MinHash-LSH pairs: Spark runs
    // distributed min-label propagation to the fixpoint; the oracle
    // computes the same transitive closure with a recursive CTE.
    QueryDef(
      "dd_dup_clusters",
      Some(s"""
        WITH RECURSIVE ${sqlLshPairsCtes()},
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
        duplicateClusters(docs, minhashLshPairs(docs))
          .orderBy(col("doc_id"))
      }),

    // Asymmetric overlap report over the near-dup pairs: containment
    // |A∩B|/|A| in BOTH directions (native codegen'd `containment_sim`,
    // same single-pass hash-set design as jaccard_sim). Jaccard is
    // symmetric and misses WHICH side is the quote/template/subset;
    // containment ≥ 0.9 on one side flags it. Candidates here are the
    // Jaccard-banded near-dup pairs — for extreme-asymmetry pairs
    // (tiny A inside huge B, LOW Jaccard) the guaranteed-recall
    // generator is a prefix filter on the contained side's rarest
    // (1−t)·|A|+1 shingles, the [[prefixFilterJaccard]] construction
    // with the containment overlap bound; on this corpus (931-shingle
    // vocabulary) that join degenerates, as documented there.
    QueryDef(
      "dd_containment",
      Some(s"""
        WITH ${sqlLshPairsCtes()}
        SELECT m.i, m.j,
               m.common * 1.0 / sa.n AS cont_i,
               m.common * 1.0 / sb.n AS cont_j,
               (m.common * 1.0 / sa.n >= 0.9 OR m.common * 1.0 / sb.n >= 0.9) AS subset_like
        FROM common m
        JOIN sizes sa ON m.i = sa.doc_id
        JOIN sizes sb ON m.j = sb.doc_id
        JOIN pairs p ON p.i = m.i AND p.j = m.j
        ORDER BY m.i, m.j
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val docs = documents(s, d)
        val arrs = shingleArrays(docs)
        minhashLshPairs(docs).select(col("i"), col("j"))
          .join(arrs.select(col("doc_id").as("i"), col("shs").as("sha")), "i")
          .join(arrs.select(col("doc_id").as("j"), col("shs").as("shb")), "j")
          .select(col("i"), col("j"),
            call_function("containment_sim", col("sha"), col("shb")).as("cont_i"),
            call_function("containment_sim", col("shb"), col("sha")).as("cont_j"))
          .withColumn("subset_like", col("cont_i") >= 0.9 || col("cont_j") >= 0.9)
          .orderBy(col("i"), col("j"))
      }),

    // Cross-source overlap forensics: near-dup pair counts and total
    // similarity mass by (source, source) — the corpus-composition
    // readout that tells you WHICH ingest feeds duplicate each other
    // (e.g. two crawls of the same sites) before you pay for a full
    // dedup pass. Rides the banded near-dup pairs; two dimension-sized
    // joins + one tiny groupBy on top.
    QueryDef(
      "dd_source_overlap",
      Some(s"""
        WITH ${sqlLshPairsCtes()}
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ${graft.det.sqlSum("p.jac", 6)} AS sum_jac
        FROM pairs p
        JOIN documents da ON p.i = da.doc_id
        JOIN documents db ON p.j = db.doc_id
        GROUP BY 1, 2
        ORDER BY 1, 2
      """.trim),
      (s, d) => {
        val docs = documents(s, d)
        val src = docs.select(col("doc_id"), col("source"))
        minhashLshPairs(docs)
          .join(src.select(col("doc_id").as("i"), col("source").as("sa")), "i")
          .join(src.select(col("doc_id").as("j"), col("source").as("sb")), "j")
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"), col("jac"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"),
            graft.det.dsum(col("jac"), 6).as("sum_jac"))
          .orderBy(col("source_a"), col("source_b"))
      }),

    // Incremental batch dedup — the production ingestion flow: an
    // incoming batch (doc_id % 5 = 0 here) dedups against the EXISTING
    // index (the rest), never batch×batch-squared. Two layers, exactly
    // as a crawl pipeline runs them: (1) exact — md5 semi-join against
    // the index fingerprints; (2) near — 8-band MinHash candidates
    // restricted to batch×index band collisions, distributed exact
    // Jaccard verify ≥ 0.7, best match per batch doc by (jac desc,
    // index id). Cost ∝ |batch|·bands + |candidates|, independent of
    // index² — the property that lets the same query run against a
    // 100 TB index every ingest cycle. Output is the batch admission
    // verdict: keep ⇔ neither layer fired.
    QueryDef(
      "dd_incremental",
        Some(s"""
        WITH $sqlAdmissionCtes
        SELECT d.doc_id,
               (e.doc_id IS NOT NULL) AS exact_dup,
               CAST(b.j AS BIGINT) AS near_dup_of,
               b.jac AS jac,
               (e.doc_id IS NULL AND b.j IS NULL) AS keep
        FROM documents d
        LEFT JOIN exact e ON d.doc_id = e.doc_id
        LEFT JOIN best b ON d.doc_id = b.i
        WHERE d.doc_id % 5 = 0
        ORDER BY d.doc_id
      """.trim),
      (s, d) => {
        val docs = documents(s, d)
        val isBatch = col("doc_id") % 5 === 0
        admitAgainstIndex(docs.filter(isBatch), buildIndex(docs.filter(!isBatch)))
          .orderBy(col("doc_id"))
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

    // SimHash near-dup pairs by Hamming distance over 64-bit signatures.
    // 64 bits (vs the 32-bit signature surface of dd_simhash) are the
    // production width: on this clustered corpus, hamming ≤ 4 over 32
    // bits marks 21% of ALL pairs "near-dup" (2.6M rows at sf0.1) —
    // wider signatures restore selectivity (326k pairs). The oracle is
    // the direct quadratic formulation; Spark runs pigeonhole banding.
    QueryDef(
      "dd_simhash_pairs", {
        val h1 = sqlH32("tok")
        val h2 = sqlH32b("tok")
        val bitAggs = ((0 until 32)
          .map(b => s"SUM(CASE WHEN (($h1 >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS lo$b") ++
          (0 until 32)
            .map(b => s"SUM(CASE WHEN (($h2 >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS hi$b"))
          .mkString(", ")
        val asmLo = (0 until 32)
          .map(b => s"(CASE WHEN lo$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
        val asmHi = (0 until 32)
          .map(b => s"(CASE WHEN hi$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
        Some(s"""
          WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                     FROM documents),
          votes AS (SELECT doc_id, $bitAggs FROM t GROUP BY doc_id),
          sigs AS (SELECT doc_id, CAST($asmLo AS BIGINT) AS sig_lo,
                          CAST($asmHi AS BIGINT) AS sig_hi FROM votes)
          SELECT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                      + bit_count(xor(a.sig_hi, b.sig_hi)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig_lo, b.sig_lo))
                + bit_count(xor(a.sig_hi, b.sig_hi)) <= 4
          ORDER BY i, j
        """.trim)
      },
      (s, d) => simhashPairs64(simhashSignatures64(documents(s, d)), 4)
        .orderBy(col("i"), col("j"))),

    // N-gram novelty curve — per document, how many of its shingles
    // were already seen in any EARLIER document (doc_id order): the
    // readout dedup-aware sampling uses to decide how fast a corpus
    // stops contributing new text. "First occurrence" is a per-shingle
    // MIN(doc_id) — one hash aggregate over the exploded shingles —
    // then a shingle-keyed join back counts each doc's repeats; at
    // 100 TB both sides shuffle on the shingle key and nothing is
    // quadratic (the join's per-key width is df, the same profile the
    // inverted index handles).
    QueryDef(
      "dd_ngram_novelty",
      Some(s"""
        WITH sh AS (${sqlShinglesFrom("documents")}),
        first AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
        per AS (
          SELECT s.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(COUNT(CASE WHEN f.first_doc < s.doc_id THEN 1 END) AS BIGINT) AS n_repeat
          FROM sh s JOIN first f USING (sh)
          GROUP BY s.doc_id)
        SELECT doc_id, n_grams, n_repeat,
               n_repeat * 1.0 / n_grams AS repeat_frac
        FROM per
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        val sh = shingleArrays(documents(s, d))
          .select(col("doc_id"), explode(col("shs")).as("sh"))
        val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, "sh")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            count(when(col("first_doc") < col("doc_id"), 1)).as("n_repeat"))
          .select(col("doc_id"), col("n_grams"), col("n_repeat"),
            (col("n_repeat") * lit(1.0) / col("n_grams")).as("repeat_frac"))
          .orderBy(col("doc_id"))
      }),

    // LSH band/row tuning S-curve — "measure before choosing" as a
    // query: the same 8 minhashes banded four ways (8×1, 4×2, 2×4,
    // 1×8), each config's candidate volume, verified-true count
    // (exact Jaccard ≥ 0.7), precision, and recall relative to the
    // most permissive config. Stricter bandings are SUBSETS of r=1
    // (all-rows-equal implies any-row-equal), so the exact verify runs
    // ONCE over the r=1 candidates and every config aggregates from
    // that one joined table. All candidate generation is explode +
    // band-key equi-join (never an OR-join, which would plan as a
    // nested loop); verify cost ∝ |r=1 candidates|.
    //
    // The tuning corpus is a BOUNDED deterministic sample (doc_id <
    // 2000): the r=1 arm's candidate volume grows near-quadratically
    // with corpus size (single-hash bands collide on every popular
    // shingle — measured t(sf0.1)/t(sf0.01) ≈ 7.6 unbounded), and
    // parameter tuning never needs the full corpus — production tunes
    // the (bands, rows) dial on a fixed-size representative sample
    // and applies the chosen config corpus-wide, the same
    // bounded-sample discipline as dd_embedding_neardup_recall's
    // truth set. At the sf0.01 gate the cap is the whole table, so
    // the oracle's semantics are unchanged there.
    QueryDef(
      "dd_lsh_tuning", {
        def allEq(hs: Seq[Int]) =
          hs.map(h => s"x.mh$h = y.mh$h").mkString("(", " AND ", ")")
        def bandsOf(rows: Int) =
          (0 until 8 / rows).map(b => allEq((b * rows) until ((b + 1) * rows)))
            .mkString(" OR ")
        Some(s"""
          WITH sh AS (${sqlShinglesFrom("(SELECT * FROM documents WHERE doc_id < 2000) tuning")}),
          sigs AS (SELECT doc_id, ${minhashParams.indices
            .map(i => s"MIN(${sqlUhash(sqlH32("sh"), i)}) AS mh$i").mkString(", ")}
                   FROM sh GROUP BY doc_id),
          cand AS (
            SELECT x.doc_id AS i, y.doc_id AS j,
                   ${bandsOf(2)} AS c4x2,
                   ${bandsOf(4)} AS c2x4,
                   ${bandsOf(8)} AS c1x8
            FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
            WHERE ${bandsOf(1)}),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
          common AS (
            SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            WHERE EXISTS (SELECT 1 FROM cand c WHERE c.i = a.doc_id AND c.j = b.doc_id)
            GROUP BY 1, 2),
          jc AS (
            SELECT cand.i, cand.j, cand.c4x2, cand.c2x4, cand.c1x8,
                   COALESCE(m.common, 0) * 1.0 / (sa.n + sb.n - COALESCE(m.common, 0)) AS jac
            FROM cand
            LEFT JOIN common m ON m.i = cand.i AND m.j = cand.j
            JOIN sizes sa ON cand.i = sa.doc_id
            JOIN sizes sb ON cand.j = sb.doc_id),
          cfg AS (
            SELECT 'r1_b8' AS config, CAST(COUNT(*) AS BIGINT) AS n_candidates,
                   CAST(SUM(CASE WHEN jac >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
            FROM jc
            UNION ALL
            SELECT 'r2_b4', CAST(COUNT(CASE WHEN c4x2 THEN 1 END) AS BIGINT),
                   CAST(SUM(CASE WHEN c4x2 AND jac >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
            FROM jc
            UNION ALL
            SELECT 'r4_b2', CAST(COUNT(CASE WHEN c2x4 THEN 1 END) AS BIGINT),
                   CAST(SUM(CASE WHEN c2x4 AND jac >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
            FROM jc
            UNION ALL
            SELECT 'r8_b1', CAST(COUNT(CASE WHEN c1x8 THEN 1 END) AS BIGINT),
                   CAST(SUM(CASE WHEN c1x8 AND jac >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
            FROM jc),
          tot AS (SELECT n_true AS base_true FROM cfg WHERE config = 'r1_b8')
          SELECT config, n_candidates, n_true,
                 CASE WHEN n_candidates > 0
                      THEN n_true * 1.0 / n_candidates END AS precision_,
                 CASE WHEN tot.base_true > 0
                      THEN n_true * 1.0 / tot.base_true END AS recall_vs_r1
          FROM cfg CROSS JOIN tot
          ORDER BY config
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).filter(col("doc_id") < 2000)
        // Shingle the tuning sample ONCE: signatures, and both sides
        // of the exact verify, all derive from this checkpointed array
        // table (jaccardForPairs would re-shingle per join side — 3
        // corpus scans instead of 1).
        val arrs = shingleArrays(docs).localCheckpoint()
        val sigs = minhashSignatures(
          arrs.select(col("doc_id"), explode(col("shs")).as("sh")))
          .localCheckpoint()

        // r=1 candidates (the superset every stricter config is a
        // subset of): one NARROW band-key equi-join (doc_id, bn, key
        // only — riding the full signatures through the pre-distinct
        // ~5× multiplicity measured slower than the DISTINCT shuffle),
        // then pair-dedup.
        val bands = sigs.select(col("doc_id"),
          explode(array((0 until 8).map { h =>
            struct(lit(h).as("bn"), col(s"mh$h").as("key"))
          }: _*)).as("bd"))
          .select(col("doc_id"), col("bd.bn").as("bn"), col("bd.key").as("key"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.bn") === col("y.bn") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
          .distinct()

        // The deduped pairs pick up both signature vectors via
        // broadcast (8 ints/doc — the one small artifact; the stricter
        // configs are boolean expressions over them, the oracle's
        // one-joined-table shape) and both shingle arrays via
        // SHUFFLED doc_id equi-joins: the per-doc shingle arrays ARE
        // the corpus, and broadcasting them caps the operator at the
        // 8 GB broadcast ceiling long before 100 TB. Shuffle cost is
        // ∝ |candidates| + |corpus| rows hashed on doc_id — the same
        // distributed-verify shape as jaccardForPairs — then one
        // linear pipeline into ONE aggregate.
        def bandEq(rows: Int) = (0 until 8 / rows).map { b =>
          ((b * rows) until ((b + 1) * rows))
            .map(h => col(s"xi$h") === col(s"yj$h")).reduce(_ && _)
        }.reduce(_ || _)
        val sx = sigs.select(col("doc_id").as("i") +:
          (0 until 8).map(h => col(s"mh$h").as(s"xi$h")): _*)
        val sy = sigs.select(col("doc_id").as("j") +:
          (0 until 8).map(h => col(s"mh$h").as(s"yj$h")): _*)
        graft.functions.GraftFunctions.register(s)
        val jc = cand
          .join(broadcast(sx), "i").join(broadcast(sy), "j")
          .join(arrs.select(col("doc_id").as("i"), col("shs").as("sha")), "i")
          .join(arrs.select(col("doc_id").as("j"), col("shs").as("shb")), "j")
          .select(col("i"), col("j"),
            bandEq(2).as("c4x2"), bandEq(4).as("c2x4"), bandEq(8).as("c1x8"),
            call_function("jaccard_sim", col("sha"), col("shb")).as("jac"))

        // All four configs in ONE aggregate row (conditional counts),
        // then stack to rows; base_true is a sibling column, so no
        // self-join/crossJoin and nothing recomputes.
        def hit(flag: Column) = count(when(flag, 1))
        val t = col("jac") >= 0.7
        jc.agg(
            count(lit(1)).as("n1"), hit(t).as("t1"),
            hit(col("c4x2")).as("n2"), hit(col("c4x2") && t).as("t2"),
            hit(col("c2x4")).as("n3"), hit(col("c2x4") && t).as("t3"),
            hit(col("c1x8")).as("n4"), hit(col("c1x8") && t).as("t4"))
          .select(expr(
            """stack(4, 'r1_b8', n1, t1, 'r2_b4', n2, t2,
              |         'r4_b2', n3, t3, 'r8_b1', n4, t4)
              |  AS (config, n_candidates, n_true)""".stripMargin),
            col("t1").as("base_true"))
          .select(col("config"), col("n_candidates"), col("n_true"),
            when(col("n_candidates") > 0,
              col("n_true") * lit(1.0) / col("n_candidates")).as("precision_"),
            when(col("base_true") > 0,
              col("n_true") * lit(1.0) / col("base_true")).as("recall_vs_r1"))
          .orderBy(col("config"))
      }),

    // Exact-duplicate rate per source — the dataset-datasheet row that
    // decides which corpus slices are worth scraping again: per
    // source, docs, distinct texts, rows that are non-canonical copies
    // (doc_id ≠ min doc_id of their md5 group), and the rate. One
    // md5-partitioned window + one groupBy(source) — the same
    // two-shuffle shape as dd_exact_documents, nothing quadratic.
    QueryDef(
      "dd_dup_rate",
      Some("""
        WITH c AS (
          SELECT doc_id, source, md5(text) AS h,
                 MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
          FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
               CAST(COUNT(CASE WHEN doc_id <> canon THEN 1 END) AS BIGINT) AS n_dup_rows,
               COUNT(CASE WHEN doc_id <> canon THEN 1 END) * 1.0 / COUNT(*) AS dup_rate
        FROM c
        GROUP BY source
        ORDER BY source
      """.trim),
      (s, d) => {
        val c = documents(s, d)
          .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
          .withColumn("canon",
            min(col("doc_id")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
        c.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("h")).as("n_unique_texts"),
            count(when(col("doc_id") =!= col("canon"), 1)).as("n_dup_rows"))
          .select(col("source"), col("n_docs"), col("n_unique_texts"),
            col("n_dup_rows"),
            (col("n_dup_rows") * lit(1.0) / col("n_docs")).as("dup_rate"))
          .orderBy(col("source"))
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
    val bands = sigs.select(col("doc_id"), col("simhash"),
        explode(array(bandBits.zipWithIndex.map { case ((off, len), bn) =>
          struct(lit(bn).as("band_no"),
            shiftright(col("simhash"), off).bitwiseAND((1L << len) - 1).as("bv"))
        }: _*)).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_no").as("band_no"), col("band.bv").as("bv"))
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

  /** 64-bit SimHash per document over distinct tokens, held as two
    * non-negative 32-bit halves (sig_lo = md5 bits 0-31 votes, sig_hi =
    * md5 bits 32-63 votes). Two longs instead of one keep every value
    * in [0, 2^32) — no sign-bit hazards in Spark or DuckDB bit ops. */
  def simhashSignatures64(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"),
      explode(array_distinct(toks)).as("tok"))
      .withColumn("h1", h32(col("tok")))
      .withColumn("h2", h32b(col("tok")))
    def vote(h: Column, b: Int): Column =
      sum(when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
    val votes = t.groupBy(col("doc_id"))
      .agg(vote(col("h1"), 0).as("lo0"),
        ((1 until 32).map(b => vote(col("h1"), b).as(s"lo$b")) ++
          (0 until 32).map(b => vote(col("h2"), b).as(s"hi$b"))): _*)
    def assemble(prefix: String): Column =
      (0 until 32).map(b => when(col(s"$prefix$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).cast("long")
    votes.select(col("doc_id"),
      assemble("lo").as("sig_lo"), assemble("hi").as("sig_hi"))
  }

  /** The 5 band extractors for [[simhashPairs64]]: 13+13+13+13+12 bits
    * over (sig_lo, sig_hi). Band 2 straddles the halves; all arithmetic
    * stays on non-negative values so Spark and any SQL mirror agree. */
  private def bandVal64(lo: Column, hi: Column, bn: Int): Column = bn match {
    case 0 => lo.bitwiseAND(8191)
    case 1 => shiftright(lo, 13).bitwiseAND(8191)
    case 2 => shiftright(lo, 26).bitwiseAND(63) + hi.bitwiseAND(127) * 64
    case 3 => shiftright(hi, 7).bitwiseAND(8191)
    case 4 => shiftright(hi, 20).bitwiseAND(4095)
  }

  /** SimHash near-dup pairs over 64-bit signatures via pigeonhole
    * banding: 5 disjoint bands; any pair within Hamming distance 4
    * differs in ≤ 4 bands, so it MUST agree exactly on ≥ 1 band —
    * exact recall, no tuning. Candidates come from a band equi-join;
    * a first-match-band predicate (computable per-row because both
    * signatures ride the join) keeps exactly ONE row per candidate
    * pair, replacing a multi-million-row DISTINCT shuffle with a
    * codegen'd filter. A popcount verifies. */
  def simhashPairs64(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 4, "5 bands guarantee recall only for hamming <= 4")
    // One explode, not a union of 5 projections (a union re-runs the
    // 64-column vote aggregation once per band).
    val bands = sigs.select(col("doc_id"), col("sig_lo"), col("sig_hi"),
        explode(array((0 until 5).map { bn =>
          struct(lit(bn).as("band_no"),
            bandVal64(col("sig_lo"), col("sig_hi"), bn).as("bv"))
        }: _*)).as("band"))
      .select(col("doc_id"), col("sig_lo"), col("sig_hi"),
        col("band.band_no").as("band_no"), col("band.bv").as("bv"))
    // Keep a candidate only at its LOWEST matching band: for band bn,
    // all earlier bands must differ. Dedups without DISTINCT.
    val firstMatch = (0 until 5).map { bn =>
      (0 until bn).map { b2 =>
        bandVal64(col("x.sig_lo"), col("x.sig_hi"), b2) =!=
          bandVal64(col("y.sig_lo"), col("y.sig_hi"), b2)
      }.foldLeft(col("x.band_no") === bn)(_ && _)
    }.reduce(_ || _)
    bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(firstMatch)
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        (bit_count(col("x.sig_lo").bitwiseXOR(col("y.sig_lo"))) +
          bit_count(col("x.sig_hi").bitwiseXOR(col("y.sig_hi")))).cast("long").as("hamming"))
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

package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Kernel MMD two-sample drift over the embedding column — the
  * distribution-shift monitor the dq_ family was missing for VECTOR
  * features (dq_ks_drift covers scalars, dq_categorical_psi covers
  * categories). Maximum Mean Discrepancy with a random-feature kernel:
  *
  *   z_p(x) = sign(w_p . x) / sqrt(D)   (D = 32 integer hyperplanes)
  *   MMD^2  = || mean_X z - mean_Y z ||^2
  *
  * Random sign features approximate the angular (arccos) kernel, so
  * this is a real kernel two-sample statistic — and because the
  * features are SIGNS of DECIMAL-summed integer projections, the whole
  * statistic reduces to exact integer arithmetic:
  *
  *   MMD^2 = sum_p (Sx_p * ny - Sy_p * nx)^2 / (D * nx^2 * ny^2)
  *
  * with Sx/Sy the +/-1 feature sums — one double division at the end,
  * bit-portable across engines and partitionings.
  *
  * Three splits calibrate each other, the readout a drift dashboard
  * actually alerts on:
  *   - `random_split` (even/odd vec_id): the empirical null,
  *     MMD^2 ~ (1/nx + 1/ny);
  *   - `planted_drift`: odd vectors get a deterministic additive shift
  *     m_d = ((d mod 3) - 1) * 0.08. The shift passes through the
  *     projections linearly, so the drifted sign is
  *     sign(100*s_p + 8*osum_p) with osum_p = SUM_d w_pd*((d mod 3)-1)
  *     an exact integer — no decimal-precision hazards. The monitor
  *     must light this up well clear of the null (measured ~7x);
  *   - `label_shift` (labels 0-4 vs 5-9): a REAL mixture shift that is
  *     deliberately subtle at fixture scale — the honest hard case.
  *
  * Scale: two interchangeable projection paths, bit-identical because
  * every intermediate is exact — [[featExchange]] (explode + codegen'd
  * hash aggregate; the batch query's, measured faster at sf0.1) and
  * [[featAll]] (row-local DECIMAL fold, no exchange; the streaming
  * twin's, which needs the split sums to be the single stateful
  * operator). Either way the statistic's only reduce is 3 x D tiny
  * rows, and sign sums are a commutative monoid — the live monitor
  * ([[graft.streaming.Streams.mmdDriftSums]]) converges to the batch
  * rows under any micro-batch slicing. Reference scope: the reference
  * has no drift monitoring; dq_ additions follow SURVEY §2's
  * data-quality charter.
  */
object DriftMmd {

  /** Widen a BIGINT sum to DECIMAL(19,0) so downstream products run in
    * Spark's exact decimal arithmetic (19,0 × 19,0 → 38,0) instead of
    * wrap-around Long multiplication. */
  private def dec19(c: Column): Column = c.cast(DecimalType(19, 0))

  private val D = 32

  /** Deterministic pseudo-random hyperplane coefficient in [-3, 3] —
    * same LCG family as the LSH planes but an independent seed, so the
    * MMD features are uncorrelated with the ANN bucket structure. */
  private def coefExpr(p: Int, d: Column): Column =
    (lit(1103515245L) * (lit(p) * 64 + d) + 999331L)
      .divide(lit(65536L)).cast("long") % 7 - 3

  private def sqlCoef(p: String, d: String): String =
    s"(((1103515245 * (($p) * 64 + ($d)) + 999331) // 65536) % 7 - 3)"

  /** Drift offsets sum_d w_pd * ((d mod 3) - 1) are data-independent —
    * plan-time constants here (the measured cost of computing them as
    * 32 extra per-vector aggregates was ~1s at sf0.1); the oracle
    * keeps deriving them in SQL, so any transcription slip between the
    * two derivations fails the hash-compare. Positive operands make
    * Long truncation == the SQL floor division. */
  private val offConst: Array[Long] = Array.tabulate(D) { p =>
    (0 until 64).map { dd =>
      val w = ((1103515245L * (p * 64 + dd) + 999331L) / 65536L) % 7L - 3L
      w * ((dd % 3) - 1)
    }.sum
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_mmd_drift",
      Some(s"""
        WITH proj AS (
          SELECT vec_id, label, p,
                 SUM(CAST(embedding[d + 1] AS DECIMAL(18,9))
                     * ${sqlCoef("p", "d")}) AS s
          FROM embeddings, range(0, 64) t(d), range(0, $D) r(p)
          GROUP BY vec_id, label, p),
        off AS (
          SELECT p, SUM(${sqlCoef("p", "d")} * ((d % 3) - 1)) AS osum
          FROM range(0, 64) t(d), range(0, $D) r(p)
          GROUP BY p),
        feat AS (
          SELECT proj.vec_id, proj.label, proj.p,
                 CASE WHEN s >= 0 THEN 1 ELSE -1 END AS z,
                 CASE WHEN s * 100 + 8 * osum >= 0 THEN 1 ELSE -1 END AS zd
          FROM proj JOIN off ON off.p = proj.p),
        splits AS (
          SELECT 'random_split' AS split,
                 CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END AS grp, p, z
          FROM feat
          UNION ALL
          SELECT 'label_shift', CASE WHEN label < 5 THEN 0 ELSE 1 END, p, z
          FROM feat
          UNION ALL
          SELECT 'planted_drift', 0, p, z FROM feat WHERE vec_id % 2 = 0
          UNION ALL
          SELECT 'planted_drift', 1, p, zd FROM feat WHERE vec_id % 2 = 1),
        agg AS (
          SELECT split, p,
                 SUM(CASE WHEN grp = 0 THEN z ELSE 0 END) AS sx,
                 SUM(CASE WHEN grp = 1 THEN z ELSE 0 END) AS sy,
                 SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS nx,
                 SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS ny
          FROM splits GROUP BY split, p)
        SELECT split,
               CAST(MIN(nx) AS BIGINT) AS nx,
               CAST(MIN(ny) AS BIGINT) AS ny,
               CAST($D AS BIGINT) AS n_features,
               CAST(SUM((sx * ny - sy * nx) * (sx * ny - sy * nx)) AS DOUBLE)
                 / ($D.0 * MIN(nx) * MIN(nx) * MIN(ny) * MIN(ny)) AS mmd2
        FROM agg GROUP BY split
        ORDER BY split
      """.trim),
      (s, d) => splitSums(featExchange(embeddings(s, d)))
        .groupBy(col("split"))
        .agg(min(col("nx")).as("nx"), min(col("ny")).as("ny"),
          // DECIMAL interior, not Long: each squared term is bounded by
          // 4n^4, so a LongType sum silently wraps at ~40k+ vectors per
          // split while the DuckDB oracle's SUM promotes to HUGEINT and
          // stays exact — the engines would diverge exactly at scale.
          // Casting the factors to DECIMAL(19,0) makes every product and
          // the running sum land in DECIMAL(38,0): exact to 38 digits,
          // matching the oracle far past any realistic corpus.
          sum((dec19(col("sx")) * dec19(col("ny"))
              - dec19(col("sy")) * dec19(col("nx")))
            * (dec19(col("sx")) * dec19(col("ny"))
              - dec19(col("sy")) * dec19(col("nx")))).as("num"))
        .select(col("split"),
          col("nx").cast("long").as("nx"),
          col("ny").cast("long").as("ny"),
          lit(D.toLong).as("n_features"),
          (col("num").cast("double")
            / (lit(D.toDouble) * col("nx") * col("nx") * col("ny") * col("ny")))
            .as("mmd2"))
        .orderBy(col("split"))))

  /** Batch-path features: explode + one (vec, plane)-keyed CODEGEN'D
    * hash aggregate. Measured faster than [[featAll]]'s row-local
    * decimal fold at sf0.1 (2.3 s vs 3.1 s — higher-order decimal
    * lambdas run interpreted), and exactness makes the two paths
    * bit-identical, which `StreamingMmdSpec` pins. */
  private[graft] def featExchange(emb: DataFrame): DataFrame = {
    val exploded = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("d", "v")))
    val planeSums = exploded.groupBy(col("vec_id"), col("label"))
      .agg(
        sum(col("v").cast(DecimalType(18, 9)) * coefExpr(0, col("d"))).as("s0"),
        (1 until D).map(p =>
          sum(col("v").cast(DecimalType(18, 9)) * coefExpr(p, col("d"))).as(s"s$p")): _*)
    planeSums.select(col("vec_id"), col("label"),
      posexplode(array((0 until D).map(p => struct(
        when(col(s"s$p") >= 0, lit(1L)).otherwise(lit(-1L)).as("z"),
        when(col(s"s$p") * 100 + lit(8L * offConst(p)) >= 0, lit(1L))
          .otherwise(lit(-1L)).as("zd"))): _*)).as(Seq("p", "zz")))
      .select(col("vec_id"), col("label"), col("p"),
        col("zz.z").as("z"), col("zz.zd").as("zd"))
  }

  /** Row-local per-plane sign features: NO exchange — each vector
    * folds its own 64 dims per plane with an exact DECIMAL
    * higher-order aggregate (order-independent because exact). This is
    * the STREAMING path: it leaves the split sums as the single
    * stateful operator (streaming cannot stack the two aggregates the
    * batch path uses). Emits (vec_id, label, p, z, zd). */
  private[graft] def featAll(emb: DataFrame): DataFrame = {
    // term and accumulator types pinned so decimal-precision capping
    // (which would silently round the 9th fraction digit) never fires:
    // (29,9)+(28,9) -> (30,9), cast back exact (|values| << 1e19)
    def planeSum(p: Int) = aggregate(
      transform(sequence(lit(0), lit(63)),
        dd => (element_at(col("embedding"), dd + 1).cast(DecimalType(18, 9))
          * coefExpr(p, dd)).cast(DecimalType(28, 9))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(29, 9)),
      (acc, x) => (acc + x).cast(DecimalType(29, 9)))
    emb.select(col("vec_id"), col("label"),
      posexplode(array((0 until D).map { p =>
        val sp = planeSum(p)
        struct(
          when(sp >= 0, lit(1L)).otherwise(lit(-1L)).as("z"),
          when(sp * 100 + lit(8L * offConst(p)) >= 0, lit(1L))
            .otherwise(lit(-1L)).as("zd"))
      }: _*)).as(Seq("p", "zz")))
      .select(col("vec_id"), col("label"), col("p"),
        col("zz.z").as("z"), col("zz.zd").as("zd"))
  }

  /** The three calibrating splits reduced to per-(split, plane) sign
    * sums — a commutative integer monoid, so a streaming Update-mode
    * aggregate over any micro-batch slicing converges to the batch
    * rows (the streaming twin's contract).
    *
    * ONE pass over `feat`: every split's group assignment is a
    * row-local function of (vec_id, label), so all twelve per-plane
    * sums are conditional aggregates of a single scan, exploded into
    * the 3 split rows afterwards. The previous 4-branch union
    * formulation re-derived `feat` — and with it [[featExchange]]'s
    * 32-wide DECIMAL projection aggregate, the query's dominant stage
    * — once per branch (profiled r13: four ~0.8–2.0 s 32-task stages
    * for one ~2 s of real work) and quadrupled the physical plan,
    * pushing per-stage task binaries to ~1.7 MB. Exact integer sums:
    * the folded form is bit-identical, which the oracle hash-compare
    * and `StreamingMmdSpec` both pin. Streaming shape is unchanged in
    * kind — one Update-mode aggregate (state now keyed by plane alone,
    * 32 rows) followed by a stateless Generate. */
  private[graft] def splitSums(feat: DataFrame): DataFrame = {
    val even = col("vec_id") % 2 === 0
    val lowLbl = col("label") < 5
    val sums = feat.groupBy(col("p")).agg(
      sum(when(even, col("z")).otherwise(lit(0L))).as("rs_sx"),
      sum(when(even, lit(0L)).otherwise(col("z"))).as("rs_sy"),
      sum(when(even, lit(1L)).otherwise(lit(0L))).as("rs_nx"),
      sum(when(even, lit(0L)).otherwise(lit(1L))).as("rs_ny"),
      sum(when(lowLbl, col("z")).otherwise(lit(0L))).as("ls_sx"),
      sum(when(lowLbl, lit(0L)).otherwise(col("z"))).as("ls_sy"),
      sum(when(lowLbl, lit(1L)).otherwise(lit(0L))).as("ls_nx"),
      sum(when(lowLbl, lit(0L)).otherwise(lit(1L))).as("ls_ny"),
      // planted_drift: even rows keep z, odd rows use the drifted sign
      // zd; its nx/ny are the even/odd counts (= rs_nx/rs_ny)
      sum(when(even, lit(0L)).otherwise(col("zd"))).as("pd_sy"))
    sums.select(col("p"), explode(array(
        struct(lit("random_split").as("split"), col("rs_sx").as("sx"),
          col("rs_sy").as("sy"), col("rs_nx").as("nx"), col("rs_ny").as("ny")),
        struct(lit("label_shift").as("split"), col("ls_sx").as("sx"),
          col("ls_sy").as("sy"), col("ls_nx").as("nx"), col("ls_ny").as("ny")),
        struct(lit("planted_drift").as("split"), col("rs_sx").as("sx"),
          col("pd_sy").as("sy"), col("rs_nx").as("nx"), col("rs_ny").as("ny"))))
        .as("r"))
      .select(col("r.split").as("split"), col("p"),
        col("r.sx").as("sx"), col("r.sy").as("sy"),
        col("r.nx").as("nx"), col("r.ny").as("ny"))
  }
}
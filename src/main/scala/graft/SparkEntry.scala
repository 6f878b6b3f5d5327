package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's QueryDef into the flat
  * `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  /** All operator modules; each contributes named queries + oracles. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Relational2.defs ++
      operators.AgentOps.defs ++
      operators.SimpleRag.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Similarity.recallDefs ++
      operators.Similarity.nearDupDefs ++
      operators.TextAnalysis.defs ++
      operators.EventWindows.defs ++
      operators.Multimodal.defs ++
      operators.JoinsExtra.defs ++
      operators.TimeSeries.defs ++
      operators.Pipeline.defs ++
      operators.CommitLogOps.defs ++
      operators.Analytics.defs ++
      operators.Skew.defs ++
      operators.Graph.defs ++
      operators.Sketches.defs ++
      operators.CorpusStats.defs ++
      operators.Trend.defs ++
      operators.Curriculum.defs ++
      operators.Relational3.defs ++
      operators.KnnGraph.defs ++
      operators.Cdc.defs ++
      operators.Changepoint.defs ++
      operators.PrioritySample.defs ++
      operators.Truss.defs ++
      operators.TrendTests.defs ++
      operators.GrowthLag.defs ++
      operators.Spectral.defs ++
      operators.Robust.defs ++
      operators.EvBands.defs ++
      operators.Mixture2.defs ++
      operators.RichClub.defs ++
      operators.Relational4.defs ++
      operators.Experiments.defs ++
      operators.Semdedup.defs ++
      operators.Ppr.defs ++
      operators.Drift.defs ++
      operators.Lm.defs ++
      operators.Acf.defs ++
      operators.Ood.defs ++
      operators.SketchJaccard.defs ++
      operators.DedupAudit.defs ++
      operators.HardNeg.defs ++
      operators.Confusion.defs ++
      operators.QualityRules.defs ++
      operators.Basket.defs ++
      operators.Cuped.defs ++
      operators.Neighborhood.defs ++
      operators.Psi.defs ++
      operators.Dsir.defs ++
      operators.Profile.defs ++
      operators.Power.defs ++
      operators.Prf.defs ++
      operators.Did.defs ++
      operators.RollingDistinct.defs ++
      operators.Pca.defs ++
      operators.Dtw.defs ++
      operators.Relational5.defs ++
      operators.Srm.defs ++
      operators.Ar.defs ++
      operators.Ppl.defs ++
      operators.Textrank.defs ++
      operators.Granger.defs ++
      operators.Expectations.defs ++
      operators.Scd2.defs ++
      operators.Backtest.defs ++
      operators.IntervalJoin.defs ++
      operators.Leakage.defs ++
      operators.MarkovAttribution.defs ++
      operators.MatrixProfile.defs ++
      operators.LateInteraction.defs ++
      operators.Probe.defs ++
      operators.Jl.defs ++
      operators.SeqPatterns.defs ++
      operators.EntityRes.defs ++
      operators.Dbscan.defs ++
      operators.LineDedup.defs ++
      operators.Compaction.defs ++
      operators.RangeSearch.defs ++
      operators.MediaBatch.defs ++
      operators.ActiveLearning.defs ++
      operators.WavMedia.defs ++
      operators.BmpMedia.defs ++
      operators.Privacy.defs ++
      operators.Bitext.defs ++
      operators.Stl.defs ++
      operators.DataLaws.defs ++
      operators.Encoding.defs ++
      operators.Walks.defs ++
      operators.Sequential.defs ++
      operators.HoltWinters.defs ++
      operators.LjungBox.defs ++
      operators.Preference.defs ++
      operators.SnapshotDiff.defs ++
      operators.Pacf.defs ++
      operators.Stress.defs ++
      operators.Uplift.defs ++
      operators.SchemaDrift.defs ++
      operators.Stylometry.defs ++
      operators.Jackknife.defs ++
      operators.Haar.defs ++
      operators.Moments.defs ++
      operators.UnitRoot.defs ++
      operators.Katz.defs ++
      operators.TemporalReach.defs ++
      operators.Kappa.defs ++
      operators.Propensity.defs ++
      operators.Silhouette.defs ++
      operators.Sax.defs ++
      operators.SynthControl.defs ++
      operators.PixelEntropy.defs ++
      operators.Hurst.defs ++
      operators.Qlm.defs ++
      operators.Switchback.defs ++
      operators.WavPitch.defs ++
      operators.Rake.defs ++
      operators.RegDiscontinuity.defs ++
      operators.Sharpness.defs ++
      operators.SubgroupEffects.defs ++
      operators.SpanCorruption.defs ++
      operators.Burstiness.defs ++
      operators.FdCheck.defs ++
      operators.Cointegration.defs ++
      operators.MdePlanner.defs ++
      operators.MotifCensus.defs ++
      operators.AmsSketch.defs ++
      operators.Pareto.defs ++
      operators.Interarrival.defs ++
      operators.Kpss.defs ++
      operators.Elasticity.defs ++
      operators.CategoricalPsi.defs ++
      operators.GoodTuring.defs ++
      operators.OffPolicy.defs ++
      operators.TurningPoints.defs ++
      operators.JsTimeDrift.defs ++
      operators.GoldenRecord.defs ++
      operators.RfmMigration.defs ++
      operators.SeasonalStrength.defs ++
      operators.BlobCount.defs ++
      operators.KmvSketch.defs ++
      operators.NdcgEval.defs ++
      operators.SesSelect.defs ++
      operators.WeibullFit.defs ++
      operators.Rendezvous.defs ++
      operators.DedupCostModel.defs ++
      operators.ControlChart.defs ++
      operators.BloomFpr.defs ++
      operators.Hurdle.defs ++
      operators.Doulion.defs ++
      operators.ClusterPurity.defs ++
      operators.FormatDispatch.defs ++
      operators.Absorption.defs ++
      operators.Streaks.defs ++
      operators.Reconcile.defs ++
      operators.LooValue.defs ++
      operators.IdGaps.defs ++
      operators.Qte.defs ++
      operators.EmWeights.defs ++
      operators.GrowthAccounting.defs ++
      operators.CountSketch.defs ++
      operators.FightinWords.defs ++
      operators.PowerLaw.defs ++
      operators.ClusterStability.defs ++
      operators.BudgetAllocation.defs ++
      operators.Gumbel.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

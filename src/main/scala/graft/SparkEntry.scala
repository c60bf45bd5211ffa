package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.sync.{Reconcile, ReconcileQueries}
import graft.metrics.DashboardQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's registered operators; `oracleSql`
  * carries the DuckDB-equivalent SQL for each (omitted where semantics are
  * not portably SQL-expressible — those are covered by ScalaTest instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reconciliation summary is the reference's headline computation
    * (etl/flows/sync_daily.py:324-436). */
  def entry(spark: SparkSession): DataFrame =
    Reconcile.summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReconcileQueries.queries ++ graft.sync.Ivm.queries ++
      DashboardQueries.queries ++
      graft.expr.ExprQueries.queries ++ graft.pipeline.CaseDocs.queries ++
      graft.ml.TextOps.queries ++ graft.ml.Dedup.queries ++
      graft.ml.Similarity.queries ++ graft.ml.Retrieval.queries ++
      graft.ml.RagFlagship.queries ++
      graft.ml.Curation.queries ++ graft.ml.Multimodal.queries ++
      graft.ml.EntityResolution.queries ++
      graft.pipeline.Enricher.queries ++ graft.operators.Temporal.queries ++
      graft.operators.Graph.queries ++ graft.operators.Layout.queries ++
      graft.streaming.IncrementalSync.queries ++
      graft.pipeline.Lineage.queries ++ graft.pipeline.Takedown.queries ++
      graft.plans.DataQuality.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReconcileQueries.oracles ++ graft.sync.Ivm.oracles ++
      DashboardQueries.oracles ++
      graft.expr.ExprQueries.oracles ++ graft.pipeline.CaseDocs.oracles ++
      graft.ml.TextOps.oracles ++ graft.ml.Dedup.oracles ++
      graft.ml.Similarity.oracles ++ graft.ml.Retrieval.oracles ++
      graft.ml.RagFlagship.oracles ++
      graft.ml.Curation.oracles ++ graft.ml.Multimodal.oracles ++
      graft.ml.EntityResolution.oracles ++
      graft.pipeline.Enricher.oracles ++ graft.operators.Temporal.oracles ++
      graft.operators.Graph.oracles ++ graft.operators.Layout.oracles ++
      graft.streaming.IncrementalSync.oracles ++
      graft.pipeline.Lineage.oracles ++ graft.pipeline.Takedown.oracles ++
      graft.plans.DataQuality.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.QueryPack
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All registered query packs; add a pack per SURVEY §2 category. */
  private val packs: Seq[QueryPack] = Seq(
    qp.AggCore,
    qp.Relational,
    qp.Joins,
    qp.SetOps,
    qp.SortLimit,
    qp.Aggregates,
    qp.Windows,
    qp.Sources,
    qp.Scalars,
    qp.LlmOps,
    qp.Streaming,
    qp.Extensibility,
    qp.Extras,
    qp.Subqueries,
    qp.GraphOps,
    qp.QualityOps,
    qp.TimeSeriesOps,
    qp.StatsOps,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qp.AggCore.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = packs.flatMap(_.names)
    // a cross-pack name collision would silently drop a query AND could
    // pair one pack's oracle with another pack's builder — fail loudly
    require(names.distinct.size == names.size,
      s"duplicate query names across packs: ${names.diff(names.distinct).distinct}")
    packs.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracles).toMap
}

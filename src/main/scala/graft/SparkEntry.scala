package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (names carry the §2 ids: p*, j*, a*, w*, o*, s*, u* — plus training-data
  * ops: d* dedup, n* ANN, t* text, m* multimodal). `oracleSql` holds the
  * DuckDB twin for every SQL-expressible query; sketch/LSH internals that
  * no other engine reproduces are covered by ScalaTest properties instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 spine in its fullest form — the token matrix:
    * scan → conditional latest-by aggregation → windowed-average fallback
    * with the rebase-glitch correction → broadcast joins to supply and
    * holders → valuation → sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    queries("a11_token_matrix")(spark, d)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++
    graft.queries.Anchors.defs ++
    graft.queries.TimeSeries.defs ++
    graft.queries.Pipeline.defs ++
    graft.queries.DomainQueries.defs

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.Anchors.oracles ++
    graft.queries.TimeSeries.oracles ++
    graft.queries.Pipeline.oracles ++
    graft.queries.DomainQueries.oracles
}

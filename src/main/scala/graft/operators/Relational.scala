package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators the reference composes repeatedly.
  * Each helper is a pure DataFrame→DataFrame function over declarative
  * plans, so Catalyst keeps pushdown/pruning/AQE intact.
  */
object Relational {

  /** Keep-latest dedupe: `ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
    * ord DESC) = 1` (reference phase3schema.sql:377-388 W1, `DISTINCT ON`
    * W2, pool_state last-wins compaction S10). `ord` must be a total
    * order within key groups for determinism.
    *
    * Scale note: a single shuffle on `keys`; prefer this over
    * `dropDuplicates` when "which row survives" matters (dropDuplicates
    * keeps an arbitrary row).
    */
  def dedupeKeepLatest(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-value snapshot: one row per key with argMax values — the
    * decorrelated form of the reference's `LEFT JOIN LATERAL (... ORDER BY
    * updated_at DESC LIMIT 1)` (SURVEY J4/J5). Aggregate once, then
    * equi-join; at scale this turns a per-row correlated probe into a
    * single hash aggregate + (usually broadcast) join.
    *
    * @param values (outputName → valueColumn) pairs, each taken at max ord
    */
  def latestSnapshot(df: DataFrame, keys: Seq[String], ord: Column,
                     values: Seq[(String, Column)]): DataFrame = {
    val aggs = values.map { case (n, c) => max_by(c, ord).as(n) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Keyset pagination: `key > lastSeen ORDER BY key LIMIT n`
    * (reference jobs/meta-refresher.js:50-62, SURVEY O3). Unlike
    * OFFSET pagination this stays O(page) at any depth — the filter is
    * pushed to the scan.
    */
  def keysetPage(df: DataFrame, key: String, lastSeen: Long, n: Int): DataFrame =
    df.filter(col(key) > lastSeen).orderBy(col(key)).limit(n)

  /** LIMIT/OFFSET page with a deterministic total order (SURVEY O1).
    * Spark ≥3.4 has DataFrame.offset, pushed into a single TakeOrdered.
    */
  def page(df: DataFrame, order: Seq[Column], limit: Int, offset: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)

  /** Top-k within each key group by an explicit total order (reference
    * top-10 holders, SURVEY O2/A12) — rank-and-filter, one shuffle. The
    * caller supplies the FULL ordering including a unique tiebreak;
    * row_number over a non-total order returns an arbitrary row.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Salted two-stage top-k per group: stage 1 takes the per-(key, salt)
    * top-k so a hot key's sort fans out across `saltBuckets` tasks;
    * stage 2 re-ranks only the k·saltBuckets survivors. Exact for any
    * row-level total order (the global top-k is a subset of the union of
    * per-bucket top-ks); `ord` must end in a unique tiebreak, same
    * contract as the window form.
    *
    * MEASURED VERDICT (SCALING.json skew_topk pair, 50%-hot-key frame):
    * on this Spark the salted form LOSES at every scale (3.16 s vs
    * 2.14 s naive at 30×), because the optimizer already inserts a
    * map-side partial WindowGroupLimit below the shuffle for
    * row_number ≤ k filters — each map partition forwards at most k
    * rows per group, which is exactly the fan-out this operator builds
    * by hand, minus the extra shuffle. [[topKPerGroup]] is therefore
    * the recommended form; this variant is the documented fallback for
    * window patterns the WindowGroupLimit rewrite doesn't cover (the
    * plan shape that carries the conclusion is pinned in SkewSpec — if
    * that pin breaks, this operator is the mitigation again). Skew
    * mitigation that DOES pay on this engine: AQE skew-join
    * (skew_join_naive 4.28 s vs skew_join_aqe 1.24 s at 30×) and
    * [[saltedAggregate]] for non-partial-aggregable state.
    */
  def topKPerGroupSalted(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                         k: Int, saltBuckets: Int): DataFrame = {
    // salt from ROW CONTENT, never monotonically_increasing_id: a
    // non-deterministic salt feeding a shuffle breaks under map-stage
    // retries (recomputed rows land in different buckets than the
    // copies surviving reducers already fetched — rows dropped or
    // doubled). Identical rows sharing a bucket is harmless here.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    val w1 = Window.partitionBy((keys.map(col) :+ col("__salt")): _*)
      .orderBy(ord: _*)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn", "__salt")
    topKPerGroup(survivors, keys, ord, k)
  }

  /** Skew-safe aggregation: two-stage (salted partial → final) groupBy for
    * hot keys. At 100 TB a handful of keys (the main pool, the router
    * signer) can hold a large share of rows; a single groupBy funnels each
    * hot key through one reducer. Stage 1 groups on (keys, salt) — hot
    * keys fan out across `saltBuckets` reducers; stage 2 merges the
    * partials. Works for any algebraic aggregate given its merge form
    * (sum/count/min/max here). AQE's skew-join handling covers joins; this
    * is the aggregation-side counterpart.
    *
    * @param partials  (outputName, rowLevelExpr, mergeOf(name)) triples:
    *                  e.g. ("n", count(*), sum) / ("hi", max(x), max)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partials: Seq[(String, Column, Column => Column)])
      : DataFrame = {
    // content-derived salt (see topKPerGroupSalted): deterministic
    // under map-stage retries; identical rows sharing a bucket only
    // shifts partial sizes, never values
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, e, _) => e.as(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, _, m) => m(col(n)).as(n) }: _*)
  }

  /** Multi-key OR resolution: rank candidate matches by match quality and
    * keep the best (reference api/util/resolve-token.js:10-28, SURVEY P6).
    * `ranked` maps each predicate to its priority (lower wins).
    */
  def resolveFirst(df: DataFrame, ranked: Seq[(Column, Int)], tiebreak: Column): DataFrame = {
    val score = ranked.foldRight(lit(Int.MaxValue)) { case ((pred, r), acc) =>
      when(pred, r).otherwise(acc)
    }
    df.filter(ranked.map(_._1).reduce(_ || _))
      .withColumn("__score", score)
      .orderBy(col("__score"), tiebreak)
      .limit(1)
      .drop("__score")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Core._
import graft.functions.Text

/** The per-(source, lang) dataset card — the release report a corpus
  * ships beside the data — in BOTH execution forms:
  *
  *   - batch: [[card]] over the whole documents table (the t24 oracle
  *     query delegates here), and
  *   - streaming: [[counterSlice]]/[[histSlice]]/[[fpSlice]] per
  *     micro-batch (written by `Streams.cardMaintenance`) + [[serve]]
  *     folding the accumulated slices into the IDENTICAL output.
  *
  * The streaming state is three additive artifacts, chosen so the serve
  * fold needs no raw-document re-scan and the card stays EXACT, not
  * approximate:
  *
  *   - counters (source, lang, n_docs, sum_q4, gate_pass): quality sums
  *     are kept as integer 1e-4 units (`sum_q4`). The quality signal is
  *     round4'd, so q·10⁴ rounds to an exact integer; the serve-side
  *     `decimal(sum_q4)/10⁴ → double / n` reproduces bit-for-bit the
  *     batch `davg` (exact decimal sum cast double, divided by count) —
  *     summing raw doubles instead would drift with addition order.
  *   - hist (source, lang, wc, dn): the word-count histogram. Word
  *     counts are small integers, so the histogram is bounded by the
  *     distinct-wc range regardless of corpus size, and total/max/exact
  *     MEDIAN all fold from it (cumulative counts over the wc order) —
  *     this is what lets a streaming card keep an exact median without
  *     retaining per-doc rows.
  *   - fp (fp, source, lang, dn): per-group fingerprint counts.
  *     Duplicate exposure needs the CORPUS-WIDE count per fingerprint
  *     (a doc in group g is dup-exposed if its fp occurs >1× anywhere),
  *     so the slice keeps the (fp, group) breakdown and serve re-sums
  *     across groups and batches.
  *
  * Every slice derives from its micro-batch alone (no read of prior
  * state), so batches cannot interfere with their own writes and the
  * per-batch `batch=<id>` overwrite makes checkpoint retries
  * exactly-once — the neardupIngest pattern without the staging step.
  */
object CorpusCard {

  /** Per-doc signal projection shared by the batch and streaming paths:
    * whitespace word count, the t3/t8 quality score, and the d1 exact
    * fingerprint (md5 of whitespace-normalized lowercased text).
    */
  def signals(docs: DataFrame): DataFrame = {
    // total over NULL text (treated as empty): without the coalesce a
    // null doc yields wc = -1 (legacy size(null)), null quality, and a
    // null fingerprint — batch card, DuckDB twin, and serve() would
    // each resolve those differently (the twin's fp inner join drops
    // the row; serve's n_docs disagrees with davg's count(quality))
    val t = coalesce(col("text"), lit(""))
    docs.select(col("doc_id"), col("source"), col("lang"),
      size(Text.words(t)).cast("long").as("wc"),
      Text.qualityScore(t).as("quality"),
      md5(Text.normalize(t)).as("fp"))
  }

  /** The batch card over a signal frame ([[signals]]). Exact median via
    * partitioned row_number ranks (middle two averaged in double) — NOT
    * `percentile`, whose per-group value buffer is O(group) memory.
    */
  def card(base: DataFrame): DataFrame = {
    val agg = base
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("wc")).as("total_tokens"),
        round4(davg(col("quality"))).as("avg_quality"),
        count_if(col("quality") >= 40d).as("gate_pass"),
        max(col("wc")).as("max_wc"))
    val fpCounts = base.groupBy(col("fp")).agg(count(lit(1)).as("n_fp"))
    val dup = base.join(fpCounts, "fp")
      .groupBy(col("source"), col("lang"))
      .agg(count_if(col("n_fp") > 1L).as("dup_docs"))
    val part = Window.partitionBy(col("source"), col("lang"))
    val median = base
      .withColumn("rn",
        row_number().over(part.orderBy(col("wc"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(part))
      // `div`, not `/`: Column `/` is true (double) division, and the
      // rank equality would silently miss every even-sized group
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(n + 2) div 2"))
      .groupBy(col("source"), col("lang"))
      .agg(avg(col("wc")).as("median_wc"))
    agg.join(dup, Seq("source", "lang"))
      .join(median, Seq("source", "lang"))
      .select(col("source"), col("lang"), col("n_docs"),
        col("total_tokens"), col("avg_quality"), col("gate_pass"),
        col("dup_docs"), col("max_wc"), col("median_wc"))
  }

  /** quality → integer 1e-4 units. quality is round4 output, so
    * quality·10⁴ sits within 1 ulp of an integer; round() recovers it
    * exactly. Truncation (a bare cast) would lose 1 unit whenever the
    * nearest double is below the rational value.
    */
  private def q4: Column = round(col("quality") * 10000d).cast("long")

  def counterSlice(base: DataFrame): DataFrame =
    base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(q4).as("sum_q4"),
        count_if(col("quality") >= 40d).as("gate_pass"))

  def histSlice(base: DataFrame): DataFrame =
    base.groupBy(col("source"), col("lang"), col("wc"))
      .agg(count(lit(1)).as("dn"))

  def fpSlice(base: DataFrame): DataFrame =
    base.groupBy(col("fp"), col("source"), col("lang"))
      .agg(count(lit(1)).as("dn"))

  private def readOr(spark: SparkSession, path: String, schema: String)
      : DataFrame = graft.Tables.readOrEmpty(spark, path, schema)

  /** Compact the accumulated micro-batch slices: fold each artifact's
    * additive rows into ONE batch partition, leaving [[serve]]'s output
    * bit-identical (the slices are sums; summing them is associative).
    * A long-running cardMaintenance stream accumulates one small file
    * set per micro-batch — thousands of batch=<id> dirs whose open/seek
    * cost eventually dominates the serve fold; compaction is the
    * operational complement, same motive as Sinks.compactSmallFiles.
    *
    * Crash safety (the compactBucketed rename-aside discipline): the
    * folded artifact is written BESIDE the live dir, the live dir is
    * renamed aside, the folded one renamed in, and only then is the
    * aside dropped — at every crash point either the old slices or the
    * folded copy exist under a recoverable name, never neither. The
    * stream must be STOPPED while compacting: the folded partition is
    * `batch=<maxSeenId>`, so a later restart with the SAME checkpoint
    * continues appending fresh batch ids above it, while a retry of the
    * last pre-compaction batch would overwrite the folded partition —
    * stop at a trigger boundary (AvailableNow drains) before calling.
    */
  def compactSlices(spark: SparkSession, indexDir: String): Unit = {
    // swap mechanics live in graft.streaming.Compaction (shared with the
    // ANN/SQ8/postings compactors); only the additive folds are ours
    def fold(sub: String, schema: String, keys: Seq[String],
             sums: Seq[String]): Unit =
      graft.streaming.Compaction.swapFolded(spark, s"$indexDir/$sub",
        schema, df => df.groupBy(keys.map(col): _*)
          .agg(sum(col(sums.head)).as(sums.head),
            sums.tail.map(c => sum(col(c)).as(c)): _*))
    fold("counters",
      "source STRING, lang STRING, n_docs BIGINT, sum_q4 BIGINT, " +
        "gate_pass BIGINT",
      Seq("source", "lang"), Seq("n_docs", "sum_q4", "gate_pass"))
    fold("hist", "source STRING, lang STRING, wc BIGINT, dn BIGINT",
      Seq("source", "lang", "wc"), Seq("dn"))
    fold("fp", "fp STRING, source STRING, lang STRING, dn BIGINT",
      Seq("fp", "source", "lang"), Seq("dn"))
  }

  /** Fold the accumulated slices into the batch card's exact output.
    *
    * Median from the histogram: with per-group cumulative counts over
    * the wc order, the rank-r value is the smallest wc whose cumulative
    * count reaches r; the batch card's avg-of-two-middle-rows equals
    * (v(r1)+v(r2))/2 because ranks within one wc bucket all carry that
    * bucket's value. All divisions happen once, in double, in the same
    * operation order as the batch side.
    */
  def serve(spark: SparkSession, indexDir: String): DataFrame = {
    val counters = readOr(spark, s"$indexDir/counters",
      "source STRING, lang STRING, n_docs BIGINT, sum_q4 BIGINT, " +
        "gate_pass BIGINT")
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_q4")).as("sum_q4"),
        sum(col("gate_pass")).as("gate_pass"))
    val hist = readOr(spark, s"$indexDir/hist",
      "source STRING, lang STRING, wc BIGINT, dn BIGINT")
      .groupBy(col("source"), col("lang"), col("wc"))
      .agg(sum(col("dn")).as("dn"))
    val fp = readOr(spark, s"$indexDir/fp",
      "fp STRING, source STRING, lang STRING, dn BIGINT")
    val fpTot = fp.groupBy(col("fp"))
      .agg(sum(col("dn")).as("ctot"))
    val dup = fp.groupBy(col("fp"), col("source"), col("lang"))
      .agg(sum(col("dn")).as("dgrp"))
      .join(fpTot.filter(col("ctot") > 1L), "fp")
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("dgrp")).as("dup_docs"))
    val part = Window.partitionBy(col("source"), col("lang"))
    val cum = hist
      .withColumn("cum", sum(col("dn")).over(part.orderBy(col("wc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("dn")).over(part))
    def rankValue(rank: Column): Column =
      min(when(col("cum") >= rank, col("wc")))
    val median = cum
      .groupBy(col("source"), col("lang"))
      .agg(((rankValue(expr("(n + 1) div 2")) +
        rankValue(expr("(n + 2) div 2"))) / lit(2.0d)).as("median_wc"))
    val volume = hist.groupBy(col("source"), col("lang"))
      .agg(sum(col("wc") * col("dn")).as("total_tokens"),
        max(col("wc")).as("max_wc"))
    counters
      .join(volume, Seq("source", "lang"))
      .join(dup, Seq("source", "lang"), "left_outer")
      .join(median, Seq("source", "lang"))
      .select(col("source"), col("lang"), col("n_docs"),
        col("total_tokens"),
        // dividing by n_docs equals the batch davg's count(quality)
        // BECAUSE signals() makes quality total (never null)
        round4((col("sum_q4").cast(org.apache.spark.sql.types
          .DecimalType(38, 6)) / lit(10000)).cast("double") /
          col("n_docs")).as("avg_quality"),
        col("gate_pass"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        col("max_wc"), col("median_wc"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the merge-learning loop every LLM corpus
  * build runs before packing (Sennrich et al. 2016; the reference has no
  * tokenizer, this is builder-brief scope: "token counting (whitespace +
  * a BPE-ish regex)" extended to the training side).
  *
  * Classic formulation: train on the WORD-FREQUENCY table, not the raw
  * corpus — the corpus collapses to (word, freq) once (one shuffled
  * aggregate over the documents, the same vocab aggregate t13/t20 pay),
  * and every subsequent pass is over the vocabulary, which is bounded
  * (≤ a few million rows at 100 TB) and independent of corpus row count.
  * Each word starts as its character sequence plus an explicit `</w>`
  * end-of-word marker; each merge step counts adjacent symbol pairs
  * weighted by word frequency (one vocab-sized aggregate), picks the
  * most frequent pair under the (count desc, left, right) total order,
  * and rewrites every word's symbol sequence.
  *
  * Determinism deviations from the reference algorithm, both pinned by
  * the DuckDB oracle:
  *   - self-pairs (left == right) are excluded from merge candidates.
  *     With left ≠ right, two matches can never overlap (a match at i
  *     and i+1 would force left = right), so the rewrite is a pure
  *     per-position map — no leftmost-greedy tie chain, no sequential
  *     scan, identical in any engine. Self-pair merges ("aa") need the
  *     run-parity rule real tokenizers special-case anyway.
  *   - ties break on (left, right) binary string order, not insertion
  *     order.
  *
  * Scale shape: the driver loop runs `k` times (k is small); each
  * iteration is one vocab aggregate + one one-row argmax. The argmax and
  * the per-step symbol-count summary are localCheckpoint'd one-row
  * frames (kmeansCentroids precedent) so iteration i never re-executes
  * iteration j's aggregates. The symbol rewrite is a map-side
  * transform/filter over the vocab's symbol arrays — higher-order
  * lambdas are interpreted, which is fine OFF the corpus path (vocab
  * rows, short arrays). Nothing corpus-scale is collected or broadcast;
  * the only broadcasts are one-row frames.
  */
object Tokenize {

  /** Character-split with the `</w>` terminator, position-based (not
    * split("") — its trailing-empty semantics differ across engines).
    */
  private val initSyms =
    expr("""concat(transform(sequence(1, length(word)),
             i -> substring(word, i, 1)), array('</w>'))""")

  /** Adjacent-pair extraction: (l, r) per position, weighted later by
    * freq. arrays_zip over two slices — codegen'd, no HOF lambda on the
    * pair-count path (the per-iteration hot aggregate).
    */
  private def pairs(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("r")))
        .as("z"))
      .select(col("z.l").as("l"), col("z.r").as("r"), col("freq"))
      .filter(col("l") =!= col("r"))
      .groupBy(col("l"), col("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Rewrite every symbol sequence for merge (l, r): position i emits
    * the merged symbol when (s[i], s[i+1]) = (l, r), is consumed when
    * (s[i-1], s[i]) = (l, r), and passes through otherwise. With l ≠ r
    * the two conditions are exclusive, so this per-position map IS
    * greedy non-overlapping application.
    */
  private val applyMerge =
    expr("""filter(transform(sequence(1, size(syms)), i ->
        CASE WHEN i < size(syms) AND element_at(syms, i) = l
                  AND element_at(syms, i + 1) = r
               THEN concat(l, r)
             WHEN i > 1 AND element_at(syms, i - 1) = l
                  AND element_at(syms, i) = r
               THEN CAST(NULL AS STRING)
             ELSE element_at(syms, i) END),
      x -> x IS NOT NULL)""")

  /** Word-frequency table from a document corpus: the ONE corpus-scale
    * pass. Empty tokens (an empty/whitespace-only doc normalizes to one
    * "" token) are dropped — they have no characters to merge.
    */
  def wordFreq(docs: DataFrame): DataFrame = docs
    .select(explode(graft.functions.Text.words(col("text"))).as("word"))
    .filter(length(col("word")) > 0)
    .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `k` BPE merges. Returns one row per step:
    * (step, left, right, merged, pair_count, n_syms_after) where
    * n_syms_after = Σ freq·|syms| AFTER applying that step's merge —
    * a corpus-level checksum of the rewrite itself, so an oracle
    * verifying these rows verifies every intermediate application, not
    * just the pair argmaxes.
    */
  def bpeMerges(docs: DataFrame, k: Int): DataFrame = {
    // materialize the corpus aggregate ONCE — each iteration's pair
    // count and summary otherwise re-run the corpus-scale wordFreq
    var words = wordFreq(docs).withColumn("syms", initSyms)
      .localCheckpoint(true)
    var steps = Vector.empty[DataFrame]
    for (step <- 1 to k) {
      val best = pairs(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint(true) // one row; stops iteration-plan nesting
      words = words.crossJoin(broadcast(best))
        .withColumn("syms", applyMerge)
        .select(col("word"), col("freq"), col("syms"))
      val summary = words
        .agg(sum(col("freq") * size(col("syms"))).as("n_syms_after"))
      steps = steps :+ best.crossJoin(summary)
        .select(lit(step.toLong).as("step"), col("l").as("left"),
          col("r").as("right"), concat(col("l"), col("r")).as("merged"),
          col("cnt").as("pair_count"), col("n_syms_after"))
        .localCheckpoint(true) // ditto — and each step executes ONCE
    }
    steps.reduce(_.union(_))
  }

  /** The trained segmentation: every vocab word's symbol sequence after
    * the `k` merges — what a downstream encoder ships. Re-runs the same
    * deterministic loop (merge steps are cheap; callers wanting both
    * artifacts in one pass would persist `words` per step).
    */
  def bpeSegmentation(docs: DataFrame, k: Int): DataFrame = {
    var words = wordFreq(docs).withColumn("syms", initSyms)
      .localCheckpoint(true)
    for (_ <- 1 to k) {
      val best = pairs(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint(true)
      words = words.crossJoin(broadcast(best))
        .withColumn("syms", applyMerge)
        .select(col("word"), col("freq"), col("syms"))
    }
    words.select(col("word"), col("freq"), col("syms"),
      size(col("syms")).cast("long").as("n_syms"))
  }
}

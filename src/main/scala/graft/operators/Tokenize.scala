package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * iteration is one vocab-sized aggregate whose ONE-ROW argmax is
  * collected to the driver — the merge pair IS the trained artifact, so
  * this is the bounded-collect class (the kmeans dimension probe, T7's
  * new-key batch), not a corpus collect. The winning pair is then
  * applied as LITERAL arguments in a map-side transform/filter over the
  * vocab's symbol arrays — no join of any kind enters the plan
  * (PlanLintSpec stays clean by construction). Higher-order lambdas are
  * interpreted, which is fine OFF the corpus path (vocab rows, short
  * arrays). The word table is localCheckpoint'd once so iterations never
  * re-run the corpus pass.
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
    * greedy non-overlapping application. l and r are literals (the
    * driver-collected argmax), so the plan stays join-free.
    */
  private def applyMerge(l: String, r: String): Column = {
    val s = col("syms")
    filter(
      transform(sequence(lit(1), size(s)), i =>
        when(i < size(s) && element_at(s, i) === lit(l)
            && element_at(s, i + 1) === lit(r), lit(l + r))
          .when(i > lit(1) && element_at(s, i - 1) === lit(l)
            && element_at(s, i) === lit(r), lit(null).cast("string"))
          .otherwise(element_at(s, i))),
      x => x.isNotNull)
  }

  /** Word-frequency table from a document corpus: the ONE corpus-scale
    * pass. Empty tokens (an empty/whitespace-only doc normalizes to one
    * "" token) are dropped — they have no characters to merge.
    */
  def wordFreq(docs: DataFrame): DataFrame = docs
    .select(explode(graft.functions.Text.words(col("text"))).as("word"))
    .filter(length(col("word")) > 0)
    .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** One merge step: (left, right, pair_count, n_syms_after, rewritten
    * words) — or None when no mergeable pair remains (exhausted or empty
    * vocab), at which point training stops early.
    */
  private def step(words: DataFrame, before: Long)
      : Option[(String, String, Long, Long, DataFrame)] = {
    val top = pairs(words)
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .limit(1).collect()
    if (top.isEmpty) None
    else {
      val (l, r, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      // checkpoint each rewrite (kmeansCentroids precedent): without it
      // iteration i replays all i−1 interpreted rewrites per action —
      // O(k²) recompute and unbounded expression nesting for large k
      val next = words.withColumn("syms", applyMerge(l, r))
        .localCheckpoint(true)
      // n_syms_after arithmetically (r16): with l ≠ r matches never
      // overlap, so EVERY counted (l, r) position merges and each merge
      // removes exactly one symbol — after = before − pair_count. The
      // retired Σ freq·|syms| aggregate re-scanned the vocab once per
      // step for a number the argmax already knows; trainLocal computes
      // the same value incrementally and TokenizeSpec pins the two
      // trainers equal, so a drift here fails the suite (and the t27
      // oracle re-derives every intermediate in SQL).
      Some((l, r, cnt, before - cnt, next))
    }
  }

  /** The shared training loop: k merge steps (early-stopped when no
    * mergeable pair remains) returning BOTH artifacts — the merge rows
    * and the rewritten vocabulary — so [[bpeMerges]] and
    * [[bpeSegmentation]] cannot drift and neither pays the corpus pass
    * twice.
    */
  private def train(docs: DataFrame, k: Int)
      : (Vector[(Long, String, String, String, Long, Long)], DataFrame) =
    trainFromVocab(wordFreq(docs), k)

  /** [[train]] from an already-aggregated (word, freq) vocabulary —
    * the entry the streamed word-count slices fold into
    * (Streams.bpeVocabMaintenance + [[serveMerges]]): word counts are
    * additive under any corpus split, so training on the folded vocab
    * is bit-identical to training on the batch corpus.
    */
  private def trainFromVocab(vocab: DataFrame, k: Int)
      : (Vector[(Long, String, String, String, Long, Long)], DataFrame) = {
    var words = vocab.withColumn("syms", initSyms)
      .localCheckpoint(true)
    // one initial Σ freq·|syms| — each step then derives its
    // n_syms_after arithmetically (see step()); sum over an EMPTY vocab
    // is null (the streamed serve path can fold zero slices)
    val symsRow = words.agg(sum(col("freq") * size(col("syms")))).head()
    var syms = if (symsRow.isNullAt(0)) 0L else symsRow.getLong(0)
    var rows = Vector.empty[(Long, String, String, String, Long, Long)]
    var n = 1
    var more = true
    while (n <= k && more) step(words, syms) match {
      case Some((l, r, cnt, after, next)) =>
        rows = rows :+ ((n.toLong, l, r, l + r, cnt, after))
        words = next; syms = after; n += 1
      case None => more = false
    }
    (rows, words)
  }

  /** Fold the word-count slices a streamed Streams.bpeVocabMaintenance
    * run accumulated under `indexDir` and train `k` merges on the
    * folded vocabulary — the merge table equals [[bpeMerges]] over the
    * ingested corpus exactly (StreamingSpec pins it): the model state
    * is just (word, freq), additive per micro-batch, so the tokenizer
    * retrains from counts without ever re-reading the corpus.
    */
  def serveMerges(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String, k: Int): DataFrame = {
    import spark.implicits._
    val vocab = graft.Tables.readOrEmpty(spark, s"$indexDir/vocab",
      "word STRING, freq BIGINT")
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
    trainFromVocab(vocab, k)._1.toDF("step", "left", "right", "merged",
      "pair_count", "n_syms_after")
  }

  /** Learn `k` BPE merges. Returns one row per step:
    * (step, left, right, merged, pair_count, n_syms_after) where
    * n_syms_after = Σ freq·|syms| AFTER applying that step's merge —
    * a corpus-level checksum of the rewrite itself, so an oracle
    * verifying these rows verifies every intermediate application, not
    * just the pair argmaxes.
    */
  def bpeMerges(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, k)._1.toDF("step", "left", "right", "merged",
      "pair_count", "n_syms_after")
  }

  /** The trained segmentation: every vocab word's symbol sequence after
    * the `k` merges — what a downstream encoder ships. Shares [[train]]
    * with [[bpeMerges]] (one loop, both artifacts).
    */
  def bpeSegmentation(docs: DataFrame, k: Int): DataFrame =
    train(docs, k)._2.select(col("word"), col("freq"), col("syms"),
      size(col("syms")).cast("long").as("n_syms"))

  // -------------------------------------------------------------------
  // Production trainer (r12 verdict #5): the distributed loop above runs
  // ~3 serial Spark jobs per merge step — exact and oracle-verifiable,
  // but a 32k-vocab training run would pay ~100k driver round-trips.
  // The production path collects the FREQUENCY-FLOORED (word, freq)
  // table once — the bounded-collect class: a natural-language vocab at
  // minFreq ≥ 2 is tens-of-millions of rows at 100 TB, and the cap
  // fails loudly rather than truncating — and runs the merge loop
  // in-process with an incremental pair index. [[bpeMerges]] stays as
  // the distributed cross-check (TokenizeSpec pins local ≡ distributed
  // ≡ the plain-Scala reference on dense-tie corpora and the fixture).
  // -------------------------------------------------------------------

  /** UTF-8 binary string comparison — Spark's UTF8String order, so the
    * local trainer's (cnt desc, l, r) tie-breaks match [[bpeMerges]]'s
    * orderBy exactly even off-ASCII (Java String order diverges from
    * code-point order on supplementary chars).
    */
  private def u8cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Code-point split + `</w>` terminator — the local twin of
    * [[initSyms]] (Spark's substring counts code points, not UTF-16
    * units, so the split must too).
    */
  private def initSymsLocal(w: String): Array[String] = {
    val cps = w.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i))); i += 1
    }
    out(cps.length) = "</w>"
    out
  }

  /** Greedy left-to-right merge application — with l ≠ r this equals
    * the engine's per-position map (the TokenizeSpec non-overlap
    * argument, executed).
    */
  private def applyLocal(s: Array[String], l: String, r: String)
      : Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** The in-process merge loop over a collected vocabulary. Maintains
    * the global pair-count map and a pair → word-index occurrence index
    * incrementally, so each step rewrites ONLY the words containing the
    * winning pair (stale index entries are filtered on use). Argmax is
    * a scan of the pair map under (cnt desc, l, r) with UTF-8 order —
    * O(k · |distinct pairs|), seconds at a 32k vocab. Deterministic
    * under ANY input order: counts are commutative sums and the argmax
    * is a total order, so the executor-order-dependent collect cannot
    * change the result.
    */
  private[graft] def trainLocal(vocab: Iterable[(String, Long)], k: Int)
      : Vector[(Long, String, String, String, Long, Long)] = {
    import scala.collection.mutable
    val words = mutable.ArrayBuffer[Array[String]]()
    val freqs = mutable.ArrayBuffer[Long]()
    vocab.foreach { case (w, f) =>
      if (w.nonEmpty) { words += initSymsLocal(w); freqs += f }
    }
    var totalSyms = 0L
    var wi = 0
    while (wi < words.length) {
      totalSyms += freqs(wi) * words(wi).length; wi += 1
    }
    val counts = mutable.HashMap[(String, String), Long]()
    val occurs = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def indexWord(idx: Int, sign: Long): Unit = {
      val s = words(idx); val f = freqs(idx)
      var i = 0
      while (i + 1 < s.length) {
        if (s(i) != s(i + 1)) { // self-pairs excluded, same as pairs()
          val p = (s(i), s(i + 1))
          val c = counts.getOrElse(p, 0L) + sign * f
          if (c == 0L) counts.remove(p) else counts(p) = c
          if (sign > 0L)
            occurs.getOrElseUpdate(p, mutable.Set[Int]()) += idx
        }
        i += 1
      }
    }
    wi = 0
    while (wi < words.length) { indexWord(wi, 1L); wi += 1 }

    var rows = Vector.empty[(Long, String, String, String, Long, Long)]
    var n = 1
    while (n <= k && counts.nonEmpty) {
      var bl: String = null; var br: String = null; var bc = -1L
      counts.foreach { case ((l, r), c) =>
        val wins = c > bc || (c == bc && {
          val dl = u8cmp(l, bl)
          dl < 0 || (dl == 0 && u8cmp(r, br) < 0)
        })
        if (wins) { bl = l; br = r; bc = c }
      }
      val hit = occurs.remove((bl, br)).map(_.toArray)
        .getOrElse(Array.empty[Int])
      hit.foreach { idx =>
        val s = words(idx)
        var has = false
        var i = 0
        while (!has && i + 1 < s.length) {
          has = s(i) == bl && s(i + 1) == br; i += 1
        }
        if (has) { // stale index entries skip here
          indexWord(idx, -1L)
          val ns = applyLocal(s, bl, br)
          totalSyms -= freqs(idx) * (s.length - ns.length)
          words(idx) = ns
          indexWord(idx, 1L)
        }
      }
      rows = rows :+ ((n.toLong, bl, br, bl + br, bc, totalSyms))
      n += 1
    }
    rows
  }

  /** [[serveMerges]] through the PRODUCTION trainer: fold the streamed
    * word-count slices, collect the frequency-floored vocab, train
    * in-process. Same folded counts → same merges as the distributed
    * serve path (TokenizeSpec pins it); this is what a deployment's
    * retrain tick runs at a real vocab size.
    */
  def serveMergesLocal(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, k: Int, minFreq: Long = 1L,
                       maxVocab: Int = 1 << 23): DataFrame = {
    import spark.implicits._
    val vocab = boundedCollect(
      graft.Tables.readOrEmpty(spark, s"$indexDir/vocab",
        "word STRING, freq BIGINT")
        .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
        .filter(col("freq") >= minFreq)
        .as[(String, Long)], maxVocab)
    trainLocal(vocab, k).toDF("step", "left", "right", "merged",
      "pair_count", "n_syms_after")
  }

  /** Driver-side vocab materialization with the loud-failure guard
    * BEFORE the collect can OOM: `limit(maxVocab + 1)` bounds what ever
    * reaches the driver, and one overflow row proves the floored vocab
    * exceeds the cap — fail with the remedy instead of truncating (a
    * truncated vocab trains a different tokenizer; raise `minFreq`,
    * which is what real tokenizer builds do at corpus scale).
    */
  private def boundedCollect(
      vocab: org.apache.spark.sql.Dataset[(String, Long)],
      maxVocab: Int): Array[(String, Long)] = {
    val got = vocab.limit(maxVocab + 1).collect()
    require(got.length <= maxVocab,
      s"floored vocab exceeds maxVocab $maxVocab — raise minFreq")
    got
  }

  /** Learn `k` BPE merges on the driver from the frequency-floored
    * vocabulary — the production trainer. Output schema and values are
    * IDENTICAL to [[bpeMerges]] at minFreq = 1 (TokenizeSpec pins it);
    * the t27 DuckDB oracle verifies this entry the same way. `maxVocab`
    * fails loudly instead of silently truncating — a truncated vocab
    * trains a different tokenizer; raise `minFreq` instead (hapax
    * flooring is what real tokenizer builds do at corpus scale).
    */
  def bpeMergesLocal(docs: DataFrame, k: Int, minFreq: Long = 1L,
                     maxVocab: Int = 1 << 23): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = boundedCollect(
      wordFreq(docs).filter(col("freq") >= minFreq)
        .select(col("word"), col("freq")).as[(String, Long)], maxVocab)
    trainLocal(vocab, k).toDF("step", "left", "right", "merged",
      "pair_count", "n_syms_after")
  }

  /** Corpus encoding under the trained tokenizer: per-doc BPE token
    * counts — the "how many tokens is this corpus" number every training
    * budget starts from, and the closed loop train → apply. Encoding is
    * a VOCAB LOOKUP (doc words ⋈ segmentation), not a re-run of the
    * merge rewrites per document: the segmentation table is vocab-sized,
    * so the join is one corpus-scale shuffle (or a broadcast when the
    * vocab fits — AQE decides), the same shape as t20's token join.
    */
  def bpeEncode(docs: DataFrame, k: Int): DataFrame = {
    val seg = bpeSegmentation(docs, k).select(col("word"), col("n_syms"))
    docs.select(col("doc_id"),
        explode(graft.functions.Text.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        graft.functions.Core.round4(
          col("n_bpe_tokens").cast("double") / col("n_words"))
          .as("tokens_per_word"))
  }
}

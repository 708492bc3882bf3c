package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Core.{round4, round6, spreadPartitions}
import graft.functions.Text

/** Full-text retrieval over the corpus — the RAG-serving counterpart of
  * the chunking/indexing ops (t21 cuts documents into embed/index units;
  * this ranks whole documents for a term query). The reference's nearest
  * shape is the multi-key token lookup (api/util/resolve-token.js:10-28:
  * denom/symbol/name matched case-insensitively, tie-broken by match
  * quality) — lookup, not ranking; a training-data engine (per the
  * builder brief) additionally needs relevance-ranked retrieval,
  * so the scorer is BM25 (Robertson et al.) with two deliberate,
  * engine-exactness-preserving substitutions, both following the t15/t20
  * precedent of never letting a libm call into a hash-compared value:
  *
  *   - idf uses the exact RATIONAL Robertson form without the log:
  *     (N - df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1) — integers on
  *     both sides of one IEEE division. The log is monotone, so per-term
  *     ordering is unchanged; cross-term weighting shifts toward rarer
  *     terms, which is the documented trade for a bit-stable score.
  *   - the saturation term with k1 = 6/5, b = 3/4 is reduced to integer
  *     factors normalized by L:
  *       tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/L))
  *         = 44·tf / (20·tf + 6 + 18·dl·N/L)
  *     (L = Σ dl, N = doc count) — every integer product Int64-safe at
  *     corpus scale (see scoreCol), combined by a FIXED-ORDER chain of
  *     exactly-rounded IEEE ops.
  *
  * Each per-term score is a product of two exactly-rounded doubles; the
  * query score sums the fixed term list left-associatively, so Spark and
  * DuckDB produce bit-identical doubles with no aggregation-order
  * nondeterminism (the term set is a query constant, never a SUM over
  * rows).
  *
  * Scale shape: tf comes from a map-side `word IN terms` filter BEFORE
  * the per-doc aggregate — shuffle volume tracks query-term occurrences,
  * not corpus tokens; N/L/df are one tiny aggregate each, broadcast
  * back; ranking is TakeOrdered(k), never a window over the corpus.
  */
object Retrieval {

  /** Per-doc (doc_id, dl) with dl = whitespace token count, the same
    * tokenization every text op uses (Text.words / the shingle kernel).
    */
  private def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(Text.words(col("text"))).cast("long").as("dl"))

  /** Per-doc tf columns (`tf_<term>`) for the fixed term list, restricted
    * to docs containing at least one query term — WITH the doc length
    * carried through (r16): dl rides the map side into the group key, so
    * the scorer needs no corpus-scale tf⋈dl join and the tokenizer runs
    * once here instead of once per consumer (a matching doc's text is
    * non-null by construction, so dl is never null in the output).
    */
  private def termFreqs(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val words = spreadPartitions(docs)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode_outer(col("w")).as("word"))
      .filter(col("word").isin(terms: _*))
    val aggs = terms.map(t =>
      sum(when(col("word") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    words.groupBy(col("doc_id"), col("dl")).agg(aggs.head, aggs.tail: _*)
  }

  /** The fixed-order BM25 score column over `tf_<t>`/`df_<t>`/`dl`/
    * `n_docs`/`l_tot` columns. Shared verbatim by the direct and the
    * postings-served paths so the two can only diverge on their inputs.
    *
    * The saturation ratio is normalized by L BEFORE any product so no
    * BIGINT intermediate carries an L·tf term: at the 100 TB design
    * point L (corpus tokens) ~ 1e13 and a frequent term's tf ~ 1e5, so
    * the naive 44·L·tf cross-multiplication overflows Int64 (ANSI-mode
    * Spark throws, DuckDB errors, non-ANSI wraps silently). Dividing
    * through by L gives 44·tf / (20·tf + 6 + 18·dl·N/L); the largest
    * integer product left is 18·dl·N (~1e16 at dl 1e5, N 1e10). The
    * denominator becomes a fixed-order chain of two exactly-rounded
    * IEEE ops (one division, one addition) — still bit-identical across
    * engines, just no longer a single integer ratio.
    */
  private def scoreCol(terms: Seq[String]): Column = {
    def one(t: String): Column = {
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      val idf = (lit(2L) * col("n_docs") - lit(2L) * df + lit(1L))
        .cast("double") / (lit(2L) * df + lit(1L)).cast("double")
      val sat = (lit(44L) * tf).cast("double") /
        ((lit(20L) * tf + lit(6L)).cast("double")
          + (lit(18L) * col("dl") * col("n_docs")).cast("double")
            / col("l_tot").cast("double"))
      idf * sat
    }
    round4(terms.map(one).reduceLeft(_ + _))
  }

  private def rank(scored: DataFrame, k: Int): DataFrame =
    scored
      .select(col("doc_id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Top-k docs for `terms`, scored directly from the corpus. One
    * corpus tokenize feeds the tf aggregate (dl carried through its
    * group key — no tf⋈dl join, r16) and one feeds the N/L constants;
    * the df aggregate reuses tf's exchange.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val consts = docLengths(docs)
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("l_tot"))
    // r16: checkpoint the (term-filtered, tiny) tf frame — it feeds the
    // df aggregate AND the scorer, and each consumer otherwise re-ran
    // the corpus tokenize+explode chain behind it (3 corpus passes per
    // query; now 2 — this one and the N/L constants, which need
    // unfiltered per-doc lengths)
    val tf = termFreqs(docs, terms).localCheckpoint()
    val dfAggs = terms.map(t =>
      sum(when(col(s"tf_$t") > 0L, 1L).otherwise(0L)).as(s"df_$t"))
    val dfs = tf.agg(dfAggs.head, dfAggs.tail: _*)
    val scored = tf
      .crossJoin(broadcast(consts))
      .crossJoin(broadcast(dfs))
      .withColumn("score", scoreCol(terms))
    rank(scored, k)
  }

  /** Write one corpus slice's index partials: postings (word, doc_id,
    * tf, dl — dl denormalized so the serve path never rejoins the
    * corpus) to `postingsDir`, dict partial (word, df) to `dictDir`,
    * meta partial (n_docs, l_tot) to `metaDir`. Dict and meta are
    * PARTIALS — the serve path sums them, so a whole-corpus build (one
    * partial) and a streamed index (one partial per micro-batch
    * partition) serve through the same code with the same result.
    *
    * The corpus tokenize+aggregate — the expensive pass — runs ONCE:
    * dict and meta derive from the postings parquet just written (both
    * read back artifact-sized data, never the corpus; a lazy
    * three-consumer composition would re-run the explode+groupBy chain
    * per write).
    */
  def writeIndexSlice(docs: DataFrame, postingsDir: String,
                      dictDir: String, metaDir: String): Unit = {
    val spark = docs.sparkSession
    val dl = docLengths(docs)
    val words = spreadPartitions(docs)
      .select(col("doc_id"), explode_outer(Text.words(col("text")))
        .as("word"))
    val postings = words.groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .select(col("word"), col("doc_id"), col("tf"), col("dl"))
    // sortWithinPartitions after a word-hash repartition: each parquet
    // file covers a contiguous word run, so a term query's min/max +
    // dictionary pruning skips every irrelevant row group
    postings.repartition(col("word")).sortWithinPartitions("word", "doc_id")
      .write.mode(SaveMode.Overwrite).parquet(postingsDir)
    val written = spark.read.parquet(postingsDir)
    // postings are unique per (word, doc_id), so df = posting count
    written.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite).parquet(dictDir)
    // every doc has >= 1 posting (empty text still tokenizes to the ''
    // token, both engines), so per-doc rows reconstruct N and L exactly
    val meta = written.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("l_tot"),
        max(col("dl")).as("max_dl"))
      .head()
    // driver-side on the ONE aggregate row — a raise_error column here
    // is dead code (the projection to (n_docs, l_tot) lets Catalyst
    // prune the branch entirely; caught by the r10 review with a repro)
    requireDlBounded(
      if (meta.isNullAt(2)) 0L else meta.getLong(2), MaxDocLenTokens)
    spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          meta.getLong(0), if (meta.isNullAt(1)) 0L else meta.getLong(1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("l_tot",
            org.apache.spark.sql.types.LongType))))
      .write.mode(SaveMode.Overwrite).parquet(metaDir)
  }

  /** The build-time Int64 bound check, factored for testability (the
    * production bound needs a >5.1e7-token document to trip).
    */
  private[graft] def requireDlBounded(maxDl: Long, bound: Long): Unit =
    if (maxDl > bound) throw new IllegalStateException(
      s"graft.Retrieval: document length $maxDl tokens exceeds " +
        s"MaxDocLenTokens=$bound; 18*dl*n_docs would overflow Int64 at " +
        "the 1e10-doc design point. Split or drop the document before " +
        "indexing.")

  /** Int64-safety bound on a single document's token length. scoreCol's
    * largest integer product is 18·dl·n_docs; at the N = 1e10-docs
    * design point that overflows Long once dl exceeds
    * (2^63−1)/18/1e10 ≈ 5.1e7 tokens — one pathological giant document
    * would make ANSI-mode Spark (and the DuckDB twin) throw at SERVE
    * time. writeIndexSlice validates at BUILD time instead (the
    * read-back pass is already paid), failing with the bound in the
    * message; the direct bm25TopK path computes dl in-query and relies
    * on the same documented bound (ANSI overflow is its fail-safe).
    */
  val MaxDocLenTokens: Long = Long.MaxValue / 18L / 10000000000L

  /** Doc_ids indexed by MORE than one micro-batch partition — violations
    * of the postingsMaintenance append-only precondition (see its
    * Scaladoc): cross-batch re-delivery of a doc_id double-counts its
    * tf/df/n_docs/l_tot contributions at serve time. Returns the
    * offending (doc_id, n_batches) rows; empty ⇔ the streamed index is
    * serve-equivalent to a one-shot build. Index-artifact-scale scan
    * (postings rows, never the corpus) — run as an on-demand
    * maintenance check. A one-shot buildPostings artifact has no
    * `batch` partition column and trivially passes.
    */
  def postingsDisjointnessViolations(spark: SparkSession, dir: String)
      : DataFrame = {
    val post = spark.read.parquet(s"$dir/postings")
    if (!post.columns.contains("batch"))
      post.select(col("doc_id"), lit(1L).as("n_batches")).limit(0)
    else
      post.select(col("doc_id"), col("batch")).distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_batches"))
        .filter(col("n_batches") > 1L)
  }

  /** Inverted-index artifact: `postings/`, `dict/`, `meta/` (see
    * [[writeIndexSlice]]). The index build is the expensive whole-corpus
    * pass; serving reads only the queried words' postings
    * (word-equality pushdown + dictionary row-group skip — the parquet
    * analogue of seeking a posting list). Mirrors the PQ/IVF artifact
    * lifecycle (Similarity): train/build once, serve many. The
    * streaming twin appending `batch=<id>` partitions to the same three
    * dirs is [[graft.streaming.Streams.postingsMaintenance]].
    */
  def buildPostings(docs: DataFrame, dir: String): Unit =
    writeIndexSlice(docs, s"$dir/postings", s"$dir/dict", s"$dir/meta")

  /** Top-k for `terms` served from a prebuilt postings artifact — no
    * corpus access; the scan touches only row groups containing the
    * query terms. Dict and meta are summed, so both the one-shot build
    * and the streamed batch-partitioned index serve here: per-term df
    * sums across partials, n_docs/l_tot sum across per-batch meta rows
    * (partial-count rows per batch, never corpus-scale).
    */
  def bm25FromPostings(spark: SparkSession, dir: String,
                       terms: Seq[String], k: Int): DataFrame = {
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("word").isin(terms: _*))
    val tfAggs = terms.map(t =>
      sum(when(col("word") === t, col("tf")).otherwise(0L)).as(s"tf_$t"))
    val tf = post.groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), tfAggs: _*)
    val dict = spark.read.parquet(s"$dir/dict")
      .filter(col("word").isin(terms: _*))
    val dfAggs = terms.map(t =>
      sum(when(col("word") === t, col("df")).otherwise(0L)).as(s"df_$t"))
    val dfs = dict.agg(dfAggs.head, dfAggs.tail: _*)
    val consts = spark.read.parquet(s"$dir/meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("l_tot")).as("l_tot"))
    val scored = tf
      .crossJoin(broadcast(consts))
      .crossJoin(broadcast(dfs))
      .withColumn("score", scoreCol(terms))
    rank(scored, k)
  }

  /** A ranked BM25 leg for [[rrfFuse]]: number the (doc_id, dl, score)
    * top-k frame by the SAME (score desc, doc_id) order that produced
    * it. The window partitions by the query id; with ONE probe Catalyst
    * constant-folds the literal key away and the window runs
    * single-partition — fine, the frame is ≤ legK rows by construction
    * (PlanLintSpec allowlists exactly this bounded shape). A batched
    * serving path carries real probe_id values and ranks every query's
    * leg in parallel.
    */
  def lexRank(bm25TopK: DataFrame, probeId: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25TopK.withColumn("probe_id", lit(probeId))
      .withColumn("lex_rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al.) of a lexical and a semantic
    * leg — the standard hybrid-retrieval combiner: each leg contributes
    * 1/(rrfK + rank) for the docs it ranked (0 for the docs it didn't),
    * and the fused top-k orders by the summed score. Rank-based, so the
    * incomparable scales of a BM25 score and a cosine never meet — and
    * both addends are one IEEE division of small integers, so the fused
    * double is bit-identical across engines (the t22/n1 exactness
    * contract composes). The output rounds at 1e-6, NOT the corpus-score
    * round4: adjacent RRF increments at the tail of a 50-deep leg
    * (1/(60+49)−1/(60+50) ≈ 8.3e-5) are finer than 1e-4, so round4 tied
    * tail ranks and let doc_id decide the served order — a
    * ranking-fidelity loss round6 is still coarse enough to avoid (the
    * smallest fused increment at legK=50 is ≫ 1e-6) while staying one
    * fixed-order IEEE op both engines reproduce bit-identically.
    * Inputs are the two top-`legK` ranked legs
    * (doc_id, lex_rank) / (doc_id, sem_rank); both are query-sized
    * frames, so the full-outer fusion join and the TakeOrdered(k) cost
    * nothing at any corpus size — the corpus-scale work happened inside
    * the legs, which is the entire point of fusing RANKS.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int,
              rrfK: Long = 60L): DataFrame = {
    val one = lit(1).cast("double")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round6(
        coalesce(one / (lit(rrfK) + col("lex_rank")).cast("double"),
          lit(0d))
        + coalesce(one / (lit(rrfK) + col("sem_rank")).cast("double"),
          lit(0d))))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
  }

  /** Hybrid retrieval, the production RAG-serving shape: the query is a
    * document (its embedding = the encoded query, `terms` = its salient
    * keywords), the lexical leg is BM25 over the corpus MINUS the probe
    * doc, the semantic leg is cosine top-`legK` over the embedding
    * table, and [[rrfFuse]] combines the two rank lists. Each leg is one
    * corpus-scale pass ending in a top-`legK`; at serving scale both
    * legs come from persisted artifacts instead ([[bm25FromPostings]] +
    * [[graft.operators.Similarity.ivfPqTopKFromCodes]]) through the same
    * fuse — Bench's hybrid_serving times that composition.
    */
  def hybridRrfTopK(docs: DataFrame, terms: Seq[String], vecs: DataFrame,
                    probeId: Long, k: Int, legK: Int = 50,
                    rrfK: Long = 60L): DataFrame = {
    val lex = lexRank(
      bm25TopK(docs.filter(col("doc_id") =!= probeId), terms, legK),
      probeId)
    val sem = graft.operators.Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === probeId), vecs, legK)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("sem_rank"))
    rrfFuse(lex, sem, k, rrfK)
  }
}

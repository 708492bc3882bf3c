package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** BM25 retrieval: the postings-artifact serving path must reproduce the
  * direct corpus scoring exactly (same shared score expression, different
  * inputs — this pins the inputs), and serving must touch only the
  * queried words' postings (the pushdown that makes the artifact an
  * index rather than a copy of the corpus).
  */
class RetrievalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private val terms = Seq("dup", "vector", "merge", "scan")

  test("postings-served BM25 == direct BM25 (top-20, scores and order)") {
    val docs = Tables.documents(spark, sfDir)
    val direct = Retrieval.bm25TopK(docs, terms, 20).collect().toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings").toString
    try {
      Retrieval.buildPostings(docs, dir)
      val served = Retrieval.bm25FromPostings(spark, dir, terms, 20)
        .collect().toSeq
      assert(served == direct)
      // one-shot build: no batch partitions → detector trivially passes
      assert(Retrieval.postingsDisjointnessViolations(spark, dir)
        .collect().isEmpty)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("build-time dl bound check: trips above the bound, passes at it " +
      "(driver-side — a raise_error column was Catalyst-pruned dead code)") {
    Retrieval.requireDlBounded(10L, 10L)
    Retrieval.requireDlBounded(0L, 10L)
    val e = intercept[IllegalStateException] {
      Retrieval.requireDlBounded(11L, 10L)
    }
    assert(e.getMessage.contains("11") && e.getMessage.contains("overflow"))
  }

  test("BM25 behavioral properties: term monotonicity, rarity weighting, " +
      "length penalty") {
    import spark.implicits._
    // crafted corpus: controlled tf/dl/df so the BM25 shape is assertable
    val docs = Seq(
      (1L, "rare common filler filler filler"),       // rare once, short
      (2L, "rare rare common filler filler"),         // rare twice
      (3L, "common filler filler filler filler"),     // common only
      (4L, "rare common " + Seq.fill(48)("filler").mkString(" ")), // long
      (5L, "filler filler filler filler filler"),     // no query terms
      (6L, "common common filler filler filler")      // common twice
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("rare", "common"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs with no query term never appear
    assert(!out.contains(5L))
    // term-frequency monotonicity at equal length: doc 2 (rare x2)
    // outscores doc 1 (rare x1); doc 6 (common x2) outscores doc 3
    assert(out(2L) > out(1L))
    assert(out(6L) > out(3L))
    // rarity weighting: 'rare' (df=3) contributes more than 'common'
    // (df=5) at equal tf and dl — doc 1 vs doc 6 both have one extra
    // occurrence beyond the shared 'common', doc 1's being the rare term
    assert(out(1L) > out(6L))
    // length penalty: same tf (rare+common once each), longer doc scores
    // lower
    assert(out(4L) < out(1L))
  }

  test("streamed postings index serves the same top-k as the batch build") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(spark, sfDir)
    val land = java.nio.file.Files
      .createTempDirectory("graft-bm25-land").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft-bm25-idx").toString + "/index"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-bm25-ckpt").toString
    try {
      // two ticks against the SAME checkpoint → two batch=<id> partitions
      docs.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.parquet(s"$land/t1")
      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema("doc_id BIGINT, text STRING, lang STRING, " +
            "source STRING, n_chars BIGINT")
          .option("recursiveFileLookup", "true")
          .parquet(land)
        val q = streaming.Streams.postingsMaintenance(stream, idx, ckpt)
        q.awaitTermination()
      }
      runOnce()
      docs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.parquet(s"$land/t2")
      runOnce()
      val served = Retrieval.bm25FromPostings(spark, idx, terms, 20)
        .collect().toSeq
      val direct = Retrieval.bm25TopK(docs, terms, 20).collect().toSeq
      assert(served == direct)
      // the equivalence above holds under the append-only precondition:
      // doc_ids disjoint across micro-batches. Pin the detector both
      // ways — clean index is violation-free...
      assert(Retrieval.postingsDisjointnessViolations(spark, idx)
        .collect().isEmpty)
      // compaction invariance (stream drained): folding the two slices
      // into one partition must not move the served top-k by a bit, and
      // the postings must still carry the word-sorted pruning layout
      streaming.Streams.compactPostingsIndex(spark, idx)
      assert(Retrieval.bm25FromPostings(spark, idx, terms, 20)
        .collect().toSeq == direct)
      // ...and a RE-DELIVERED doc (same doc_id, later batch — an update,
      // not a checkpoint retry) is flagged by exactly its doc_id
      docs.filter(col("doc_id") === 0).coalesce(1)
        .write.parquet(s"$land/t3")
      runOnce()
      val bad = Retrieval.postingsDisjointnessViolations(spark, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(bad == Seq((0L, 2L)), s"expected doc 0 in 2 batches: $bad")
      // compaction would collapse the batch ids and permanently mask
      // this violation without fixing the double-count — it must refuse
      val e = intercept[IllegalArgumentException] {
        streaming.Streams.compactPostingsIndex(spark, idx)
      }
      assert(e.getMessage.contains("re-delivered"))
    } finally {
      Seq(land, idx, ckpt).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
  }

  test("serving scan pushes the term filter into the postings read") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings-pd").toString
    try {
      Retrieval.buildPostings(Tables.documents(spark, sfDir), dir)
      // sparkPlan, not executedPlan: AQE wraps the executed plan in an
      // AdaptiveSparkPlanExec whose children aren't visible to collect
      // until execution (same convention as PlanLintSpec)
      val plan = Retrieval.bm25FromPostings(spark, dir, terms, 20)
        .queryExecution.sparkPlan
      // "/postings" (the subdirectory), NOT "postings": the temp-dir
      // prefix contains the bare word, so a bare match would also catch
      // the dict scan — which carries its own word pushdown and would
      // keep this green even if the postings scan lost its filter
      val postingsScans = plan.collect {
        case s: FileSourceScanExec
            if s.metadata.getOrElse("Location", "").contains("/postings") =>
          s.metadata.getOrElse("PushedFilters", "")
      }
      assert(postingsScans.nonEmpty)
      assert(postingsScans.exists(_.contains("word")),
        s"postings scan lost the term pushdown: $postingsScans")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("hybrid RRF: fused rows recompute from the two legs, full-outer " +
      "keeps single-leg docs, ordering is (rrf desc, doc_id)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sfDir)
    val vecs = Tables.embeddings(spark, sfDir)
    val fused = Retrieval.hybridRrfTopK(docs, terms, vecs,
      probeId = 0L, k = 20).collect().toSeq
    assert(fused.length == 20)
    // the reference legs, recomputed independently
    val lex = Retrieval.lexRank(
        Retrieval.bm25TopK(docs.filter(col("doc_id") =!= 0L), terms, 50),
        probeId = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sem = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 0L), vecs, 50)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      val lr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      // ranks match the legs exactly (absent leg → null, never 0)
      assert(lex.get(id) == lr, s"doc $id lex rank")
      assert(sem.get(id) == sr, s"doc $id sem rank")
      val want = lr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) <= 5e-5,
        s"doc $id rrf ${r.getDouble(3)} vs $want")
    }
    // ordering contract
    val key = fused.map(r => (-r.getDouble(3), r.getLong(0)))
    assert(key == key.sorted)
    // the fixture's legs disagree enough that single-leg docs exist in
    // the fused top-20 — the full-outer join is load-bearing, not
    // decorative (an inner join would silently drop these)
    assert(fused.exists(r => r.isNullAt(1) || r.isNullAt(2)))
  }

  test("hybrid with the lexical leg served from postings == headline " +
      "hybrid (the artifact leg is exact, so the fusion is too)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sfDir)
    val vecs = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hybrid-postings").toString
    try {
      // index the SAME corpus the headline lexical leg scores (minus
      // the probe doc — the probe is the query)
      Retrieval.buildPostings(docs.filter(col("doc_id") =!= 0L), dir)
      val lexServed = Retrieval.lexRank(
        Retrieval.bm25FromPostings(spark, dir, terms, 50), probeId = 0L)
      val semBrute = Similarity.bruteForceTopK(
          vecs.filter(col("vec_id") === 0L), vecs, 50)
        .select(col("neighbor_id").as("doc_id"),
          col("rank").as("sem_rank"))
      val served = Retrieval.rrfFuse(lexServed, semBrute, k = 20)
        .collect().toSeq
      val direct = Retrieval.hybridRrfTopK(docs, terms, vecs,
        probeId = 0L, k = 20).collect().toSeq
      assert(served == direct)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }
}

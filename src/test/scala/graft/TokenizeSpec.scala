package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Tokenize

/** BPE merge training: a fully hand-computed tiny corpus (argmax ties,
  * merged symbols re-entering later merges, multi-match rewrites), the
  * exact symbol-count chain invariant, and segmentation consistency.
  */
class TokenizeSpec extends AnyFunSuite {

  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def tiny = Seq(
    (1L, "ab ab ab cab"),
    (2L, "ab banana ab")).toDF("doc_id", "text")

  test("bpeMerges: hand-computed merges, ties, and per-step counts") {
    // vocab: ab×5, cab×1, banana×1; initial syms 5·3 + 4 + 7 = 26.
    // step 1: (a,b)=6 ties (b,</w>)=6 → (a,b) on the (l,r) order; 26−6=20
    // step 2: (ab,</w>)=6 — step 1's output symbol is the left side
    // step 3: (a,n)=2 ties (n,a)=2 → (a,n); banana rewrites BOTH matches
    val got = Tokenize.bpeMerges(tiny, 3).orderBy(col("step"))
      .as[(Long, String, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "b", "ab", 6L, 20L),
      (2L, "ab", "</w>", "ab</w>", 6L, 14L),
      (3L, "a", "n", "an", 2L, 12L)))
  }

  test("bpeSegmentation: rewritten vocab matches the merge chain and " +
      "reconstructs every word") {
    val seg = Tokenize.bpeSegmentation(tiny, 3)
      .as[(String, Long, Seq[String], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(seg("ab")._3 == Seq("ab</w>"))
    assert(seg("cab")._3 == Seq("c", "ab</w>"))
    assert(seg("banana")._3 == Seq("b", "an", "an", "a", "</w>"))
    // Σ freq·n_syms equals the merge table's final n_syms_after
    assert(seg.values.map(r => r._2 * r._4).sum == 12L)
    // lossless: concatenating symbols and dropping the terminator
    // reproduces the word — no rewrite may lose or duplicate characters
    seg.values.foreach { case (word, _, syms, _) =>
      assert(syms.mkString.replace("</w>", "") == word)
    }
  }

  test("bpeEncode: hand-computed per-doc token counts under the " +
      "trained segmentation") {
    // doc 1 = ab ab ab cab → ab(1 sym)×3 + cab(2) = 5 tokens / 4 words
    // doc 2 = ab banana ab → ab×2 + banana(5) = 7 tokens / 3 words
    val got = Tokenize.bpeEncode(tiny, 3).orderBy(col("doc_id"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 5L, 1.25), (2L, 3L, 7L, 2.3333)))
  }

  test("empty corpus: bpeMerges and bpeEncode return empty, don't throw") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Tokenize.bpeMerges(none, 2).collect().isEmpty)
    assert(Tokenize.bpeEncode(none, 2).collect().isEmpty)
  }

  test("bpeMerges == a plain-Scala reference trainer on random " +
      "corpora (dense tie/overlap space)") {
    // independent differential oracle: sequential greedy left-to-right
    // application (the textbook form) must equal the per-position map
    // the engine runs — the l ≠ r non-overlap argument, executed
    def applyRef(s: Vector[String], l: String, r: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    def refTrain(freq: Map[String, Long], k: Int)
        : Vector[(Long, String, String, String, Long, Long)] = {
      var vocab: Map[Vector[String], Long] = freq.map { case (w, f) =>
        (w.toVector.map(_.toString) :+ "</w>") -> f
      }
      var rows = Vector.empty[(Long, String, String, String, Long, Long)]
      var n = 1L
      var done = false
      while (n <= k && !done) {
        val counts = vocab.toSeq.flatMap { case (s, f) =>
          s.zip(s.tail).filter(p => p._1 != p._2).map(p => p -> f)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (counts.isEmpty) done = true
        else {
          val ((l, r), cnt) = counts.minBy { case ((l, r), c) =>
            (-c, l, r)
          }
          vocab = vocab.toSeq.map { case (s, f) =>
            applyRef(s, l, r) -> f
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          val after = vocab.map { case (s, f) => f * s.length }.sum
          rows = rows :+ ((n, l, r, l + r, cnt, after))
          n += 1
        }
      }
      rows
    }
    val rnd = new scala.util.Random(23)
    // 3-letter alphabet: dense pair collisions, frequent ties, runs
    for (trial <- 1 to 4) {
      val words = Seq.fill(10 + rnd.nextInt(15))(
        Seq.fill(1 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString)
      val docs = words.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val got = Tokenize.bpeMerges(docs, 5).orderBy(col("step"))
        .as[(Long, String, String, String, Long, Long)].collect().toSeq
      val freq = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val want = refTrain(freq, 5)
      assert(got == want, s"trial $trial diverged: got $got want $want")
    }
  }

  test("bpeMergesLocal == bpeMerges on random dense-tie corpora and " +
      "the fixture (production trainer ≡ distributed cross-check)") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 4) {
      val words = Seq.fill(10 + rnd.nextInt(15))(
        Seq.fill(1 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString)
      val docs = words.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val dist = Tokenize.bpeMerges(docs, 5).orderBy(col("step"))
        .as[(Long, String, String, String, Long, Long)].collect().toSeq
      val local = Tokenize.bpeMergesLocal(docs, 5).orderBy(col("step"))
        .as[(Long, String, String, String, Long, Long)].collect().toSeq
      assert(local == dist, s"trial $trial diverged")
    }
    // the fixture, deeper than the oracle's k=4: every merge row equal
    val docs = Tables.documents(spark, sfDir)
    val dist = Tokenize.bpeMerges(docs, 6).orderBy(col("step"))
      .as[(Long, String, String, String, Long, Long)].collect().toSeq
    val local = Tokenize.bpeMergesLocal(docs, 6).orderBy(col("step"))
      .as[(Long, String, String, String, Long, Long)].collect().toSeq
    assert(local == dist)
    assert(local.size == 6)
    // minFreq floors the collected vocab, maxVocab fails loudly
    assert(Tokenize.bpeMergesLocal(docs, 2, minFreq = 2L)
      .collect().length == 2)
    intercept[IllegalArgumentException] {
      Tokenize.bpeMergesLocal(docs, 1, maxVocab = 1).collect()
    }
  }

  test("BPE: sliced vocab fold == batch merges on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "the", "and",
      "banana", "is", "query", "engine")
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(40)
      def text(): String = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case _ => Seq.fill(1 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = (0 until n).map(i => (i.toLong, text()))
        .toDF("doc_id", "text")
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-bpefold-$trial").toString
      for (b <- 0 until 3)
        Tokenize.wordFreq(df.filter(col("doc_id") % 3 === b.toLong))
          .write.parquet(s"$idx/vocab/batch=$b")
      val served = Tokenize.serveMerges(spark, idx, 4)
        .orderBy(col("step")).collect().toSeq
      val direct = Tokenize.bpeMerges(df, 4)
        .orderBy(col("step")).collect().toSeq
      assert(served == direct, s"trial $trial diverged")
      assert(direct.nonEmpty)
      // the production serve path folds the same slices into the
      // in-process trainer — same counts, same merges
      assert(Tokenize.serveMergesLocal(spark, idx, 4)
        .orderBy(col("step")).collect().toSeq == served)
      // the serve twin carries the same pre-collect maxVocab guard as
      // bpeMergesLocal: a retrain tick over an oversized streamed vocab
      // fails loudly BEFORE materializing it on the driver
      intercept[IllegalArgumentException] {
        Tokenize.serveMergesLocal(spark, idx, 4, maxVocab = 2).collect()
      }
    }
  }

  test("bpeMerges on the fixture: symbol-count chain is exact " +
      "(n_syms_after[i] = n_syms_after[i-1] - pair_count[i])") {
    val docs = Tables.documents(spark, sfDir)
    val base = Tokenize.wordFreq(docs)
      .select(sum(col("freq") * (length(col("word")) + 1)))
      .head().getLong(0)
    val steps = Tokenize.bpeMerges(docs, 3).orderBy(col("step"))
      .select(col("pair_count"), col("n_syms_after"))
      .as[(Long, Long)].collect()
    var prev = base
    steps.foreach { case (cnt, after) =>
      assert(after == prev - cnt, s"chain broke: $prev - $cnt != $after")
      assert(cnt > 0)
      prev = after
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Selection

/** DSIR selection: the sliced-fold battery (streamed model == batch
  * weights on randomized corpora) and the smoothed-unseen-bucket serve
  * contract from the r10 review fix.
  */
class SelectionSpec extends AnyFunSuite {

  import SparkTestSession.spark
  import spark.implicits._

  private val hash = Selection.md5Bucket(1024)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("DSIR: sliced model fold == batch weights on random corpora " +
      "(nulls, empties, uneven target mix across slices)") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "the", "and",
      "of", "is", "query", "engine")
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(60)
      def text(): String = rnd.nextInt(12) match {
        case 0 => null
        case 1 => ""
        case _ => Seq.fill(1 + rnd.nextInt(25))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = (0 until n).map { i =>
        (i.toLong, text(), Seq("en", "de", "es")(rnd.nextInt(3)))
      }.toDF("doc_id", "text", "lang")
      val idx = tmpDir(s"graft-dsirfold-$trial")
      for (b <- 0 until 3)
        Selection.modelSlice(Selection.features(
            df.filter(col("doc_id") % 3 === b.toLong),
            col("lang") === "en", hash))
          .write.parquet(s"$idx/buckets/batch=$b")
      val served = Selection.serve(df, hash, idx)
        .orderBy(col("doc_id")).collect().toSeq
      val direct = Selection.dsirWeights(df, col("lang") === "en", hash)
        .orderBy(col("doc_id")).collect().toSeq
      assert(served == direct, s"trial $trial diverged")
      assert(direct.nonEmpty)
    }
  }

  test("serve: unseen buckets get the smoothed zero-count weight — " +
      "novel docs never vanish (r10 review finding)") {
    // model trained on a corpus that cannot cover the novel doc's
    // buckets; the served row must exist with every feature counted
    val corpus = Seq((1L, "alpha beta alpha", "en"),
      (2L, "gamma delta", "de")).toDF("doc_id", "text", "lang")
    val idx = tmpDir("graft-dsir-unseen")
    Selection.modelSlice(Selection.features(corpus,
        col("lang") === "en", hash))
      .write.parquet(s"$idx/buckets/batch=0")
    val novel = Seq((9L, "zzznovelword qqqotherword"))
      .toDF("doc_id", "text")
    val got = Selection.serve(novel, hash, idx).collect()
    assert(got.length == 1)
    // 2 unigrams + 1 bigram, all counted even if their buckets are
    // absent from the 5-feature model
    assert(got(0).getLong(1) == 3L, s"n_feat ${got(0).getLong(1)}")
    // an EMPTY model scores every feature 0 (S=T=0), keep at the cut
    val idx2 = tmpDir("graft-dsir-emptymodel")
    val got2 = Selection.serve(novel, hash, idx2).collect()
    assert(got2.length == 1 && got2(0).getLong(2) == 0L)
  }
}

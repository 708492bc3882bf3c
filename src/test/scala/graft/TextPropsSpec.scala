package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Dedup

/** Property tests for the text/dedup expression layer against plain-Scala
  * oracles: normalization idempotence, shingle correctness, marker counts,
  * exact Jaccard values from the pair pipeline.
  */
object TextPropsSpec extends Properties("Text") {

  import SparkTestSession.spark
  import spark.implicits._

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  private val rawText: Gen[String] = for {
    words <- Gen.nonEmptyListOf(word)
    seps <- Gen.listOfN(words.size, Gen.oneOf(" ", "  ", "\t", " \t "))
    lead <- Gen.oneOf("", " ", "\t")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  private def normScala(s: String): String =
    s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")

  property("normalize matches scala lower/trim/collapse and is idempotent") =
    Prop.forAllNoShrink(Gen.listOfN(5, rawText)) { texts =>
      val got = texts.toDF("t")
        .select(Text.normalize(col("t")).as("n"),
          Text.normalize(Text.normalize(col("t"))).as("nn"))
        .as[(String, String)].collect()
      got.zip(texts).forall { case ((n, nn), t) =>
        n == normScala(t) && nn == n
      }
    }

  property("shingles match scala sliding n-grams (order + duplicates)") =
    Prop.forAllNoShrink(rawText, Gen.choose(1, 4)) { (t, n) =>
      val got = Seq(t).toDF("t")
        .select(Text.shingles(col("t"), n)).head.getSeq[String](0).toList
      val words = normScala(t).split(" ").toList.filter(_.nonEmpty)
      val want =
        if (words.size < n) Nil
        else words.sliding(n).map(_.mkString(" ")).toList
      got == want
    }

  property("markerCount counts non-overlapping padded occurrences") =
    Prop.forAllNoShrink(Gen.listOfN(12, Gen.oneOf("the", "cat", "dog"))) {
      words =>
        val text = words.mkString(" ")
        val got = Seq(text).toDF("t")
          .select(Text.markerCount(col("t"), "the")).head.getInt(0)
        // non-overlapping scan: resume AFTER the full match (a shared
        // space between two adjacent markers is consumed by the first)
        val padded = " " + normScala(text) + " "
        var count = 0
        var idx = padded.indexOf(" the ")
        while (idx >= 0) {
          count += 1
          idx = padded.indexOf(" the ", idx + 5)
        }
        got == count
    }

  property("brute-force Jaccard equals scala set Jaccard") =
    Prop.forAllNoShrink(Gen.listOfN(4,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
        .map(_.mkString(" ")))) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.jaccardBruteForce(docs, 2, 0.0)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      def sh(t: String): Set[String] = {
        val w = normScala(t).split(" ").toList
        if (w.size < 2) Set.empty
        else w.sliding(2).map(_.mkString(" ")).toSet
      }
      val want = (for {
        i <- texts.indices; j <- texts.indices if i < j
        si = sh(texts(i)); sj = sh(texts(j))
        inter = (si & sj).size if inter > 0
      } yield (i.toLong, j.toLong) ->
        BigDecimal(inter.toDouble / (si | sj).size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      got == want
    }
}

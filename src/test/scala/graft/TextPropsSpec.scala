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

  // (r15) normalize is evaluated by the single-pass byte kernel now —
  // its contract is BIT-IDENTITY with the regex chain the DuckDB twins
  // replay, so compare against that exact form evaluated by Spark over
  // a generator that covers what the ASCII-word generator above cannot:
  // uppercase, all six java-regex \s characters, unicode words (incl.
  // chars whose lowercase differs), empty and all-whitespace strings.
  private val anyWord: Gen[String] = Gen.oneOf(
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaChar, Gen.numChar)).map(_.mkString)),
    Gen.oneOf("Straße", "ÜNÏCÖDE", "日本語", "İstanbul", "ΣΙΓΜΑΣ", "é è"))
  private val anyWs: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r")).map(_.mkString))
  private val messyText: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    1 -> anyWs,
    8 -> (for {
      lead <- Gen.oneOf(Gen.const(""), anyWs)
      words <- Gen.nonEmptyListOf(anyWord)
      seps <- Gen.listOfN(words.size + 1, anyWs)
      flags <- Gen.listOfN(words.size + 1, Gen.oneOf(true, false))
    } yield lead + words.zipAll(seps.zip(flags), "", (" ", true)).map {
      case (w, (s, keep)) => w + (if (keep) s else "")
    }.mkString))

  property("normalize kernel is bit-identical to the regex-chain twin") =
    Prop.forAllNoShrink(Gen.listOfN(8, messyText)) { texts =>
      val got = texts.toDF("t")
        .select(Text.normalize(col("t")).as("k"),
          regexp_replace(regexp_replace(lower(col("t")),
            "^\\s+|\\s+$", ""), "\\s+", " ").as("r"))
        .as[(String, String)].collect()
      got.forall { case (k, r) => k == r }
    }

  // (r15) the fused gram-hash kernel must emit element-wise exactly
  // xxhash64(shingles(text, n)[i]) — same count, same order, same 64-bit
  // values — over text with messy whitespace and mixed case (the ASCII
  // domain where ShingleKernel's ROOT lower and the kernel's normalize
  // lower coincide; the fixtures and oracles live there)
  property("shingle_hashes == xxhash64 over shingles, element-wise") =
    Prop.forAllNoShrink(Gen.listOfN(6, rawText), Gen.choose(1, 4)) {
      (texts, n) =>
        val got = texts.toDF("t")
          .select(
            graft.plans.Expressions.shingleHashes(col("t"), n).as("f"),
            transform(Text.shingles(col("t"), n),
              s => xxhash64(s)).as("r"))
          .as[(Seq[Long], Seq[Long])].collect()
        got.forall { case (f, r) => f == r }
    }

  // (r16) the strided kernel (d15's non-overlapping chunker) must emit
  // exactly every stride-th element of the stride-1 output — same
  // values, same order — i.e. skipping windows changes WHICH grams are
  // hashed, never their hashes
  property("strided shingle_hashes == every stride-th stride-1 hash") =
    Prop.forAllNoShrink(Gen.listOfN(6, rawText), Gen.choose(1, 4),
      Gen.choose(1, 5)) { (texts, n, stride) =>
        val got = texts.toDF("t")
          .select(
            graft.plans.Expressions.shingleHashes(col("t"), n, stride)
              .as("s"),
            graft.plans.Expressions.shingleHashes(col("t"), n).as("f"))
          .as[(Seq[Long], Seq[Long])].collect()
        got.forall { case (s, f) =>
          s == f.zipWithIndex.collect {
            case (h, i) if i % stride == 0 => h }
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

  // the one-pass text_profile kernel must agree with the retired Column
  // composition it replaced, field by field, on arbitrary text
  property("text_profile kernel == Column composition (wc, alpha, counts)") =
    Prop.forAllNoShrink(Gen.listOfN(6, rawText)) { texts =>
      val markers = Seq("the", "a", "of")
      val p = graft.plans.Expressions.textProfile(col("t"), markers)
      val got = texts.toDF("t")
        .select(p.getField("wc"), p.getField("alpha"),
          p.getField("counts"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Int](2).toList))
      val want = texts.map { t =>
        val w = normScala(t).split(" ", -1).toList // "" -> List("")
        val alpha = w.count(x => x.nonEmpty && x.forall(c => c >= 'a' && c <= 'z'))
        val padded = " " + normScala(t) + " "
        val counts = markers.map { m =>
          val pat = s" $m "
          var c = 0
          var idx = padded.indexOf(pat)
          while (idx >= 0) { c += 1; idx = padded.indexOf(pat, idx + pat.length) }
          c
        }.toList
        (w.size, alpha, counts)
      }
      got.toList == want.toList
    }

  property("langPredict kernel form == markerCount composition") =
    Prop.forAllNoShrink(Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf("the", "a", "window", "hash", "data",
        "row", "query", "table", "spark", "stream", "zzz"))
        .map(_.mkString(" ")))) { texts =>
      val composed = {
        // the pre-kernel formulation, inlined as the oracle
        val scores = Text.langMarkers.map { case (l, _) =>
          l -> Text.langScore(col("t"), l)
        }
        def chain(rest: Seq[(String, org.apache.spark.sql.Column)])
            : org.apache.spark.sql.Column = rest match {
          case (l, s) +: tail if tail.nonEmpty =>
            when(tail.map(tl => s >= tl._2).reduce(_ && _), lit(l))
              .otherwise(chain(tail))
          case Seq((l, _)) => lit(l)
        }
        chain(scores)
      }
      val rows = texts.toDF("t")
        .select(Text.langPredict(col("t")).as("k"), composed.as("c"))
        .as[(String, String)].collect()
      rows.forall { case (k, c) => k == c }
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

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.{AsOf, AsOfJoinExec}

/** Contract of the custom as-of join (plans/AsOfJoin.scala): semantics vs
  * a driver-side brute-force reference on random inputs, null/empty/
  * tolerance/inner edge behavior, and the physical plan shape (the node
  * itself plus child ordering satisfied by sorts, not windows).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def leftDf(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("k", "t", "lv")
  private def rightDf(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("k", "rt", "rv")

  /** Brute-force reference for all three directions (right side unique
    * per (key, time); nearest ties prefer backward).
    */
  private def reference(
      ls: Seq[(Long, Long, String)], rs: Seq[(Long, Long, String)],
      tol: Option[Long], dir: String = "backward")
      : Set[(Long, Long, String, Option[String])] =
    ls.map { case (k, t, lv) =>
      val back = rs.filter(r => r._1 == k && r._2 <= t &&
        tol.forall(tl => t - r._2 <= tl))
        .sortBy(_._2).lastOption
      val fwd = rs.filter(r => r._1 == k && r._2 >= t &&
        tol.forall(tl => r._2 - t <= tl))
        .sortBy(_._2).headOption
      val m = dir match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      (k, t, lv, m.map(_._3))
    }.toSet

  private def run(l: DataFrame, r: DataFrame, joinType: String = "left",
      tol: Option[Long] = None, dir: String = "backward"): DataFrame =
    AsOf.join(l, r.withColumnRenamed("k", "rk"),
      Seq("k"), Seq("rk"), "t", "rt", dir, joinType, tol)

  /** Run `body` under both physical strategies: broadcast index (right
    * side under the auto-broadcast threshold — the default here, since
    * test frames are tiny) and the co-partitioned sort-merge (threshold
    * disabled). Strategy choice must never change results.
    */
  private def bothPaths(body: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      Seq("10485760", "-1").foreach { v =>
        spark.conf.set(key, v); body
      }
    } finally spark.conf.set(key, old)
  }

  // Right sides in the generator are unique per (key, time) — ties between
  // right rows are explicitly sort-order-dependent (see scaladoc).
  private val rowsGen = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 50L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 50L)))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") },
    rs.distinctBy(x => (x._1, x._2))
      .zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") })

  /** Deterministic scalacheck sampling (no scalatestplus in the cache). */
  private def samples(n: Int) = (1 to n).map(i =>
    rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("matches a brute-force reference on random inputs (left outer)") {
    bothPaths {
    samples(30).foreach { case (ls, rs) =>
      val got = run(leftDf(ls), rightDf(rs))
        .select($"k", $"t", $"lv", $"rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == reference(ls, rs, None), s"inputs: $ls vs $rs")
    }
    }
  }

  test("tolerance bounds the allowed staleness") {
    bothPaths {
    samples(15).foreach { case (ls, rs) =>
      val got = run(leftDf(ls), rightDf(rs), tol = Some(7L))
        .select($"k", $"t", $"lv", $"rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == reference(ls, rs, Some(7L)), s"inputs: $ls vs $rs")
    }
    }
  }

  test("forward direction matches the brute-force reference") {
    bothPaths {
    samples(15).foreach { case (ls, rs) =>
      val got = run(leftDf(ls), rightDf(rs), dir = "forward")
        .select($"k", $"t", $"lv", $"rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == reference(ls, rs, None, "forward"), s"inputs: $ls vs $rs")
    }
    }
  }

  test("nearest direction matches the brute-force reference (with tolerance)") {
    bothPaths {
    samples(15).foreach { case (ls, rs) =>
      for (tol <- Seq(None, Some(7L))) {
        val got = run(leftDf(ls), rightDf(rs), tol = tol, dir = "nearest")
          .select($"k", $"t", $"lv", $"rv").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            Option(r.getString(3)))).toSet
        assert(got == reference(ls, rs, tol, "nearest"),
          s"tol=$tol inputs: $ls vs $rs")
      }
    }
    }
  }

  test("nearest ties at equal distance prefer the backward row") {
    bothPaths {
    val l = leftDf(Seq((1L, 5L, "a")))
    val r = rightDf(Seq((1L, 3L, "before"), (1L, 7L, "after")))
    assert(run(l, r, dir = "nearest").select($"rv").as[String]
      .collect().toSeq == Seq("before"))
    }
  }

  test("skew salting yields identical results to the unsalted join") {
    bothPaths {
    samples(10).foreach { case (ls, rs) =>
      for (dir <- Seq("backward", "forward")) {
        val got = AsOf.join(leftDf(ls), rightDf(rs).withColumnRenamed("k", "rk"),
          Seq("k"), Seq("rk"), "t", "rt", dir, skewSalt = 4)
          .select($"k", $"t", $"lv", $"rv").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            Option(r.getString(3)))).toSet
        assert(got == reference(ls, rs, None, dir),
          s"dir=$dir inputs: $ls vs $rs")
      }
    }
    }
  }

  test("inner join drops unmatched left rows") {
    bothPaths {
    val l = leftDf(Seq((1L, 5L, "a"), (1L, 1L, "b"), (2L, 9L, "c")))
    val r = rightDf(Seq((1L, 3L, "x")))
    val got = run(l, r, "inner").select($"lv", $"rv").as[(String, String)]
      .collect().toSet
    assert(got == Set(("a", "x")))
    }
  }

  test("ties on time match inclusively (rt == t wins over earlier rt)") {
    bothPaths {
    val l = leftDf(Seq((1L, 5L, "a")))
    val r = rightDf(Seq((1L, 5L, "now"), (1L, 4L, "before")))
    assert(run(l, r).select($"rv").as[String].collect().toSeq == Seq("now"))
    }
  }

  test("empty right yields all-null right side; empty left yields nothing") {
    bothPaths {
    val l = leftDf(Seq((1L, 5L, "a")))
    val r = rightDf(Nil)
    val row = run(l, r).select($"rv").collect()
    assert(row.length == 1 && row.head.isNullAt(0))
    assert(run(leftDf(Nil), rightDf(Seq((1L, 1L, "x")))).count() == 0)
    }
  }

  test("null keys and null times never match") {
    bothPaths {
    val l = Seq((Option(1L), Option(5L), "a"), (None, Option(5L), "b"),
      (Option(1L), None, "c")).toDF("k", "t", "lv")
    val r = Seq((Option(1L), Option(3L), "x"), (None, Option(2L), "y"),
      (Option(1L), None, "z")).toDF("k", "rt", "rv")
    val got = AsOf.joinBackward(l, r.withColumnRenamed("k", "rk"),
      Seq("k"), Seq("rk"), "t", "rt")
      .select($"lv", $"rv").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("a", Some("x")), ("b", None), ("c", None)))
    }
  }

  test("multi-column keys and timestamp time columns work") {
    bothPaths {
    val l = Seq((1L, "x", 100L, "a"), (1L, "y", 100L, "b"))
      .toDF("k1", "k2", "tl", "lv")
      .withColumn("t", timestamp_micros($"tl"))
    val r = Seq((1L, "x", 90L, "m"), (1L, "y", 101L, "n"))
      .toDF("k1", "k2", "tr", "rv")
      .withColumn("rt", timestamp_micros($"tr"))
    val got = AsOf.joinBackward(
      l, r.withColumnsRenamed(Map("k1" -> "rk1", "k2" -> "rk2")),
      Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select($"lv", $"rv").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("a", Some("m")), ("b", None)))
    }
  }

  test("self-join on the same source frame resolves (dedup safety)") {
    bothPaths {
    val ev = Seq((1L, 1L, "p"), (1L, 3L, "p"), (1L, 2L, "c"))
      .toDF("k", "t", "kind")
    val l = ev.filter($"kind" === "p")
    val r = ev.filter($"kind" === "c")
      .select($"k".as("rk"), $"t".as("rt"), $"kind".as("rkind"))
    val got = AsOf.joinBackward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"t", $"rt").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(got == Set((1L, None), (3L, Some(2L))))
    }
  }

  test("left-side filters push through the join; right-side filters stay above") {
    import graft.plans.AsOfJoinPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val df = run(leftDf(Seq((1L, 1L, "a"), (2L, 2L, "b"))),
      rightDf(Seq((1L, 1L, "x"))))
      .filter($"lv" === "a" && $"rv".isNotNull)
    val opt = df.queryExecution.optimizedPlan
    // the left-only conjunct sits BELOW the join…
    val pushedLeft = opt.collect {
      case j: AsOfJoinPlan => j.left.collectFirst {
        case f: LFilter if f.condition.references.map(_.name)
          .exists(_ == "lv") => f
      }
    }.flatten
    assert(pushedLeft.nonEmpty, s"left filter not pushed:\n$opt")
    // …while the right-side conjunct stays above it
    val aboveJoin = opt.collectFirst {
      case f: LFilter if f.child.isInstanceOf[AsOfJoinPlan] => f
    }
    assert(aboveJoin.exists(_.condition.references.map(_.name)
      .exists(_ == "rv")), s"right filter not above join:\n$opt")
    // and semantics are unchanged
    assert(df.select($"lv", $"rv").as[(String, String)].collect().toSet ==
      Set(("a", "x")))
  }

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{
    AdaptiveSparkPlanExec, QueryStageExec}

  // AQE stage wrappers are leaf nodes — unwrap to find nodes
  private def findExec(p: SparkPlan)(pred: SparkPlan => Boolean): Boolean =
    p match {
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)(pred)
      case q: QueryStageExec => pred(q) || findExec(q.plan)(pred)
      case other => pred(other) || other.children.exists(findExec(_)(pred))
    }

  test("physical plan under threshold=-1 is the merge exec, not a window or nested loop") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = run(leftDf(Seq((1L, 1L, "a"))), rightDf(Seq((1L, 1L, "x"))))
      df.collect() // finalize any adaptive re-planning
      val plan = df.queryExecution.executedPlan
      val txt = plan.toString
      assert(!txt.contains("Window"))
      assert(!txt.contains("NestedLoop"))
      assert(findExec(plan) { case _: AsOfJoinExec => true; case _ => false })
    } finally spark.conf.set(key, old)
  }

  test("config fuzz: random direction/tolerance/salt/dedupe/joinType combinations agree with the reference") {
    // every feature is pinned individually above; this drives random
    // COMBINATIONS through both physical strategies, where interactions
    // (salted keys + tolerance + nearest, dedupe + inner, ...) would hide
    val rng = new scala.util.Random(7)
    bothPaths {
      samples(12).foreach { case (ls, rs) =>
        val dir = Seq("backward", "forward", "nearest")(rng.nextInt(3))
        val tol = if (rng.nextBoolean()) Some(rng.nextInt(15).toLong + 1L) else None
        val salt = if (rng.nextBoolean()) rng.nextInt(4) + 2 else 1
        val dedupe = rng.nextBoolean() // right sides are unique per (k,t): semantics unchanged
        val inner = rng.nextBoolean()
        val got = AsOf.join(leftDf(ls), rightDf(rs).withColumnRenamed("k", "rk"),
            Seq("k"), Seq("rk"), "t", "rt", dir,
            joinType = if (inner) "inner" else "left",
            tolerance = tol, skewSalt = salt, dedupeRight = dedupe)
          .select($"k", $"t", $"lv", $"rv").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            Option(r.getString(3)))).toSet
        val full = reference(ls, rs, tol, dir)
        val want = if (inner) full.filter(_._4.nonEmpty) else full
        assert(got == want,
          s"dir=$dir tol=$tol salt=$salt dedupe=$dedupe inner=$inner: $ls vs $rs")
      }
    }
  }

  test("mixed left/right time column types are rejected") {
    val l = leftDf(Seq((1L, 5L, "a")))
    val r = rightDf(Seq((1L, 3L, "x")))
      .withColumn("rt", timestamp_micros($"rt")) // left stays LongType
    val e = intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r.withColumnRenamed("k", "rk"),
        Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(e.getMessage.contains("same type"))
  }

  test("dedupeRight makes duplicate (key,time) right rows order-independent") {
    bothPaths {
    // three right rows tie on (key, time) — without dedupe the pick is
    // input-order dependent; with dedupeRight it must be the same row
    // under every input order and both physical strategies.
    val dups = Seq((1L, 3L, "r0"), (1L, 3L, "r1"), (1L, 3L, "r2"))
    val l = leftDf(Seq((1L, 5L, "a")))
    val picks = dups.permutations.map { perm =>
      AsOf.join(l, rightDf(perm).withColumnRenamed("k", "rk"),
        Seq("k"), Seq("rk"), "t", "rt", "backward", dedupeRight = true)
        .select($"rv").as[String].collect().toSeq
    }.toSeq
    assert(picks.forall(_.length == 1))
    assert(picks.distinct.size == 1,
      s"dedupeRight pick varied with input order: $picks")
    }
  }

  test("SQL table function asof_join(TABLE, TABLE, ...) matches the DataFrame API") {
    AsOf.ensureRegistered(spark)
    bothPaths {
      val (ls, rs) = samples(1).head
      leftDf(ls).createOrReplaceTempView("tvf_l")
      rightDf(rs).withColumnRenamed("k", "rk")
        .createOrReplaceTempView("tvf_r")
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = spark.sql(
          s"""SELECT k, t, lv, rv FROM asof_join(
             TABLE(tvf_l), TABLE(tvf_r), 'k', 'rk', 't', 'rt', '$dir')""")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            Option(r.getString(3)))).toSet
        assert(got == reference(ls, rs, None, dir), s"dir=$dir")
      }
      // inner variant drops unmatched lefts
      val inner = spark.sql(
        """SELECT count(*) FROM asof_join(
           TABLE(tvf_l), TABLE(tvf_r), 'k', 'rk', 't', 'rt',
           'backward', 'inner')""").head.getLong(0)
      assert(inner ==
        reference(ls, rs, None).count(_._4.nonEmpty).toLong)
    }
    // tolerance argument bounds staleness like the DataFrame API
    bothPaths {
      val (ls, rs) = samples(2).last
      leftDf(ls).createOrReplaceTempView("tvf_l")
      rightDf(rs).withColumnRenamed("k", "rk")
        .createOrReplaceTempView("tvf_r")
      val got = spark.sql(
        """SELECT k, t, lv, rv FROM asof_join(
           TABLE(tvf_l), TABLE(tvf_r), 'k', 'rk', 't', 'rt',
           'backward', 'left', 7)""").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == reference(ls, rs, Some(7L)))
    }
    // multi-key: comma-separated key lists resolve per side
    bothPaths {
      val l = Seq((1L, 10L, 5L, "a"), (1L, 20L, 5L, "b"))
        .toDF("k1", "k2", "t", "lv")
      val r = Seq((1L, 10L, 3L, "x"), (1L, 20L, 4L, "y"))
        .toDF("rk1", "rk2", "rt", "rv")
      l.createOrReplaceTempView("tvf_ml")
      r.createOrReplaceTempView("tvf_mr")
      val got = spark.sql(
        """SELECT lv, rv FROM asof_join(
           TABLE(tvf_ml), TABLE(tvf_mr), 'k1,k2', 'rk1,rk2', 't', 'rt')""")
        .as[(String, String)].collect().toSet
      assert(got == Set(("a", "x"), ("b", "y")))
    }
    // WHERE on the probe side still pushes through the TVF-built node
    val l = leftDf(Seq((1L, 1L, "a"), (2L, 2L, "b")))
    val r = rightDf(Seq((1L, 1L, "x")))
    l.createOrReplaceTempView("tvf_l")
    r.withColumnRenamed("k", "rk").createOrReplaceTempView("tvf_r")
    val q = spark.sql(
      """SELECT lv, rv FROM asof_join(
         TABLE(tvf_l), TABLE(tvf_r), 'k', 'rk', 't', 'rt')
         WHERE lv = 'a'""")
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val pushed = q.queryExecution.optimizedPlan.collect {
      case j: graft.plans.AsOfJoinPlan =>
        j.left.collectFirst { case f: LFilter => f }
    }.flatten
    assert(pushed.nonEmpty, s"probe filter not pushed:\n${q.queryExecution.optimizedPlan}")
    assert(q.as[(String, String)].collect().toSeq == Seq(("a", "x")))
  }

  test("TVF rejects PARTITION BY / ORDER BY specs on TABLE arguments") {
    // the operator derives its own distribution and ordering; a user spec
    // would be silently discarded, so it must fail loudly (r6 review)
    AsOf.ensureRegistered(spark)
    leftDf(Seq((1L, 1L, "a"))).createOrReplaceTempView("tvf_l")
    rightDf(Seq((1L, 1L, "x"))).withColumnRenamed("k", "rk")
      .createOrReplaceTempView("tvf_r")
    for (spec <- Seq("PARTITION BY (k)", "PARTITION BY (k) ORDER BY (t)",
        "WITH SINGLE PARTITION")) {
      val e = intercept[Exception](spark.sql(
        s"""SELECT * FROM asof_join(
           TABLE(tvf_l) $spec, TABLE(tvf_r), 'k', 'rk', 't', 'rt')""")
        .collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("not supported"), s"spec=$spec got: $msgs")
    }
  }

  test("small right side auto-selects the broadcast exec: no shuffle, no sort") {
    import graft.plans.BroadcastAsOfJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.SortExec
    val df = run(leftDf(Seq((1L, 5L, "a"))), rightDf(Seq((1L, 1L, "x"))))
    df.collect()
    val plan = df.queryExecution.executedPlan
    def joinNode(p: SparkPlan): Option[BroadcastAsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => joinNode(a.executedPlan)
      case q: QueryStageExec => joinNode(q.plan)
      case b: BroadcastAsOfJoinExec => Some(b)
      case other => other.children.flatMap(joinNode(_)).headOption
    }
    val b = joinNode(plan)
    assert(b.nonEmpty, s"broadcast exec not chosen:\n$plan")
    // the join subtree is shuffle- and sort-free (the only exchange is
    // the BroadcastExchange feeding the right child)
    assert(!b.get.children.exists(findExec(_) {
      case _: SortExec => true
      case _: ShuffleExchangeLike => true
      case _ => false
    }), s"unexpected shuffle/sort under broadcast as-of:\n${b.get}")
  }
}

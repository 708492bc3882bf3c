package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench harness's oracle canonicalization stripping —
  * the measured surface must compare the SAME query on both engines.
  */
class BenchSpec extends AnyFunSuite {

  test("stripCanonOrder removes a trailing canonical sort list") {
    assert(Bench.stripCanonOrder("SELECT * FROM t ORDER BY a, b") ==
      "SELECT * FROM t")
    assert(Bench.stripCanonOrder("SELECT * FROM t ORDER BY 1, 2, 3") ==
      "SELECT * FROM t")
    // canonOrder accepts desc columns (b13's custdist DESC etc.) — a
    // trailing qualified list is still canonical and still strips
    assert(Bench.stripCanonOrder(
      "SELECT * FROM t ORDER BY revenue DESC, n_name") ==
      "SELECT * FROM t")
    assert(Bench.stripCanonOrder(
      "SELECT * FROM t\n         ORDER BY a.b ASC, c DESC") ==
      "SELECT * FROM t")
    // r12 advice: NULLS FIRST/LAST and quoted identifiers are canonical
    // spellings too — leaving them behind would make the DuckDB twin
    // pay a sort Spark doesn't
    assert(Bench.stripCanonOrder(
      "SELECT * FROM t ORDER BY a DESC NULLS LAST, b NULLS FIRST") ==
      "SELECT * FROM t")
    assert(Bench.stripCanonOrder(
      "SELECT * FROM t ORDER BY \"odd col\" ASC, b") ==
      "SELECT * FROM t")
  }

  test("no non-headline oracle retains a trailing bare ORDER BY after " +
      "stripping (the strip covers every canonical spelling in use)") {
    val tail = "(?is)\\s+ORDER\\s+BY\\s+[^()]*$".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      val stripped = Bench.stripCanonOrder(sql)
      // a trailing ORDER BY surviving the strip must be load-bearing:
      // followed by LIMIT/OFFSET (top-k) — otherwise the grammar missed
      // a canonical sort spelling and the twin times an extra sort
      tail.findFirstIn(stripped).foreach { t =>
        assert("(?i)\\b(limit|offset)\\b".r.findFirstIn(t).isDefined,
          s"$name: non-top-k trailing ORDER BY survived the strip: $t")
      }
    }
  }

  test("stripCanonOrder never crosses a LIMIT/OFFSET (the r11 bug: four " +
      "headline twins lost their semantic top-k)") {
    val topk = "SELECT * FROM t ORDER BY score DESC, id LIMIT 20"
    assert(Bench.stripCanonOrder(topk) == topk)
    val off = "SELECT * FROM t ORDER BY id LIMIT 20 OFFSET 40"
    assert(Bench.stripCanonOrder(off) == off)
    val plain = "SELECT * FROM t ORDER BY wc DESC LIMIT 5"
    assert(Bench.stripCanonOrder(plain) == plain)
  }

  test("every duckHeadline oracle keeps its LIMIT through the strip") {
    val sqls = SparkEntry.oracleSql.view
      .filterKeys(Bench.duckHeadline.contains).toMap
    assert(sqls.nonEmpty)
    def limits(s: String): Int =
      "(?i)\\blimit\\b".r.findAllIn(s).length
    for ((name, sql) <- sqls) {
      val stripped = Bench.stripCanonOrder(sql)
      assert(limits(stripped) == limits(sql),
        s"$name: strip removed a LIMIT — semantic top-k lost")
      // and stripping is the only edit: the stripped text is a prefix
      assert(sql.startsWith(stripped), s"$name: strip edited mid-string")
    }
  }
}

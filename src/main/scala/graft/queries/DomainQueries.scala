package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Core._
import graft.functions.Domain

/** Domain-logic queries — SURVEY §2.10 F1-F5/F9/F11/F12 as Column
  * expressions over the driver tables, the A11 token matrix (price
  * fallback chain with the rebase-glitch correction), the decode-faithful
  * ingest slice (S2/S3 + §2.8 encoding fns), and the §2.8 array/JSON
  * functions. F6-F8 (swap sim / routing) are driver-side pure Scala over
  * collected pool rows — see operators/Swap.scala and SwapSpec.
  *
  * The driver tables stand in for the domain tables (events≈trades keyed
  * by user_id≈token, customer≈tokens, part≈pools); the expressions under
  * test are the reference's, the column bindings are synthetic.
  */
object DomainQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(

    // F1: direction classification (core/parse.js:35).
    "f1_direction" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000L)
        .select(col("event_id"),
          Domain.classifyDirection(col("event_type"), lit("purchase"))
            .as("direction"))
        .canonOrder(col("event_id"))
    },

    // F2: pair normalization — uzig forced to quote side (core/parse.js:71-76).
    // Pair strings synthesized so all three branches (uzig-first,
    // uzig-second, no-uzig) and the first-dash split are exercised.
    "f2_normalize_pair" -> { (s, d) =>
      val pair = when(col("p_partkey") % 3 === 0,
          concat(lit("uzig-"), lower(col("p_brand"))))
        .when(col("p_partkey") % 3 === 1,
          concat(lower(col("p_brand")), lit("-uzig")))
        .otherwise(lower(col("p_type")))
      val np = Domain.normalizePair(pair)
      Tables.part(s, d)
        .filter(col("p_partkey") <= 2000L)
        .select(col("p_partkey"), pair.as("pair"),
          np.getField("base").as("base"), np.getField("quote").as("quote"))
        .canonOrder(col("p_partkey"))
    },

    // F3: display scaling (core/parse.js:36) — exponent varies per line.
    "f3_todisp" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 300L)
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          round4(Domain.toDisp(col("l_extendedprice"), col("l_linenumber")))
            .as("disp"))
        .canonOrder(col("okey"), col("line"))
    },

    // F4: price from reserves (core/prices.js:69-92) — per-user "pool"
    // with purchase volume as quote reserve, click volume as base reserve.
    "f4_price_reserves" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((xsumIf(col("value"), col("event_type") === "purchase") * 1e6)
            .as("rq_base"),
          (xsumIf(col("value"), col("event_type") === "click") * 1e6)
            .as("rb_base"))
        .select(col("user_id"),
          round4(Domain.priceFromReserves(col("rq_base"), col("rb_base"),
            lit(6))).as("price"))
        .filter(col("price").isNotNull)
        .canonOrder(col("user_id"))
    },

    // JOB: the composed price-from-reserves scheduled batch
    // (jobs/price-from-reserves.js:27-75) — the 8 s loop as ONE declarative
    // pass: uzig-quoted pools ⋈ token meta (the job's SELECT ... INNER JOIN
    // tokens WHERE is_uzig_quote = 1), wait-for-meta skip (null exponent
    // rows dropped BEFORE pricing, :49-55), per-pool reserves → F4 price
    // math, and the finite-positive guard (:62) — emitting the refreshed
    // (token_id, pool_id, price) batch the loop upserts. The reserve fetch
    // itself is LCD-bound (S4 scope); reserves here are deterministic
    // per-pool synthetics, incl. zero-reserve pools the guard must drop.
    // Scale shape: the pool dim filters selectively, the token meta join
    // is broadcast-able, pricing is map-side — the whole "loop over pools
    // with CONCURRENCY=8" becomes one partition-parallel pass.
    "job1_price_refresh" -> { (s, d) =>
      val pools = Tables.part(s, d)
        .filter(col("p_partkey") % 3 === 0) // WHERE is_uzig_quote = 1
        .select(col("p_partkey").as("pool_id"),
          (col("p_partkey") % 100 + 1).as("token_id"),
          ((col("p_partkey") % 97 + 1) * 1e6).as("rq_base"),
          ((col("p_partkey") % 10) * 1e5).as("rb_base"))
      val tokens = Tables.supplier(s, d)
        .select(col("s_suppkey").as("token_id"),
          when(col("s_suppkey") % 7 === 0, lit(null).cast("int"))
            .otherwise((col("s_suppkey") % 4 + 4).cast("int")).as("exp"))
      pools.join(tokens, Seq("token_id"))
        .filter(col("exp").isNotNull) // wait-for-meta: exponent present
        .select(col("pool_id"), col("token_id"),
          round4(Domain.priceFromReserves(col("rq_base"), col("rb_base"),
            col("exp"))).as("price_in_zig"))
        .filter(col("price_in_zig").isNotNull) // finite positive only
        .canonOrder(col("pool_id"))
    },

    // F5: pair-type fee schedule (api/routes/swap.js:21-32), incl. the
    // xyk_<bps> parse and the null default.
    "f5_pair_fee" -> { (s, d) =>
      val ptype = when(col("p_partkey") % 5 === 0, lit("xyk"))
        .when(col("p_partkey") % 5 === 1, lit("concentrated"))
        .when(col("p_partkey") % 5 === 2,
          concat(lit("xyk_"), (col("p_size") * 10).cast("string")))
        .when(col("p_partkey") % 5 === 3, lit("custom-concentrated"))
        .otherwise(lit(null).cast("string"))
      Tables.part(s, d)
        .filter(col("p_partkey") <= 2000L)
        .select(col("p_partkey"), ptype.as("pair_type"),
          Domain.pairFee(ptype).as("fee"))
        .canonOrder(col("p_partkey"))
    },

    // F9: trade class thresholds (api/routes/trades.js:222-226).
    "f9_trade_class" -> { (s, d) =>
      val worth = col("value") * 20d
      Tables.events(s, d)
        .filter(col("event_id") < 2000L)
        .select(col("event_id"), round4(worth).as("worth"),
          Domain.tradeClass(worth).as("cls"))
        .canonOrder(col("event_id"))
    },

    // F12: worth expression — ZIG-leg preferred, else notional × price
    // (api/routes/trades.js:216-220,353-388).
    "f12_worth" -> { (s, d) =>
      val zigLeg = when(col("event_type") === "purchase", col("value"))
      val px = lit(0.5d) + (col("user_id") % 10).cast("double") / 10d
      val w = Domain.worth(zigLeg, col("value"), px)
      Tables.events(s, d)
        .filter(col("event_id") < 2000L)
        .select(col("event_id"), round4(w).as("worth"),
          Domain.tradeClass(w).as("cls"))
        .canonOrder(col("event_id"))
    },

    // F11: security risk score (api/routes/tokens.js:1104-1143) — rule
    // chain over synthetic per-customer security facts; age from real
    // order dates vs a collected literal anchor.
    "f11_security_score" -> { (s, d) =>
      val o = Tables.orders(s, d)
      // o_orderdate is normalized to session-zone (UTC) TimestampType by
      // Tables.orders whatever the parquet physical type; epoch matches
      // DuckDB's epoch() on the same instants.
      val anchorSec = o.agg(max(col("o_orderdate"))).head()
        .getTimestamp(0).toInstant.getEpochSecond
      val firstSeen = o.groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_seen"),
          count_if(col("o_totalprice") > 1000d).as("big_orders"))
      Tables.customer(s, d)
        .join(firstSeen, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          Domain.securityScore(
            isMintable = col("c_mktsegment") === "BUILDING",
            canChangeCap = col("c_acctbal") < 0d,
            top10PctOfMax = abs(col("c_acctbal")) % 100d,
            creatorPctOfMax = (col("c_custkey") % 40).cast("double"),
            holdersCount = (col("c_custkey") * 37) % 12000,
            fullyMinted = col("c_custkey") % 2 === 0,
            daysAlive = coalesce(
              floor((lit(anchorSec)
                - unix_timestamp(col("first_seen").cast("timestamp")))
                / 86400d).cast("double"),
              lit(0d))).cast("long").as("score"))
        .canonOrder(col("c_custkey"))
    },

    // A11: token matrix — trades-price with 60m-avg-OHLCV fallback, the
    // ×10⁻⁶ rebase-glitch correction, mcap/fdv from display supplies,
    // holders count (jobs/matrix-rollups.js:242-336). events play trades
    // (latest purchase value = prices source; 1-day click average = OHLCV
    // source), customers play tokens.
    "a11_token_matrix" -> { (s, d) =>
      tokenMatrix(s, d).canonOrder(col("token_id"))
    },

    // §3.2 serving composite: the GET /tokens list page — matrix metrics,
    // total count, dynamic sort, LIMIT page (api/routes/tokens.js:178-245)
    // — with the reference's per-row helper fan-outs collapsed into the
    // joins that already built the matrix. Total is a scalar count, not a
    // single-partition window (see w3).
    "api1_token_list" -> { (s, d) =>
      val m = tokenMatrix(s, d)
      // total == |customer|: the matrix is built by LEFT joins off the
      // customer scan, so counting it would recompute the whole
      // aggregation chain just to learn the row count of its preserved
      // side. Counting the base table reads parquet footers only.
      val total = Tables.customer(s, d).count()
      m.withColumn("total", lit(total))
        .orderBy(col("mcap_zig").desc, col("token_id"))
        .limit(20)
    },

    // §3 serving composite #2: the GET /trades page — newest-first keyset
    // page of fact rows, each enriched with the prevailing reference
    // value via the custom as-of join (api/routes/trades.js: per-trade
    // price lookups + cursor pagination). The keyset predicate sits on
    // the PROBE side, so PushFilterThroughAsOfJoin must carry it through
    // the custom node into the fact scan — this query exercises that
    // rule in a composed serving path, then TakeOrdered pages the result.
    "api2_trades_page" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"),
          max_by(col("value"), col("event_id")).as("click_value"))
      graft.plans.AsOf.joinBackward(purchases, clicks,
          Seq("user_id"), Seq("c_user"), "ts", "click_ts")
        .filter(col("event_id") < 9000L) // keyset cursor from the client
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"),
          col("click_id"), unix_micros(col("click_ts")).as("click_ts_us"),
          col("click_value"))
        .orderBy(col("event_id").desc)
        .limit(20)
    },

    // §3 serving composite #3: the GET /tokens/:id/ohlcv chart route
    // (api/routes/tokens.js:1244-1558): a from/to window over ONE
    // series, 1h candles resampled to the requested tf, fill=prev gap
    // fill, newest `limit` bars. The 14-day cutoff collects to a literal
    // and reaches the parquet scan through the raw-nanos pushdown path
    // (Tables.eventsFrom) — at 100 TB the route reads days, not history.
    // The series key (pool_id, synthesized as user_id%4; the route's :id
    // selects pool 1) threads through candles → resample → gapFill so
    // the carry window PARTITIONS by series — the production per-pool
    // shape, never a single-partition window over all series.
    "api3_ohlcv_route" -> { (s, d) =>
      val cut = anchorInstantMinusSec(Tables.events(s, d), col("ts"),
        14L * 86400L)
      val e = Tables.eventsFrom(s, d, cut)
        .filter(col("event_type") === "purchase")
        .withColumn("pool_id", col("user_id") % 4)
        .filter(col("pool_id") === 1L)
      val key = Seq("pool_id")
      val c1h = graft.operators.Ohlcv.candles(e, key,
        col("ts"), col("event_id"), col("value"), col("value"), 3600L)
      val c6h = graft.operators.Ohlcv.resample(c1h, key, 21600L)
      graft.operators.Ohlcv.gapFill(c6h, key, 21600L, mode = "prev")
        .select(col("pool_id"), col("bucket_ts"), col("open"), col("high"),
          col("low"), col("close"), col("volume"), col("trade_count"))
        .orderBy(col("bucket_ts").desc).limit(300)
        .canonOrder(col("bucket_ts"))
    },

    // §3 serving composite #4: the GET /tokens/:id detail — ONE token's
    // matrix row (price/mcap/fdv/holders) joined with its security score
    // (api/routes/tokens.js:91-243 + 1104-1143). The single-key lookup
    // shape: the token_id equality pushes through the matrix joins onto
    // the customer scan; the age anchor stays a global collected literal
    // exactly as in f11.
    "api4_token_detail" -> { (s, d) =>
      val m = tokenMatrix(s, d).filter(col("token_id") === 42L)
      val o = Tables.orders(s, d)
      val anchorSec = o.agg(max(col("o_orderdate"))).head()
        .getTimestamp(0).toInstant.getEpochSecond
      val firstSeen = o.filter(col("o_custkey") === 42L)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_seen"))
      val sec = Tables.customer(s, d).filter(col("c_custkey") === 42L)
        .join(firstSeen, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          Domain.securityScore(
            isMintable = col("c_mktsegment") === "BUILDING",
            canChangeCap = col("c_acctbal") < 0d,
            top10PctOfMax = abs(col("c_acctbal")) % 100d,
            creatorPctOfMax = (col("c_custkey") % 40).cast("double"),
            holdersCount = (col("c_custkey") * 37) % 12000,
            fullyMinted = col("c_custkey") % 2 === 0,
            daysAlive = coalesce(
              floor((lit(anchorSec)
                - unix_timestamp(col("first_seen").cast("timestamp")))
                / 86400d).cast("double"),
              lit(0d))).cast("long").as("score"))
      m.join(sec, col("token_id") === col("c_custkey"))
        .select(col("token_id"), col("price_in_zig"), col("mcap_zig"),
          col("fdv_zig"), col("holders"), col("score"))
    },

    // S3 + §2.8 encoding: base64 round-trip decode check, "amount+denom"
    // asset parse, "denom:amount" k/v parse (core/parse.js:4-17,38-60).
    "s3_event_decode" -> { (s, d) =>
      val b64 = base64(col("text").cast("binary"))
      val decoded = decode(unbase64(b64), "UTF-8")
      val assetStr = concat(col("n_chars"), lower(col("source")))
      val kvStr = concat(lower(col("source")), lit(":"), col("n_chars"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          (decoded === col("text")).as("round_ok"),
          regexp_extract(assetStr, "^(\\d+)([a-zA-Z0-9.\\-_]+)$", 1)
            .cast("long").as("amount"),
          regexp_extract(assetStr, "^(\\d+)([a-zA-Z0-9.\\-_]+)$", 2)
            .as("denom"),
          substring_index(kvStr, ":", 1).as("kv_denom"),
          substring_index(kvStr, ":", -1).cast("long").as("kv_amount"))
        .canonOrder(col("doc_id"))
    },

    // §2.8 JSON: extract a typed field from the JSON props payload
    // (jobs/alerts.js:14-101 reads alert params the same way).
    "x1_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .canonOrder(col("event_type"))
    },

    // §2.8 JSON, typed form: from_json with an explicit schema — the
    // alert-params shape (phase3schema.sql:300 JSONB params).
    "x5_from_json" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000L)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
        .canonOrder(col("event_id"))
    },

    // §2.8 / A-family: typed pivot — per-user cross-tab of event counts
    // and exact value sums by event_type (the matrix-panel transpose the
    // reference assembles in app code). The pivot value list is EXPLICIT
    // (the enum is fixed), so Spark skips the distinct-scan pre-pass and
    // the schema is static; the plan is ONE hash aggregate with map-side
    // partials — each pivot cell is a conditional aggregate, exactly the
    // FILTER-clause form the oracle uses. Counts null-fill to 0 (a user
    // with no such events has a 0 cell, as count FILTER yields); sums
    // stay NULL for empty cells on both engines.
    "x6_pivot" -> { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"), xsum(col("value"), dp = 2).as("vol"))
        .na.fill(0L, types.map(t => s"${t}_n"))
        .canonOrder(col("user_id"))
    },

    // §2.8 array: explode words, global top-20 by frequency.
    "x2_array_topwords" -> { (s, d) =>
      Tables.documents(s, d)
        .select(explode(graft.functions.Text.words(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    // §2.8 string: the twitter-handle normalizer — three chained
    // regexp_replace passes (phase3schema.sql:415-431): strip scheme+host,
    // strip a leading @, strip trailing slash/query tail.
    "x3_handle_normalize" -> { (s, d) =>
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("https://twitter.com/@"), col("source"), lit("/")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("https://x.com/"), col("source"), lit("?ref=1")))
        .when(col("doc_id") % 4 === 2, concat(lit("@"), col("source")))
        .otherwise(col("source"))
      val h1 = regexp_replace(raw, "^https?://(www\\.)?(x|twitter)\\.com/", "")
      val h2 = regexp_replace(h1, "^@", "")
      val h3 = regexp_replace(h2, "[/?].*$", "")
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"), h3.as("handle"))
        .canonOrder(col("doc_id"))
    },

    // J10: explicit in-memory hash join — the pool-cache Map analog
    // (core/block-processor.js:46-56): a bounded, explicitly-broadcast dim
    // (filtered part) hash-joined against the streaming fact side.
    "j10_broadcast_hash_join" -> { (s, d) =>
      val dim = Tables.part(s, d)
        .filter(col("p_size") <= 10)
        .select(col("p_partkey"), col("p_brand"))
      Tables.lineitem(s, d)
        .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), xsum(col("l_quantity"), dp = 2).as("qty"))
        .canonOrder(col("p_brand"))
    },

    // T10: alert CEP pass — evaluate a small rules table against the
    // latest per-key state every tick (jobs/alerts.js:8-135: price_cross
    // + large_trade rules; throttling is the scheduler's job, the engine
    // evaluates the predicates).
    "t10_alert_rules" -> { (s, d) =>
      val latest = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(latestBy(col("value"), col("event_id")).as("last_value"),
          max(col("value")).as("max_value"))
      val rules = s.createDataFrame(Seq(
        (1L, "purchase", "price_cross_above", 50.0),
        (2L, "purchase", "price_cross_below", 50.0),
        (3L, "click", "price_cross_above", 80.0),
        (4L, "error", "large_trade", 150.0),
        (5L, "view", "price_cross_above", 20.0)))
        .toDF("rule_id", "event_type", "kind", "threshold")
      latest.join(rules, Seq("event_type"))
        .withColumn("fired",
          when(col("kind") === "price_cross_above",
            col("last_value") > col("threshold"))
          .when(col("kind") === "price_cross_below",
            col("last_value") < col("threshold"))
          .otherwise(col("max_value") >= col("threshold")))
        .select(col("rule_id"), col("event_type"), col("kind"),
          col("fired"))
        .canonOrder(col("rule_id"))
    },

    // T10 (remaining kinds): wallet_trade + tvl_change rule evaluation
    // (jobs/alerts.js:47-66, 80-103). wallet_trade counts a signer's
    // trades inside the rule's look-back window (optional direction
    // filter); tvl_change compares the latest TVL against the latest TVL
    // as-of `window_min` ago and fires on |Δ%| ≥ delta_pct. Batch twin:
    // `now()` anchors at max event time; user_id plays signer, event_type
    // plays pool, value plays tvl. Both rule tables are tiny broadcasts;
    // each branch is one pass over events (conditional max_by does the
    // as-of pick without a second scan).
    "t10b_alert_wallet_tvl" -> { (s, d) =>
      val e = Tables.events(s, d)
      val anchorSec = e.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
      val wr = s.createDataFrame(Seq(
        (101L, 1L, 30L, "purchase"),
        (102L, 2L, 120L, null.asInstanceOf[String]),
        (103L, 3L, 60L, "click"),
        (104L, 4L, 10L, null.asInstanceOf[String]),
        (105L, 5L, 360L, "view")))
        .toDF("rule_id", "addr", "since_min", "dir")
      val wc = e
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        .join(broadcast(wr),
          col("user_id") === col("addr") &&
          (col("dir").isNull || col("event_type") === col("dir")) &&
          col("sec") >= lit(anchorSec) - col("since_min") * 60L)
        .groupBy(col("rule_id")).agg(count(lit(1)).as("n"))
      val wallet = wr.join(wc, Seq("rule_id"), "left")
        .select(col("rule_id"), lit("wallet_trade").as("kind"),
          (coalesce(col("n"), lit(0L)) > 0L).as("fired"),
          coalesce(col("n"), lit(0L)).cast("double").as("metric"))
      val tr = s.createDataFrame(Seq(
        (201L, "purchase", 60L, 5.0),
        (202L, "click", 1440L, 10.0),
        (203L, "view", 240L, 1.0),
        (204L, "error", 10080L, 20.0)))
        .toDF("rule_id", "event_type", "window_min", "delta_pct")
      val chg = (col("tvl_now") - col("tvl_past")) / abs(col("tvl_past")) * 100d
      val tvl = e.join(broadcast(tr), Seq("event_type"))
        .groupBy(col("rule_id"), col("delta_pct"))
        .agg(
          latestBy(col("value"), col("event_id")).as("tvl_now"),
          latestBy(col("value"),
            when(unix_timestamp(col("ts")) <=
              lit(anchorSec) - col("window_min") * 60L, col("event_id")))
            .as("tvl_past"))
        .select(col("rule_id"), lit("tvl_change").as("kind"),
          (col("tvl_past").isNotNull && col("tvl_past") =!= 0d &&
            abs(chg) >= col("delta_pct")).as("fired"),
          round4(chg).as("metric"))
      wallet.unionByName(tvl).canonOrder(col("rule_id"))
    }
  )

  /** Shared A11/api1 matrix build — see the a11 entry for semantics. */
  private def tokenMatrix(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val cut = anchorMinusSec(e, col("ts"), 86400L)
    // Only purchase/click rows can contribute (p1's max_by ordinal is null
    // on every other type, p2 sums clicks only), so the type filter is a
    // no-op on the result but reaches the parquet scan as an In predicate —
    // the matrix reads 2 of 5 event types instead of the full fact table.
    // A user with no such events drops out of the aggregate here and
    // resurfaces as the same all-null row via the left join below.
    val priced = e.filter(col("event_type").isin("purchase", "click"))
      .groupBy(col("user_id")).agg(
      latestBy(col("value"),
        when(col("event_type") === "purchase", col("event_id"))).as("p1"),
      xsumIf(col("value"),
        col("event_type") === "click" && col("ts") >= cut).as("o_sum"),
      countIf(col("event_type") === "click" && col("ts") >= cut)
        .as("o_cnt"))
      .select(col("user_id"), col("p1"),
        when(col("o_cnt") > 0, col("o_sum") / col("o_cnt")).as("p2"))
    val holders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 1000d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("holders"))
    val exp = col("c_custkey") % 10
    val price = Domain.tokenPriceDisp(col("p1"), col("p2"), exp)
    val circDisp = (col("c_acctbal") * 1000d) / pow(lit(10d), coalesce(exp, lit(6)))
    val maxDisp = (col("c_acctbal") * 2000d) / pow(lit(10d), coalesce(exp, lit(6)))
    Tables.customer(s, d)
      .join(priced, col("c_custkey") === col("user_id"), "left")
      .join(holders, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey").as("token_id"),
        round4(price).as("price_in_zig"),
        round4(circDisp * price).as("mcap_zig"),
        round4(maxDisp * price).as("fdv_zig"),
        coalesce(col("holders"), lit(0L)).as("holders"))
  }

  /** A11 oracle — shared verbatim by the api1 page (as a CTE). */
  /** F11 oracle body (no ORDER BY) — shared by the f11 entry and the
    * api4 token-detail composite.
    */
  private val f11Sql: String =
    """WITH fs AS (SELECT o_custkey, min(o_orderdate) AS first_seen
           FROM orders GROUP BY o_custkey),
         anchor AS (SELECT max(o_orderdate) AS a FROM orders),
         facts AS (SELECT c_custkey,
           c_mktsegment = 'BUILDING' AS is_mintable,
           c_acctbal < 0 AS can_change_cap,
           abs(c_acctbal) % 100 AS top10,
           CAST(c_custkey % 40 AS DOUBLE) AS creator,
           (c_custkey * 37) % 12000 AS holders,
           c_custkey % 2 = 0 AS fully_minted,
           coalesce(floor((epoch(a) - epoch(first_seen)) / 86400), 0) AS days_alive
         FROM customer LEFT JOIN fs ON c_custkey = o_custkey CROSS JOIN anchor)
         SELECT c_custkey,
           greatest(1, least(99, CAST(round(100
             + CASE WHEN is_mintable THEN -12 ELSE 4 END
             + CASE WHEN can_change_cap THEN -8 ELSE 0 END
             + CASE WHEN top10 >= 75 THEN -20 WHEN top10 >= 50 THEN -12
                    WHEN top10 >= 30 THEN -6 ELSE 4 END
             + CASE WHEN creator >= 25 THEN -18 WHEN creator >= 10 THEN -10
                    WHEN creator > 0 THEN 3 ELSE 0 END
             + CASE WHEN holders < 100 THEN -8 WHEN holders < 1000 THEN -4
                    WHEN holders >= 10000 THEN 5 ELSE 0 END
             + CASE WHEN NOT is_mintable AND fully_minted THEN 4 ELSE 0 END
             + CASE WHEN days_alive >= 180 THEN 6 WHEN days_alive >= 90 THEN 4
                    WHEN days_alive >= 30 THEN 2 ELSE 0 END, 0) AS INT)))
           AS score
         FROM facts"""

  private val a11Sql: String =
    """WITH cut AS (SELECT max(ts) - INTERVAL 1 DAY AS c FROM events),
       pr AS (SELECT user_id,
         max_by(value, CASE WHEN event_type = 'purchase' THEN event_id END) AS p1,
         CAST(SUM(CAST(floor((CASE WHEN event_type = 'click' AND ts >= c THEN value ELSE 0 END)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS o_sum,
         count(*) FILTER (WHERE event_type = 'click' AND ts >= c) AS o_cnt
       FROM events CROSS JOIN cut GROUP BY user_id),
       px AS (SELECT user_id, p1,
         CASE WHEN o_cnt > 0 THEN o_sum / o_cnt END AS p2 FROM pr),
       h AS (SELECT o_custkey, count(*) AS holders FROM orders
             WHERE o_totalprice > 1000 GROUP BY o_custkey),
       m AS (SELECT c_custkey, c_acctbal, p1, p2, holders,
         c_custkey % 10 AS exp,
         CASE WHEN p1 IS NOT NULL AND p2 IS NOT NULL AND p2 > 0
                AND p1 / p2 BETWEEN 100000 AND 10000000
                AND coalesce(c_custkey % 10, 6) = 6
              THEN p1 / 1000000
              WHEN p1 IS NOT NULL THEN p1
              WHEN p2 IS NOT NULL THEN p2
              ELSE 0 END AS price
       FROM customer
       LEFT JOIN px ON c_custkey = user_id
       LEFT JOIN h ON c_custkey = o_custkey)
       SELECT c_custkey AS token_id,
         round(price, 4) + 0 AS price_in_zig,
         round((c_acctbal * 1000) / pow(10, coalesce(exp, 6)) * price, 4) + 0 AS mcap_zig,
         round((c_acctbal * 2000) / pow(10, coalesce(exp, 6)) * price, 4) + 0 AS fdv_zig,
         coalesce(holders, 0) AS holders
       FROM m ORDER BY token_id"""

  val oracles: Map[String, String] = Map(
    "f1_direction" ->
      """SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 'buy' ELSE 'sell' END AS direction
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "f2_normalize_pair" ->
      """WITH p AS (SELECT p_partkey,
           CASE WHEN p_partkey % 3 = 0 THEN 'uzig-' || lower(p_brand)
                WHEN p_partkey % 3 = 1 THEN lower(p_brand) || '-uzig'
                ELSE lower(p_type) END AS pair
         FROM part WHERE p_partkey <= 2000),
         sp AS (SELECT p_partkey, pair,
           CASE WHEN strpos(pair, '-') = 0 THEN pair
                ELSE substr(pair, 1, strpos(pair, '-')-1) END AS x,
           CASE WHEN strpos(pair, '-') = 0 THEN ''
                ELSE substr(pair, strpos(pair, '-')+1) END AS y
         FROM p)
         SELECT p_partkey, pair,
           CASE WHEN x = 'uzig' AND y <> '' THEN y
                WHEN y = 'uzig' AND x <> '' THEN x
                ELSE x END AS base,
           CASE WHEN x = 'uzig' AND y <> '' THEN 'uzig'
                WHEN y = 'uzig' AND x <> '' THEN 'uzig'
                ELSE y END AS quote
         FROM sp ORDER BY p_partkey""",
    "f3_todisp" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line,
         round(l_extendedprice / pow(10, coalesce(l_linenumber, 0)), 4) AS disp
         FROM lineitem WHERE l_orderkey < 300 ORDER BY okey, line""",
    "f4_price_reserves" ->
      """WITH r AS (SELECT user_id,
           CAST(SUM(CAST(floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 * 1e6 AS rq_base,
           CAST(SUM(CAST(floor((CASE WHEN event_type = 'click' THEN value ELSE 0 END)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 * 1e6 AS rb_base
         FROM events GROUP BY user_id)
         SELECT user_id,
           round((rq_base / 1000000.0) / (rb_base / pow(10, 6)), 4) AS price
         FROM r WHERE rq_base > 0 AND rb_base > 0
         ORDER BY user_id""",
    "job1_price_refresh" ->
      """WITH p AS (SELECT p_partkey AS pool_id,
           (p_partkey % 100) + 1 AS token_id,
           ((p_partkey % 97) + 1) * 1000000.0 AS rq_base,
           (p_partkey % 10) * 100000.0 AS rb_base
         FROM part WHERE p_partkey % 3 = 0),
         b AS (SELECT s_suppkey AS token_id,
           CASE WHEN s_suppkey % 7 = 0 THEN NULL
                ELSE CAST((s_suppkey % 4) + 4 AS INTEGER) END AS exp
         FROM supplier),
         j AS (SELECT pool_id, token_id, rq_base, rb_base, exp
               FROM p JOIN b USING (token_id) WHERE exp IS NOT NULL)
         SELECT pool_id, token_id,
           round((rq_base / 1000000.0) / (rb_base / pow(10, exp)), 4)
             AS price_in_zig
         FROM j WHERE rq_base > 0 AND rb_base > 0
         ORDER BY pool_id""",
    "f5_pair_fee" ->
      """WITH p AS (SELECT p_partkey,
           CASE WHEN p_partkey % 5 = 0 THEN 'xyk'
                WHEN p_partkey % 5 = 1 THEN 'concentrated'
                WHEN p_partkey % 5 = 2 THEN 'xyk_' || CAST(p_size * 10 AS VARCHAR)
                WHEN p_partkey % 5 = 3 THEN 'custom-concentrated'
                ELSE NULL END AS pair_type
         FROM part WHERE p_partkey <= 2000)
         SELECT p_partkey, pair_type,
           CASE WHEN pair_type IS NULL THEN 0.003
                WHEN lower(pair_type) = 'xyk' THEN 0.0001
                WHEN lower(pair_type) = 'concentrated' THEN 0.01
                WHEN regexp_extract(lower(pair_type), 'xyk[_-](\d+)', 1) <> ''
                  THEN CAST(regexp_extract(lower(pair_type), 'xyk[_-](\d+)', 1) AS DOUBLE) / 10000
                ELSE 0.003 END AS fee
         FROM p ORDER BY p_partkey""",
    "f9_trade_class" ->
      """SELECT event_id, round(value * 20, 4) AS worth,
         CASE WHEN value * 20 < 1000 THEN 'shrimp'
              WHEN value * 20 <= 10000 THEN 'shark'
              ELSE 'whale' END AS cls
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "f12_worth" ->
      """WITH w AS (SELECT event_id,
           coalesce(CASE WHEN event_type = 'purchase' THEN value END,
             value * (0.5 + CAST(user_id % 10 AS DOUBLE) / 10)) AS worth
         FROM events WHERE event_id < 2000)
         SELECT event_id, round(worth, 4) AS worth,
           CASE WHEN worth < 1000 THEN 'shrimp'
                WHEN worth <= 10000 THEN 'shark'
                ELSE 'whale' END AS cls
         FROM w ORDER BY event_id""",
    "f11_security_score" -> (f11Sql + " ORDER BY c_custkey"),
    "a11_token_matrix" -> a11Sql,
    "api1_token_list" ->
      s"""WITH am AS ($a11Sql)
         SELECT token_id, price_in_zig, mcap_zig, fdv_zig, holders,
           (SELECT count(*) FROM am) AS total
         FROM am ORDER BY mcap_zig DESC, token_id LIMIT 20""",
    "api2_trades_page" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'purchase'),
         c AS (SELECT user_id AS c_user, ts AS click_ts,
             max(event_id) AS click_id,
             max_by(value, event_id) AS click_value
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.user_id, epoch_us(p.ts) AS ts_us, p.event_id, p.value,
           c.click_id, epoch_us(c.click_ts) AS click_ts_us, c.click_value
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.c_user AND p.ts >= c.click_ts
         WHERE p.event_id < 9000
         ORDER BY p.event_id DESC LIMIT 20""",
    "api3_ohlcv_route" ->
      """WITH a AS (SELECT max(ts) - INTERVAL 14 DAY AS cut FROM events),
         t AS (SELECT e.*, CAST(user_id % 4 AS BIGINT) AS pool_id
               FROM events e, a
               WHERE e.event_type = 'purchase' AND e.ts >= a.cut
                 AND user_id % 4 = 1),
         c AS (SELECT pool_id,
               CAST(floor(epoch(ts)/21600)*21600 AS BIGINT) AS bucket_ts,
               min_by(value, event_id) AS open,
               max(value) AS high, min(value) AS low,
               max_by(value, event_id) AS close,
               CAST(SUM(CAST(floor((value)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS volume,
               count(*) AS trade_count
             FROM t GROUP BY 1, 2),
         spine AS (SELECT pool_id, unnest(generate_series(
             min(bucket_ts), max(bucket_ts), 21600)) AS bucket_ts
           FROM c GROUP BY pool_id),
         j AS (SELECT s.pool_id, s.bucket_ts, c.open, c.high, c.low,
                 c.close, c.volume, c.trade_count
               FROM spine s LEFT JOIN c USING (pool_id, bucket_ts)),
         k AS (SELECT *, last_value(close IGNORE NULLS) OVER (
                 PARTITION BY pool_id ORDER BY bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
               FROM j),
         f AS (SELECT pool_id, bucket_ts,
                 coalesce(open, carry) AS open,
                 coalesce(high, carry) AS high,
                 coalesce(low, carry) AS low,
                 coalesce(close, carry) AS close,
                 coalesce(volume, 0) AS volume,
                 coalesce(trade_count, 0) AS trade_count
               FROM k),
         page AS (SELECT * FROM f ORDER BY bucket_ts DESC LIMIT 300)
         SELECT * FROM page ORDER BY bucket_ts""",
    "api4_token_detail" ->
      s"""WITH am AS ($a11Sql),
         sec AS ($f11Sql)
         SELECT am.token_id, am.price_in_zig, am.mcap_zig, am.fdv_zig,
           am.holders, sec.score
         FROM am JOIN sec ON am.token_id = sec.c_custkey
         WHERE am.token_id = 42""",
    "s3_event_decode" ->
      """SELECT doc_id,
         decode(from_base64(base64(encode(text)))) = text AS round_ok,
         CAST(regexp_extract(n_chars || lower(source),
           '^(\d+)([a-zA-Z0-9.\-_]+)$', 1) AS BIGINT) AS amount,
         regexp_extract(n_chars || lower(source),
           '^(\d+)([a-zA-Z0-9.\-_]+)$', 2) AS denom,
         substr(lower(source) || ':' || n_chars, 1,
           strpos(lower(source) || ':' || n_chars, ':')-1) AS kv_denom,
         CAST(substr(lower(source) || ':' || n_chars,
           strpos(lower(source) || ':' || n_chars, ':')+1) AS BIGINT) AS kv_amount
         FROM documents ORDER BY doc_id""",
    "x1_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "x5_from_json" ->
      """SELECT event_id,
         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "x6_pivot" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click') AS click_n,
         CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) FILTER (WHERE event_type = 'click') AS DOUBLE)/100 AS click_vol,
         count(*) FILTER (WHERE event_type = 'error') AS error_n,
         CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) FILTER (WHERE event_type = 'error') AS DOUBLE)/100 AS error_vol,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
         CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) FILTER (WHERE event_type = 'purchase') AS DOUBLE)/100 AS purchase_vol,
         count(*) FILTER (WHERE event_type = 'signup') AS signup_n,
         CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) FILTER (WHERE event_type = 'signup') AS DOUBLE)/100 AS signup_vol,
         count(*) FILTER (WHERE event_type = 'view') AS view_n,
         CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) FILTER (WHERE event_type = 'view') AS DOUBLE)/100 AS view_vol
         FROM events GROUP BY user_id ORDER BY user_id""",
    "x2_array_topwords" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(regexp_split_to_array(trim(lower(text),
             ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
             '[\s\x0B]+')) AS word
           FROM documents)
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "x3_handle_normalize" ->
      """WITH r AS (SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN 'https://twitter.com/@' || source || '/'
                WHEN doc_id % 4 = 1 THEN 'https://x.com/' || source || '?ref=1'
                WHEN doc_id % 4 = 2 THEN '@' || source
                ELSE source END AS raw
         FROM documents)
         SELECT doc_id, raw,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '^https?://(www\.)?(x|twitter)\.com/', ''),
             '^@', ''), '[/?].*$', '') AS handle
         FROM r ORDER BY doc_id""",
    "j10_broadcast_hash_join" ->
      """SELECT p_brand, count(*) AS n,
         CAST(SUM(CAST(floor((l_quantity)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 10
         GROUP BY p_brand ORDER BY p_brand""",
    "t10_alert_rules" ->
      """WITH latest AS (
           SELECT event_type, max_by(value, event_id) AS last_value,
             max(value) AS max_value
           FROM events GROUP BY event_type),
         rules(rule_id, event_type, kind, threshold) AS (VALUES
           (1, 'purchase', 'price_cross_above', 50.0),
           (2, 'purchase', 'price_cross_below', 50.0),
           (3, 'click', 'price_cross_above', 80.0),
           (4, 'error', 'large_trade', 150.0),
           (5, 'view', 'price_cross_above', 20.0))
         SELECT CAST(rule_id AS BIGINT) AS rule_id, l.event_type, kind,
           CASE WHEN kind = 'price_cross_above' THEN last_value > threshold
                WHEN kind = 'price_cross_below' THEN last_value < threshold
                ELSE max_value >= threshold END AS fired
         FROM latest l JOIN rules r ON l.event_type = r.event_type
         ORDER BY rule_id""",
    "t10b_alert_wallet_tvl" ->
      """WITH a AS (
           SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS asec FROM events),
         wr(rule_id, addr, since_min, dir) AS (VALUES
           (101, 1, 30, 'purchase'),
           (102, 2, 120, NULL),
           (103, 3, 60, 'click'),
           (104, 4, 10, NULL),
           (105, 5, 360, 'view')),
         wc AS (
           SELECT wr.rule_id, count(*) AS n
           FROM events e CROSS JOIN a
           JOIN wr ON e.user_id = wr.addr
             AND (wr.dir IS NULL OR e.event_type = wr.dir)
             AND CAST(floor(epoch(e.ts)) AS BIGINT) >= a.asec - wr.since_min*60
           GROUP BY 1),
         tr(rule_id, event_type, window_min, delta_pct) AS (VALUES
           (201, 'purchase', 60, 5.0),
           (202, 'click', 1440, 10.0),
           (203, 'view', 240, 1.0),
           (204, 'error', 10080, 20.0)),
         tv AS (
           SELECT tr.rule_id, tr.delta_pct,
             max_by(e.value, e.event_id) AS tvl_now,
             max_by(e.value, CASE
               WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
                    <= a.asec - tr.window_min*60
               THEN e.event_id END) AS tvl_past
           FROM events e CROSS JOIN a
           JOIN tr ON e.event_type = tr.event_type
           GROUP BY 1, 2)
         SELECT CAST(rule_id AS BIGINT) AS rule_id,
           'wallet_trade' AS kind,
           coalesce(n, 0) > 0 AS fired,
           CAST(coalesce(n, 0) AS DOUBLE) AS metric
         FROM wr LEFT JOIN wc USING (rule_id)
         UNION ALL
         SELECT CAST(rule_id AS BIGINT) AS rule_id,
           'tvl_change' AS kind,
           (tvl_past IS NOT NULL AND tvl_past <> 0
             AND abs((tvl_now - tvl_past)/abs(tvl_past)*100) >= delta_pct)
             AS fired,
           round((tvl_now - tvl_past)/abs(tvl_past)*100, 4) + 0 AS metric
         FROM tv
         ORDER BY rule_id"""
  )
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — the LCD enrichment source (SURVEY §2.1): the reference's REST
  * side-input lookups behind a mockable client trait.
  *
  * The reference talks to a Cosmos LCD endpoint for five lookups
  * (lib/lcd.js:30-51): denom metadata, factory denom supplies, paged
  * denom owners, the CosmWasm `{pool:{}}` smart query (reserves,
  * core/prices.js:35-66), and IBC denom traces. The sandbox has no
  * network, and the ENGINE-side design shouldn't care: lookups are a
  * driver-side side input — the distinct key set is bounded (distinct
  * denoms/pairs, not corpus rows), the results become small DataFrames
  * that broadcast into the existing meta/holders/price paths. So the
  * client is a TRAIT; production would implement it over HTTP, tests
  * implement it over fixtures, and everything above the trait — the
  * endpoint failover policy (lib/lcd.js:9-26), the TTL cache +
  * in-flight coalescing (core/prices.js:35-41), the owners paging sweep
  * (jobs/holders-refresher.js:81-110), and the meta-derivation rules
  * (core/tokens.js:269-310) — is engine code, exercised by LcdSpec.
  *
  * Scale shape: every method here is keyed by a DIM-sized key (denom,
  * contract); nothing iterates corpus rows. The produced frames join
  * downstream as broadcast side inputs (a11's supply/holders joins).
  */
object Lcd {

  /** One denom's bank metadata (core/tokens.js:287-296 reads name /
    * symbol / display / denom_units-derived exponent).
    */
  final case class DenomMeta(name: String, symbol: String,
                             display: String,
                             displayExponent: Option[Int])

  /** Factory supplies (core/tokens.js:418-431: max_supply/total_supply,
    * base-unit strings — kept as raw digit strings like the reference;
    * the engine's decimal(38,0) ingestion parses them downstream).
    */
  final case class FactorySupply(maxSupplyBase: Option[String],
                                 totalSupplyBase: Option[String])

  /** One denom_owners page + the cursor for the next
    * (jobs/holders-refresher.js:66, lcdDenomOwners's pagination.key).
    */
  final case class OwnersPage(owners: Seq[(String, String)],
                              nextKey: Option[String])

  /** One pool reserve entry (core/prices.js:48-58: denom + integer
    * base-amount string).
    */
  final case class Reserve(denom: String, amountBase: String)

  /** The mockable lookup surface — the five reference endpoints.
    * Implementations throw on transport failure; retry/failover policy
    * lives in [[failover]], not in implementations.
    */
  trait LcdClient {
    def denomMetadata(denom: String): Option[DenomMeta]
    def factoryDenom(denom: String): Option[FactorySupply]
    def denomOwners(denom: String, pageKey: Option[String]): OwnersPage
    def smartPoolReserves(pairContract: String): Seq[Reserve]
    def ibcDenomTrace(ibcId: String): Option[String]
  }

  /** Endpoint failover with capped exponential backoff — the
    * lib/lcd.js:9-26 policy: rotate through the endpoint list on any
    * failure, backoff min(1000·1.5^attempt, 10000) ms (the reference
    * adds jitter; deterministic here — jitter defeats test replay and
    * serves no correctness purpose), give up after `maxAttempts` so a
    * dead fleet fails loudly instead of looping forever (the reference
    * retries unboundedly; a batch engine job must terminate). `sleep`
    * is injected so tests replay the schedule without waiting.
    */
  def failover[A](endpoints: Seq[LcdClient], maxAttempts: Int = 8,
                  sleep: Long => Unit = Thread.sleep)
                 (call: LcdClient => A): A = {
    require(endpoints.nonEmpty, "no LCD endpoints configured")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return call(endpoints(attempt % endpoints.size))
      catch {
        case e: Exception =>
          last = e
          attempt += 1
          // backoff only precedes a RETRY — after the final attempt the
          // terminal failure throws immediately instead of stalling the
          // job one more capped backoff for nothing
          if (attempt < maxAttempts)
            sleep(math.min(
              (1000d * math.pow(1.5, attempt - 1)).toLong, 10000L))
      }
    }
    throw new RuntimeException(
      s"LCD failed after $maxAttempts attempts: ${last.getMessage}", last)
  }

  /** TTL cache + in-flight coalescing for the smart-query path
    * (core/prices.js:35-41: ~2 s TTL, concurrent callers share one
    * fetch). The JVM twin: computeIfAbsent gives coalescing (one
    * loader runs, racers block on it), the (value, loadedAt) pair gives
    * TTL. `clock` injected for tests.
    */
  final class CachedReserves(underlying: LcdClient,
                             ttlMillis: Long = 2000L,
                             clock: () => Long = System.currentTimeMillis) {
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      String, (Seq[Reserve], Long)]()
    private var loads = 0L
    def loadCount: Long = synchronized(loads)
    def get(pairContract: String): Seq[Reserve] = {
      val now = clock()
      val hit = cache.get(pairContract)
      if (hit != null && now - hit._2 < ttlMillis) hit._1
      else {
        cache.compute(pairContract, (_, prev) => {
          if (prev != null && clock() - prev._2 < ttlMillis) prev
          else {
            synchronized(loads += 1)
            (underlying.smartPoolReserves(pairContract), clock())
          }
        })._1
      }
    }
  }

  /** The core/tokens.js:296-308 exponent-resolution rules, as data:
    * display-unit exponent when the metadata has one; 6 for IBC denoms
    * without one; the `u<core>` base-denom derivation (exponent 0,
    * symbol = core uppercased) otherwise; 0 as the final fallback.
    */
  private[sources] def resolveMeta(denom: String, isIbc: Boolean,
                                   meta: Option[DenomMeta])
      : (String, String, Int) = {
    val exp = meta.flatMap(_.displayExponent) match {
      case Some(e) => e
      case None if isIbc => 6
      case None => 0
    }
    val derived = "^u([a-z0-9]+)$".r.findFirstMatchIn(denom)
      .map(_.group(1))
    val symbol = meta.map(_.symbol).filter(_.nonEmpty)
      .orElse(derived.map(_.toUpperCase))
      .getOrElse(denom.toUpperCase)
    val display = meta.map(_.display).filter(_.nonEmpty)
      .orElse(derived.map(_.toLowerCase))
      .getOrElse(denom.toLowerCase)
    (symbol, display, exp)
  }

  /** Enrich a bounded denom list into the token-meta side-input frame —
    * the setTokenMetaFromLCD path (core/tokens.js:269-310 + 418-431):
    * IBC denoms resolve their trace first and look up the BASE denom;
    * metadata and factory supplies land in one row per input denom.
    * Driver-side loop over DIM-sized keys by design (S4's side-input
    * scope); the result broadcasts into the a11/api1 meta joins.
    */
  def enrichTokenMeta(spark: SparkSession, denoms: Seq[String],
                      client: LcdClient): DataFrame = {
    import spark.implicits._
    denoms.map { denom =>
      val isIbc = denom.startsWith("ibc/")
      val base = if (isIbc) client.ibcDenomTrace(denom) else None
      val lookup = base.getOrElse(denom)
      val meta = client.denomMetadata(lookup)
      val (symbol, display, exp) = resolveMeta(lookup, isIbc, meta)
      val fact = client.factoryDenom(lookup)
      (denom, if (isIbc) "ibc" else "native",
        meta.map(_.name).getOrElse(""), symbol, display, exp,
        fact.flatMap(_.maxSupplyBase).orNull,
        fact.flatMap(_.totalSupplyBase).orNull)
    }.toDF("denom", "token_type", "name", "symbol", "display",
      "exponent", "max_supply_base", "total_supply_base")
  }

  /** Page through denom_owners into a full holder snapshot — the
    * refreshHoldersOnce sweep (jobs/holders-refresher.js:81-110):
    * last-page-wins per address (addrMap semantics), bounded by
    * `maxPages` so one hot denom can't starve a cycle; a truncated
    * sweep reports `complete = false` instead of writing a partial
    * snapshot as if it were total. IBC denoms are the caller's skip.
    */
  def holdersSnapshot(denom: String, client: LcdClient,
                      maxPages: Int = 100)
      : (Seq[(String, String)], Boolean) = {
    val addr = scala.collection.mutable.LinkedHashMap[String, String]()
    var key: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val page = client.denomOwners(denom, key)
      page.owners.foreach { case (a, bal) => addr(a) = bal }
      pages += 1
      key = page.nextKey
      done = key.isEmpty
    }
    (addr.toSeq, done)
  }

  /** The holders snapshot as the S9 write: one partition per denom,
    * replaced atomically (Sinks.snapshotReplace = the reference's
    * "DELETE token's holders, INSERT fresh snapshot" without the hole).
    */
  def refreshHolders(spark: SparkSession, denom: String,
                     client: LcdClient, path: String,
                     maxPages: Int = 100): Boolean = {
    import spark.implicits._
    val (owners, complete) = holdersSnapshot(denom, client, maxPages)
    if (complete) {
      val df = owners.toDF("address", "balance_base")
        .withColumn("denom", lit(denom))
      Sinks.snapshotReplace(df, path, "denom")
    }
    complete
  }

  /** Pool reserves for a bounded contract list as the price side-input
    * frame (core/prices.js fetchPoolReserves → the job1 F4 price math):
    * one row per (contract, denom), amounts as raw digit strings.
    */
  def poolReserves(spark: SparkSession, contracts: Seq[String],
                   reserves: CachedReserves): DataFrame = {
    import spark.implicits._
    contracts.flatMap { c =>
      reserves.get(c).map(r => (c, r.denom, r.amountBase))
    }.toDF("pair_contract", "denom", "amount_base")
  }

  /** Fixture-backed client for tests and offline replay: lookups served
    * from maps, owners paged at `pageSize`, and an optional failure
    * budget (`failFirst`) so LcdSpec can drive the failover policy.
    */
  final class FixtureLcdClient(
      meta: Map[String, DenomMeta] = Map.empty,
      supplies: Map[String, FactorySupply] = Map.empty,
      owners: Map[String, Seq[(String, String)]] = Map.empty,
      reserves: Map[String, Seq[Reserve]] = Map.empty,
      traces: Map[String, String] = Map.empty,
      pageSize: Int = 2,
      failFirst: Int = 0) extends LcdClient {
    private var failures = failFirst
    private var calls0 = 0L
    def calls: Long = synchronized(calls0)
    private def tick(): Unit = synchronized {
      calls0 += 1
      if (failures > 0) {
        failures -= 1
        throw new RuntimeException("HTTP 503")
      }
    }
    def denomMetadata(denom: String): Option[DenomMeta] =
      { tick(); meta.get(denom) }
    def factoryDenom(denom: String): Option[FactorySupply] =
      { tick(); supplies.get(denom) }
    def denomOwners(denom: String, pageKey: Option[String]): OwnersPage = {
      tick()
      val all = owners.getOrElse(denom, Seq.empty)
      val from = pageKey.map(_.toInt).getOrElse(0)
      val slice = all.slice(from, from + pageSize)
      val next = if (from + pageSize < all.size)
        Some((from + pageSize).toString) else None
      OwnersPage(slice, next)
    }
    def smartPoolReserves(pairContract: String): Seq[Reserve] =
      { tick(); reserves.getOrElse(pairContract, Seq.empty) }
    def ibcDenomTrace(ibcId: String): Option[String] =
      { tick(); traces.get(ibcId) }
  }
}

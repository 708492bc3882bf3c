package graft.operators

/** Swap simulation and routing (SURVEY §2.10 F5-F8) — pure Scala over
  * collected pool rows. The reference runs these per-request over at most
  * a handful of a token's pools (api/routes/swap.js:57-173), so
  * driver-side evaluation over a collected snapshot IS the right
  * distribution strategy; only the pool-snapshot frames they read are
  * cluster-scale.
  */
object Swap {

  /** One uzig-quoted pool's tradable state in display units. */
  final case class Pool(poolId: Long, pairType: String,
                        reserveZig: Double, reserveToken: Double)

  final case class SimResult(out: Double, price: Double, impact: Double)

  /** F5 (Scala twin of Domain.pairFee, for driver-side sims). */
  def pairFee(pairType: String): Double = {
    if (pairType == null) return 0.003
    val t = pairType.toLowerCase
    if (t == "xyk") return 0.0001
    if (t == "concentrated") return 0.01
    "xyk[_-](\\d+)".r.findFirstMatchIn(t) match {
      case Some(m) => m.group(1).toDouble / 10000d
      case None => 0.003
    }
  }

  /** F6: constant-product swap with fee-on-input
    * (reference api/routes/swap.js:35-55). `fromIsZig` = paying ZIG for
    * token; price is executable ZIG per token either way; impact is the
    * slippage vs the mid price.
    */
  def simulateXYK(fromIsZig: Boolean, amountIn: Double, rz: Double,
                  rt: Double, fee: Double): SimResult = {
    if (!(rz > 0 && rt > 0) || !(amountIn > 0)) return SimResult(0, 0, 0)
    val mid = rz / rt
    val xin = amountIn * (1 - fee)
    if (fromIsZig) {
      val outToken = (xin * rt) / (rz + xin)
      val eff = amountIn / math.max(outToken, 1e-18)
      SimResult(outToken, eff, if (mid > 0) eff / mid - 1 else 0)
    } else {
      val outZig = (xin * rz) / (rt + xin)
      val eff = outZig / amountIn
      SimResult(outZig, eff, if (mid > 0) mid / math.max(eff, 1e-18) - 1 else 0)
    }
  }

  /** F7: best-pool selection — simulate the trade on every candidate pool
    * and keep the max output (reference api/routes/swap.js:57-173;
    * deterministic poolId tiebreak).
    */
  def bestPool(pools: Seq[Pool], fromIsZig: Boolean,
               amountIn: Double): Option[(Pool, SimResult)] =
    pools
      .map(p => p -> simulateXYK(fromIsZig, amountIn, p.reserveZig,
        p.reserveToken, pairFee(p.pairType)))
      .sortBy { case (p, r) => (-r.out, p.poolId) }
      .headOption
      .filter(_._2.out > 0)

  /** F8: two-hop route A→uzig→B — sell A for ZIG on A's best pool, buy B
    * with the proceeds on B's best pool; cross mid = midA/midB
    * (reference api/routes/swap.js:284-357).
    */
  def twoHop(poolsA: Seq[Pool], poolsB: Seq[Pool],
             amountInA: Double): Option[(Double, Double)] =
    for {
      (pa, legA) <- bestPool(poolsA, fromIsZig = false, amountInA)
      (pb, legB) <- bestPool(poolsB, fromIsZig = true, legA.out)
      if legB.out > 0
    } yield {
      val crossMid = (pa.reserveZig / pa.reserveToken) /
        (pb.reserveZig / pb.reserveToken)
      (legB.out, crossMid)
    }
}

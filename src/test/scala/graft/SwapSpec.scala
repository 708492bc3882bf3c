package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Swap
import graft.operators.Swap.Pool

/** Swap sim / routing fixtures (SURVEY F5-F8) — semantics from
  * api/routes/swap.js:21-55 (fee schedule, fee-on-input constant product,
  * impact vs mid) and :57-357 (best pool by output, two-hop A→uzig→B).
  */
class SwapSpec extends AnyFunSuite {

  test("pairFee schedule") {
    assert(Swap.pairFee("xyk") == 0.0001)
    assert(Swap.pairFee("concentrated") == 0.01)
    assert(Swap.pairFee("xyk_30") == 0.003)
    assert(Swap.pairFee("XYK-250") == 0.025)
    assert(Swap.pairFee("custom-concentrated") == 0.003)
    assert(Swap.pairFee(null) == 0.003)
  }

  test("simulateXYK zig→token: constant product with fee on input") {
    val r = Swap.simulateXYK(fromIsZig = true, amountIn = 100,
      rz = 10000, rt = 5000, fee = 0.003)
    val xin = 100 * (1 - 0.003)
    val expectedOut = xin * 5000 / (10000 + xin)
    assert(math.abs(r.out - expectedOut) < 1e-12)
    assert(math.abs(r.price - 100 / expectedOut) < 1e-12)
    // paying the spread: effective price worse than mid (impact > 0)
    assert(r.impact > 0 && r.impact < 0.05)
  }

  test("simulateXYK token→zig mirrors orientation") {
    val r = Swap.simulateXYK(fromIsZig = false, amountIn = 50,
      rz = 10000, rt = 5000, fee = 0.0001)
    val xin = 50 * (1 - 0.0001)
    val expectedOut = xin * 10000 / (5000 + xin)
    assert(math.abs(r.out - expectedOut) < 1e-12)
    assert(r.impact > 0)
  }

  test("degenerate pools and amounts return zeros") {
    assert(Swap.simulateXYK(true, 0, 10, 10, 0.003).out == 0)
    assert(Swap.simulateXYK(true, 5, 0, 10, 0.003).out == 0)
  }

  test("bestPool picks max output with poolId tiebreak") {
    val pools = Seq(
      Pool(1, "xyk", 10000, 5000),       // deep, 1bp fee
      Pool(2, "concentrated", 10000, 5000), // same depth, 100bp fee
      Pool(3, "xyk", 100, 50))           // shallow
    val Some((best, sim)) = Swap.bestPool(pools, fromIsZig = true, 100)
    assert(best.poolId == 1) // lowest fee at equal depth wins
    assert(sim.out > 0)
  }

  test("twoHop routes through best pools and reports cross mid") {
    val poolsA = Seq(Pool(1, "xyk", 10000, 5000)) // A: mid 2 zig per A
    val poolsB = Seq(Pool(2, "xyk", 10000, 2000)) // B: mid 5 zig per B
    val Some((outB, crossMid)) = Swap.twoHop(poolsA, poolsB, 10)
    assert(math.abs(crossMid - 0.4) < 1e-12) // midA/midB = 2/5
    // selling 10 A ≈ 20 zig ≈ 4 B minus fees/slippage
    assert(outB > 3.5 && outB < 4.0)
  }
}

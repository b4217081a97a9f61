package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SRP-LSH auto-sizing helpers ([[graft.ext.Similarity]]) to the
  * values the measured recall/bench evidence was collected at
  * (tools/SrpCheck, tools/SrpMissDiag, BASELINE.md round-12 section).
  * These are shared between the operator and its diagnostics — a change
  * here invalidates the documented x10 recall numbers and must re-run
  * both tools. */
class SrpSizingSpec extends AnyFunSuite {
  import graft.ext.Similarity._

  test("auto bits/bands at the measured corpus sizes") {
    // sf0.01 (500 docs) → the 8-bit floor; sf0.1 (5,000); x10 (50,000)
    assert(srpAutoBits(500) == 8)
    assert(srpAutoBits(5000) == 12)
    assert(srpAutoBits(50000) == 15)
    assert(srpAutoBands(8) == 32)
    assert(srpAutoBands(12) == 62)
    assert(srpAutoBands(15) == 100)
  }

  test("hamming gate at the measured configurations") {
    // x10: h = 15*100 = 1500 at threshold 0.6 → the 559 gate SrpMissDiag
    // measured the boundary miss against (hamming 437, margin intact)
    assert(srpHamMax(15 * 100, 0.6) == 559)
    // sf0.1: h = 12*62 = 744
    assert(srpHamMax(12 * 62, 0.6) == 302)
    // the gate grows monotonically with slack
    assert(srpHamMax(1500, 0.6, hamSigma = 6.0) > srpHamMax(1500, 0.6))
  }

  test("hyperplanes are seeded and reproducible") {
    val a = srpHyperplanes(64, 16)
    val b = srpHyperplanes(64, 16)
    assert(a.length == 64 * 16)
    assert(a.sameElements(b), "same seed must give the same matrix")
    assert(!srpHyperplanes(64, 16, seed = 43L).sameElements(a))
  }
}

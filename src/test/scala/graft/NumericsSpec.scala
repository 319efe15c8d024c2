package graft

import graft.functions.GammaFuncs
import graft.lda.AlphaUpdate
import org.scalatest.funsuite.AnyFunSuite

/** Pins the numerics to the reference's golden values
  * (reference: src/test/java/cc/mrlda/VariationalInferenceTest.java). */
class NumericsSpec extends AnyFunSuite {
  val eps10 = 1e-10

  test("digamma matches known values") {
    // ψ(1) = -γ (Euler–Mascheroni), ψ(1/2) = -γ - 2 ln 2
    val euler = 0.5772156649015329
    assert(math.abs(GammaFuncs.digamma(1.0) + euler) < 1e-12)
    assert(math.abs(GammaFuncs.digamma(0.5) + euler + 2 * math.log(2)) < 1e-12)
    // recurrence ψ(x+1) = ψ(x) + 1/x over a range
    for (x <- Seq(0.1, 0.7, 1.3, 5.5, 20.0, 123.456)) {
      assert(math.abs(GammaFuncs.digamma(x + 1) - GammaFuncs.digamma(x) - 1.0 / x) < 1e-12)
    }
  }

  test("trigamma matches known values") {
    // ψ'(1) = π²/6, ψ'(1/2) = π²/2
    assert(math.abs(GammaFuncs.trigamma(1.0) - math.Pi * math.Pi / 6) < 1e-12)
    assert(math.abs(GammaFuncs.trigamma(0.5) - math.Pi * math.Pi / 2) < 1e-11)
    for (x <- Seq(0.1, 0.7, 1.3, 5.5, 20.0)) {
      assert(math.abs(GammaFuncs.trigamma(x + 1) - GammaFuncs.trigamma(x) + 1.0 / (x * x)) < 1e-12)
    }
  }

  test("logGamma matches known values") {
    assert(math.abs(GammaFuncs.logGamma(1.0)) < 1e-13)
    assert(math.abs(GammaFuncs.logGamma(2.0)) < 1e-13)
    assert(math.abs(GammaFuncs.logGamma(5.0) - math.log(24.0)) < 1e-12)
    assert(math.abs(GammaFuncs.logGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12)
    assert(math.abs(GammaFuncs.logGamma(101.0) - (1 to 100).map(i => math.log(i.toDouble)).sum) < 1e-9)
  }

  test("logAdd is a stable log-space addition") {
    assert(math.abs(GammaFuncs.logAdd(math.log(3), math.log(4)) - math.log(7)) < 1e-12)
    assert(GammaFuncs.logAdd(Double.NegativeInfinity, 1.5) == 1.5)
    assert(GammaFuncs.logAdd(1.5, Double.NegativeInfinity) == 1.5)
    assert(math.abs(GammaFuncs.logAdd(-1000.0, -1000.0) - (-1000.0 + math.log(2))) < 1e-12)
  }

  test("updateVectorAlpha golden (reference VariationalInferenceTest:28-41)") {
    val alpha = Array(0.4736839726180464, 9.928726975283879, 8.319361678447014)
    val ss = Array(-23792.9569126969113, -22519.9434073184025, -23973.2360888324797)
    val got = AlphaUpdate.updateVectorAlpha(3, 112, alpha, ss)
    val want = Array(0.4736839726180464, 9.92872697528388, 8.319361678447015)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < eps10, s"$g vs $w") }
  }

  test("updateScalarAlpha golden (reference VariationalInferenceTest:43-62)") {
    val cases = Seq(
      (5, 2246, 100.0, -40100.9192398908126052, 0.2958548131184747),
      (5, 2246, 100.0, -34828.2371112336259102, 0.3731832583179411),
      (5, 2246, 100.0, -37309.1699276268700487, 0.3319329678764105),
      (5, 2246, 100.0, -44085.8660385293114814, 0.2568195157403902),
      (10, 2246, 100.0, -155990.5727383689954877, 0.1531475153565107),
      (10, 2246, 100.0, -196359.2521305996051524, 0.1150183709445565),
      (10, 2246, 100.0, -226577.3570433593704365, 0.0972395316113154),
      (10, 2246, 100.0, -256318.9209672076685820, 0.0845206104885002))
    for ((k, n, init, ss, want) <- cases) {
      val got = AlphaUpdate.updateScalarAlpha(k, n, init, ss)
      assert(math.abs(got - want) < eps10, s"K=$k ss=$ss: $got vs $want")
    }
  }
}

package graft.functions

/**
 * Special functions needed by variational LDA: digamma, trigamma, log-gamma,
 * and numerically-stable log-space addition (log-sum-exp of two operands).
 *
 * The reference engine gets these from the cloud9 utility library
 * (reference: src/main/java/cc/mrlda/DocumentMapper.java:27-28,
 * VariationalInference.java:35). Re-implemented here from the standard
 * recurrence + asymptotic (Bernoulli) series found in Abramowitz & Stegun
 * §6.3/§6.4 — accurate to ~1e-13 for x > 0, which comfortably pins the
 * reference's golden alpha-update tests at 1e-10.
 *
 * Methods are on a top-level object so that Scala emits static forwarders:
 * generated Java (whole-stage codegen) can call
 * `graft.functions.GammaFuncs.digamma(x)` directly.
 */
object GammaFuncs {

  /** ψ(x) = d/dx ln Γ(x), for x > 0. NaN for x <= 0 poles handled crudely. */
  def digamma(x0: Double): Double = {
    if (x0.isNaN) return x0
    // limits: psi(+inf) = +inf; psi(-inf) undefined
    if (x0.isInfinite) return if (x0 > 0) x0 else Double.NaN
    var x = x0
    var acc = 0.0
    // reflection not needed for LDA (arguments are positive); guard anyway
    if (x <= 0 && x == math.floor(x)) return Double.NaN
    // recurrence ψ(x) = ψ(x+1) - 1/x until x >= 10
    while (x < 10.0) {
      acc -= 1.0 / x
      x += 1.0
    }
    // asymptotic series: ln x - 1/(2x) - Σ B_{2n} / (2n x^{2n})
    val inv = 1.0 / x
    val inv2 = inv * inv
    var series = inv2 * (-1.0 / 12.0 + inv2 * (1.0 / 120.0 + inv2 * (-1.0 / 252.0 +
      inv2 * (1.0 / 240.0 + inv2 * (-1.0 / 132.0 + inv2 * (691.0 / 32760.0 +
        inv2 * (-1.0 / 12.0)))))))
    acc + math.log(x) - 0.5 * inv + series
  }

  /** ψ'(x), the trigamma function, for x > 0. */
  def trigamma(x0: Double): Double = {
    if (x0.isNaN) return x0
    // limits: psi'(+inf) = 0; psi'(-inf) undefined
    if (x0.isInfinite) return if (x0 > 0) 0.0 else Double.NaN
    var x = x0
    var acc = 0.0
    if (x <= 0 && x == math.floor(x)) return Double.NaN
    // recurrence ψ'(x) = ψ'(x+1) + 1/x^2 until x >= 10
    while (x < 10.0) {
      acc += 1.0 / (x * x)
      x += 1.0
    }
    // asymptotic: 1/x + 1/(2x^2) + Σ B_{2n} / x^{2n+1}
    val inv = 1.0 / x
    val inv2 = inv * inv
    val series = 1.0 + inv * (0.5 + inv * (1.0 / 6.0 + inv2 * (-1.0 / 30.0 +
      inv2 * (1.0 / 42.0 + inv2 * (-1.0 / 30.0 + inv2 * (5.0 / 66.0 +
        inv2 * (-691.0 / 2730.0)))))))
    acc + series * inv
  }

  /** ln Γ(x) for x > 0 via Lanczos approximation (g=7, n=9). */
  def logGamma(x: Double): Double = {
    if (x.isNaN) return x
    if (x <= 0) return Double.NaN
    // standard Lanczos coefficients (g = 7)
    val g = 7.0
    val c = LANCZOS
    if (x < 0.5) {
      // reflection formula (unused by LDA but keeps the function total)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val xm1 = x - 1.0
      var a = c(0)
      val t = xm1 + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (xm1 + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (xm1 + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private val LANCZOS: Array[Double] = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /**
   * log(exp(a) + exp(b)) without overflow; identity for -Inf operands.
   * Semantics of the reference's log-space accumulator
   * (reference: cc/mrlda/TermCombiner.java:19-35, DocumentMapper.java:414,425).
   */
  def logAdd(a: Double, b: Double): Double = {
    if (a.isNegInfinity) b
    else if (b.isNegInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))
  }
}

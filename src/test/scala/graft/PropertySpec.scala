package graft

import graft.functions.GammaFuncs.{digamma, logAdd, logGamma, trigamma}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks for the numerical kernels (SURVEY §5 called these
 * out as the tests the reference lacks): log-space arithmetic identities,
 * gamma-function recurrences, and E-step invariants. Uses scalacheck
 * generators with explicit sampling (the scalatest-scalacheck bridge
 * artifact is not on the offline classpath).
 */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach { a => f(a); i += 1 }
      seed = seed.next
    }
  }

  test("logAdd matches naive log(exp+exp) on safe ranges and is commutative") {
    forSamples(Gen.zip(Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0))) { case (a, b) =>
      val naive = math.log(math.exp(a) + math.exp(b))
      assert(math.abs(logAdd(a, b) - naive) < 1e-9)
      assert(logAdd(a, b) == logAdd(b, a))
    }
  }

  test("logAdd is stable and bounded where naive overflows") {
    forSamples(Gen.zip(Gen.choose(-500.0, 500.0), Gen.choose(-500.0, 500.0))) { case (a, b) =>
      val r = logAdd(a, b)
      assert(!r.isNaN && !r.isInfinite)
      assert(r >= math.max(a, b) - 1e-12 && r <= math.max(a, b) + math.log(2) + 1e-12)
    }
  }

  test("digamma satisfies the recurrence ψ(x+1) = ψ(x) + 1/x") {
    forSamples(Gen.choose(1e-6, 1e4)) { x =>
      assert(math.abs(digamma(x + 1) - (digamma(x) + 1.0 / x)) < 1e-8 * (1 + 1 / x))
    }
  }

  test("trigamma satisfies the recurrence ψ'(x+1) = ψ'(x) − 1/x²") {
    forSamples(Gen.choose(1e-6, 1e4)) { x =>
      val lhs = trigamma(x + 1)
      val rhs = trigamma(x) - 1.0 / (x * x)
      assert(math.abs(lhs - rhs) < 1e-8 * (1 + 1 / (x * x)))
    }
  }

  test("logGamma satisfies lnΓ(x+1) = lnΓ(x) + ln(x)") {
    forSamples(Gen.choose(1e-6, 1e4)) { x =>
      assert(math.abs(logGamma(x + 1) - (logGamma(x) + math.log(x))) <
        1e-8 * (1 + logGamma(x).abs))
    }
  }

  test("updatePhiTerm: exp-normalized phi sums to 1 and the ll term is finite") {
    forSamples(Gen.zip(Gen.choose(2, 8), Gen.choose(1, 50), Gen.long)) { case (k, cnt, seed) =>
      val rng = new java.util.Random(seed)
      val lb = Array.fill(k)(math.log(rng.nextDouble() + 1e-6))
      val dg = Array.fill(k)(digamma(rng.nextDouble() * 5 + 0.1))
      val lp = new Array[Double](k)
      val ulg = Array.fill(k)(math.log(0.5))
      val ll = graft.lda.EStep.updatePhiTerm(k, cnt, math.log(cnt.toDouble),
        lb, dg, lp, ulg)
      // after the update, lp holds log(c · φ_k) with Σ_k φ_k = 1
      val phiSum = lp.map(v => math.exp(v) / cnt).sum
      assert(math.abs(phiSum - 1.0) < 1e-9, s"phi not normalized: $phiSum")
      assert(!ll.isNaN && !ll.isInfinite)
    }
  }

  test("gamma positivity: exp of any finite log-space accumulation is positive") {
    forSamples(Gen.nonEmptyListOf(Gen.choose(-200.0, 10.0))) { xs =>
      val acc = xs.reduce(logAdd)
      assert(math.exp(acc) > 0.0 || acc < -745.0) // exp underflow floor
    }
  }

  test("bpe encode concatenation is the identity on arbitrary corpora") {
    import graft.pipeline.Tokenizer
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaLowerChar, Gen.oneOf('é', 'ß', '中', '!', '0'))).map(_.mkString)
    forSamples(Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.choose(1L, 20L))), n = 60) { wf =>
      val counts = wf.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val model = Tokenizer.trainFromCounts(counts.sortBy(p => (-p._2, p._1)), 30)
      counts.foreach { case (w, _) =>
        val toks = Tokenizer.encodeWord(w, model.ranks)
        assert(toks.mkString("").stripSuffix(Tokenizer.EndOfWord) == w, s"word $w → $toks")
        assert(toks.forall(model.vocab.contains), s"OOV piece for $w: $toks")
      }
    }
  }

  test("unigram viterbi segmentation is the identity and never empty") {
    import graft.pipeline.Unigram
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaLowerChar, Gen.oneOf('é', '中', '7'))).map(_.mkString.take(20))
    forSamples(Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.choose(1L, 20L))), n = 40) { wf =>
      val counts = wf.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
        .sortBy(p => (-p._2, p._1))
      val model = Unigram.trainFromCounts(counts,
        Unigram.Config(targetVocab = 30, seedSize = 60, maxPieceLen = 4))
      counts.foreach { case (w, _) =>
        val pieces = Unigram.viterbiEncode(w, model)
        assert(pieces.nonEmpty && pieces.mkString("") == w, s"word $w → $pieces")
      }
    }
  }
}

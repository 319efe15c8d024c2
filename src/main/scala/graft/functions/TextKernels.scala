package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Row-level kernels behind the text Catalyst expressions (WordNgrams,
 * SimHash60). Static-forwarder object so generated Java can call
 * `graft.functions.TextKernels.ngrams(...)` directly (same pattern as
 * GammaFuncs). Everything works on UTF8String/bytes — no String round-trip,
 * no CatalystTypeConverters, unlike the ScalaUDFs these replaced.
 */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** Whitespace tokens: split on single space, drop empties. */
  private def tokens(s: UTF8String): Array[UTF8String] =
    s.split(Space, -1).filter(_.numBytes() > 0)

  /**
   * Distinct sliding word n-grams (first-occurrence order, grams joined by
   * one space). When the text has fewer than n tokens: with
   * `wholeTextFallback` the whole token sequence re-joined by single spaces
   * is the one gram (shingle semantics — an empty text yields [""]);
   * without it the result is empty (strict n-gram semantics).
   */
  def ngrams(s: UTF8String, n: Int, wholeTextFallback: Boolean): ArrayData = {
    val toks = tokens(s)
    if (toks.length >= n) {
      // LinkedHashSet: dedup preserving first occurrence, like Seq.distinct
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + n <= toks.length) {
        if (n == 1) seen.add(toks(i))
        else {
          val window = new Array[UTF8String](n)
          System.arraycopy(toks, i, window, 0, n)
          seen.add(UTF8String.concatWs(Space, window: _*))
        }
        i += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    } else if (wholeTextFallback) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, toks: _*)))
    } else {
      new GenericArrayData(Array.empty[Any])
    }
  }

  /**
   * ALL sliding word n-grams in order, duplicates kept (one entry per
   * occurrence) — the counting twin of `ngrams` for repetition statistics,
   * where multiplicity is the whole point. Texts with fewer than n tokens
   * yield an empty array.
   */
  def ngramsAll(s: UTF8String, n: Int): ArrayData = {
    val toks = tokens(s)
    if (toks.length >= n) {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        if (n == 1) out(i) = toks(i)
        else {
          val window = new Array[UTF8String](n)
          System.arraycopy(toks, i, window, 0, n)
          out(i) = UTF8String.concatWs(Space, window: _*)
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array.empty[Any])
    }
  }

  /** Unicode NFC normalization (canonical composition): the standard
    * pre-dedup canonicalization — visually identical strings with
    * different codepoint sequences (é vs e + combining acute) hash apart
    * without it. Pays one UTF8String↔String round-trip (java.text.Normalizer
    * has no byte-level API) but runs inside whole-stage codegen; the
    * already-normalized common case returns the input buffer unchanged. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Accent-folding casefold: NFD-decompose, drop combining marks
    * (general category Mn), lowercase — "Café Nürnberg" → "cafe
    * nurnberg". The aggressive canonicalization for accent-insensitive
    * dedup keys; matches `lower(strip_accents(x))` semantics for
    * Latin-script diacritics (what the oracle pins). ASCII-only strings
    * skip the Normalizer round-trip entirely. */
  def foldAccents(s: UTF8String): UTF8String = {
    // ASCII scan over the raw UTF-8 bytes — no String materialized unless
    // the row actually needs folding (a negative byte marks non-ASCII)
    var asciiUpper = false
    var nonAscii = false
    var i = 0
    val n = s.numBytes()
    while (i < n && !nonAscii) {
      val b = s.getByte(i)
      if (b < 0) nonAscii = true
      else if (b >= 'A' && b <= 'Z') asciiUpper = true
      i += 1
    }
    if (!nonAscii) {
      if (!asciiUpper) s
      else UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
    } else {
      val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      // iterate CODE POINTS, not UTF-16 units: a supplementary-plane
      // combining mark (e.g. U+110B9) is two surrogates whose per-char
      // type is SURROGATE — a char loop would never strip it
      var j = 0
      while (j < nfd.length) {
        val cp = nfd.codePointAt(j)
        if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString.toLowerCase(java.util.Locale.ROOT))
    }
  }

  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 as a long — the JVM twin of the
    * `conv(substring(md5(c),1,15),16,10)` SQL base hash (Dedup.baseHash60):
    * fold the top 8 digest bytes big-endian, drop the low nibble. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  val SimhashBits = 60

  /** 60-bit SimHash over a token array: bit b set iff more than half the
    * tokens have bit b set in their 60-bit md5 base hash. One pass
    * accumulating all 60 bit-counts. */
  def simhash60(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](SimhashBits)
    var i = 0
    while (i < n) {
      val h = hash60(toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < SimhashBits) {
        if (((h >> b) & 1L) != 0L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < SimhashBits) {
      if (counts(b) * 2 > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  /**
   * Textbook Jaro–Winkler similarity over the raw UTF-8 BYTES of both
   * strings — deliberately byte-level, not code-point-level, because
   * that is what DuckDB's `jaro_winkler_similarity` computes (probe:
   * 'éclair' vs 'eclair' → 0.849206… = the length-7 byte math), so the
   * oracle replays exactly. ASCII inputs are unaffected. Standard
   * parameters: match window max(|s|,|t|)/2 − 1, Winkler boost p=0.1
   * over a common prefix capped at 4, applied only when jaro > 0.7.
   * Either side empty → 0.0 (DuckDB's convention, including both-empty).
   */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val sl = s.length
    val tl = t.length
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(0, math.max(sl, tl) / 2 - 1)
    val sMatch = new Array[Boolean](sl)
    val tMatch = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order; half the mismatches
    var halfT = 0
    var k = 0
    i = 0
    while (i < sl) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / sl + md / tl + (md - halfT / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(sl, tl))
    while (prefix < pMax && s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /**
   * Longest common subsequence LENGTH between two token arrays — the
   * row-local O(m·n) two-row DP (one reusable n+1 column array, the
   * prev-diagonal scalar carried through the inner sweep). Null tokens
   * match only null tokens. The kernel behind ROUGE-L; segments are
   * sentence-sized, so the quadratic cell count is per-row bounded.
   */
  def lcsLength(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    val dp = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      var prev = 0
      j = 0
      while (j < n) {
        val temp = dp(j + 1)
        dp(j + 1) =
          if (java.util.Objects.equals(ai, bs(j))) prev + 1
          else math.max(dp(j + 1), dp(j))
        prev = temp
        j += 1
      }
      i += 1
    }
    dp(n).toLong
  }
}

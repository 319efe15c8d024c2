package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/**
 * The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
 * stripping", Program 14(3), 1980) — a faithful re-implementation of the
 * author's public-domain reference version, including its two documented
 * departures from the paper (step 2: `bli`→`ble` rather than `abli`→`able`,
 * and the added `logi`→`log` rule), so outputs match the published
 * voc.txt/output.txt vectors.
 *
 * This is the algorithm behind Lucene's `PorterStemFilter`, i.e. the
 * stemming stage of the `EnglishAnalyzer` a reference user would name via
 * ParseCorpus's analyzer option (reference ParseCorpus.java:191-207). With
 * no Lucene jar available in this environment, the hand-rolled kernel
 * closes that gap natively — the same move as the hand-rolled mrlda
 * SequenceFile framing (sources/MrldaSequenceFile.scala).
 *
 * Static-forwarder object so generated Java calls
 * `graft.functions.PorterStemmer.stem(...)` straight from whole-stage
 * codegen (the TextKernels pattern). The kernel itself is allocation-lean:
 * one char-array copy per word, in-place suffix edits.
 */
object PorterStemmer {

  /** Stem one lowercase word. Words shorter than 3 chars are returned
    * unchanged (the algorithm's own guard). Non-ASCII-letter input is not
    * rejected — chars outside a-z are simply treated as consonants, which
    * matches the reference implementation's behavior on its own buffer. */
  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    val b = word.toCharArray
    val s = new Stemmer(b, b.length - 1)
    s.run()
    new String(b, 0, s.k + 1)
  }

  /** UTF8String adapter for the codegen'd expression. ASCII fast path:
    * stemming is byte-level for a-z; anything multi-byte passes through the
    * String round-trip (rare for the lowercased token streams this runs
    * on). */
  def stem(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = stem(str)
    if (out eq str) s else UTF8String.fromString(out)
  }

  /** One word's stemming state: `b[0..k]` is the live word, `j` the
    * candidate stem end set by `ends`. Mirrors the reference
    * implementation's variable names so the rule tables line up with the
    * published code. */
  private final class Stemmer(val b: Array[Char], var k: Int) {
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m() — number of consonant-vowel sequences in b[0..j]:
      * [C](VC)^m[V] */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cvc(i) — b[i-2..i] is consonant-vowel-consonant with the final
      * consonant not w, x or y; restarting the word as *o (e.g. cav(e),
      * lov(e), hop(ing)). */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    /** Overwrite b[j+1..] with `s`, adjusting k. */
    private def setto(s: String): Unit = {
      val l = s.length
      var i = 0
      while (i < l) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setto(s)

    /** step1ab: plurals and -ed / -ing.
      * caresses→caress, ponies→poni, ties→ti, cats→cat, agreed→agree,
      * plastered→plaster, motoring→motor, conflat(ed)→conflate,
      * hopp(ing)→hop, tann(ed)→tan, fail(ing)→fail, fil(ing)→file. */
    private def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    /** step1c: terminal y → i when there is another vowel in the stem
      * (happy→happi, sky→sky). */
    private def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** step2: double suffixes → single (m>0). Switched on the penultimate
      * letter exactly like the reference table. */
    private def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // departure (paper: abli→able)
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // departure (added rule)
        case _ =>
      }
    }

    /** step3: -ic-, -full, -ness etc. (m>0). */
    private def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    /** step4: drop -ant, -ence etc. in context <c>vcvc<v> (m>1). */
    private def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** step5: drop terminal e (m>1, or m=1 unless *o) and map -ll → -l
      * (m>1). probate→probat, cease→ceas, controll→control. */
    private def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    def run(): Unit = {
      step1ab(); step1c(); step2(); step3(); step4(); step5()
    }
  }
}

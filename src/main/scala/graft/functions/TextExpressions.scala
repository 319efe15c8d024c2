package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Codegen'd text expressions for the dedup/decontamination hot paths
 * (the DotProduct pattern applied to tokenization): a ScalaUDF pays a
 * CatalystTypeConverters round-trip (UTF8String -> String -> Seq -> back)
 * per row; these run straight over UTF8String bytes inside whole-stage
 * codegen via a static kernel call (TextKernels).
 */

/**
 * Distinct sliding word n-grams over whitespace tokens.
 * `wholeTextFallback = false`: texts with fewer than n tokens yield an
 * empty array (strict n-grams — TextAnalysis.wordNgrams semantics).
 * `wholeTextFallback = true`: such texts yield the whole token sequence
 * re-joined as one gram (shingle semantics — Dedup.shingles; an empty or
 * null-coalesced text yields [""]).
 */
case class WordNgrams(child: Expression, n: Int, wholeTextFallback: Boolean)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n, wholeTextFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.ngrams($c, $n, $wholeTextFallback)")

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
  override def prettyName: String = if (wholeTextFallback) "shingles" else "word_ngrams"
}

/** All sliding word n-grams with duplicates kept (one entry per
  * occurrence) — the counting twin of WordNgrams for repetition
  * statistics. Fewer than n tokens yields an empty array. */
case class WordNgramsAll(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngramsAll(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.ngramsAll($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordNgramsAll = copy(child = c)
  override def prettyName: String = "word_ngrams_all"
}

/** Unicode NFC normalization (see TextKernels.nfc) as a codegen'd
  * expression — string in, canonically-composed string out. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** Accent-folding casefold (see TextKernels.foldAccents) as a codegen'd
  * expression — NFD − combining marks, lowercased. */
case class FoldAccents(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.foldAccents(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.foldAccents($c)")

  override protected def withNewChildInternal(c: Expression): FoldAccents = copy(child = c)
  override def prettyName: String = "fold_accents"
}

/** Porter stemming (see [[PorterStemmer]]) as a codegen'd expression —
  * one lowercase word in, its stem out. The stemming stage of the English
  * analyzer chain, exposed standalone so SQL/DataFrame pipelines can stem
  * token columns without running the whole corpus parser. */
case class PorterStem(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PorterStemmer.stem(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemmer.stem($c)")

  override protected def withNewChildInternal(c: Expression): PorterStem = copy(child = c)
  override def prettyName: String = "porter_stem"
}

/** 60-bit SimHash over an array<string> token column (bit b of the
  * signature = majority vote of bit b across the tokens' 60-bit md5 base
  * hashes — TextKernels.hash60, the JVM twin of Dedup.baseHash60). */
case class SimHash60(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash60($c)")

  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
  override def prettyName: String = "simhash60"
}

/** Jaro–Winkler similarity (see TextKernels.jaroWinkler) as a codegen'd
  * binary expression — the record-linkage scorer. Byte-level on UTF-8 to
  * match DuckDB's `jaro_winkler_similarity` exactly. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

/** LCS length between two token arrays (see TextKernels.lcsLength) as a
  * codegen'd binary expression — the ROUGE-L kernel. */
case class LcsLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.lcsLength(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextKernels.lcsLength($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcsLen =
    copy(left = l, right = r)
  override def prettyName: String = "lcs_len"
}

/** Column facade (functions-package style); inputs are cast here, since
  * ExpectsInputTypes is private[sql]. */
object tfunctions {
  private def str(c: Column): Expression = {
    val e = shim.toExpr(c)
    if (e.dataType == StringType) e else Cast(e, StringType)
  }
  private def strArr(c: Column): Expression = {
    val e = shim.toExpr(c)
    e.dataType match {
      case ArrayType(StringType, _) => e
      case _ => Cast(e, ArrayType(StringType))
    }
  }
  def word_ngrams(text: Column, n: Int): Column =
    shim.toColumn(WordNgrams(str(text), n, wholeTextFallback = false))
  def word_ngrams_all(text: Column, n: Int): Column =
    shim.toColumn(WordNgramsAll(str(text), n))
  def nfc_normalize(text: Column): Column =
    shim.toColumn(NfcNormalize(str(text)))
  def fold_accents(text: Column): Column =
    shim.toColumn(FoldAccents(str(text)))
  def shingles(text: Column, n: Int): Column =
    shim.toColumn(WordNgrams(str(text), n, wholeTextFallback = true))
  def simhash60(tokens: Column): Column = shim.toColumn(SimHash60(strArr(tokens)))
  def porter_stem(word: Column): Column = shim.toColumn(PorterStem(str(word)))
  def jaro_winkler(a: Column, b: Column): Column =
    shim.toColumn(JaroWinkler(str(a), str(b)))
  def lcs_len(a: Column, b: Column): Column =
    shim.toColumn(LcsLen(strArr(a), strArr(b)))
}

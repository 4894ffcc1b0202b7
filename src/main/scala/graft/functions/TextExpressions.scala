package graft.functions

import graft.text.TextHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted eval path and the generated
  * Java of the native text-hashing expressions. Each body delegates to the
  * SAME [[TextHash]] routines the former Scala UDFs called, so swapping a
  * UDF for the native expression cannot change a single byte of output —
  * the win is dropping the per-row UDF invocation + Seq boxing on the
  * kernels that run once per document (or once per shingle set) in every
  * dedup / fingerprint query. */
object TextCodegenOps {

  private def toStrings(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = a.getUTF8String(i).toString; i += 1 }
    out
  }

  private def toArrayData(ss: Array[String]): ArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s): Any))

  /** Distinct k-word shingles of the tokenized text. */
  def shingles(text: UTF8String, k: Int): ArrayData =
    toArrayData(TextHash.shingles(TextHash.tokenize(text.toString), k))

  /** MinHash signature over the shingle set → LSH band-key strings. */
  def minhashBands(sh: ArrayData, rows: Int): ArrayData =
    toArrayData(TextHash.bandKeys(TextHash.minhash(toStrings(sh)), rows))

  /** 60-bit simhash over the token multiset. */
  def simhash(text: UTF8String): Long =
    TextHash.simhash(TextHash.tokenize(text.toString))

  /** 1-permutation minhash fingerprint: min md5 hex over the shingles. */
  def minShingle(text: UTF8String, k: Int): UTF8String = {
    val sh = TextHash.shingles(TextHash.tokenize(text.toString), k)
    UTF8String.fromString(sh.map(TextHash.md5Hex).min)
  }

  /** Full MinHash signature (NumHashes longs) over the shingle set. */
  def minhashSig(sh: ArrayData): ArrayData =
    new GenericArrayData(TextHash.minhash(toStrings(sh)).map(v => v: Any))
}

/** Native `doc_shingles(text)`: tokenize + distinct k-shingles. Feeds
  * every MinHash/Jaccard dedup query (q31/q32/q52/q62/q63/q64/q70). */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "doc_shingles"

  override protected def nullSafeEval(t: Any): Any =
    TextCodegenOps.shingles(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextCodegenOps.shingles($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `minhash_bands(sh)`: 16-hash MinHash signature folded into
  * band-key strings (`rows` signature values per band). */
case class MinhashBandsExpr(child: Expression, rows: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(a: Any): Any =
    TextCodegenOps.minhashBands(a.asInstanceOf[ArrayData], rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextCodegenOps.minhashBands($a, $rows);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `doc_simhash(text)`: 60-bit simhash of the token multiset. */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "doc_simhash"

  override protected def nullSafeEval(t: Any): Any =
    TextCodegenOps.simhash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextCodegenOps.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `minhash_sig(sh)`: the full 16-value MinHash signature as an
  * array of longs — the raw estimator the band keys compress (q81 compares
  * its per-position agreement against exact Jaccard). */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    TextCodegenOps.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextCodegenOps.minhashSig($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `min_shingle(text)`: min-md5 shingle fingerprint (q38). */
case class MinShingleExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle"

  override protected def nullSafeEval(t: Any): Any =
    TextCodegenOps.minShingle(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextCodegenOps.minShingle($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column helpers building the native text expressions. */
object TextFunctions {
  private def colOf(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  def doc_shingles(text: Column, k: Int): Column =
    colOf(ShinglesExpr(Cast(exprOf(text), StringType), k))

  def minhash_bands(sh: Column, rows: Int): Column =
    colOf(MinhashBandsExpr(Cast(exprOf(sh), ArrayType(StringType)), rows))

  def minhash_sig(sh: Column): Column =
    colOf(MinhashSigExpr(Cast(exprOf(sh), ArrayType(StringType))))

  def doc_simhash(text: Column): Column =
    colOf(SimhashExpr(Cast(exprOf(text), StringType)))

  def min_shingle(text: Column, k: Int): Column =
    colOf(MinShingleExpr(Cast(exprOf(text), StringType), k))
}

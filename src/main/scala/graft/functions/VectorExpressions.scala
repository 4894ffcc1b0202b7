package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels shared by the interpreted eval path and the generated
  * Java of the native vector expressions. The loops are the EXACT former
  * UDF bodies (double accumulation, ascending index order), so swapping a
  * UDF call for the native expression cannot move a single ulp — the
  * DuckDB oracles' list_transform formulations keep matching bit-for-bit. */
object VectorCodegenOps {

  /** Cosine similarity of two float vectors. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** L2 norm of a float vector. */
  def l2norm(a: ArrayData): Double = {
    var s = 0.0
    val n = a.numElements()
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Set Jaccard of two string arrays: |A∩B| / |A∪B| — exact integer
    * counts then one IEEE division, identical to the former Scala-Set UDF
    * and the oracle's list_intersect/list_distinct formulation. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) { sa.add(a.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var j = 0
    val nb = b.numElements()
    while (j < nb) { sb.add(b.getUTF8String(j)); j += 1 }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }
}

/** Native `vec_cosine(a, b)` over two array&lt;float&gt; columns: stays inside
  * WholeStageCodegen — no UDF serialization, no Seq[Float] boxing per row.
  * In the ANN queries the cosine runs once per CANDIDATE PAIR, so this is
  * the hottest scalar kernel in the vector family. */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorCodegenOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorCodegenOps.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native `arr_jaccard(a, b)` over two array&lt;string&gt; columns — the
  * dedup-verification kernel (runs once per candidate pair in the LSH /
  * prefix-filter joins). */
case class JaccardExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorCodegenOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorCodegenOps.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native `vec_l2norm(a)` over an array&lt;float&gt; column. */
case class L2NormExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorCodegenOps.l2norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorCodegenOps.l2norm($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column helpers building the native expressions (mirrors SaxFunctions). */
object VectorFunctions {
  private def colOf(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def castF(c: Column): Expression =
    Cast(exprOf(c), ArrayType(FloatType))

  def vec_cosine(a: Column, b: Column): Column =
    colOf(CosineSimExpr(castF(a), castF(b)))

  def vec_l2norm(a: Column): Column =
    colOf(L2NormExpr(castF(a)))

  def arr_jaccard(a: Column, b: Column): Column =
    colOf(JaccardExpr(
      Cast(exprOf(a), ArrayType(StringType)),
      Cast(exprOf(b), ArrayType(StringType))))
}

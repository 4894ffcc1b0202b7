package graft.sax

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from both the interpreted eval path and the
  * generated Java of the native expressions — one shared implementation, so
  * codegen and non-codegen plans agree bit-for-bit with the UDF path. */
object SaxCodegenOps {

  private def toDoubles(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) Double.NaN else arr.getDouble(i)
      i += 1
    }
    out
  }

  def encode(arr: ArrayData, w: Int, c: Int): UTF8String = {
    if (arr == null) return null
    val s = Sax.encode(toDoubles(arr), w, c)
    if (s == null) null else UTF8String.fromString(s)
  }

  def encodeWindow(arr: ArrayData, n: Int, w: Int, c: Int): UTF8String = {
    if (arr == null) return null
    val s = Sax.encodePadded(toDoubles(arr), n, w, c)
    if (s == null) null else UTF8String.fromString(s)
  }

  def paa(arr: ArrayData, w: Int): ArrayData = {
    if (arr == null) return null
    val p = Sax.paaNormalized(toDoubles(arr), w)
    if (p == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(p)
  }

  def mindist(a: UTF8String, aN: Long, b: UTF8String, bN: Long, c: Int): InternalRow = {
    if (a == null || b == null) return null
    val md = Sax.mindist(a.toString, aN, b.toString, bN, c)
    if (md == null) null
    else InternalRow(md.dist, md.above, md.below)
  }
}

/** Native `sax_encode(values, w, c)` — a codegen'd Catalyst expression: no
  * UDF serialization or Seq boxing, stays inside WholeStageCodegen.
  * Null on invalid (n%w != 0, c outside [2,16]), like the reference's NULL
  * returns (src/symtseries.c:515-524). */
case class SaxEncodeExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sax_encode"

  override protected def nullSafeEval(v: Any, w: Any, c: Any): Any =
    SaxCodegenOps.encode(v.asInstanceOf[ArrayData],
      w.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, w, c) => {
      s"""
         |UTF8String ${ev.value}Tmp = graft.sax.SaxCodegenOps.encode($v, $w, $c);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native `sax_encode_window(values, n, w, c)`: trailing-window encode with
  * NaN left-padding (ring prefill) / keep-last-n semantics. */
case class SaxEncodeWindowExpr(first: Expression, second: Expression,
                               third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sax_encode_window"

  override protected def nullSafeEval(v: Any, n: Any, w: Any, c: Any): Any =
    SaxCodegenOps.encodeWindow(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], w.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, w, c) => {
      s"""
         |UTF8String ${ev.value}Tmp = graft.sax.SaxCodegenOps.encodeWindow($v, $n, $w, $c);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Native `sax_paa(values, w)`: the normalized PAA frame z-scores that
  * symbolization would bucket — [[Sax.paaNormalized]], the same arithmetic
  * as saxTransform minus the symbol lookup. Null on invalid (empty or
  * n % w != 0); elements are never null (NaN marks degenerate frames).
  * Ported from the last boxed Scala UDF in a query path (q11): identical
  * kernel, no per-row Seq boxing, stays inside WholeStageCodegen. */
case class SaxPaaExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sax_paa"

  override protected def nullSafeEval(v: Any, w: Any): Any =
    SaxCodegenOps.paa(v.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, w) => {
      s"""
         |ArrayData ${ev.value}Tmp = graft.sax.SaxCodegenOps.paa($v, $w);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native `sax_mindist(a, nA, b, nB, c)` returning
  * struct(dist, above, below); null for incompatible words (the
  * reference's NaN / Lua nil). */
case class SaxMindistExpr(children: Seq[Expression]) extends Expression {
  require(children.length == 5, "sax_mindist takes (a, nA, b, nB, c)")

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType), StructField("above", DoubleType),
    StructField("below", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "sax_mindist"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    SaxCodegenOps.mindist(
      vs(0).asInstanceOf[UTF8String], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[UTF8String], vs(3).asInstanceOf[Long],
      vs(4).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(e => s"${e.isNull}").mkString(" || ")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      childCode +
        code"""
           |boolean ${ev.isNull} = true;
           |InternalRow ${ev.value} = null;
           |if (!($anyNull)) {
           |  ${ev.value} = graft.sax.SaxCodegenOps.mindist(
           |    ${evals(0).value}, ${evals(1).value}, ${evals(2).value},
           |    ${evals(3).value}, ${evals(4).value});
           |  ${ev.isNull} = (${ev.value} == null);
           |}
         """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

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

  // ---- LSH sign banks ------------------------------------------------------
  // Deterministic ±1 hyperplane signs from a fixed LCG. These are the
  // CONTRACT constants: VectorQueries embeds the same values into the
  // DuckDB oracle SQL, so they live here (next to the kernel that consumes
  // them) and the query layer aliases them.
  val NumPlanes = 8
  val NumTables = 4
  val MaxPlanes = 16
  private def lcgSigns(seed: Long, rows: Int): Array[Array[Double]] = {
    var x = seed
    Array.fill(rows, 64) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 62) & 1L) == 1L) 1.0 else -1.0
    }
  }
  /** Fixed-plane bank (ANN probe tables q41/q42/q53). */
  val Signs: Array[Array[Double]] = lcgSigns(42L, NumTables * NumPlanes)
  /** Derived-plane bank (q44 near-dup; sized for the MaxPlanes cap). */
  val SignsX: Array[Array[Double]] = lcgSigns(1337L, NumTables * MaxPlanes)

  /** All per-table LSH bucket keys of a float vector: sign bits of
    * `planes` hyperplane projections per table, table id encoded at
    * `shift` so keys from different tables never join. The double
    * accumulation loop is the EXACT former UDF body (bucketFor /
    * bucketForX in the query layer). bank 0 = [[Signs]], 1 = [[SignsX]]. */
  def lshBuckets(e: ArrayData, bank: Int, planes: Int, shift: Int): ArrayData = {
    val (signs, stride) = if (bank == 0) (Signs, NumPlanes) else (SignsX, MaxPlanes)
    val n = e.numElements()
    val out = new Array[Any](NumTables)
    var t = 0
    while (t < NumTables) {
      var bucket = 0
      var j = 0
      while (j < planes) {
        val row = signs(t * stride + j)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += row(i) * e.getFloat(i).toDouble; i += 1 }
        if (acc > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = (t << shift) | bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Symmetric int8 quantization of a float vector: scale to [-127,127],
    * emit struct(scale, position-weighted checksum, q_min, q_max) — the
    * EXACT former q59 UDF arithmetic (zero-vector guard mirrored in the
    * oracle). */
  def int8Quantize(e: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var mx = 1e-12
    val n = e.numElements()
    var i = 0
    while (i < n) {
      val a = math.abs(e.getFloat(i).toDouble); if (a > mx) mx = a; i += 1
    }
    val scale = 127.0 / mx
    var cks = 0L; var qmin = Int.MaxValue; var qmax = Int.MinValue
    i = 0
    while (i < n) {
      val q = math.floor(e.getFloat(i).toDouble * scale + 0.5).toInt
      cks += q.toLong * (i + 1)
      if (q < qmin) qmin = q
      if (q > qmax) qmax = q
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](math.floor(scale * 1e6 + 0.5) / 1e6, cks, qmin, qmax))
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

/** Native `lsh_buckets(e)` over an array&lt;float&gt; column: the per-table
  * random-hyperplane bucket keys (NumTables ints). Runs once per corpus
  * row in every ANN / near-dup query — hoisting it out of a Scala UDF
  * removes the per-row Seq[Float] boxing on the hottest hashing path.
  * `bank`/`planes`/`shift` are plan-time constants, not child exprs. */
case class LshBucketsExpr(child: Expression, bank: Int, planes: Int, shift: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(a: Any): Any =
    VectorCodegenOps.lshBuckets(a.asInstanceOf[ArrayData], bank, planes, shift)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorCodegenOps.lshBuckets($a, $bank, $planes, $shift);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native `int8_quantize(e)` over an array&lt;float&gt; column —
  * struct(scale, checksum, q_min, q_max), the q59 storage-compression
  * kernel (pure map-side, one pass per row). */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false)))
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(a: Any): Any =
    VectorCodegenOps.int8Quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorCodegenOps.int8Quantize($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  def lsh_buckets(e: Column, bank: Int, planes: Int, shift: Int): Column =
    colOf(LshBucketsExpr(castF(e), bank, planes, shift))

  def int8_quantize(e: Column): Column =
    colOf(Int8QuantizeExpr(castF(e)))
}

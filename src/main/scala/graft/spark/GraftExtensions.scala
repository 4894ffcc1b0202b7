package graft.spark

import graft.sax.{SaxEncodeExpr, SaxEncodeWindowExpr, SaxMindistExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types._

/** SparkSessionExtensions hook: registers the native SAX expressions in the
  * session's FunctionRegistry, so plain SQL can call them:
  *
  * {{{
  * spark.sql("SELECT sax_encode(array(1.0,2.0,3.0,10.1), 2, 4)")
  * }}}
  *
  * Activate with `.config("spark.sql.extensions", "graft.spark.GraftExtensions")`
  * (done by SparkUtil.configure) or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$name takes exactly $n arguments, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // iSAX-style pruning of pattern-threshold mindist filters (SURVEY.md §4)
    ext.injectOptimizerRule(_ => MindistPruneRule)

    ext.injectFunction((FunctionIdentifier("sax_encode"),
      info("sax_encode", "sax_encode(values, w, c) - SAX-encode an array of doubles"),
      (args: Seq[Expression]) => { arity("sax_encode", 3, args); SaxEncodeExpr(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), IntegerType),
        Cast(args(2), IntegerType)) }))

    ext.injectFunction((FunctionIdentifier("sax_encode_window"),
      info("sax_encode_window", "sax_encode_window(values, n, w, c) - trailing-window SAX encode with NaN prefill"),
      (args: Seq[Expression]) => { arity("sax_encode_window", 4, args); SaxEncodeWindowExpr(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), IntegerType),
        Cast(args(2), IntegerType), Cast(args(3), IntegerType)) }))

    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float vectors (double accumulation)"),
      (args: Seq[Expression]) => { arity("vec_cosine", 2, args); graft.functions.CosineSimExpr(
        Cast(args(0), ArrayType(FloatType)), Cast(args(1), ArrayType(FloatType))) }))

    ext.injectFunction((FunctionIdentifier("vec_l2norm"),
      info("vec_l2norm", "vec_l2norm(a) - L2 norm of a float vector"),
      (args: Seq[Expression]) => { arity("vec_l2norm", 1, args); graft.functions.L2NormExpr(
        Cast(args(0), ArrayType(FloatType))) }))

    ext.injectFunction((FunctionIdentifier("arr_jaccard"),
      info("arr_jaccard", "arr_jaccard(a, b) - set Jaccard similarity of two string arrays"),
      (args: Seq[Expression]) => { arity("arr_jaccard", 2, args); graft.functions.JaccardExpr(
        Cast(args(0), ArrayType(StringType)), Cast(args(1), ArrayType(StringType))) }))

    // constant int params (shingle k, band rows, plane counts) are
    // plan-time fields of the expression, not child exprs — fold them out
    // of the literal argument here
    def intArg(e: Expression): Int = e.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"expected a constant integer argument, got $other")
    }

    ext.injectFunction((FunctionIdentifier("doc_shingles"),
      info("doc_shingles", "doc_shingles(text, k) - distinct k-word shingles of the tokenized text"),
      (args: Seq[Expression]) => { arity("doc_shingles", 2, args); graft.functions.ShinglesExpr(
        Cast(args(0), StringType), intArg(args(1))) }))

    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(shingles, rows) - MinHash LSH band-key strings"),
      (args: Seq[Expression]) => { arity("minhash_bands", 2, args); graft.functions.MinhashBandsExpr(
        Cast(args(0), ArrayType(StringType)), intArg(args(1))) }))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles) - full 16-value MinHash signature"),
      (args: Seq[Expression]) => { arity("minhash_sig", 1, args); graft.functions.MinhashSigExpr(
        Cast(args(0), ArrayType(StringType))) }))

    ext.injectFunction((FunctionIdentifier("doc_simhash"),
      info("doc_simhash", "doc_simhash(text) - 60-bit simhash of the token multiset"),
      (args: Seq[Expression]) => { arity("doc_simhash", 1, args); graft.functions.SimhashExpr(
        Cast(args(0), StringType)) }))

    ext.injectFunction((FunctionIdentifier("min_shingle"),
      info("min_shingle", "min_shingle(text, k) - min md5 shingle fingerprint"),
      (args: Seq[Expression]) => { arity("min_shingle", 2, args); graft.functions.MinShingleExpr(
        Cast(args(0), StringType), intArg(args(1))) }))

    ext.injectFunction((FunctionIdentifier("int8_quantize"),
      info("int8_quantize", "int8_quantize(vec) - struct(scale, checksum, q_min, q_max) of the int8-quantized vector"),
      (args: Seq[Expression]) => { arity("int8_quantize", 1, args); graft.functions.Int8QuantizeExpr(
        Cast(args(0), ArrayType(FloatType))) }))

    ext.injectFunction((FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", "lsh_buckets(vec, bank, planes, shift) - per-table random-hyperplane bucket keys"),
      (args: Seq[Expression]) => { arity("lsh_buckets", 4, args); graft.functions.LshBucketsExpr(
        Cast(args(0), ArrayType(FloatType)), intArg(args(1)), intArg(args(2)), intArg(args(3))) }))

    ext.injectFunction((FunctionIdentifier("sax_paa"),
      info("sax_paa", "sax_paa(values, w) - normalized PAA frame z-scores (pre-symbolization)"),
      (args: Seq[Expression]) => { arity("sax_paa", 2, args); graft.sax.SaxPaaExpr(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), IntegerType)) }))

    ext.injectFunction((FunctionIdentifier("sax_mindist"),
      info("sax_mindist", "sax_mindist(a, nA, b, nB, c) - lower-bounding distance as struct(dist, above, below)"),
      (args: Seq[Expression]) => { arity("sax_mindist", 5, args); SaxMindistExpr(Seq(
        Cast(args(0), StringType), Cast(args(1), LongType),
        Cast(args(2), StringType), Cast(args(3), LongType),
        Cast(args(4), IntegerType))) }))
  }
}

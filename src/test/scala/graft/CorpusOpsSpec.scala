package graft

import graft.queries.{DedupQueries, RelQueries, TextQueries, VectorQueries}
import graft.text.TextHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-analysis operators (q63-q68) beyond the DuckDB
  * oracle: driver-side recomputation of the n-gram stats, contamination
  * set membership, k-means mass conservation, and the no-self-join plan
  * shape of the SemDeDup window pairing. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.SparkUtil.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docShingles(): Map[Long, Array[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.shingles(TextHash.tokenize(r.getString(1)), 3))
      .toMap

  test("q63 dup-ngram fraction matches a driver-side corpus recount") {
    val sh = docShingles()
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rows = DedupQueries.defs("q63_dup_ngram_fraction")(spark, dir).collect()
    assert(rows.length == sh.size, "one row per document")
    for (r <- rows) {
      val mine = sh(r.getLong(0))
      val dup = mine.count(s => df(s) >= 2)
      assert(r.getLong(1) == mine.length && r.getLong(2) == dup)
      assert(r.getDouble(3) == math.floor(dup.toDouble / mine.length * 1e6 + 0.5) / 1e6)
    }
  }

  test("q103 bloom probe matches a driver-side filter recount; fp accounting holds") {
    val sh = docShingles()
    def bucket(id: Long): Int =
      (java.lang.Long.parseLong(TextHash.md5Hex(id.toString).take(15), 16) % 100).toInt
    val m = 65536L
    def positions(s: String): Seq[Long] = {
      val hex = TextHash.md5Hex(s)
      val h1 = java.lang.Long.parseLong(hex.take(15), 16)
      val h2 = java.lang.Long.parseLong(hex.slice(15, 30), 16)
      (0 until 3).map(i => (h1 + i * h2) % m)
    }
    val testDocs = sh.filter { case (id, _) => bucket(id) >= 90 }
    val testGrams = testDocs.values.flatten.toSet
    val bloom = testGrams.flatMap(positions)
    val expected = sh.collect { case (id, grams) if bucket(id) < 80 =>
      val pos = grams.count(g => positions(g).forall(bloom.contains))
      val exact = grams.count(g => positions(g).forall(bloom.contains) && testGrams.contains(g))
      id -> ((grams.length.toLong, pos.toLong, exact.toLong))
    }.filter(_._2._2 > 0)
    val rows = DedupQueries.defs("q103_bloom_contamination")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == expected, "bloom probe differs from the driver recount")
    // the filter has no false NEGATIVES (every exact hit is bloom-positive
    // by construction) and, at this load factor, real false positives
    assert(rows.values.forall { case (_, pos, exact) => exact <= pos })
    assert(rows.values.exists { case (_, pos, exact) => pos > exact },
      "no false positive at sf0.001 — the fp accounting is unexercised")
  }

  test("q108 HLL: error within 3 sigma; per-source registers merge to the direct sketch") {
    val row = DedupQueries.defs("q108_hll_distinct")(spark, dir).collect().head
    assert(row.getInt(0) == 256)
    assert(row.getDouble(5) < 3 * 1.04 / math.sqrt(256),
      s"rel_err ${row.getDouble(5)} above 3x the p=8 stderr")
    // mergeability — the property that makes HLL distributable: registers
    // built per SOURCE sub-corpus then merged by max must equal the
    // registers of one pass over the whole corpus (max is associative and
    // commutative over any partitioning)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), TextHash.shingles(TextHash.tokenize(r.getString(1)), 3)))
    def registers(shingles: Iterable[String]): Map[Long, Int] =
      shingles.foldLeft(Map.empty[Long, Int]) { (m, s) =>
        val h = java.lang.Long.parseLong(TextHash.md5Hex(s).take(15), 16)
        val bucket = h >>> 52
        val rest = h & ((1L << 52) - 1)
        val rank = if (rest == 0) 53 else java.lang.Long.numberOfLeadingZeros(rest) - 11
        m.updated(bucket, math.max(m.getOrElse(bucket, 0), rank))
      }
    val direct = registers(docs.iterator.flatMap(_._2).toSeq)
    val merged = docs.groupBy(_._1).values.map(g => registers(g.iterator.flatMap(_._2).toSeq))
      .foldLeft(Map.empty[Long, Int]) { (a, b) =>
        (a.keySet ++ b.keySet).iterator.map(k =>
          k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
      }
    assert(merged == direct, "per-source merge diverges from the direct registers")
    assert(row.getLong(1) == 256L - direct.size, "v_zero vs driver registers")
  }

  test("q109 CMS matches a driver recount and never undercounts") {
    val sh = docShingles()
    val w = 1024L
    def hashes(s: String): (Long, Long) = {
      val hex = TextHash.md5Hex(s)
      (java.lang.Long.parseLong(hex.take(15), 16),
       java.lang.Long.parseLong(hex.slice(15, 30), 16))
    }
    // driver-built counters over the (doc, shingle) stream
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (grams <- sh.values; g <- grams; i <- 0 until 3) {
      val (h1, h2) = hashes(g)
      val k = (i, (h1 + i * h2) % w)
      counters(k) = counters.getOrElse(k, 0L) + 1
    }
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def est(s: String): Long = {
      val (h1, h2) = hashes(s)
      (0 until 3).map(i => counters((i, (h1 + i * h2) % w))).min
    }
    val rows = DedupQueries.defs("q109_cms_heavyhitters")(spark, dir).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val s = r.getString(0)
      assert(r.getLong(1) == df(s), s"exact df of '$s'")
      assert(r.getLong(2) == est(s), s"CMS estimate of '$s'")
      assert(r.getLong(3) >= 0, s"CMS undercounted '$s'")
    }
    // the never-undercount invariant holds for EVERY shingle, not just
    // the emitted top-k (the sketch's defining one-sided guarantee)
    assert(df.forall { case (s, exact) => est(s) >= exact })
  }

  test("q64 contaminated shingles really occur in the train split") {
    val sh = docShingles()
    def bucket(id: Long): Int =
      (java.lang.Long.parseLong(TextHash.md5Hex(id.toString).take(15), 16) % 100).toInt
    val train = sh.collect { case (id, s) if bucket(id) < 80 => s }.flatten.toSet
    val rows = DedupQueries.defs("q64_contamination")(spark, dir).collect()
    val testIds = sh.keys.filter(bucket(_) >= 90).toSet
    assert(rows.map(_.getLong(0)).toSet == testIds, "one row per held-out doc")
    for (r <- rows) {
      val overlap = sh(r.getLong(0)).count(train.contains)
      assert(r.getLong(2) == overlap, s"doc ${r.getLong(0)} overlap")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q65 k-means step conserves mass and covers every seed cell") {
    val rows = VectorQueries.defs("q65_kmeans_step")(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val cells = rows.map(_.getLong(0)).toSet
    assert(rows.length == cells.size * 64, "K cells x 64 dimensions")
    // every dimension slice carries the full corpus exactly once
    val perPos = rows.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perPos.values.forall(_ == n), "per-dimension member counts sum to the corpus")
    // each seed centroid captures at least itself (cos=1 to its own cell)
    assert(cells == (0L until 8L).toSet)
  }

  test("q66 semantic dedup pairs without any sort-merge self-join") {
    val q = VectorQueries.defs("q66_semantic_dedup")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "neighbor pairing must be lead() windows, not a self-join")
    val rows = q.collect()
    for (r <- rows) {
      assert(r.getLong(1) != r.getLong(2), "a vector never dedups against itself")
      assert(r.getDouble(3) >= 0.3)
    }
    assert(rows.map(_.getLong(1)).distinct.length == rows.length,
      "each dropped vector attributes to exactly one keeper")
  }

  test("q70 KMV sketch lands within sampling error of the exact count") {
    val r = DedupQueries.defs("q70_kmv_distinct")(spark, dir).collect().head
    val (k, kth, exact, est) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(k == 64 && kth > 0)
    assert(exact >= k, "sketch only engages above K distinct values")
    // KMV relative stderr ~ 1/sqrt(K-2) ≈ 13% at K=64; 3 sigma bound
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
  }

  test("q71 resample conserves the event count across buckets") {
    val rows = RelQueries.defs("q71_time_resample")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("q72 quantiles are monotone in q within each group") {
    val rows = RelQueries.defs("q72_quantiles")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val types = rows.map(_._1).distinct
    assert(rows.length == types.length * 4, "four quantiles per event type")
    for (t <- types) {
      val vs = rows.filter(_._1 == t).sortBy(_._2).map(_._3)
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, s"$t: ${vs.toSeq}")
    }
  }

  test("q67 intra-doc repetition matches a driver-side recount") {
    val rows = TextQueries.defs("q67_intradoc_repetition")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.tokenize(r.getString(1))).toMap
    assert(rows.length == docs.size)
    for (r <- rows) {
      val toks = docs(r.getLong(0))
      val grams =
        if (toks.length < 3) Array(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toArray
      assert(r.getInt(1) == grams.length && r.getInt(2) == grams.distinct.length)
    }
  }

  test("q73 plans a LeftAnti join and excludes exactly the right customers") {
    val q = RelQueries.defs("q73_anti_join")(spark, dir)
    assert(q.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val got = q.collect().map(_.getLong(0)).toSet
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_totalprice") > 300000.0)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(got == custs.diff(orders))
    assert(got.nonEmpty, "the threshold must leave a non-trivial anti set")
  }

  test("q74 pivot conserves the event count across type columns") {
    val rows = RelQueries.defs("q74_pivot")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(r => (1 to 5).map(r.getLong).sum).sum == total)
  }

  test("q75 components agree with a driver-side union-find over the q32 pairs") {
    val pairs = DedupQueries.defs("q32_lsh_jaccard_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // full union-find labels = min doc id per component; 3 propagation
    // rounds reach them whenever component diameter <= 3
    val expected = docs.map(d => d -> find(d)).toMap
    val got = DedupQueries.defs("q75_neardup_components")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    val mismatches = expected.count { case (d, c) => got(d) != c }
    assert(mismatches == 0,
      s"$mismatches labels unconverged — a component wider than the 3-round bound")
  }

  test("q81 signature agreement matches a driver-side recount of the minhash kernel") {
    import graft.text.TextHash
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        TextHash.minhash(TextHash.shingles(TextHash.tokenize(r.getString(1)), 3)))
      .toMap
    val rows = DedupQueries.defs("q81_minhash_est")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expected = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      assert(r.getLong(2) == expected, s"n_agree of pair ($a,$b)")
      assert(r.getDouble(3) == math.floor(expected / 16.0 * 1e6 + 0.5) / 1e6,
        s"est_jaccard of pair ($a,$b)")
    }
    // the estimator runs over the same banded candidates q32 verifies, so
    // every surviving q32 pair must appear here
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val q32 = DedupQueries.defs("q32_lsh_jaccard_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q32.subsetOf(pairs))
  }

  test("q84 estimate-only pairs are exactly the q81 pairs at n_agree >= 8") {
    val est = DedupQueries.defs("q81_minhash_est")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = DedupQueries.defs("q84_estimate_dedup")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet == est.filter(_._2 >= 8).keySet)
    for ((pair, n, e) <- got) {
      assert(n == est(pair), s"n_agree drift on $pair")
      assert(e == math.floor(n / 16.0 * 1e6 + 0.5) / 1e6)
    }
  }

  test("q85 burstiness matches a driver-side token recount") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.tokenize(r.getString(1))).toMap
    val got = TextQueries.defs("q85_token_burstiness")(spark, dir).collect()
    assert(got.length == texts.count(_._2.nonEmpty))
    for (r <- got) {
      val freq = texts(r.getLong(0)).groupBy(identity).view.mapValues(_.length)
      assert(r.getLong(1) == freq.values.sum.toLong, "n_tokens")
      assert(r.getLong(2) == freq.size.toLong, "n_types")
      assert(r.getLong(3) == freq.values.count(_ == 1).toLong, "n_hapax")
    }
  }

  test("q86 gate keeps exactly the docs inside the corpus [p10, p90] rank band") {
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sorted = lens.map(_._2).sorted
    val n = sorted.length
    def rankVal(q: Double): Long = sorted((math.floor(q * (n - 1)) + 1 - 1).toInt)
    val (lo, hi) = (rankVal(0.1), rankVal(0.9))
    val got = TextQueries.defs("q86_length_gate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.forall(g => g._3 == lo && g._4 == hi))
    assert(got.map(_._1).toSet ==
      lens.filter(l => l._2 >= lo && l._2 <= hi).map(_._1).toSet)
  }

  test("q97 weighted sample: keys recompute driver-side, plan is TakeOrdered") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val q = TextQueries.defs("q97_weighted_sample")(spark, dir)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrdered"),
      "weighted top-k must be per-partition TakeOrdered, not a global sort")
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val w = TextHash.tokenize(r.getString(1)).length + 1L
        val h = java.lang.Long.parseLong(TextHash.md5Hex(s"wsamp:$id").take(15), 16)
        val u = (h + 1L).toDouble / math.pow(2, 60)
        (id, w, r6(math.log(u) / w.toDouble))
      }
      .sortBy { case (id, _, k) => (-k, id) }.take(20).toSeq
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the weight really biases the draw: a doc can outrank another with a
    // smaller u because its weight is larger (A-ES, not plain top-u)
    val byU = expected.map(_._1).toSet
    val plainTopU = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => -java.lang.Long.parseLong(TextHash.md5Hex(s"wsamp:$id").take(15), 16))
      .take(20).toSet
    assert(byU != plainTopU, "weighted sample must differ from the unweighted top-u draw")
  }

  test("q93 trigram back-off scores match a driver-side recount") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def bucket(id: Long): Int =
      (java.lang.Long.parseLong(TextHash.md5Hex(id.toString).take(15), 16) % 100).toInt
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.tokenize(r.getString(1))).toMap
    val train = toks.collect { case (id, t) if bucket(id) < 80 => t }
    val tc = train.filter(_.length >= 3).flatMap(_.sliding(3).map(_.toSeq))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bc = train.filter(_.length >= 2).flatMap(_.sliding(2).map(_.toSeq))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uc = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTotal = train.map(_.length.toLong).sum
    val vocab = uc.size.toLong
    val alpha = 0.4
    def lp(v: String, w: String, x: String): Double =
      if (tc.contains(Seq(v, w, x)))
        r6(math.log(tc(Seq(v, w, x)).toDouble / bc(Seq(v, w))))
      else if (bc.contains(Seq(w, x)))
        r6(math.log((alpha * bc(Seq(w, x)).toDouble) / uc(w)))
      else
        r6(math.log(((alpha * alpha) * (uc.getOrElse(x, 0L).toDouble + 1.0)) /
          (tTotal + vocab).toDouble))
    val rows = TextQueries.defs("q93_trigram_logprob")(spark, dir).collect()
    val testIds = toks.collect { case (id, t) if bucket(id) >= 90 && t.length >= 3 => id }
    assert(rows.map(_.getLong(0)).toSet == testIds.toSet, "one row per held-out doc")
    for (r <- rows) {
      val t = toks(r.getLong(0))
      val lps = t.sliding(3).map(s => lp(s(0), s(1), s(2))).toSeq
      assert(r.getLong(1) == lps.size)
      val avg = r6(lps.map(l => math.floor(l * 1e6 + 0.5)).sum / 1e6 / lps.size)
      assert(r.getDouble(2) == avg, s"doc ${r.getLong(0)}")
    }
    // all three back-off levels actually fire on this corpus (the test
    // would silently stop covering the lower levels otherwise)
    val branches = testIds.flatMap(id => toks(id).sliding(3).map { s =>
      if (tc.contains(s.toSeq)) 0 else if (bc.contains(s.toSeq.tail)) 1 else 2
    }).toSet
    assert(branches == Set(0, 1, 2), s"levels exercised: $branches")
  }

  test("q87 extracts exactly the planted shared paragraph as maximal spans") {
    // a 9-token paragraph planted verbatim in two docs at different offsets;
    // its 7 interior 3-grams are the only cross-doc-duplicated grams
    val shared = "the quick brown fox jumps over a lazy dog"
    val tmp = java.nio.file.Files.createTempDirectory("graft-q87").toString
    spark.createDataFrame(Seq(
        (1L, s"alpha beta $shared gamma delta"), // shared tokens at 3..11
        (2L, s"one two three $shared four"),     // shared tokens at 4..12
        (3L, "completely different text with no overlap at all"),
        (4L, "tiny doc")))                       // < 3 tokens: no positions
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.defs("q87_repeated_spans")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 7 consecutive duplicated gram positions -> one maximal 9-token span
    // per doc, each shared with exactly 1 other doc; nothing from docs 3/4
    assert(got == Set((1L, 3L, 9L, 1L), (2L, 4L, 9L, 1L)), got)
    // q91 materializes exactly the planted paragraph's text from BOTH docs
    // (different offsets, same tokens) and groups them under the lowest
    // carrying doc id — the survivor pointer a redaction pass follows
    val txt = DedupQueries.defs("q91_span_text")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(5))).toSet
    assert(txt == Set((1L, shared, 1L), (2L, shared, 1L)), txt)
    // driver-side recount on the real corpus: every reported span's grams
    // are genuinely cross-doc duplicated and maximal runs are not split
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextHash.tokenize(r.getString(1))).toMap
    val grams = texts.view.mapValues(t =>
      if (t.length < 3) Array.empty[String]
      else t.sliding(3).map(_.mkString(" ")).toArray).toMap
    val dfm = grams.toSeq.flatMap { case (id, g) => g.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val spans = DedupQueries.defs("q87_repeated_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((id, start, len, other) <- spans) {
      val g = grams(id)
      val s0 = start.toInt - 1            // 0-based first gram of the run
      val m = len.toInt - 2               // gram count of the run
      assert((s0 until s0 + m).forall(i => dfm(g(i)) >= 2), s"doc $id span not duplicated")
      assert(s0 == 0 || dfm(g(s0 - 1)) < 2, s"doc $id span not left-maximal")
      assert(s0 + m == g.length || dfm(g(s0 + m)) < 2, s"doc $id span not right-maximal")
      assert(other == (s0 until s0 + m).map(i => dfm(g(i))).max - 1, s"doc $id n_other_docs")
    }
    val expectedDupPositions = texts.keys.iterator.map { id =>
      grams(id).count(s => dfm(s) >= 2)
    }.sum
    assert(spans.map(_._3 - 2).sum == expectedDupPositions,
      "span gram counts partition the duplicated positions")
  }

  test("component memo: one shared frame per (session, dir), rebuilt after invalidate") {
    DedupQueries.invalidateComponentMemo()
    val a = DedupQueries.defs("q75_neardup_components")(spark, dir)
    val b = DedupQueries.defs("q83_component_stats")(spark, dir)
    val a2 = DedupQueries.defs("q75_neardup_components")(spark, dir)
    assert(a eq a2, "q75 twice must return the ONE memoized frame, not rebuild")
    assert(b.collect().nonEmpty, "q83 consumes the shared labels")
    // the explicit invalidate API: entries (and their edge caches) drop, so
    // a caller that rewrites data under dir — or a long-lived server
    // evicting a session — gets a fresh build, and nothing stays pinned
    DedupQueries.invalidateComponentMemo()
    val c = DedupQueries.defs("q75_neardup_components")(spark, dir)
    assert(!(c eq a), "post-invalidate calls must rebuild, not serve the stale frame")
    assert(c.collect().toSet == a.collect().toSet, "rebuild is value-identical")
  }

  test("q83 cluster-size histogram conserves the document count") {
    val rows = DedupQueries.defs("q83_component_stats")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == docs,
      "sum(cluster_size * n_clusters) must equal the number of documents")
  }

  test("partitioned parquet sink round-trips with partition pruning at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val back = spark.read.parquet(out).where(col("lang") === "en")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      "the lang predicate must prune partitions, not filter rows")
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang") === "en").count()
    assert(back.count() == expected)
  }

  test("q68 json aggregates match a driver-side parse") {
    val rows = RelQueries.defs("q68_json_extract")(spark, dir).collect()
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "props").collect()
      .map(r => r.getString(0) -> """"k":\s*(-?\d+)""".r
        .findFirstMatchIn(r.getString(1)).get.group(1).toLong)
    val expected = ev.groupBy(_._1).view.mapValues(vs => (vs.length.toLong, vs.map(_._2).sum))
    for (r <- rows) {
      val (n, s) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == s)
    }
  }
}

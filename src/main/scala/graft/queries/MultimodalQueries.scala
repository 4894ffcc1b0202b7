package graft.queries

import graft.SparkUtil.table
import graft.sql.OracleGen.sround
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryBase._

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, processed by a batched partition-level decode operator.
  *
  * The real decode (image/audio codecs) is STUBBED with a deterministic
  * fake — the container has no media libraries — but the Spark-side
  * plumbing is real and tested: binary column construction, an explicit
  * output schema, and a mapPartitions batch operator (the Scala analogue of
  * mapInPandas: one iterator pass per partition, no per-row UDF dispatch).
  *
  * Stub contract: "decode" reads the first 16 bytes of the payload and
  * emits their mean as the feature — reproducible in the oracle from
  * ascii(substr(text, i, 1)) because the payload is the UTF-8 encoding of
  * the (ASCII) document text.
  */
object MultimodalQueries {

  private val DecodeBytes = 16

  /** q57 frame sampling: a 64-byte "frame" every 128 bytes (i.e. sample
    * every other frame — the video-pipeline shape where decoding all
    * frames is the cost driver). */
  private val FrameBytes = 64
  private val FrameStride = 128

  val defs: Map[String, QFn] = Map(
    "q45_multimodal_decode" -> ((spark, dir) => {
      val docs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(lit("application/fake").as("mime"),
                 length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("n_bytes", IntegerType),
        StructField("f0", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      // batched partition-level decode (mapInPandas-style: one pass per
      // partition over the binary payloads, vectorizable batch shape)
      docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          var s = 0.0
          var i = 0
          val k = math.min(DecodeBytes, payload.length)
          while (i < k) { s += (payload(i) & 0xff).toDouble; i += 1 }
          val f0 = s / DecodeBytes.toDouble
          Row(id, meta.getInt(1), math.floor(f0 * 1e6 + 0.5) / 1e6)
        }
      }(enc)
    }),

    // frame sampling over a binary payload: generate sampled frame offsets
    // relationally (sequence + explode — Catalyst sizes the fan-out, no
    // driver loop), then batch-"decode" each frame slice per partition.
    // The real pipeline swaps the slice-mean stub for a codec call; the
    // fan-out/partitioning/batch shape is exactly this. Tail frames keep
    // their true (shorter) length — resize semantics stay explicit.
    // MODALITY FEATURE PROFILE — the extract-then-profile pipeline: a
    // partition-level batch operator "embeds" each payload into a fixed
    // 4-dim byte-class histogram (the codec stub; a real pipeline swaps
    // in an encoder call with the same batch shape), then one combinable
    // per-source aggregation profiles the corpus — feature drift between
    // sources is exactly what this readout monitors. Per-doc fractions
    // quantize before the order-independent mean.
    "q227_multimodal_profile" -> ((spark, dir) => {
      val docs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
      val outSchema = StructType(Seq(
        StructField("source", StringType),
        StructField("f0", DoubleType), StructField("f1", DoubleType),
        StructField("f2", DoubleType), StructField("f3", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val per = docs.mapPartitions { rows =>
        rows.map { r =>
          val src = r.getString(1)
          val p = r.getAs[Array[Byte]](2)
          if (p.length == 0) Row(src, 0.0, 0.0, 0.0, 0.0)
          else {
            var c0 = 0; var c1 = 0; var c2 = 0; var c3 = 0
            var i = 0
            while (i < p.length) {
              val c = p(i) & 0xff
              if (c < 97) c0 += 1
              else if (c < 110) c1 += 1
              else if (c < 123) c2 += 1
              else c3 += 1
              i += 1
            }
            val n = p.length.toDouble
            def q(x: Int) = math.floor(x / n * 1e6 + 0.5) / 1e6
            Row(src, q(c0), q(c1), q(c2), q(c3))
          }
        }
      }(enc)
      per.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          pround(xsum(col("f0"), 6) / count(lit(1)).cast("double"), 6).as("m0"),
          pround(xsum(col("f1"), 6) / count(lit(1)).cast("double"), 6).as("m1"),
          pround(xsum(col("f2"), 6) / count(lit(1)).cast("double"), 6).as("m2"),
          pround(xsum(col("f3"), 6) / count(lit(1)).cast("double"), 6).as("m3"))
    }),

    "q57_multimodal_frames" -> ((spark, dir) => {
      val docs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .withColumn("n_bytes", length(col("payload")).cast("int"))
        // `div` yields LONG, so the sequence elements are longs — cast
        // back down after the explode (generators can't be nested in cast)
        .withColumn("frame_l",
          explode(sequence(lit(0), expr(s"(n_bytes - 1) div $FrameStride"))))
        .select(col("doc_id"), col("payload"), col("n_bytes"),
          col("frame_l").cast("int").as("frame"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame", IntegerType),
        StructField("off", IntegerType),
        StructField("f_len", IntegerType),
        StructField("f_mean", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nBytes = r.getInt(2)
          val f = r.getInt(3)
          val off = f * FrameStride
          val len = math.min(FrameBytes, nBytes - off)
          var s = 0.0
          var i = 0
          while (i < len) { s += (payload(off + i) & 0xff).toDouble; i += 1 }
          Row(id, f, off, len, math.floor(s / len * 1e6 + 0.5) / 1e6)
        }
      }(enc)
    }),

    // perceptual-bucket dedup — the pHash shape over the stubbed decode:
    // the first 4 frame features quantize to integer buckets and
    // concatenate into a coarse perceptual signature; identical
    // signatures form a dup group with q56's survivor discipline (min
    // doc_id canonical). The real pipeline swaps the frame-mean stub for
    // a perceptual hash of decoded pixels; the plan shape — feature
    // extraction map-side, ONE combinable group on a short signature
    // key, survivor pointers by equi-join — is exactly this at any
    // corpus size (never pairwise comparison of media payloads).
    "q96_perceptual_dedup" -> ((spark, dir) => {
      val sig = defs("q57_multimodal_frames")(spark, dir)
        .where(col("frame") < 4)
        .select(col("doc_id"), col("frame"), floor(col("f_mean")).cast("int").as("q"))
        .groupBy("doc_id")
        .agg(concat_ws("-",
          transform(array_sort(collect_list(struct(col("frame"), col("q")))),
            x => x.getField("q").cast("string"))).as("sig"))
      val groups = sig.groupBy("sig")
        .agg(count(lit(1)).as("group_size"), min("doc_id").as("canonical_id"))
      sig.join(groups, "sig")
        .select(col("doc_id"), col("sig"), col("canonical_id"), col("group_size"),
          (col("doc_id") =!= col("canonical_id")).as("is_dup"))
    }),

    // BINARY FILE INGEST — the production multimodal INGEST path the
    // in-table binary columns (q45/q57) start from: a directory of
    // at-rest .bin blobs read through Spark's real `binaryFile` data
    // source (path / length / content columns, the scan an image or
    // audio corpus lands on before any decode). The report fingerprints
    // every blob (md5 + byte length + the id recovered from the file
    // name); the oracle recomputes both from the documents table the
    // blobs were derived from, proving the file round trip byte-lossless
    // end to end. At 100 TB the blobs directory is the object store and
    // this scan is the first stage of every multimodal pipeline.
    "q263_binaryfile_ingest" -> ((spark, dir) => {
      val blobs = binaryFilesDir(spark, dir)
      spark.read.format("binaryFile").load(blobs)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length"), md5(col("content")).as("content_md5"))
    }),

    // MULTIMODAL EXTRACT → ANN — the bridge from the codec stub to the
    // similarity-search path: the partition-level batch operator "embeds"
    // each binary payload into a 16-dim byte-bucket histogram (the stub a
    // real pipeline swaps for an encoder call with the SAME batch shape
    // and output schema), fractions quantized to integer 1e-6ths at
    // birth, then each of the [[MmQueryCount]] query payloads takes its
    // exact cosine top-5 over the corpus — BIGINT-exact dot/norms (16
    // terms of ≤1e12 products), one terminal division + sqrt, the q40
    // brute-baseline broadcast/top-k discipline (queries broadcast, the
    // corpus never shuffles before the per-query rank).
    "q296_multimodal_knn" -> ((spark, dir) => {
      val docs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("emb", ArrayType(LongType, containsNull = false))))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val fe = docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val p = r.getAs[Array[Byte]](1)
          val c = new Array[Long](16)
          var i = 0
          while (i < p.length) { c((p(i) & 0xff) >> 4) += 1; i += 1 }
          val e =
            if (p.isEmpty) new Array[Long](16)
            else c.map(x =>
              math.floor(x.toDouble / p.length * 1e6 + 0.5).toLong)
          Row(id, e.toSeq)
        }
      }(enc)
      val q = fe.where(col("doc_id") < MmQueryCount)
        .select(col("doc_id").as("query_id"), col("emb").as("qe"))
      val scored = fe.join(broadcast(q), col("doc_id") =!= col("query_id"))
        .withColumn("dot", expr(
          "aggregate(zip_with(qe, emb, (x, y) -> x * y), cast(0 as bigint), (a, v) -> a + v)"))
        .withColumn("n1", expr(
          "aggregate(qe, cast(0 as bigint), (a, v) -> a + v * v)"))
        .withColumn("n2", expr(
          "aggregate(emb, cast(0 as bigint), (a, v) -> a + v * v)"))
        .select(col("query_id"), col("doc_id"),
          when(col("n1") > 0L && col("n2") > 0L,
            pround(col("dot").cast("double") /
              sqrt(col("n1").cast("double") * col("n2").cast("double")), 6))
            .otherwise(lit(0.0)).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cos"), col("doc_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("query_id", "doc_id", "cos")
    })
  )

  /** q296's fixed query-payload count — ONE place, embedded into the
    * oracle WHERE (the q40 QueryCount discipline). */
  private val MmQueryCount = 3L

  /** q263's bounded blob count — ONE place, embedded into the oracle
    * WHERE. */
  private val BinFileDocs = 32L

  /** q263's at-rest BINARY FILE store: one `.bin` blob per sampled
    * document, bytes = the UTF-8 text (the q45 payload contract). The
    * driver-side write loop is bounded to [[BinFileDocs]] files — the
    * deliberate q128/q141 bounded idiom; a production corpus's blobs are
    * landed by whatever produced them, and THIS query demonstrates the
    * ingest scan, not the landing. */
  private def binaryFilesDir(spark: org.apache.spark.sql.SparkSession,
                             dir: String): String = {
    // path-only entry: the blob store is a plain directory, not a catalog
    // table — getPath registers no table names, so registry eviction never
    // attempts a DROP TABLE on a filesystem path
    val base = AtRestTables.getPath(spark, s"binfiles|$dir") { base =>
      val rows = spread(table(spark, dir, "documents"))
        .where(col("doc_id") < BinFileDocs)
        .select(col("doc_id"), col("text")).collect()
      val d = java.nio.file.Paths.get(base, "blobs")
      java.nio.file.Files.createDirectories(d)
      rows.foreach { r =>
        java.nio.file.Files.write(d.resolve(f"doc_${r.getLong(0)}%05d.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    java.nio.file.Paths.get(base, "blobs").toString
  }

  val oracles: Map[String, String] = Map(
    // the same byte-class fractions from ascii codes (the payload is the
    // UTF-8 encoding of ASCII text, the q45 stub contract)
    "q227_multimodal_profile" -> {
      def frac(cond: String) =
        s"floor(len(list_filter(cs, c -> $cond))::DOUBLE / len(cs) * 1000000.0 + 0.5) / 1000000.0"
      def guarded(cond: String) =
        s"CASE WHEN len(cs) = 0 THEN 0.0 ELSE ${frac(cond)} END"
      val x = graft.sql.OracleGen.xsumSql _
      s"""WITH codes AS (SELECT source,
         |  list_transform(range(1, len(text) + 1), i -> ascii(substr(text, i, 1))) AS cs
         |  FROM documents),
         |f AS (SELECT source,
         |        ${guarded("c < 97")} AS f0,
         |        ${guarded("c >= 97 AND c < 110")} AS f1,
         |        ${guarded("c >= 110 AND c < 123")} AS f2,
         |        ${guarded("c >= 123")} AS f3
         |      FROM codes)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       ${sround(s"(${x("f0", 6)}) / CAST(count(*) AS DOUBLE)", 6)} AS m0,
         |       ${sround(s"(${x("f1", 6)}) / CAST(count(*) AS DOUBLE)", 6)} AS m1,
         |       ${sround(s"(${x("f2", 6)}) / CAST(count(*) AS DOUBLE)", 6)} AS m2,
         |       ${sround(s"(${x("f3", 6)}) / CAST(count(*) AS DOUBLE)", 6)} AS m3
         |FROM f GROUP BY source""".stripMargin
    },

    "q45_multimodal_decode" -> {
      val byteSum = s"list_sum(list_transform(range(1, ${DecodeBytes + 1}), i -> ascii(substr(text, i, 1))::DOUBLE))"
      s"""SELECT doc_id,
         |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |       ${sround(s"$byteSum / $DecodeBytes.0", 6)} AS f0
         |FROM documents""".stripMargin
    },

    "q57_multimodal_frames" ->
      s"""WITH $frameCtes
         |SELECT doc_id, frame, off, f_len, ${sround(s"$frameByteSum / f_len", 6)} AS f_mean
         |FROM g""".stripMargin,

    "q96_perceptual_dedup" ->
      s"""WITH $frameCtes,
         |fm AS (SELECT doc_id, frame, ${sround(s"$frameByteSum / f_len", 6)} AS f_mean
         |       FROM g WHERE frame < 4),
         |sig AS (SELECT doc_id,
         |               array_to_string(list(CAST(CAST(floor(f_mean) AS INT) AS VARCHAR)
         |                                    ORDER BY frame), '-') AS sig
         |        FROM fm GROUP BY doc_id),
         |grp AS (SELECT sig, CAST(count(*) AS BIGINT) AS group_size,
         |               min(doc_id) AS canonical_id
         |        FROM sig GROUP BY sig)
         |SELECT s.doc_id, s.sig, g2.canonical_id, g2.group_size,
         |       s.doc_id <> g2.canonical_id AS is_dup
         |FROM sig s JOIN grp g2 USING (sig)""".stripMargin,

    // the blob bytes are the UTF-8 text, so strlen (bytes) and md5 of
    // the string recompute the file facts exactly
    "q263_binaryfile_ingest" ->
      s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS length,
         |       md5(text) AS content_md5
         |FROM documents WHERE doc_id < $BinFileDocs""".stripMargin,

    // byte-bucket embedding replayed from the (ASCII) text — ascii codes
    // ARE the payload bytes (the q45 contract); integer 1e-6 fractions,
    // BIGINT dot/norms, one terminal division + sqrt
    "q296_multimodal_knn" ->
      s"""WITH codes AS (SELECT doc_id,
         |  list_transform(range(1, len(text) + 1),
         |                 i -> ascii(substr(text, i, 1)) // 16) AS bs
         |  FROM documents),
         |emb AS (SELECT doc_id,
         |  list_transform(range(0, 16), b -> CASE WHEN len(bs) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(floor(len(list_filter(bs, x -> x = b))::DOUBLE / len(bs) * 1000000.0 + 0.5) AS BIGINT) END) AS e
         |  FROM codes),
         |q AS (SELECT doc_id AS query_id, e AS qe FROM emb WHERE doc_id < $MmQueryCount),
         |sc AS (SELECT q.query_id, m.doc_id,
         |         CAST(list_sum(list_transform(range(1, 17), i -> qe[i] * e[i])) AS BIGINT) AS dot,
         |         CAST(list_sum(list_transform(qe, v -> v * v)) AS BIGINT) AS n1,
         |         CAST(list_sum(list_transform(e, v -> v * v)) AS BIGINT) AS n2
         |       FROM emb m CROSS JOIN q WHERE m.doc_id <> q.query_id),
         |cosd AS (SELECT query_id, doc_id,
         |           CASE WHEN n1 > 0 AND n2 > 0
         |                THEN ${sround("CAST(dot AS DOUBLE) / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))", 6)}
         |                ELSE 0.0 END AS cos
         |         FROM sc),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rn
         |      FROM cosd)
         |SELECT query_id, doc_id, cos FROM r WHERE rn <= 5""".stripMargin
  )

  /** Shared q57/q96 frame-geometry CTE chain (mirrors the Spark-side
    * fan-out in q57): frame offsets and true (tail-shortened) lengths. */
  private def frameCtes: String =
    s"""d AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS INT) AS n_bytes FROM documents),
       |f AS (SELECT doc_id, text, n_bytes,
       |             unnest(range(0, (n_bytes - 1) // $FrameStride + 1)) AS frame
       |      FROM d),
       |g AS (SELECT doc_id, text, CAST(frame AS INT) AS frame,
       |             CAST(frame * $FrameStride AS INT) AS off,
       |             CAST(least($FrameBytes, n_bytes - frame * $FrameStride) AS INT) AS f_len
       |      FROM f)""".stripMargin

  /** The stub "decode": mean of the frame's payload bytes, reproduced from
    * ascii() because the payload is the UTF-8 encoding of the ASCII text. */
  private def frameByteSum: String =
    "list_sum(list_transform(range(off + 1, off + f_len + 1), i -> ascii(substr(text, i, 1))::DOUBLE))"
}

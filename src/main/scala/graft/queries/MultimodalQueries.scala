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
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_multimodal_decode" -> {
      val byteSum = s"list_sum(list_transform(range(1, ${DecodeBytes + 1}), i -> ascii(substr(text, i, 1))::DOUBLE))"
      s"""SELECT doc_id,
         |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |       ${sround(s"$byteSum / $DecodeBytes.0", 6)} AS f0
         |FROM documents""".stripMargin
    }
  )
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, and run decode / feature-extraction as a batched
  * per-partition transform.
  *
  * The Spark-side mechanics are real — schema, partition-parallel batched
  * execution via `mapPartitions` over a typed Dataset (the JVM analog of
  * `mapInPandas` batch processing), and a stable output schema. The decode
  * itself is a clearly-marked DETERMINISTIC STUB (this container has no
  * image/audio codecs): it derives fake "media properties" from the bytes.
  * Swapping in a real codec changes only the body of [[decodeStub]].
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Decoded(doc_id: Long, byte_len: Long, head_codes: String,
      fake_width: Long, fake_height: Long)

  /** documents → binary payload column (utf-8 bytes stand in for media) */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("media_meta"))

  /** STUB "decoder": batched per-partition transform with the shape of a
    * real media decode (read bytes → emit typed features). Deterministic
    * fake: byte length, first-4 byte codes, and dimensions derived from
    * the length. */
  def decodeStub(payload: Array[Byte]): (Long, String, Long, Long) = {
    // ??? real implementation would decode image/audio here (e.g. via a
    // JNI codec or, in PySpark, a Pandas UDF over mapInPandas); the
    // surrounding plumbing is what this operator tests.
    val len = payload.length.toLong
    val head = payload.take(4).map(b => (b & 0xff).toString).mkString(",")
    (len, head, len % 640, (len * 7) % 480)
  }

  /** decode features, partition-parallel */
  def decoded(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.map { p =>
        val (len, head, w, h) = decodeStub(p.payload)
        Decoded(p.doc_id, len, head, w, h)
      }
    }.toDF()
  }
}

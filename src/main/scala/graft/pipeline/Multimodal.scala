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

  final case class Resized(doc_id: Long, src_w: Long, src_h: Long,
      out_w: Long, out_h: Long)

  /** fit-within-box resize of the decoded (fake) image dimensions —
    * integer-only math (`floor(w*th/h)` style) so any engine reproduces
    * the output exactly; a real implementation would also emit the
    * resampled pixels from the same batched loop. Degenerate sources
    * (zero-area) pass through as 0×0 rather than erroring the batch. */
  def resized(spark: SparkSession, docs: DataFrame,
      targetW: Long = 128, targetH: Long = 96): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.map { p =>
        val (len, _, w, h) = decodeStub(p.payload)
        val (ow, oh) =
          if (w <= 0 || h <= 0) (0L, 0L)
          else if (w * targetH <= h * targetW) (w * targetH / h, targetH)
          else (targetW, h * targetW / w)
        Resized(p.doc_id, w, h, ow, oh)
      }
    }.toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame_code: Long)

  /** frame sampling: treat the payload as a fake video of
    * `len / frameBytes` frames and emit every `stride`-th frame with a
    * deterministic per-frame fingerprint (first byte of the frame) — the
    * one-to-many batched shape of real video frame extraction. */
  def frameSamples(spark: SparkSession, docs: DataFrame,
      frameBytes: Int = 100, stride: Int = 5): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.flatMap { p =>
        val nFrames = p.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          Frame(p.doc_id, i.toLong, (p.payload(i * frameBytes) & 0xff).toLong)
        }
      }
    }.toDF()
  }
}

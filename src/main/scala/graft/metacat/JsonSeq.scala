package graft.metacat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RS-delimited json-seq result emitter — the reference's streaming HTTP
  * sink (`webserver/data_handler.py:50-78,1371-1378`): each record is
  * `0x1E <json> \n`, streamed in pages so the driver never materializes
  * the whole result. */
object JsonSeq {

  val RS: Char = 0x1e.toChar

  /** lazily stream a file set as json-seq lines (metadata rendered as
    * JSON); pull-based via toLocalIterator like the reference's
    * server-side cursor. */
  def stream(fileSet: DataFrame): Iterator[String] = {
    val cols = fileSet.columns
      .filterNot(_.startsWith("_s_")) // internal shredded copies
      .map {
        case "metadata" => to_json(col("metadata")).as("metadata")
        case c => col(c)
      }
    val jsons = fileSet.select(cols.toIndexedSeq: _*).toJSON
    val it = jsons.toLocalIterator()
    new Iterator[String] {
      def hasNext: Boolean = it.hasNext
      def next(): String = s"$RS${it.next()}\n"
    }
  }

  /** write the whole stream to an Appendable (e.g. a chunked HTTP writer) */
  def write(fileSet: DataFrame, out: Appendable): Unit =
    stream(fileSet).foreach(out.append(_: CharSequence))
}

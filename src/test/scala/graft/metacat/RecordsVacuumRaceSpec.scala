package graft.metacat

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the r14 driver-run flake (CatalogIngestStreamSpec's concurrent
  * test, 1-in-N): `spark.read.parquet` resolves its file index EAGERLY,
  * so a checkpoint+vacuum landing between [[OccLog.records]]'s segment
  * listing and its `spark.read` calls used to throw PATH_NOT_FOUND out
  * of plan CONSTRUCTION — before any materializing caller's
  * `retryOnVanish` could see it (the ingest path's very first
  * `mkBatch()` in `declareFiles` is built outside the pin-retry loop).
  * records() now absorbs the plan-time race inside its own guard loop;
  * the deterministic seam [[OccLog.onRecordsPinned]] fires maintenance
  * in the exact window. */
class RecordsVacuumRaceSpec extends SparkTestBase with OccFailureCapture {

  test("records() retries when a vacuum deletes just-listed segments") {
    import spark.implicits._
    val root = registerRoot(
      Files.createTempDirectory("graft-recrace-").toString)
    val schema = Seq(("x", 1L)).toDF("k", "v")
      .withColumn("__op", lit("upsert")).withColumn("__seq", lit(1L)).schema
    val log = new OccLog(spark, root, "tlog", schema,
      OccLog.latestPerKey(Seq("k")))
    for (i <- 1 to 4)
      log.commit(() => Seq((s"k$i", i.toLong)).toDF("k", "v"), "upsert",
        Some(Seq(s"k$i")))

    // no checkpoint yet: records() pins the listing [s1..s4]; the seam
    // then checkpoints (fold lands at seq 4) and vacuums (s1..s4 deleted)
    // INSIDE the window between the pointer re-validation and the eager
    // reads — the exact interleaving the ingest stream hit against the
    // admin loop's maintenance cadence. One-shot: the retry's fresh
    // listing must see the post-vacuum state and serve the checkpoint.
    var fired = 0
    log.onRecordsPinned = () => {
      if (fired == 0) {
        fired += 1
        log.onRecordsPinned = () => ()
        assert(log.checkpoint() == 4L)
        assert(log.vacuum() == 4L)
      }
    }
    val recs = log.records() // pre-fix: AnalysisException PATH_NOT_FOUND
    assert(fired == 1, "the seam must have raced the listing")
    // the checkpoint is the fold of the vacuumed prefix: same live state
    assert(recs.count() == 4L)
    assert(recs.select("k").as[String].collect().sorted.toSeq ==
      Seq("k1", "k2", "k3", "k4"))
  }
}

package graft.metacat

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.util.Random

/** Differential fuzz of the catalog write path: a random sequence of
  * mutations (declare / add_to / remove_from / retire / update-meta /
  * move-namespace) is applied BOTH to a ParquetCatalog and to a trivial
  * in-memory model; after every few steps the visible state (live file
  * rows + dataset memberships) must coincide. Complements the 3 query-side
  * fuzzers — this one hunts ordering/compaction bugs in the
  * rewrite-and-swap storage path. */
class WritePathFuzzSpec extends SparkTestBase {

  // in-memory model of the catalog's visible state
  private case class MFile(fid: String, var namespace: String, var run: Long,
      var mark: Option[String], var retired: Boolean)

  private def freshCatalog(): (ParquetCatalog, String) = {
    val root = Files.createTempDirectory("graft-fuzz-cat-").toString
    (new ParquetCatalog(spark, root), root)
  }

  private def declareDf(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      (f"Z$i%08d", s"zns${i % 3}", s"z_$i.dat", s"""{"core.run":$i}""",
        "fuzzer", 100L + i)
    }.toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
      .withColumn("created_timestamp", to_timestamp(lit("2026-03-01 00:00:00")))
  }

  private def fidDf(fids: Seq[String]) = {
    import spark.implicits._
    fids.toDF("fid")
  }

  test("random mutation sequences match the model") {
    val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(42L))
    val rounds = sys.env.get("GRAFT_FUZZ_N").map(_.toInt / 40 max 2).getOrElse(3)

    for (round <- 0 until rounds) {
      val (cat, _) = freshCatalog()
      cat.createDataset("zds", "a")
      cat.createDataset("zds", "b")
      val model = scala.collection.mutable.LinkedHashMap.empty[String, MFile]
      val members = Map("a" -> scala.collection.mutable.Set.empty[String],
        "b" -> scala.collection.mutable.Set.empty[String])
      var nextId = 0

      def randomLive(n: Int): Seq[String] =
        rnd.shuffle(model.values.filterNot(_.retired).map(_.fid).toSeq).take(n)

      for (step <- 0 until 12) {
        rnd.nextInt(7) match {
          case 0 => // declare a fresh batch, optionally straight into a dataset
            val ids = (nextId until nextId + 1 + rnd.nextInt(8))
            nextId = ids.last + 1
            val intoDs = if (rnd.nextBoolean()) Some("a") else None
            cat.declareFiles(declareDf(ids),
              dataset = intoDs.map(d => ("zds", d)))
            ids.foreach { i =>
              val fid = f"Z$i%08d"
              model(fid) = MFile(fid, s"zns${i % 3}", i.toLong, None, retired = false)
              intoDs.foreach(d => members(d) += fid)
            }
          case 1 => // add a random live subset to a dataset
            val ds = if (rnd.nextBoolean()) "a" else "b"
            val picks = randomLive(1 + rnd.nextInt(5))
            if (picks.nonEmpty) {
              cat.addTo(fidDf(picks), "zds", ds)
              members(ds) ++= picks
            }
          case 2 => // remove a random subset from a dataset
            val ds = if (rnd.nextBoolean()) "a" else "b"
            val picks = rnd.shuffle(members(ds).toSeq).take(1 + rnd.nextInt(4))
            if (picks.nonEmpty) {
              cat.removeFrom(fidDf(picks), "zds", ds)
              members(ds) --= picks
            }
          case 3 => // retire a few files
            val picks = randomLive(1 + rnd.nextInt(3))
            if (picks.nonEmpty) {
              cat.retireFiles(picks)
              picks.foreach(model(_).retired = true)
            }
          case 4 => // metadata patch: run := 9000+step, mark := "s<step>"
            val picks = randomLive(1 + rnd.nextInt(4))
            if (picks.nonEmpty) {
              cat.updateFileMeta(picks,
                s"""{"core.run":${9000 + step},"opt.mark":"s$step"}""")
              picks.foreach { f =>
                model(f).run = 9000 + step
                model(f).mark = Some(s"s$step")
              }
            }
          case 5 => // move a few files to a new namespace
            val picks = randomLive(1 + rnd.nextInt(3))
            if (picks.nonEmpty) {
              cat.moveNamespace(picks, s"moved$step")
              picks.foreach(model(_).namespace = s"moved$step")
            }
          case 6 => // hard delete: file rows, memberships, provenance
            val picks = randomLive(1 + rnd.nextInt(3))
            if (picks.nonEmpty) {
              cat.removeFiles(picks)
              picks.foreach { f =>
                model.remove(f)
                members.values.foreach(_ -= f)
              }
            }
        }

        if (step % 4 == 3 || step == 11) {
          // visible files: fid -> (namespace, run, mark, retired)
          val got = cat.files
            .select(col("fid"), col("namespace"),
              expr("try_variant_get(metadata, \"$['core.run']\", 'long')").as("run"),
              expr("try_variant_get(metadata, \"$['opt.mark']\", 'string')").as("mark"),
              col("retired"))
            .collect()
            .map(r => r.getString(0) ->
              ((r.getString(1), r.getLong(2), Option(r.getString(3)), r.getBoolean(4))))
            .toMap
          val want = model.map { case (fid, m) =>
            fid -> ((m.namespace, m.run, m.mark, m.retired))
          }.toMap
          assert(got == want,
            s"round $round step $step files diverged: " +
              s"onlyGot=${(got.toSet -- want.toSet).take(3)} onlyWant=${(want.toSet -- got.toSet).take(3)}")

          for (ds <- Seq("a", "b")) {
            val gotM = cat.filesDatasets
              .filter(col("dataset_name") === ds)
              .select("fid").collect().map(_.getString(0)).toSet
            assert(gotM == members(ds).toSet,
              s"round $round step $step membership $ds diverged")
          }
        }
      }
    }
  }
}

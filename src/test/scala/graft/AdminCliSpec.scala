package graft

import graft.metacat.ParquetCatalog
import graft.mql.{Mql, SparkTestBase}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The CLI admin subcommand groups (reference `metacat/ui/` parity) as
  * thin wrappers over the catalog API — end-to-end through
  * [[AdminCli.run]], the same entry `Cli.main` dispatches to. */
class AdminCliSpec extends SparkTestBase {

  private lazy val root = Files.createTempDirectory("graft-admincli-").toString
  private lazy val cat = new ParquetCatalog(spark, root)
  private def adm(args: String*): Unit = AdminCli.run(spark, cat, args.toList)

  test("admin dispatch recognizes group tokens, not query keywords") {
    assert(AdminCli.isAdmin(Array("dataset", "create", "a:b")))
    assert(AdminCli.isAdmin(Array("-c", "/tmp/x", "file", "retire", "F1")))
    assert(!AdminCli.isAdmin(Array("files", "from", "a:b")))
    assert(!AdminCli.isAdmin(Array("-c", "/tmp/x", "datasets", "matching", "a:*")))
    assert(!AdminCli.isAdmin(Array.empty[String]))
  }

  test("namespace and dataset lifecycle through the CLI surface") {
    adm("namespace", "create", "adm", "-o", "alice")
    assert(cat.namespaces.filter(col("name") === "adm" &&
      col("owner_user") === "alice").count() == 1)

    adm("dataset", "create", "adm:base", "-m", """{"ds.kind":"raw"}""")
    adm("dataset", "create", "adm:frozen1", "--frozen")
    assert(cat.datasets.filter(col("namespace") === "adm").count() == 2)
    assert(cat.datasets.filter(col("name") === "frozen1")
      .select("frozen").collect().head.getBoolean(0))

    adm("dataset", "update", "adm:base", "-m", """{"ds.note":"v2"}""",
      "-d", "updated desc")
    val meta = cat.datasets.filter(col("name") === "base")
      .select(to_json(col("metadata"))).collect().head.getString(0)
    assert(meta.contains("\"ds.kind\":\"raw\"") && meta.contains("\"ds.note\":\"v2\""))

    adm("dataset", "add-subset", "adm:base", "adm:frozen1")
    assert(cat.datasetsParentChild.count() == 1)

    adm("dataset", "remove", "adm:frozen1")
    assert(cat.datasets.filter(col("namespace") === "adm").count() == 1)
    assert(cat.datasetsParentChild.count() == 0)
  }

  test("file declare / update-meta / retire / move / update through the CLI") {
    val jf = Files.createTempFile("graft-declare-", ".json")
    Files.writeString(jf,
      """[{"fid":"A00000001","namespace":"adm","name":"a1.dat",
        |  "metadata":{"core.run":1},"size":10},
        | {"fid":"A00000002","namespace":"adm","name":"a2.dat",
        |  "metadata":{"core.run":2},"size":20,"checksums":{"md5":"ff"}}]""".stripMargin)
    adm("file", "declare", "-j", jf.toString, "adm:base")
    assert(Mql.query(spark, cat, "files from adm:base").count() == 2)

    adm("file", "update-meta", "-m", """{"core.tag":"x"}""", "A00000001")
    val m = Mql.query(spark, cat, "files adm:a1.dat")
      .select(to_json(col("metadata"))).collect().head.getString(0)
    assert(m.contains("\"core.run\":1") && m.contains("\"core.tag\":\"x\""))

    adm("file", "update", "A00000002", "--parents", "A00000001", "--size", "25")
    assert(cat.parentChild.filter(col("parent_fid") === "A00000001" &&
      col("child_fid") === "A00000002").count() == 1)
    assert(cat.files.filter(col("fid") === "A00000002")
      .select("size").collect().head.getLong(0) == 25L)

    adm("file", "retire", "A00000001")
    assert(Mql.query(spark, cat, "files from adm:base").count() == 1)

    adm("file", "move", "--to", "adm2", "A00000002")
    assert(cat.files.filter(col("fid") === "A00000002")
      .select("namespace").collect().head.getString(0) == "adm2")
  }

  test("named-query create and show round trip") {
    adm("named-query", "create", "adm:recent", "files", "from", "adm:base")
    assert(cat.namedQuerySource("adm", "recent").contains("files from adm:base"))
    adm("named-query", "show", "adm:recent") // prints; must not throw
    assertThrows[IllegalArgumentException](adm("named-query", "show", "adm:missing"))
  }

  test("unknown commands and malformed dids fail with clear errors") {
    assertThrows[IllegalArgumentException](adm("dataset", "frobnicate", "a:b"))
    assertThrows[IllegalArgumentException](adm("dataset", "create", "no-colon"))
    assertThrows[IllegalArgumentException](adm("file", "move", "A00000002"))
  }

  test("dedup-store maintenance group: stats/retire/checkpoint/vacuum/fsck") {
    assert(AdminCli.isAdmin(Array("dedup-store", "fsck", "/tmp/x")))
    val sroot = Files.createTempDirectory("graft-admincli-ds-").toString + "/store"
    val dl = new graft.metacat.DedupLog(spark, sroot)
    import spark.implicits._
    dl.ingest(Seq(
      (1L, (0 until 10).map(i => s"cli-a-$i").mkString(" ")),
      (2L, (0 until 10).map(i => s"cli-b-$i").mkString(" ")))
      .toDF("doc_id", "text"), 0L)
    adm("dedup-store", "stats", sroot)      // prints; must not throw
    adm("dedup-store", "retire", sroot, "1")
    assert(dl.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(2L))
    adm("dedup-store", "checkpoint", sroot)
    adm("dedup-store", "vacuum", sroot)
    adm("dedup-store", "fsck", sroot)       // all-green or fsck rows print
    assert(dl.fsck().filter(!col("ok")).count() == 0)
  }
}

package graft.metacat

import graft.mql.{Mql, SparkTestBase}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Catalog write path: declare → query → save_as/add_to → retire →
  * update metadata → named queries, over a parquet-backed catalog. */
class WritePathSpec extends SparkTestBase {

  private lazy val root = Files.createTempDirectory("graft-cat-").toString
  private lazy val cat = new ParquetCatalog(spark, root)

  private def declared(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (f"X$i%08d", s"ns${i % 2}", s"d_$i.dat",
        s"""{"core.run":$i,"core.tag":"t${i % 3}"}""",
        "tester", 1000L + i)
    }.toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
      .withColumn("created_timestamp", to_timestamp(lit("2026-02-01 00:00:00")))
      .withColumn("checksums", map(lit("md5"), md5(col("fid"))))
      .withColumn("updated_by", col("creator"))
      .withColumn("updated_timestamp", col("created_timestamp"))
      .withColumn("retired", lit(false))
      .withColumn("retired_timestamp", lit(null).cast("timestamp"))
      .withColumn("retired_by", lit(null).cast("string"))
  }

  test("declare, dataset membership, MQL round trip") {
    cat.declareFiles(declared(20))
    cat.createDataset("w", "base")
    cat.addTo(cat.files, "w", "base")
    assert(Mql.query(spark, cat, "files from w:base").count() == 20)
    assert(Mql.query(spark, cat, "files from w:base where core.run < 10").count() == 10)
  }

  test("save_as materializes a query result as a new dataset") {
    val result = Mql.query(spark, cat, "files from w:base where core.tag == t0")
    cat.saveAs(result, "w", "t0_files")
    val n = result.count()
    assert(Mql.query(spark, cat, "files from w:t0_files").count() == n)
    // add_to is idempotent on membership (set semantics)
    cat.addTo(result, "w", "t0_files")
    assert(Mql.query(spark, cat, "files from w:t0_files").count() == n)
  }

  test("frozen dataset rejects add_to") {
    cat.createDataset("w", "ice", frozen = true)
    assertThrows[IllegalArgumentException](
      cat.addTo(cat.files.limit(1), "w", "ice"))
  }

  test("retire removes files from default query results") {
    cat.retireFiles(Seq("X00000000", "X00000001"))
    assert(Mql.query(spark, cat, "files from w:base").count() == 18)
    assert(Mql.query(spark, cat, "files from w:base", includeRetired = true).count() == 20)
  }

  test("metadata update merge vs replace") {
    cat.updateFileMeta(Seq("X00000005"), """{"core.extra":42,"core.tag":"zz"}""", "update")
    val m = Mql.query(spark, cat, "files ns1:d_5.dat")
      .select(to_json(col("metadata"))).collect().head.getString(0)
    assert(m.contains("\"core.run\":5") && m.contains("\"core.extra\":42")
      && m.contains("\"core.tag\":\"zz\""))
    cat.updateFileMeta(Seq("X00000006"), """{"only.key":1}""", "replace")
    val r = Mql.query(spark, cat, "files ns0:d_6.dat")
      .select(to_json(col("metadata"))).collect().head.getString(0)
    assert(r == """{"only.key":1}""")
  }

  test("validation rejects bad declarations") {
    val cs = Seq(
      Validation.Constraint("core.run", typ = Some("int"), min = Some(0), max = Some(1000)),
      Validation.Constraint("core.tag", typ = Some("text"), pattern = Some("t[0-9]")))
    // valid rows pass
    cat.declareFiles(declared(3).withColumn("fid", concat(lit("V"), col("fid"))), cs)
    // type violation
    import spark.implicits._
    val bad = declared(1).withColumn("metadata_json", lit("""{"core.run":"not-an-int"}"""))
    assertThrows[IllegalArgumentException](cat.declareFiles(bad, cs))
    // range violation
    val bad2 = declared(1).withColumn("metadata_json", lit("""{"core.run":5000}"""))
    assertThrows[IllegalArgumentException](cat.declareFiles(bad2, cs))
    // pattern violation
    val bad3 = declared(1).withColumn("metadata_json", lit("""{"core.tag":"nope"}"""))
    assertThrows[IllegalArgumentException](cat.declareFiles(bad3, cs))
  }

  test("move namespace rewrites DID but keeps memberships") {
    cat.moveNamespace(Seq("X00000007"), "moved")
    assert(Mql.query(spark, cat, "files moved:d_7.dat").count() == 1)
    // still a member of its dataset under the new namespace
    assert(Mql.query(spark, cat, "files from w:base where name == d_7.dat")
      .select("namespace").collect().head.getString(0) == "moved")
  }

  test("named queries persist and splice") {
    cat.saveNamedQuery("w", "low", "files from w:base where core.run < 5")
    assert(Mql.query(spark, cat, "files selected by w:low").count() > 0)
  }

  test("provenance edges") {
    import spark.implicits._
    cat.addProvenance(Seq(("X00000002", "X00000003"), ("X00000002", "X00000004"))
      .toDF("parent_fid", "child_fid"))
    assert(Mql.query(spark, cat, "children(fids X00000002)").count() == 2)
    assert(Mql.query(spark, cat, "parents(fids X00000003)")
      .select("fid").collect().head.getString(0) == "X00000002")
  }

  test("declare with minimal columns: optional ones default, null retired coalesces") {
    import spark.implicits._
    val minimal = Seq(("M00000001", "nsm", "m_1.dat", """{"core.run":1}""", "tester", 10L),
      ("M00000002", "nsm", "m_2.dat", """{"core.run":2}""", "tester", 20L))
      .toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
      .withColumn("created_timestamp", to_timestamp(lit("2026-02-01 00:00:00")))
      // retired explicitly null — must behave as false, not vanish
      .withColumn("retired", lit(null).cast("boolean"))
    cat.declareFiles(minimal)
    assert(Mql.query(spark, cat, "fids M00000001, M00000002").count() == 2)
    assert(cat.files.filter(col("fid") === "M00000001" && !col("retired")).count() == 1)
    // missing required column is a clear error, not an AnalysisException
    assertThrows[IllegalArgumentException](
      cat.declareFiles(minimal.drop("size")))
  }

  test("dataset file_metadata_requirements enforced on declare and add_to") {
    cat.createDataset("w", "strict", fileMetaRequirementsJson =
      """{"core.run": {"required": true, "type": "int", "min": 0, "max": 100},
         "core.tag": {"pattern": "t[0-9]"}}""")
    // conforming declare-into-dataset passes and lands in the dataset
    cat.declareFiles(declared(3).withColumn("fid", concat(lit("R"), col("fid"))),
      dataset = Some(("w", "strict")))
    assert(Mql.query(spark, cat, "files from w:strict").count() == 3)
    // out-of-range metadata rejected at declare
    val bad = declared(1).withColumn("fid", concat(lit("RB"), col("fid")))
      .withColumn("metadata_json", lit("""{"core.run":5000}"""))
    assertThrows[IllegalArgumentException](
      cat.declareFiles(bad, dataset = Some(("w", "strict"))))
    // add_to re-validates existing files against the dataset's requirements
    // (runs 0 and 1 are retired by an earlier test; use 2/3 — still live)
    cat.createDataset("w", "strict2",
      fileMetaRequirementsJson = """{"core.run": {"max": 2}}""")
    assertThrows[IllegalArgumentException](
      cat.addTo(Mql.query(spark, cat, "files from w:base where core.run == 3"),
        "w", "strict2"))
    cat.addTo(Mql.query(spark, cat, "files from w:base where core.run == 2"),
      "w", "strict2")
    assert(Mql.query(spark, cat, "files from w:strict2").count() == 1)
  }

  test("numeric enumeration requirement accepts integer values numerically") {
    // "1" in the stored enum must match a BIGINT variant 1 (not compare
    // "1" against the canonical "1.0" string form)
    cat.createDataset("w", "enum", fileMetaRequirementsJson =
      """{"core.run": {"values": [0, 1, 2]}, "core.tag": {"values": ["t0", "t1", "t2"]}}""")
    cat.declareFiles(declared(2).withColumn("fid", concat(lit("E"), col("fid"))),
      dataset = Some(("w", "enum")))
    assert(Mql.query(spark, cat, "files from w:enum").count() == 2)
    val bad = declared(1).withColumn("fid", concat(lit("EB"), col("fid")))
      .withColumn("metadata_json", lit("""{"core.run":7,"core.tag":"t0"}"""))
    assertThrows[IllegalArgumentException](
      cat.declareFiles(bad, dataset = Some(("w", "enum"))))
    // type-strict: the STRING "1" does not satisfy the numeric enum
    // (Python's typed `value in values`)
    val crossType = declared(1).withColumn("fid", concat(lit("EX"), col("fid")))
      .withColumn("metadata_json", lit("""{"core.run":"1","core.tag":"t0"}"""))
    assertThrows[IllegalArgumentException](
      cat.declareFiles(crossType, dataset = Some(("w", "enum"))))
    // array values validate element-wise (validation.py:113-116)
    val arrOk = declared(1).withColumn("fid", concat(lit("EA"), col("fid")))
      .withColumn("metadata_json", lit("""{"core.run":[0,2],"core.tag":"t0"}"""))
    cat.declareFiles(arrOk, dataset = Some(("w", "enum")))
    val arrBad = declared(1).withColumn("fid", concat(lit("EZ"), col("fid")))
      .withColumn("metadata_json", lit("""{"core.run":[0,9],"core.tag":"t0"}"""))
    assertThrows[IllegalArgumentException](
      cat.declareFiles(arrBad, dataset = Some(("w", "enum"))))
  }

  test("re-declaring an existing fid is rejected") {
    val first = declared(1).withColumn("fid", concat(lit("D"), col("fid")))
    cat.declareFiles(first)
    assertThrows[IllegalArgumentException](cat.declareFiles(first))
  }

  test("category-less metadata keys rejected on declare-into-dataset") {
    cat.createDataset("w", "cats")
    val bad = declared(1).withColumn("fid", concat(lit("C"), col("fid")))
      .withColumn("metadata_json", lit("""{"nocategory":1}"""))
    assertThrows[IllegalArgumentException](
      cat.declareFiles(bad, dataset = Some(("w", "cats"))))
  }

  test("monotonic dataset: declares append, add_to/remove_from rejected") {
    cat.createDataset("w", "mono", monotonic = true)
    // appending NEWLY DECLARED files is allowed (monotonic = grow-only)
    cat.declareFiles(declared(2).withColumn("fid", concat(lit("N"), col("fid"))),
      dataset = Some(("w", "mono")))
    assert(Mql.query(spark, cat, "files from w:mono").count() == 2)
    // attaching pre-existing files is not
    assertThrows[IllegalArgumentException](
      cat.addTo(cat.files.limit(1), "w", "mono"))
    // neither is removal
    assertThrows[IllegalArgumentException](
      cat.removeFrom(cat.files.limit(1), "w", "mono"))
  }

  test("remove_from drops membership but keeps the files") {
    cat.createDataset("w", "trimmed")
    // runs 0/1 are retired by an earlier test; 2..4 are live
    val three = Mql.query(spark, cat, "files from w:base where core.run in 2:4")
    cat.addTo(three, "w", "trimmed")
    assert(Mql.query(spark, cat, "files from w:trimmed").count() == 3)
    cat.removeFrom(Mql.query(spark, cat, "files from w:base where core.run == 2"),
      "w", "trimmed")
    assert(Mql.query(spark, cat, "files from w:trimmed").count() == 2)
    // the file itself still exists in the catalog
    assert(Mql.query(spark, cat, "files from w:base where core.run == 2").count() == 1)
  }

  test("restricted parameter categories close the declared key set") {
    // fresh root: category config must not leak into the shared catalog
    val c2 = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-cat2-").toString)
    c2.createCategory("core", restricted = true,
      definitionsJson = """{"run": {"type": "int", "min": 0}, "tag": {}}""")
    c2.createCategory("opt")
    // conforming declare passes (core.run / core.tag are declared)
    c2.declareFiles(declared(3))
    // undeclared key in the restricted category is rejected
    assertThrows[IllegalArgumentException](c2.declareFiles(
      declared(1).withColumn("fid", concat(lit("B"), col("fid")))
        .withColumn("metadata_json", lit("""{"core.unknown":1}"""))))
    // ... as is an unknown SUBcategory under the restricted path
    assertThrows[IllegalArgumentException](c2.declareFiles(
      declared(1).withColumn("fid", concat(lit("B2"), col("fid")))
        .withColumn("metadata_json", lit("""{"core.sub.k":1}"""))))
    // a declared parameter's definition binds (min 0)
    assertThrows[IllegalArgumentException](c2.declareFiles(
      declared(1).withColumn("fid", concat(lit("B3"), col("fid")))
        .withColumn("metadata_json", lit("""{"core.run":-5}"""))))
    // the update path validates the incoming patch too (data_handler.py:932)
    assertThrows[IllegalArgumentException](
      c2.updateFileMeta(Seq("X00000000"), """{"core.unknown":1}"""))
    // non-restricted categories accept undeclared keys
    c2.declareFiles(declared(1).withColumn("fid", concat(lit("O"), col("fid")))
      .withColumn("metadata_json", lit("""{"opt.whatever":"y"}""")))
  }

  test("catalog root as a file: URI works end-to-end (Hadoop FS, not java.io)") {
    val c3 = new ParquetCatalog(spark,
      "file://" + Files.createTempDirectory("graft-uri-").toString)
    c3.declareFiles(declared(4).withColumn("fid", concat(lit("U"), col("fid"))))
    assert(c3.files.count() == 4)
    // retire exercises the compacting rewrite's rename/swap path
    c3.retireFiles(Seq("UX00000000"))
    assert(c3.files.filter(col("retired")).count() == 1)
    // count refresh materializes; the estimate path serves the stored
    // counts without touching the files table (retired still counted)
    c3.refreshCounts()
    val est = Mql.namespaceCounts(c3, exact = false).collect()
    assert(est.map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("ns0" -> 2L, "ns1" -> 2L))
    assert(est.forall(!_.getBoolean(3)))
  }

  test("update dataset: metadata merge/replace, flags, description") {
    cat.createDataset("w", "upd", metadataJson = """{"ds.kind":"raw"}""")
    cat.updateDataset("w", "upd", metadataJson = Some("""{"ds.v":1}"""))
    val m = cat.datasets.filter(col("namespace") === "w" && col("name") === "upd")
      .select(to_json(col("metadata"))).collect().head.getString(0)
    assert(m == """{"ds.kind":"raw","ds.v":1}""")
    cat.updateDataset("w", "upd", metadataJson = Some("""{"ds.only":2}"""),
      metadataMode = "replace", frozen = Some(true), description = Some("d2"))
    val r = cat.datasets.filter(col("namespace") === "w" && col("name") === "upd")
      .select(to_json(col("metadata")), col("frozen"), col("description"))
      .collect().head
    assert(r.getString(0) == """{"ds.only":2}""" && r.getBoolean(1)
      && r.getString(2) == "d2")
    // the frozen flag set by update BINDS: add_to now rejects...
    assertThrows[IllegalArgumentException](cat.addTo(cat.files.limit(1), "w", "upd"))
    // ...and thawing re-opens the dataset
    cat.updateDataset("w", "upd", frozen = Some(false))
    cat.addTo(cat.files.filter(col("fid") === "X00000002"), "w", "upd")
    assert(cat.filesDatasets.filter(col("dataset_name") === "upd").count() == 1)
    // category-less patch key and unknown dataset are rejected
    assertThrows[IllegalArgumentException](
      cat.updateDataset("w", "upd", metadataJson = Some("""{"bare":1}""")))
    assertThrows[IllegalArgumentException](
      cat.updateDataset("w", "nope", frozen = Some(true)))
  }

  test("remove dataset cleans memberships and hierarchy edges, keeps files") {
    cat.createDataset("w", "gone")
    cat.addTo(Mql.query(spark, cat, "files from w:base where core.run in 3:4"),
      "w", "gone")
    cat.addDatasetEdge("w", "base", "w", "gone")
    cat.removeDataset("w", "gone")
    assert(cat.datasets.filter(col("name") === "gone").count() == 0)
    assert(cat.filesDatasets.filter(col("dataset_name") === "gone").count() == 0)
    assert(cat.datasetsParentChild.filter(col("child_name") === "gone").count() == 0)
    // the files themselves are untouched
    assert(Mql.query(spark, cat, "files from w:base where core.run in 3:4").count() == 2)
    // removing a missing dataset is an error, not a no-op
    assertThrows[IllegalArgumentException](cat.removeDataset("w", "gone"))
  }

  test("remove files: hard delete cleans memberships and provenance edges") {
    import spark.implicits._
    cat.addProvenance(Seq(("X00000008", "X00000009")).toDF("parent_fid", "child_fid"))
    cat.removeFiles(Seq("X00000008"))
    assert(cat.files.filter(col("fid") === "X00000008").count() == 0)
    assert(cat.filesDatasets.filter(col("fid") === "X00000008").count() == 0)
    assert(cat.parentChild.filter(col("parent_fid") === "X00000008" ||
      col("child_fid") === "X00000008").count() == 0)
    // neighbors survive: the file it pointed to, and other edges
    assert(cat.files.filter(col("fid") === "X00000009").count() == 1)
    assert(cat.parentChild.filter(col("parent_fid") === "X00000002").count() == 2)
  }

  test("update file: size, checksum merge/replace, provenance add/set, validation") {
    cat.updateFile("X00000010", checksums = Some(Map("adler32" -> "aa")),
      size = Some(999L))
    val r = cat.files.filter(col("fid") === "X00000010")
      .select("size", "checksums").collect().head
    assert(r.getLong(0) == 999L)
    val merged = r.getMap[String, String](1)
    assert(merged.size == 2 && merged("adler32") == "aa" && merged.contains("md5"))
    // replace swaps the whole checksum map
    cat.updateFile("X00000010", checksums = Some(Map("sha1" -> "bb")), mode = "replace")
    val swapped = cat.files.filter(col("fid") === "X00000010")
      .select("checksums").collect().head.getMap[String, String](0)
    assert(swapped == Map("sha1" -> "bb"))
    // provenance: add-update appends, replace swaps the given side
    cat.updateFile("X00000010", parents = Some(Seq("X00000011")))
    cat.updateFile("X00000010", parents = Some(Seq("X00000012")))
    assert(cat.parentChild.filter(col("child_fid") === "X00000010").count() == 2)
    cat.updateFile("X00000010", parents = Some(Seq("X00000012")), mode = "replace")
    val ps = cat.parentChild.filter(col("child_fid") === "X00000010")
      .select("parent_fid").collect().map(_.getString(0)).toSeq
    assert(ps == Seq("X00000012"))
    // unknown provenance endpoint and unknown file are rejected
    assertThrows[IllegalArgumentException](
      cat.updateFile("X00000010", parents = Some(Seq("NOPE"))))
    assertThrows[IllegalArgumentException](cat.updateFile("NOPE", size = Some(1L)))
    // merged metadata must satisfy every member dataset's contract
    // (RX00000000 is in w:strict, which caps core.run at 100)
    assertThrows[IllegalArgumentException](
      cat.updateFile("RX00000000", metadataJson = Some("""{"core.run":5000}""")))
    // a conforming patch passes and merges
    cat.updateFile("RX00000000", metadataJson = Some("""{"core.run":42}"""))
    val run = Mql.query(spark, cat, "fids RX00000000")
      .select(expr("try_variant_get(metadata, \"$['core.run']\", 'long')"))
      .collect().head.getLong(0)
    assert(run == 42L)
  }

  test("declare dry_run validates everything but writes nothing") {
    val before = cat.files.count()
    cat.declareFiles(declared(2).withColumn("fid", concat(lit("DR"), col("fid"))),
      dryRun = true)
    assert(cat.files.count() == before, "dry run must not write")
    // the checks still bind: re-declaring an existing id fails in dry run
    assertThrows[IllegalArgumentException](
      cat.declareFiles(declared(3), dryRun = true))
  }

  test("add_child_dataset: cycle reject, duplicate no-op, existence checks") {
    cat.createDataset("w", "h1"); cat.createDataset("w", "h2")
    cat.createDataset("w", "h3")
    cat.addDatasetEdge("w", "h1", "w", "h2")
    cat.addDatasetEdge("w", "h2", "w", "h3")
    // h1 is an ancestor of h3 — attaching it as h3's child closes a cycle
    assertThrows[IllegalArgumentException](cat.addDatasetEdge("w", "h3", "w", "h1"))
    assertThrows[IllegalArgumentException](cat.addDatasetEdge("w", "h1", "w", "h1"))
    // duplicate edge is a no-op, as in the reference
    val n = cat.datasetsParentChild.count()
    cat.addDatasetEdge("w", "h1", "w", "h2")
    assert(cat.datasetsParentChild.count() == n)
    assertThrows[IllegalArgumentException](cat.addDatasetEdge("w", "h1", "w", "nope"))
  }

  test("namespace dimension: create, duplicate-reject, counts join") {
    cat.createNamespace("wn1", owner = "alice", description = "first")
    cat.createNamespace("wn2", owner = "bob")
    assertThrows[IllegalArgumentException](cat.createNamespace("wn1"))
    val got = cat.namespaces.select("name", "owner_user", "description")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set(("wn1", "alice", Some("first")), ("wn2", "bob", None)))
    // refreshCounts writes the denormalized count onto the dimension
    cat.refreshCounts()
    val counts = cat.namespaces.select("name", "file_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("wn1", "wn2") && counts.values.forall(_ == 0L))
  }

  test("non-object metadata payloads are rejected, not written verbatim") {
    cat.createDataset("w", "objchk")
    for (bad <- Seq("[1,2]", "\"str\"", "7")) {
      assertThrows[IllegalArgumentException](
        cat.updateDataset("w", "objchk", metadataJson = Some(bad)))
      assertThrows[IllegalArgumentException](
        cat.updateFileMeta(Seq("X00000001"), bad))
      assertThrows[IllegalArgumentException](
        cat.updateFile("X00000001", metadataJson = Some(bad)))
    }
  }

  test("update_file rejects a self-referencing provenance edge") {
    assertThrows[IllegalArgumentException](
      cat.updateFile("X00000001", parents = Some(Seq("X00000001"))))
    assertThrows[IllegalArgumentException](
      cat.updateFile("X00000001", children = Some(Seq("X00000002", "X00000001"))))
  }

  test("exact namespaceCounts keeps namespaces missing from the dimension") {
    // this catalog declared into ns0/ns1 without createNamespace; the
    // dimension holds only wn1/wn2 — the exact path must still count the
    // file-derived namespaces (ADVICE r4) and coalesce sizes to 0
    val rows = Mql.namespaceCounts(cat, includeRetired = true).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.contains("ns0") && rows.contains("ns1"), s"got $rows")
    assert(rows("wn1") == 0L && rows("wn2") == 0L)
    val sizes = Mql.namespaceCounts(cat, includeRetired = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap // coalesced, never null
    assert(sizes("wn1") == 0L)
  }

  test("declared shredding stores typed columns and serves predicates") {
    val root2 = Files.createTempDirectory("graft-shred-").toString
    val shred = Map("core.run" -> (("_s_run", graft.mql.MetaCompiler.ShredNum)))
    val c = new ParquetCatalog(spark, root2, shred)
    c.declareFiles(declared(6).withColumn("fid", concat(lit("S"), col("fid"))))
    // the typed column is physically present and equals the variant value
    val f = spark.read.parquet(s"$root2/files")
    assert(f.columns.contains("_s_run"))
    assert(c.files.filter(col("_s_run") === 3.0).count() == 1)
    // metadata updates re-derive the shred column on rewrite
    c.updateFileMeta(Seq("SX00000003"), """{"core.run":99}""")
    assert(c.files.filter(col("_s_run") === 99.0).count() == 1)
    assert(Mql.query(spark, c, "files where core.run == 99").count() == 1)
  }

  test("json-seq emitter") {
    val out = new java.io.StringWriter
    JsonSeq.write(Mql.query(spark, cat, "files from w:base limit 3"), out)
    val recs = out.toString.split(JsonSeq.RS).filter(_.nonEmpty)
    assert(recs.length == 3 && recs.forall(r => r.trim.startsWith("{") && r.contains("\"fid\"")))
  }
}

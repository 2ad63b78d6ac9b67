package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.{DerivedCatalog, OracleCatalog}
import graft.mql.Mql

/** The MQL operator suite (SURVEY.md §2), run end-to-end through
  * parse → resolve → plan over the [[DerivedCatalog]], each with a DuckDB
  * oracle that re-derives the catalog from `orders` via
  * [[OracleCatalog.cte]] and expresses the query's semantics directly in
  * SQL. Column names/types are aligned on both sides (driver hash-compares
  * after sorting columns by name).
  */
object MqlQueries {

  private def q(text: String)(s: SparkSession, dir: String): DataFrame =
    fileOut(Mql.query(s, new DerivedCatalog(s, dir), text))

  /** stable output projection: fixed attributes only (the Variant metadata
    * column is engine-internal; DuckDB can't read variant parquet) */
  private def fileOut(df: DataFrame): DataFrame =
    df.select(col("fid"), col("namespace"), col("name"), col("size"),
      col("creator"),
      unix_timestamp(col("created_timestamp")).as("created_ts"),
      col("retired"))

  private val FileCols =
    "fid, namespace, name, size, creator, CAST(epoch(created_timestamp) AS BIGINT) AS created_ts, retired"

  private def o(select: String): String = OracleCatalog.sql(select)

  /** Per-JVM staging of the embedded-Derby lookup DB (keyed by sf dir):
    * creating a Derby database + writing the nation rows over JDBC is a
    * multi-second disk-bound setup that belongs to SESSION INIT, not to
    * the query — re-creating it per invocation made the `mql_filter_jdbc`
    * gate measure Derby's create path (70× swings on cold disk, r6),
    * exactly like re-ingesting the catalog per query would. Real posture:
    * the external lookup DB exists before the engine queries it. */
  private val derbyStaged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedDerbyUrl(s: SparkSession, dir: String): String =
    derbyStaged.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-derby-")
      graft.TempDirs.register(tmp)
      // keep derby.log inside the temp dir, not the process cwd
      System.setProperty("derby.system.home", tmp.toString)
      val url = s"jdbc:derby:$tmp/nationdb;create=true"
      val props = new java.util.Properties
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("int").as("nkey"), col("n_name"))
        .write.mode("overwrite").jdbc(url, "runsdb", props)
      url
    })

  /** DuckDB adler32 over the 9-char fid — value-identical to zlib/java
    * (validated against java.util.zip.Adler32). */
  private val DuckAdler32 =
    "(((9 + list_sum(list_transform(range(1,10), i -> (10-i)*ascii(substr(fid,i,1))))) % 65521) * 65536" +
      " + ((1 + list_sum(list_transform(range(1,10), i -> ascii(substr(fid,i,1))))) % 65521))"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans + metadata predicates (SURVEY §2.1, §2.3) ---
    "mql_bfq_where" -> q("files from dsns:all where core.run > 500 and core.status == F") _,
    "mql_bfq_multi_ds" -> q("files from dsns:ds1, dsns:ds2 where data.weight == 42") _,
    "mql_bfq_matching_having" -> q("files from datasets matching dsns:ds* having ds.index <= 2 where core.run < 400") _,
    "mql_full_scan" -> q("files where core.priority == 1-URGENT and size > 500000") _,
    "mql_in_set" -> q("files from dsns:all where core.status in (O, P)") _,
    "mql_not_in_set" -> q("files from dsns:all where core.run not in 100:900") _,
    "mql_present" -> q("files from dsns:all where opt.flag present and opt.flag == true") _,
    "mql_not_present" -> q("files from dsns:ds1 where opt.note not present") _,
    "mql_regex" -> q("""files from dsns:all where opt.note ~ "note-F" """) _,
    "mql_regex_ci" -> q("""files from dsns:all where opt.note ~* "NOTE-O" and opt.note !~ "-1[01]$" """) _,
    "mql_any_range" -> q("files from dsns:all where core.runs[any] in 1500:1700") _,
    "mql_all_cmp" -> q("files from dsns:all where core.runs[all] < 1500") _,
    // len==4 ⇒ k%4==3 ⇒ k odd ⇒ bits.muon==1: the conjunction is
    // satisfiable (round 1 used len==3 which forced muon==0 — a 0-row gate)
    "mql_len_subscript" -> q("""files from dsns:all where len(data.tags) == 4 and core.bits["muon"] == 1""") _,
    "mql_const_in" -> q("""files from dsns:all where "tag3" in data.tags""") _,
    "mql_mixed_type" -> q("""files from dsns:all where data.weight == "w43" or data.weight == 42""") _,
    "mql_datetime" -> q("""files from dsns:all where core.ts >= datetime("1997-01-01") and core.ts < datetime("1998-01-01")""") _,
    "mql_date_window" -> q("""files from dsns:all where core.ts == date("1997-03-15")""") _,
    "mql_object_attrs" -> q("""files from dsns:all where creator == user3 and size > 500000 and name ~ "1.dat" """) _,

    // --- set algebra (SURVEY §2.4, §2.5) ---
    "mql_union" -> q("union(files from dsns:ds1 where core.run < 300, files from dsns:ds2 where core.run < 300, files from dsns:ds1 where core.run in 200:400)") _,
    "mql_intersect" -> q("{files from dsns:all where core.run < 600, files from dsns:ds2}") _,
    "mql_minus" -> q("files from dsns:ds0 - files where core.run >= 500") _,

    // --- provenance (SURVEY §2.4) ---
    "mql_parents" -> q("parents(files from dsns:ds2 where core.run < 100)") _,
    "mql_children" -> q("children(files from dsns:ds1 where core.run < 100)") _,
    // transitive lineage (engine extension — the reference hop is
    // one-level): every ancestor of the seed set with its min hop depth
    "mql_ancestors" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      val seeds = Mql.query(s, cat,
        "files from dsns:ds2 where core.run < 20").select("fid")
      Mql.provenanceClosure(cat, seeds)
    }),
    // the derived-data direction: everything downstream of the seed set
    "mql_descendants" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      val seeds = Mql.query(s, cat,
        "files from dsns:ds1 where core.run < 10").select("fid")
      Mql.provenanceClosure(cat, seeds, ancestors = false)
    }),

    // --- ordering / pagination (SURVEY §2.8) ---
    "mql_skip_limit" -> q("files from dsns:all ordered skip 100 limit 20") _,
    "mql_skip_limit_fold" -> q("files from dsns:all skip 40 limit 100 skip 10 limit 30") _,

    // --- file lists (SURVEY §2.1; dbobjects2.py:306-345) ---
    // point lookups are always id-ordered; retired files ARE returned
    // (direct lookups skip the liveness filter); postfix skip/limit folds
    // into the list node. F00000097 is retired (97 % 97 == 0).
    "mql_file_list" -> q("fids F00000003, F00000097, F00000101, F00000202 skip 1 limit 2") _,

    // MQL text straight through spark.sql (ParserInterface passthrough,
    // SURVEY §7.3) — a SQL notebook runs reference queries verbatim; the
    // session's parser is injected by GraftExtensions (Verify/Bench
    // register it), the catalog bound per session via MqlSql.install
    "mql_sql_passthrough" -> ((s, dir) => {
      graft.mql.MqlSql.install(s, new DerivedCatalog(s, dir))
      fileOut(s.sql("files from dsns:ds1 where core.run < 250"))
    }),

    // --- named queries (SURVEY §2.1) ---
    "mql_named_query" -> q("files selected by q:runs_low") _,

    // --- with_provenance projection (schema.sql:86-97, dbobjects2.py:252-255) ---
    "mql_with_provenance" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      val res = Mql.withProvenance(cat,
        Mql.query(s, cat, "files from dsns:ds1 where core.run < 100"))
      res.select(col("fid"), col("namespace"), col("name"), col("size"),
        col("creator"),
        unix_timestamp(col("created_timestamp")).as("created_ts"),
        col("retired"),
        array_join(col("parents"), ",").as("parents"),
        array_join(col("children"), ",").as("children"))
    }),

    // --- external lookup-join filter (SURVEY §2.4; the runsdb/rucio
    // custom-filter analog) — lookup table derived from nation.parquet so
    // the oracle can reproduce the join ---
    "mql_filter_lookup" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      val nation = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").as("key"), col("n_name"))
      graft.mql.Filters.register("oracle_nation",
        new graft.mql.Filters.LookupJoinFilter(nation, "core.run", "nat"))
      Mql.query(s, cat,
        "filter oracle_nation()(files from dsns:all where core.run < 40)")
        .select(col("fid"), col("namespace"), col("name"), col("size"),
          col("creator"),
          unix_timestamp(col("created_timestamp")).as("created_ts"),
          col("retired"),
          expr("try_variant_get(metadata, \"$['nat.n_name']\", 'string')").as("nat_name"))
    }),

    // --- JDBC-sourced lookup filter (the concrete connector: the same
    // nation lookup routed through a real SQL database — embedded Derby,
    // written and read over spark JDBC — and loaded through the
    // reference-style conf surface rather than in-process registration ---
    "mql_filter_jdbc" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      val url = stagedDerbyUrl(s, dir)
      s.conf.set("spark.graft.filters", "runsdb=graft.mql.JdbcLookupFilter")
      s.conf.set("spark.graft.filter.jdbc.url", url)
      s.conf.set("spark.graft.filter.jdbc.driver", "org.apache.derby.jdbc.EmbeddedDriver")
      s.conf.set("spark.graft.filter.jdbc.table", "runsdb")
      s.conf.set("spark.graft.filter.jdbc.keyColumn", "nkey")
      s.conf.set("spark.graft.filter.jdbc.metaKey", "core.run")
      s.conf.set("spark.graft.filter.jdbc.prefix", "run")
      Mql.query(s, cat,
        "filter runsdb()(files from dsns:ds3 where core.run < 60)")
        .select(col("fid"), col("namespace"), col("name"), col("size"),
          col("creator"),
          unix_timestamp(col("created_timestamp")).as("created_ts"),
          col("retired"),
          expr("try_variant_get(metadata, \"$['run.n_name']\", 'string')").as("run_name"))
    }),

    // --- conf-loaded USER filter (SURVEY §2.7's registry row — the last
    // spec-only component, oracle-gated r14): BandFilter is user-side
    // code in the queries package, resolved by name through
    // spark.graft.filters (conf entry → Class.forName → zero-arg
    // construct → per-call resolution), exercising positional AND
    // keyword params through the MQL grammar ---
    "mql_filter_user" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      s.conf.set("spark.graft.filters", "band=graft.queries.BandFilter")
      fileOut(Mql.query(s, cat,
        "filter band(200000, 400000, key=\"size\")(files from dsns:ds2)"))
    }),

    // --- filters (SURVEY §2.7) ---
    "mql_filter_stride" -> q("filter stride(7, 2)(files from dsns:all)") _,
    "mql_filter_sample" -> q("filter sample(0.25)(files from dsns:all)") _,
    "mql_filter_hash" -> q("filter hash(3, 1)(files from dsns:all)") _,
    "mql_filter_limit" -> q("filter limit(25)(files from dsns:all ordered)") _,
    // mix: the driver hash-compares row SETS (order-insensitive), so the
    // interleave's emitted set is oracle-able even though its order is
    // driver-sequenced. Three gates cover the algorithm's three regimes
    // (filters.py:161-191): (2,1) degenerates to always-stream-0 under the
    // renormalize step, (1,1) disjoint alternates with the exhaustion-stop
    // count formula, and (1,1) overlapping exercises the dedup-skip path
    // (its expected fid set is generated by an independent driver-side
    // replay of the reference score algorithm — see [[mixOracle]]).
    // randomize exposes its portable md5 sort key as a column so the
    // oracle verifies the exact reorder derivation.
    "mql_filter_mix" -> q("filter mix(2, 1)(files from dsns:ds1, files from dsns:ds2)") _,
    "mql_filter_mix_even" -> q("filter mix(1, 1)(files from dsns:ds1, files from dsns:ds2)") _,
    "mql_filter_mix_overlap" -> q("filter mix(1, 1)(files from dsns:ds1, files from dsns:all)") _,
    "mql_filter_randomize" -> ((s, dir) =>
      fileOut(Mql.query(s, new DerivedCatalog(s, dir),
        "filter randomize(7)(files from dsns:ds0)"))
        .withColumn("rand_key", graft.mql.Filters.randomizeKey(col("fid"), 7))),

    // --- dataset & query queries (SURVEY §2.1) ---
    "mql_datasets" -> ((s, dir) =>
      Mql.query(s, new DerivedCatalog(s, dir), "datasets matching dsns:* having ds.index >= 0")
        .select(col("namespace"), col("name"), col("frozen"), col("monotonic"))),
    "mql_datasets_recursive" -> ((s, dir) =>
      Mql.query(s, new DerivedCatalog(s, dir), "datasets dsns:top with subsets recursively")
        .select(col("namespace"), col("name"))),
    "mql_queries_search" -> ((s, dir) =>
      Mql.query(s, new DerivedCatalog(s, dir), "queries matching q:* where q.owner == admin")
        .select(col("namespace"), col("name"))),

    // --- summary (SURVEY §2.6) ---
    "mql_summary_count" -> ((s, dir) =>
      Mql.summaryCount(Mql.query(s, new DerivedCatalog(s, dir),
        "files from dsns:all where core.run < 250"))),
    "mql_summary_keys" -> ((s, dir) =>
      Mql.summaryKeys(Mql.query(s, new DerivedCatalog(s, dir), "files from dsns:ds2"))),
    "mql_dataset_counts" -> ((s, dir) =>
      Mql.datasetCounts(new DerivedCatalog(s, dir))),
    "mql_namespace_counts" -> ((s, dir) =>
      Mql.namespaceCounts(new DerivedCatalog(s, dir))),
    // catalog integrity audit (fsck): one row per invariant with its
    // violation count — the derived catalog intentionally reports
    // non-zero dangling provenance parents (sparse TPC-H key space)
    "mql_fsck" -> ((s, dir) =>
      graft.metacat.Fsck.audit(new DerivedCatalog(s, dir))),
    // datasets_for_files endpoint (data_handler.py:573-607): memberships
    // of a selective file set
    "mql_datasets_for_files" -> ((s, dir) => {
      val cat = new DerivedCatalog(s, dir)
      Mql.datasetsForFiles(cat,
        Mql.query(s, cat, "files from dsns:ds2 where core.run < 100"))
    }),
    "mql_summary_kv" -> ((s, dir) =>
      Mql.summaryKeyValues(Mql.query(s, new DerivedCatalog(s, dir),
        "files from dsns:ds3 where core.run < 50"))))

  val oracles: Map[String, String] = Map(
    "mql_bfq_where" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND m_run > 500 AND m_status = 'F'"),
    "mql_bfq_multi_ds" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 IN (1, 2)" +
        " AND weight_is_int AND m_weight_int = 42"),
    "mql_bfq_matching_having" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 IN (0, 1, 2) AND m_run < 400"),
    "mql_full_scan" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND m_priority = '1-URGENT' AND size > 500000"),
    "mql_in_set" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND m_status IN ('O', 'P')"),
    "mql_not_in_set" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND NOT (m_run BETWEEN 100 AND 900)"),
    "mql_present" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND has_flag AND m_flag"),
    "mql_not_present" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 1 AND NOT has_note"),
    "mql_regex" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND has_note AND regexp_matches(m_note, 'note-F')"),
    "mql_regex_ci" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND has_note" +
        " AND regexp_matches(m_note, '(?i)NOTE-O') AND NOT regexp_matches(m_note, '-1[01]$')"),
    "mql_any_range" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired" +
        " AND len(list_filter(m_runs, x -> x BETWEEN 1500 AND 1700)) > 0"),
    "mql_all_cmp" -> o( // [all] < 1500 == no element >= 1500
      s"SELECT $FileCols FROM mc_files WHERE NOT retired" +
        " AND len(list_filter(m_runs, x -> x >= 1500)) = 0"),
    "mql_len_subscript" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND len(m_tags) = 4 AND m_bits_muon = 1"),
    "mql_const_in" -> o( // array containment; scalar-regex leg is false on an array
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND list_contains(m_tags, 'tag3')"),
    "mql_mixed_type" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND" +
        " ((NOT weight_is_int AND m_weight_str = 'w43') OR (weight_is_int AND m_weight_int = 42))"),
    "mql_datetime" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired" +
        " AND m_ts >= 852076800 AND m_ts < 883612800"),
    "mql_date_window" -> o( // 1997-03-15 = 858384000
      s"SELECT $FileCols FROM mc_files WHERE NOT retired" +
        " AND m_ts >= 858384000 AND m_ts < 858470400"),
    "mql_object_attrs" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND creator = 'user3'" +
        " AND size > 500000 AND regexp_matches(name, '1.dat')"),
    "mql_union" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND (" +
        " (k % 5 = 1 AND m_run < 300) OR (k % 5 = 2 AND m_run < 300)" +
        " OR (k % 5 = 1 AND m_run BETWEEN 200 AND 400))"),
    "mql_intersect" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND m_run < 600 AND k % 5 = 2"),
    "mql_minus" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 0 AND m_run < 500"),
    // NOTE: the provenance hop does NOT exclude retired files on the hop
    // result (sql_converter.py:165-221 has no retired condition on the
    // outer table) — only the inner BFQ filters retired.
    "mql_parents" -> o(
      s"SELECT $FileCols FROM mc_files WHERE fid IN (" +
        "SELECT pc.parent_fid FROM mc_parent_child pc JOIN mc_files c ON pc.child_fid = c.fid" +
        " WHERE NOT c.retired AND c.k % 5 = 2 AND c.m_run < 100)"),
    "mql_children" -> o(
      s"SELECT $FileCols FROM mc_files WHERE fid IN (" +
        "SELECT pc.child_fid FROM mc_parent_child pc JOIN mc_files p ON pc.parent_fid = p.fid" +
        " WHERE NOT p.retired AND p.k % 5 = 1 AND p.m_run < 100)"),
    // min hop depth = BFS first reach; the recursive UNION keeps every
    // (fid, depth) pair and the final GROUP BY takes the minimum
    "mql_ancestors" ->
      (s"WITH RECURSIVE ${OracleCatalog.cte}, " +
        "sd AS (SELECT fid FROM mc_files WHERE NOT retired AND k % 5 = 2 AND m_run < 20), " +
        "walk(fid, depth) AS (" +
        "SELECT pc.parent_fid, 1::BIGINT FROM mc_parent_child pc JOIN sd ON pc.child_fid = sd.fid " +
        "UNION " +
        "SELECT pc.parent_fid, w.depth + 1 FROM walk w JOIN mc_parent_child pc ON pc.child_fid = w.fid) " +
        "SELECT fid, min(depth)::BIGINT AS depth FROM walk GROUP BY fid"),
    "mql_descendants" ->
      (s"WITH RECURSIVE ${OracleCatalog.cte}, " +
        "sd AS (SELECT fid FROM mc_files WHERE NOT retired AND k % 5 = 1 AND m_run < 10), " +
        "walk(fid, depth) AS (" +
        "SELECT pc.child_fid, 1::BIGINT FROM mc_parent_child pc JOIN sd ON pc.parent_fid = sd.fid " +
        "UNION " +
        "SELECT pc.child_fid, w.depth + 1 FROM walk w JOIN mc_parent_child pc ON pc.parent_fid = w.fid) " +
        "SELECT fid, min(depth)::BIGINT AS depth FROM walk GROUP BY fid"),
    "mql_skip_limit" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired ORDER BY fid LIMIT 20 OFFSET 100"),
    // skip 40 limit 100 skip 10 limit 30  ==>  skip 50 limit 30
    "mql_skip_limit_fold" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired ORDER BY fid LIMIT 30 OFFSET 50"),
    "mql_named_query" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 1 AND m_run < 300"),
    // same BFQ semantics as the API path — the passthrough must not change
    // retired-row hiding or predicate compilation
    "mql_sql_passthrough" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 1 AND m_run < 250"),

    "mql_file_list" -> o(
      s"SELECT $FileCols FROM mc_files" +
        " WHERE fid IN ('F00000003', 'F00000097', 'F00000101', 'F00000202')" +
        " ORDER BY fid LIMIT 2 OFFSET 1"),
    "mql_with_provenance" ->
      (s"WITH ${OracleCatalog.cte}, " +
        "pr AS (SELECT child_fid AS fid, array_to_string(list_sort(list(parent_fid)), ',') AS parents" +
        " FROM mc_parent_child GROUP BY 1), " +
        "ch AS (SELECT parent_fid AS fid, array_to_string(list_sort(list(child_fid)), ',') AS children" +
        " FROM mc_parent_child GROUP BY 1) " +
        s"SELECT $FileCols, COALESCE(pr.parents, '') AS parents, COALESCE(ch.children, '') AS children" +
        " FROM mc_files LEFT JOIN pr USING (fid) LEFT JOIN ch USING (fid)" +
        " WHERE NOT retired AND k % 5 = 1 AND m_run < 100"),
    "mql_filter_lookup" -> o(
      s"SELECT $FileCols, n.n_name AS nat_name FROM mc_files" +
        " LEFT JOIN nation n ON m_run = n.n_nationkey" +
        " WHERE NOT retired AND m_run < 40"),
    "mql_filter_jdbc" -> o(
      s"SELECT $FileCols, n.n_name AS run_name FROM mc_files" +
        " LEFT JOIN nation n ON m_run = n.n_nationkey" +
        " WHERE NOT retired AND k % 5 = 3 AND m_run < 60"),
    "mql_filter_user" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 2" +
        " AND size >= 200000 AND size < 400000"),
    "mql_filter_randomize" -> o(
      s"SELECT $FileCols, md5('7:' || fid) AS rand_key" +
        " FROM mc_files WHERE NOT retired AND k % 5 = 0"),
    "mql_filter_stride" ->
      (s"WITH ${OracleCatalog.cte}, numbered AS (" +
        "SELECT *, row_number() OVER (ORDER BY fid) AS rn FROM mc_files WHERE NOT retired)" +
        s" SELECT $FileCols FROM numbered WHERE (rn - 1) % 7 = 2"),
    "mql_filter_sample" ->
      (s"WITH ${OracleCatalog.cte}, numbered AS (" +
        "SELECT *, row_number() OVER (ORDER BY fid) AS rn FROM mc_files WHERE NOT retired)" +
        s" SELECT $FileCols FROM numbered WHERE floor(rn * 0.25) > floor((rn - 1) * 0.25)"),
    "mql_filter_hash" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND $DuckAdler32 % 3 = 1"),
    "mql_filter_limit" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired ORDER BY fid LIMIT 25"),
    // mix(2,1): the reference renormalizes scores to max=0 each round and
    // charges the winner a flat -1.0 (filters.py:170-189), so with
    // UNNORMALIZED ratios r0 > r1 the score difference returns to the same
    // fixed point every round (d += r0-r1; d -= 1 on the win for 2-1=1)
    // and stream 0 wins EVERY round until it exhausts ⇒ the emitted set is
    // exactly ds1's (non-retired) files. Degenerate but faithful — and the
    // gate proves the engine reproduces the degeneracy instead of
    // "helpfully" interleaving.
    "mql_filter_mix" -> o(
      s"SELECT $FileCols FROM mc_files WHERE NOT retired AND k % 5 = 1"),
    // mix(1,1) over DISJOINT streams: ties go to the higher input index
    // (sorted(reverse=True, key=(score, index))), so picks alternate
    // ds2, ds1, ds2, ds1, ... and stop at the first failed pull:
    // ds2 contributes least(n2, n1+1) and ds1 least(n1, n2) of their
    // fid-ordered streams.
    "mql_filter_mix_even" ->
      (s"WITH ${OracleCatalog.cte}, " +
        "a AS (SELECT *, row_number() OVER (ORDER BY fid) AS rn FROM mc_files WHERE NOT retired AND k % 5 = 1), " +
        "b AS (SELECT *, row_number() OVER (ORDER BY fid) AS rn FROM mc_files WHERE NOT retired AND k % 5 = 2), " +
        "n AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb) " +
        s"SELECT $FileCols FROM b WHERE rn <= (SELECT least(nb, na + 1) FROM n) " +
        "UNION ALL " +
        s"SELECT $FileCols FROM a WHERE rn <= (SELECT least(na, nb) FROM n)"),
    "mql_datasets" -> o(
      "SELECT namespace, name, frozen, monotonic FROM mc_datasets WHERE ds_index >= 0"),
    "mql_datasets_recursive" -> o(
      "SELECT namespace, name FROM mc_datasets"),
    "mql_queries_search" ->
      "SELECT 'q' AS namespace, name FROM (VALUES ('flagged'), ('runs_low')) AS t(name)",
    "mql_summary_count" -> o(
      "SELECT count(*) AS \"count\", CAST(COALESCE(sum(size), 0) AS BIGINT) AS total_size" +
        " FROM mc_files WHERE NOT retired AND m_run < 250"),
    "mql_dataset_counts" ->
      (s"WITH ${OracleCatalog.cte}, fa AS (" +
        "SELECT fd.dataset_namespace, fd.dataset_name, count(*) AS file_count," +
        " CAST(sum(f.size) AS BIGINT) AS total_size" +
        " FROM mc_files_datasets fd JOIN mc_files f ON fd.fid = f.fid" +
        " WHERE NOT f.retired GROUP BY 1, 2)," +
        " cc AS (SELECT parent_namespace AS ns, parent_name AS n, count(*) AS c FROM mc_ds_parent_child GROUP BY 1, 2)," +
        " pc AS (SELECT child_namespace AS ns, child_name AS n, count(*) AS c FROM mc_ds_parent_child GROUP BY 1, 2)" +
        " SELECT fa.*, COALESCE(cc.c, 0) AS child_count, COALESCE(pc.c, 0) AS parent_count" +
        " FROM fa LEFT JOIN cc ON fa.dataset_namespace = cc.ns AND fa.dataset_name = cc.n" +
        " LEFT JOIN pc ON fa.dataset_namespace = pc.ns AND fa.dataset_name = pc.n"),
    "mql_datasets_for_files" ->
      (s"WITH ${OracleCatalog.cte}, base AS (" +
        "SELECT fid FROM mc_files WHERE NOT retired AND k % 5 = 2 AND m_run < 100) " +
        "SELECT b.fid, fd.dataset_namespace, fd.dataset_name" +
        " FROM base b JOIN mc_files_datasets fd ON fd.fid = b.fid"),
    "mql_namespace_counts" -> o(
      "SELECT namespace, 'owner' || CAST(CAST(substr(namespace, 3) AS INT) % 2 AS VARCHAR) AS owner_user," +
        " count(*) AS file_count, CAST(sum(size) AS BIGINT) AS total_size," +
        " true AS exact FROM mc_files WHERE NOT retired GROUP BY 1"),
    // integrity audit replay: the same six invariant counts over the
    // derived catalog's oracle twin
    "mql_fsck" -> o(
      "SELECT 'dangling_membership' AS check_name, (SELECT count(*) FROM mc_files_datasets fd " +
        "WHERE fd.fid NOT IN (SELECT fid FROM mc_files))::BIGINT AS n_issues " +
      "UNION ALL SELECT 'dangling_parent_fid', (SELECT count(*) FROM mc_parent_child " +
        "WHERE parent_fid NOT IN (SELECT fid FROM mc_files))::BIGINT " +
      "UNION ALL SELECT 'dangling_child_fid', (SELECT count(*) FROM mc_parent_child " +
        "WHERE child_fid NOT IN (SELECT fid FROM mc_files))::BIGINT " +
      "UNION ALL SELECT 'missing_dataset', (SELECT count(*) FROM " +
        "(SELECT DISTINCT dataset_namespace, dataset_name FROM mc_files_datasets) fd " +
        "WHERE NOT EXISTS (SELECT 1 FROM mc_datasets d " +
        "WHERE d.namespace = fd.dataset_namespace AND d.name = fd.dataset_name))::BIGINT " +
      "UNION ALL SELECT 'dangling_ds_edge', (SELECT count(*) FROM " +
        "(SELECT parent_namespace AS ns, parent_name AS n FROM mc_ds_parent_child " +
        " UNION ALL SELECT child_namespace, child_name FROM mc_ds_parent_child) e " +
        "WHERE NOT EXISTS (SELECT 1 FROM mc_datasets d " +
        "WHERE d.namespace = e.ns AND d.name = e.n))::BIGINT " +
      "UNION ALL SELECT 'duplicate_fid', (SELECT count(*) FROM " +
        "(SELECT fid FROM mc_files GROUP BY fid HAVING count(*) > 1))::BIGINT " +
      "UNION ALL SELECT 'duplicate_membership', (SELECT count(*) FROM " +
        "(SELECT fid FROM mc_files_datasets " +
        "GROUP BY fid, dataset_namespace, dataset_name HAVING count(*) > 1))::BIGINT " +
      // the derived catalog's namespaces dimension is itself derived from
      // the files table, so this replay is structurally zero — the check
      // matters for writable catalogs with a stored namespaces table
      "UNION ALL SELECT 'missing_namespace', (SELECT count(*) FROM " +
        "(SELECT DISTINCT namespace FROM mc_files) f WHERE f.namespace NOT IN " +
        "(SELECT DISTINCT namespace FROM mc_files))::BIGINT " +
      // datasets on a hierarchy cycle = nodes that reach themselves
      "UNION ALL SELECT 'ds_cycle_member', (" +
        "WITH RECURSIVE reach(src, dst) AS (" +
        "SELECT parent_namespace || ' ' || parent_name, " +
        "child_namespace || ' ' || child_name FROM mc_ds_parent_child " +
        "UNION SELECT r.src, e.child_namespace || ' ' || e.child_name " +
        "FROM reach r JOIN mc_ds_parent_child e " +
        "ON r.dst = e.parent_namespace || ' ' || e.parent_name) " +
        "SELECT count(DISTINCT src) FROM reach WHERE src = dst)::BIGINT"),
    // (key, value-as-json) pairs: value rendering pinned to Spark's
    // variant to_json — object keys sorted, compact separators, decimals
    // kept verbatim (both engines print doubles shortest-roundtrip)
    "mql_summary_kv" ->
      (s"WITH ${OracleCatalog.cte}, base AS (" +
        "SELECT * FROM mc_files WHERE NOT retired AND k % 5 = 3 AND m_run < 50), " +
        "kv AS (" +
        "SELECT 'core.run' AS key, CAST(m_run AS VARCHAR) AS value FROM base" +
        " UNION ALL SELECT 'core.status', '\"' || m_status || '\"' FROM base" +
        " UNION ALL SELECT 'core.priority', '\"' || m_priority || '\"' FROM base" +
        " UNION ALL SELECT 'core.runs', '[' || array_to_string(m_runs, ',') || ']' FROM base" +
        " UNION ALL SELECT 'core.bits', '{\"electron\":' || CAST(m_bits_electron AS VARCHAR) ||" +
        " ',\"muon\":' || CAST(m_bits_muon AS VARCHAR) || '}' FROM base" +
        " UNION ALL SELECT 'core.ts', CAST(m_ts AS VARCHAR) FROM base" +
        " UNION ALL SELECT 'data.tags', '[\"' || array_to_string(m_tags, '\",\"') || '\"]' FROM base" +
        // Spark's variant number rendering drops trailing fraction zeros
        // ("142556.0" -> "142556"); mirror with rtrim on dotted values
        " UNION ALL SELECT 'data.price', CASE WHEN contains(CAST(m_price AS VARCHAR), '.')" +
        " THEN rtrim(rtrim(CAST(m_price AS VARCHAR), '0'), '.')" +
        " ELSE CAST(m_price AS VARCHAR) END FROM base" +
        " UNION ALL SELECT 'data.weight', CASE WHEN weight_is_int THEN CAST(m_weight_int AS VARCHAR)" +
        " ELSE '\"' || m_weight_str || '\"' END FROM base" +
        " UNION ALL SELECT 'opt.flag', CASE WHEN m_flag THEN 'true' ELSE 'false' END FROM base WHERE has_flag" +
        " UNION ALL SELECT 'opt.note', '\"' || m_note || '\"' FROM base WHERE has_note)" +
        " SELECT DISTINCT key, value FROM kv"),
    "mql_summary_keys" ->
      (s"WITH ${OracleCatalog.cte} SELECT key FROM (" +
        "SELECT unnest(['core.bits','core.priority','core.run','core.runs','core.status'," +
        "'core.ts','data.price','data.tags','data.weight']) AS key" +
        " UNION ALL SELECT 'opt.flag' AS key WHERE EXISTS" +
        " (SELECT 1 FROM mc_files WHERE NOT retired AND k % 5 = 2 AND has_flag)" +
        " UNION ALL SELECT 'opt.note' AS key WHERE EXISTS" +
        " (SELECT 1 FROM mc_files WHERE NOT retired AND k % 5 = 2 AND has_note)" +
        ") ORDER BY key"))

  /** Pure replay of the reference mix score algorithm
    * (filters.py:161-191) over already-materialized fid streams — the
    * oracle-side twin of [[graft.mql.Filters]]' mix, sharing NONE of its
    * machinery (no Spark iterators, no TreeSet prune, no chunked spill,
    * no re-attachment join). */
  private def mixReplay(ratios: Array[Double],
      streams: Array[Iterator[String]]): Seq[String] = {
    val sent = scala.collection.mutable.HashSet[String]()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var scores = ratios.indices.map(i => (0.0, i)).toList
    var done = false
    while (!done) {
      scores = scores.map { case (s, i) => (s + ratios(i), i) }
      scores = scores.sortBy { case (s, i) => (-s, -i) }
      val (s0, i0) = scores.head
      scores = scores.map { case (s, i) => (s - s0, i) }
      var sentOne = false
      while (!sentOne && !done) {
        if (!streams(i0).hasNext) done = true
        else {
          val f = streams(i0).next()
          if (!sent(f)) {
            sent += f; out += f
            scores = (scores.head._1 - 1.0, i0) :: scores.tail
            sentOne = true
          }
        }
      }
    }
    out.toSeq
  }

  /** Data-dependent oracles, generated at Verify time for the sf dir the
    * driver compares against (static SQL cannot express the mix
    * dedup-skip interplay between OVERLAPPING sorted streams). The fid
    * universe is derived straight from orders.parquet — bypassing
    * [[DerivedCatalog]] — and the expected set is emitted as a literal
    * IN-list for DuckDB to re-attach attributes to. The collect is
    * oracle-generation by definition (driver-side expected-value
    * computation at verify SF, never a production path). */
  def dynamicOracles(s: SparkSession, dir: String): Map[String, String] = {
    val keys = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    def fid(k: Long): String = "F" + ("%08d".format(k))
    // fid order == orderkey order (8-digit zero pad); retired = k%97==0
    val ds1 = keys.filter(k => k % 5 == 1 && k % 97 != 0).map(fid)
    val all = keys.filter(_ % 97 != 0).map(fid)
    val expect = mixReplay(Array(1.0, 1.0),
      Array(ds1.iterator, all.iterator))
    val inList = expect.map("'" + _ + "'").mkString(", ")
    Map("mql_filter_mix_overlap" -> o(
      s"SELECT $FileCols FROM mc_files WHERE fid IN ($inList)"))
  }
}

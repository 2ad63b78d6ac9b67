package graft.metacat

/** DuckDB-SQL twin of [[DerivedCatalog]].
  *
  * The driver registers the raw parquet tables (`orders`, ...) and runs each
  * oracle statement in DuckDB; this object supplies a WITH-clause prefix that
  * re-derives the metacat catalog value-identically to the Spark side, so
  * MQL query oracles can be written against `mc_files`, `mc_files_datasets`,
  * `mc_datasets`, `mc_parent_child`, `mc_ds_parent_child`.
  *
  * Metadata keys appear here as typed columns (`m_run`, `m_status`, ...);
  * conditional keys carry a companion `has_*` flag; the variable-length
  * arrays are DuckDB lists built with the same slicing rule as the JSON
  * built on the Spark side. Any change here MUST be mirrored in
  * [[DerivedCatalog]] and vice versa.
  */
object OracleCatalog {

  /** WITH-clause body (no trailing comma). Prepend as:
    * s"WITH $cte SELECT ..." or s"WITH $cte, extra AS (...) SELECT ...".
    */
  val cte: String =
    """mc_files AS (
      |  SELECT
      |    'F' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS fid,
      |    'ns' || CAST(o_custkey % 4 AS VARCHAR) AS namespace,
      |    'f_' || CAST(o_orderkey AS VARCHAR) || '.dat' AS name,
      |    'user' || CAST(o_custkey % 10 AS VARCHAR) AS creator,
      |    o_orderdate AS created_timestamp,
      |    o_orderkey * 100 + o_custkey % 100 AS size,
      |    (o_orderkey % 97 = 0) AS retired,
      |    o_orderkey AS k,
      |    o_custkey AS ck,
      |    o_orderkey % 1000 AS m_run,
      |    o_orderstatus AS m_status,
      |    o_orderpriority AS m_priority,
      |    [o_orderkey % 1000, o_orderkey % 1000 + 1000, o_orderkey % 1000 + 2000]
      |      [1:(1 + CAST(o_orderkey % 3 AS INT))] AS m_runs,
      |    o_orderkey % 2 AS m_bits_muon,
      |    (o_orderkey + 1) % 2 AS m_bits_electron,
      |    CAST(epoch(o_orderdate) AS BIGINT) AS m_ts,
      |    ['tag' || CAST(o_orderkey % 7 AS VARCHAR),
      |     'tag' || CAST((o_orderkey + 1) % 7 AS VARCHAR),
      |     'tag' || CAST((o_orderkey + 2) % 7 AS VARCHAR),
      |     'tag' || CAST((o_orderkey + 3) % 7 AS VARCHAR)]
      |      [1:(1 + CAST(o_orderkey % 4 AS INT))] AS m_tags,
      |    o_totalprice AS m_price,
      |    (o_orderkey % 2 = 0) AS weight_is_int,
      |    o_orderkey % 100 AS m_weight_int,
      |    'w' || CAST(o_orderkey % 100 AS VARCHAR) AS m_weight_str,
      |    (o_orderkey % 5 = 0) AS has_flag,
      |    (o_orderkey % 10 = 0) AS m_flag,
      |    (o_orderkey % 7 = 0) AS has_note,
      |    'note-' || o_orderstatus || '-' || CAST(o_orderkey % 13 AS VARCHAR) AS m_note
      |  FROM orders
      |),
      |mc_files_datasets AS (
      |  SELECT 'F' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS fid,
      |         'dsns' AS dataset_namespace,
      |         'ds' || CAST(o_orderkey % 5 AS VARCHAR) AS dataset_name
      |  FROM orders
      |  UNION ALL
      |  SELECT 'F' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS fid,
      |         'dsns', 'all'
      |  FROM orders
      |),
      |mc_datasets AS (
      |  SELECT 'dsns' AS namespace, t.name, t.frozen, t.monotonic,
      |         'admin' AS creator,
      |         TIMESTAMP '2026-01-01 00:00:00' AS created_timestamp,
      |         'dataset ' || t.name AS description,
      |         t.ds_kind, t.ds_index
      |  FROM (VALUES
      |    ('top', false, false, 'root', -1),
      |    ('all', false, true,  'all',   0),
      |    ('ds0', true,  false, 'shard', 0),
      |    ('ds1', false, false, 'shard', 1),
      |    ('ds2', true,  false, 'shard', 2),
      |    ('ds3', false, false, 'shard', 3),
      |    ('ds4', true,  false, 'shard', 4)
      |  ) AS t(name, frozen, monotonic, ds_kind, ds_index)
      |),
      |mc_parent_child AS (
      |  SELECT 'F' || lpad(CAST((o_orderkey - 1) // 2 AS VARCHAR), 8, '0') AS parent_fid,
      |         'F' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS child_fid
      |  FROM orders WHERE o_orderkey >= 1
      |),
      |mc_ds_parent_child AS (
      |  SELECT 'dsns' AS parent_namespace, t.pn AS parent_name,
      |         'dsns' AS child_namespace, t.cn AS child_name
      |  FROM (VALUES ('top','all'), ('all','ds0'), ('all','ds1'),
      |               ('all','ds2'), ('all','ds3'), ('all','ds4')) AS t(pn, cn)
      |)""".stripMargin

  /** Convenience: full statement given a SELECT body. */
  def sql(select: String): String = s"WITH $cte\n$select"
}

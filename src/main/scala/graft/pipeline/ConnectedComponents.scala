package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate PAIR set — the clustering
  * step that turns pairwise LSH evidence into dedup groups (chains
  * a~b~c collapse into one cluster even when (a,c) was never a
  * candidate pair).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * MapReduce-native CC that converges in O(log n) rounds on any graph,
  * vs O(diameter) for naive hash-min label propagation. Each round is
  * two groupBy-min passes over the EDGE set (which for near-dup graphs
  * is orders of magnitude smaller than the corpus); no step ever
  * materializes a neighborhood larger than a node's degree.
  *
  * Determinism: the fixpoint is unique (stars centered at each
  * component's minimum id) regardless of execution order, so any engine
  * — including the DuckDB oracle's recursive-CTE closure — derives the
  * same cluster ids. Lineage is truncated per round with
  * localCheckpoint (same posture as the dataset-closure recursion);
  * convergence is detected by an order-independent edge-set signature
  * (count + two decimal hash sums — no overflow, no full comparison
  * join), with `maxIters` as the backstop.
  */
object ConnectedComponents {

  /** large-star: for every node u (over the symmetrized edge set), link
    * each STRICTLY LARGER neighbor to m = min(Γ(u) ∪ {u}). Keeps every
    * component connected while halving long chains. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("mn"), col("src")).as("m"))
    sym.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: orient every edge (larger → smaller); for every node u,
    * link its smaller-or-equal neighborhood (and u itself) to
    * m = min(Γ⁻(u) ∪ {u}). */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val mins = dir.groupBy("src").agg(min("dst").as("m"))
    dir.join(mins, "src")
      .select(col("dst").as("v"), col("m"))
      .union(mins.select(col("src").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** order-independent edge-set fingerprint: row count plus two
    * independent 64-bit hash sums accumulated in decimal(38,0) so the
    * sum can't overflow (Spark 4 runs ANSI mode — a wrapped long sum
    * would throw, not wrap) */
  private def signature(e: DataFrame): (Long, String, String) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
      sum(xxhash64(col("dst"), col("src")).cast("decimal(38,0)"))).head()
    (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)))
  }

  /** cluster id (= minimum doc_id of the connected component) for every
    * document that appears in a (non-self) pair. Documents in no pair
    * are their own singleton cluster by definition and are not emitted.
    *
    * The caller's `pairs` plan is evaluated exactly ONCE (the initial
    * edge checkpoint) — everything downstream, including the final node
    * list, reads the checkpointed edges, so an expensive upstream (an
    * LSH pair join) is never recomputed per CC round. Checkpoints are
    * lazy; the signature action right after each one materializes it,
    * giving one Spark job per round instead of two. */
  def clusters(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 25): DataFrame = {
    // ids must already be integral: a silent cast("long") on string ids
    // would null them out and drop every edge — fail loudly instead
    // (string-keyed corpora map ids first, e.g. via a dictionary join)
    for (c <- Seq(aCol, bCol)) {
      val t = pairs.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.ShortType,
        s"clusters: $c must be an integral id column, got $t")
    }
    val edges0 = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    var edges = edges0
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var it = 0
    while (!converged && it < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nsig = signature(next)
      converged = nsig == sig
      edges = next; sig = nsig; it += 1
    }
    // fixpoint = star forest: every edge is (member, component-min)
    val roots = edges.select(greatest(col("src"), col("dst")).as("id"),
      least(col("src"), col("dst")).as("cluster_id")).distinct()
    val nodes = edges0.select(col("src").as("id"))
      .union(edges0.select(col("dst").as("id"))).distinct()
    nodes.join(roots, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }
}

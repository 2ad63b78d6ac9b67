package graft.pipeline

import graft.mql.SparkTestBase
import scala.util.Random

/** Differential fuzz of the large-star/small-star contraction: random
  * graphs (sparse chains, dense blobs, stars, isolated pairs) checked
  * against a trivial driver-side union-find. Hunts convergence bugs —
  * a premature fixpoint detection or a star that stops short of the
  * component minimum would survive the example-based tests. */
class ConnectedComponentsFuzzSpec extends SparkTestBase {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root = component minimum because unions always point larger -> smaller
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graphs: cluster ids equal union-find component minima") {
    import spark.implicits._
    val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(7L))
    for (round <- 0 until 5) {
      val n = 20 + rnd.nextInt(60)           // node id space
      val m = 1 + rnd.nextInt(3 * n)         // edge count — sparse to dense
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val want = unionFind(edges)
        val got = ConnectedComponents
          .clusters(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want,
          s"round $round (n=$n m=$m): diff=${(got.toSet -- want.toSet).take(3)} " +
            s"missing=${(want.toSet -- got.toSet).take(3)}")
      }
    }
    // worst-case shapes for star contraction: one long path and one
    // complete-ish blob, explicitly
    val path = (0L until 40L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(ConnectedComponents.clusters(path.toDF("doc_a", "doc_b"))
      .collect().forall(_.getLong(1) == 0L))
    val blob = for (a <- 0L until 12L; b <- (a + 1) until 12L if (a + b) % 3 != 0)
      yield (a, b)
    val wantBlob = unionFind(blob)
    val gotBlob = ConnectedComponents.clusters(blob.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBlob == wantBlob)
  }

  test("string id columns are rejected, not silently cast to null") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    assertThrows[IllegalArgumentException](ConnectedComponents.clusters(pairs))
  }
}

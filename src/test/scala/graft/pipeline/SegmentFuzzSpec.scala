package graft.pipeline

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential fuzz of the segment-level cleaning operators against
  * trivial in-memory models, on random small-vocab corpora (the regime
  * where collisions actually happen). Complements the fixed-structure
  * unit tests: the operators' subtle parts are ordering (global
  * first-occurrence by (doc_id, seg_idx)) and distinct-doc counting,
  * which random corpora exercise far better than planted ones. */
class SegmentFuzzSpec extends SparkTestBase {

  private val vocab = Vector("a", "b", "c", "d", "e")

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String)] =
    (0L until nDocs).map { id =>
      val len = 1 + rnd.nextInt(12)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }

  private def segmentsOf(text: String, k: Int): Seq[String] =
    text.split(" ", -1).grouped(k).map(_.mkString(" ")).toSeq

  test("dedupSegments matches the first-occurrence model on random corpora") {
    import spark.implicits._
    val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong + 21).getOrElse(63L))
    for (round <- 0 until 4) {
      val corpus = randomCorpus(rnd, 30 + rnd.nextInt(40))
      val k = 1 + rnd.nextInt(3)
      // model: first global occurrence of each segment content survives
      val seen = scala.collection.mutable.Set.empty[String]
      val model = corpus.map { case (id, text) =>
        val segs = segmentsOf(text, k)
        val kept = segs.filter(s => seen.add(s))
        id -> ((segs.size.toLong, (segs.size - kept.size).toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.dedupSegments(corpus.toDF("doc_id", "text"), segTokens = k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == model, s"round $round (k=$k) diverged: " +
        s"${(got.toSet -- model.toSet).take(3)} vs ${(model.toSet -- got.toSet).take(3)}")
      // fingerprint-keyed shuffles are an internal layout choice — output
      // identity with the text-keyed path is the contract
      val gotFp = Dedup.dedupSegments(corpus.toDF("doc_id", "text"),
        segTokens = k, keyByFingerprint = true)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(gotFp == model, s"round $round (k=$k) fp-keyed path diverged")
    }
  }

  test("stripBoilerplate matches the distinct-doc-frequency model") {
    import spark.implicits._
    val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong + 22).getOrElse(64L))
    for (round <- 0 until 4) {
      val corpus = randomCorpus(rnd, 30 + rnd.nextInt(40))
      val k = 1 + rnd.nextInt(3)
      val maxDf = 2 + rnd.nextInt(4)
      val df = corpus.flatMap { case (id, text) =>
        segmentsOf(text, k).distinct.map(_ -> id)
      }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
      val boiler = df.collect { case (s, d) if d >= maxDf => s }.toSet
      val model = corpus.map { case (id, text) =>
        val segs = segmentsOf(text, k)
        val kept = segs.filterNot(boiler)
        id -> ((segs.size.toLong, (segs.size - kept.size).toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.stripBoilerplate(corpus.toDF("doc_id", "text"),
        segTokens = k, maxDocFreq = maxDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == model, s"round $round (k=$k, maxDf=$maxDf) diverged")
      val gotFp = Dedup.stripBoilerplate(corpus.toDF("doc_id", "text"),
        segTokens = k, maxDocFreq = maxDf, keyByFingerprint = true)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(gotFp == model, s"round $round (k=$k, maxDf=$maxDf) fp-keyed path diverged")
    }
  }

  test("stratified containment never invents a pair (random corpora)") {
    import spark.implicits._
    val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong + 23).getOrElse(65L))
    for (_ <- 0 until 2) {
      // longer docs so 3-shingles exist; containment structure arises
      // naturally from the tiny vocabulary
      val corpus = (0L until 40L).map { id =>
        val len = 3 + rnd.nextInt(20)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val exact = Dedup.containmentPairs(df, 0.6)
      val strat = Dedup.containmentPairsStratified(df, 0.6)
      assert(strat.exceptAll(exact).isEmpty,
        "stratified invented a pair the exact path rejects")
    }
  }

  test("stratified-containment oracle stays in lockstep with the engine pairings") {
    val oracle = graft.queries.PipelineQueries.oracles("pipe_containment_stratified")
    val pairings = Dedup.stratumPairings(0.6, 64, 20)
    assert(pairings.nonEmpty)
    pairings.foreach { case (ga, gb, r, b) =>
      assert(oracle.contains(s"($ga, $gb, $r, $b)"),
        s"oracle missing pairing ($ga, $gb, $r, $b) — regenerate after changing stratumShape")
    }
    // and the oracle carries EXACTLY these pairings (no stale extras)
    val inOracle = "\\((\\d+), (\\d+), (\\d+), (\\d+)\\)".r
      .findAllMatchIn(oracle.substring(oracle.indexOf("VALUES")))
      .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, m.group(4).toInt))
      .toSeq
    assert(inOracle.toSet == pairings.toSet,
      s"oracle pairing table diverged: ${inOracle.toSet -- pairings.toSet}")
  }

  test("minhashParamsFor meets its recall identity within budget") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); target <- Seq(0.8, 0.9)) {
      val (k, b) = Dedup.minhashParamsFor(t, target, maxHashes = 64)
      val r = k / b
      assert(k <= 64 && k == r * b, s"budget broken at t=$t: ($k, $b)")
      val recall = 1.0 - math.pow(1.0 - math.pow(t, r), b.toDouble)
      assert(recall >= target - 1e-9, s"t=$t target=$target -> ($k,$b) recall $recall")
    }
    // higher threshold admits deeper (more selective) rows-per-band
    val r05 = { val (k, b) = Dedup.minhashParamsFor(0.5); k / b }
    val r09 = { val (k, b) = Dedup.minhashParamsFor(0.9); k / b }
    assert(r09 > r05)
    // end-to-end on the real corpus: sized banding keeps >= 0.9 recall of
    // the exact Jaccard pair set (banding differs per hash subset, so a
    // strict superset of the pinned banding is NOT guaranteed — recall
    // against exact is the honest contract)
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardPairs(docsDf, 0.5).select("doc_a", "doc_b")
    val (k, b) = Dedup.minhashParamsFor(0.5)
    val sized = Dedup.minhashPairs(docsDf, numHashes = k, bands = b)
      .select("doc_a", "doc_b")
    assert(sized.exceptAll(exact).isEmpty, "sized banding invented a pair")
    val nExact = exact.count()
    assert(nExact > 0 && sized.count().toDouble / nExact >= 0.9,
      s"sized recall ${sized.count()}/$nExact below 0.9")
  }

  test("new operators' plans: no corpus-wide Window, no cartesian product") {
    import spark.implicits._
    val df = randomCorpus(new Random(7), 40).toDF("doc_id", "text")
    for ((name, plan) <- Seq(
      "dedupSegments" -> Dedup.dedupSegments(df),
      "stripBoilerplate" -> Dedup.stripBoilerplate(df),
      "containmentPairsStratified" -> Dedup.containmentPairsStratified(df))) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$name plan has a Window:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$name plan has a product join:\n$p")
    }
  }
}

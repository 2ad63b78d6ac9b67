package graft.pipeline

import graft.mql.SparkTestBase
import scala.util.Random

/** Differential fuzz: the distributed BPE trainer against an independent
  * plain-Scala reference implementation (sequential, list-of-symbols —
  * no shared code, no shared representation) over random small corpora.
  * Any divergence in pair counting, argmax tie-breaking, greedy
  * left-to-right merging or early stop shows up as a mismatch. */
class BpeTrainerFuzzSpec extends SparkTestBase {

  /** reference: textbook BPE over (word -> count), symbols as Lists */
  private def referenceMerges(words: Map[String, Long], merges: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toList -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to merges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
      if (pairCounts.nonEmpty) {
        val ((l, r), pc) = pairCounts.toSeq
          .minBy { case ((l, r), pc) => (-pc, l, r) }
        out += ((l, r, pc))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          // greedy left-to-right merge of (l, r)
          val res = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              res += (l + r); i += 2
            } else { res += syms(i); i += 1 }
          }
          res.toList
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("distributed trainer matches the sequential reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 12) {
      // small alphabet so pair collisions and ties actually happen
      val alphabet = "abcd"
      val nDocs = 1 + rnd.nextInt(4)
      val docs = (1 to nDocs).map { i =>
        val words = (1 to (3 + rnd.nextInt(8))).map { _ =>
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }
        (i.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val wordCounts = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      val expect = referenceMerges(wordCounts, merges = 5)
      val got = BpeTrainer.trainMerges(df, merges = 5).orderBy("rk").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == expect,
        s"trial $trial diverged:\n got    $got\n expect $expect\n corpus $docs")
    }
  }
}

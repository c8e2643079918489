package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, TextAnalysis}

/** Training-data pipeline operators: dedup family, similarity search, text
  * analysis — verified on planted fixtures with driver-side oracles. */
class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic corpus: docs 0=1 exact dup; 2~3 near-dup (one token of 40
    * changed); 4~5 near-dup (two tokens changed); others pairwise distant. */
  lazy val docs = {
    def words(seed: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}_$i")
    val base = words(1, 40)
    val rows = Seq(
      (0L, base.mkString(" ")),
      (1L, base.mkString(" ")),
      (2L, words(2, 40).mkString(" ")),
      (3L, words(2, 40).updated(20, "CHANGED").mkString(" ")),
      (4L, words(3, 40).mkString(" ")),
      (5L, words(3, 40).updated(5, "xx").updated(30, "yy").mkString(" "))) ++
      (6L until 30L).map(i => (i, words(i.toInt * 13 + 5, 40).mkString(" ")))
    rows.toDF("doc_id", "text")
  }

  test("exact dedup: identical texts grouped, keeper = min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "group_size", "keep_id", "is_duplicate")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r(0) == ((0L, 2L, 0L, false)))
    assert(r(1) == ((1L, 2L, 0L, true)))
    assert(r.drop(2).forall(t => t._2 == 1L && !t._4))
  }

  /** Driver-side shingle jaccard for verification. */
  def jacc(a: String, b: String, w: Int): Double = {
    def sh(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .sliding(w).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("minhash LSH pairs find planted near-dups with exact jaccard") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(t => ((t._1, t._2), t._3)).toMap
    assert(got.contains((0L, 1L)) && math.abs(got((0L, 1L)) - 1.0) < 1e-12)
    assert(got.contains((2L, 3L)))
    // engine jaccard equals driver-computed set jaccard exactly
    got.foreach { case ((a, b), j) =>
      assert(math.abs(j - jacc(rows(a), rows(b), 3)) < 1e-12, s"pair ($a,$b)")
    }
    // distant docs must not appear even as verified pairs
    assert(!got.keySet.exists { case (a, b) => a >= 6 && b >= 6 })
  }

  test("simhash: exact dups have distance 0; pairs find near-dups") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(1L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("ngram jaccard inverted-index join matches driver oracle") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Dedup.jaccardPairs(docs, "doc_id", "text",
      shingleWidth = 3, threshold = 0.5, maxDf = 100)
      .as[(Long, Long, Double)].collect()
    val want = (for {
      a <- rows.keys; b <- rows.keys if a < b
      j = jacc(rows(a), rows(b), 3) if j >= 0.5
    } yield ((a, b), j)).toMap
    assert(got.map(t => (t._1, t._2)).toSet == want.keySet)
    got.foreach { case (a, b, j) =>
      assert(math.abs(j - want((a, b))) < 1e-12)
    }
  }

  /** Deterministic embeddings: 24 vectors of dim 8. */
  lazy val vecs: Seq[(Long, Seq[Float])] =
    (0L until 24L).map { i =>
      val v =
        if (i == 1) Seq.tabulate(8)(d => (((0 * 7 + d * 13) % 19) - 9) * 2.0f) // 2x vec 0
        else Seq.tabulate(8)(d => (((i * 7 + d * 13) % 19) - 9).toFloat)
      (i, v)
    }
  lazy val emb = vecs.toDF("vec_id", "embedding")

  def cosD(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("brute-force cosine top-k matches driver oracle") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Ann.bruteForceTopK(emb, queries, 5)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val lookup = vecs.toMap
    (0L until 3L).foreach { q =>
      val want = vecs.map { case (id, v) => (id, cosD(lookup(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(q) == want, s"query $q")
    }
  }

  test("cosine near-dup pairs find the planted colinear pair") {
    val got = Ann.cosineNearDupPairs(emb, 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L))) // identical direction -> cosine 1
  }

  test("LSH top-k: self is rank 1; results are valid corpus ids with true cosines") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Ann.lshTopK(emb, queries, 3, bits = 6, tables = 4)
      .select("query_id", "vec_id", "rank", "cosine")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    val lookup = vecs.toMap
    got.foreach { case (q, v, _, c) =>
      assert(math.abs(c - cosD(lookup(q), lookup(v))) < 1e-9)
    }
    // a vector always lands in its own buckets -> self (cosine 1) is rank 1
    (0L until 3L).foreach { q =>
      val self = got.filter(t => t._1 == q && (t._2 == q ||
        (q == 0 && t._2 == 1) || (q == 1 && t._2 == 0)))
      assert(self.exists(_._3 == 1), s"query $q")
    }
  }

  test("text analysis: deterministic, sane ranges, language id") {
    val sample = Seq(
      (0L, "The cat sat on the mat and it was happy for a while."),
      (1L, "Der Hund ist nicht mit der Katze und das ist gut."),
      (2L, "le chat est dans la maison et les oiseaux pour un jour."),
      (3L, ""),
      (4L, "x")).toDF("doc_id", "text")
    val r = TextAnalysis.analyze(sample, "doc_id", "text")
      .as[(Long, Long, Long, String, Double, Long)].collect().sortBy(_._1)
    assert(r(0)._4 == "en"); assert(r(1)._4 == "de"); assert(r(2)._4 == "fr")
    assert(r(3)._2 == 0L) // empty text -> 0 tokens
    r.foreach(t => assert(t._5 >= 0.0 && t._5 <= 1.0))
    // token counts
    assert(r(0)._2 == 13L)
    // fingerprints: deterministic and distinct for distinct texts
    val again = TextAnalysis.analyze(sample, "doc_id", "text")
      .as[(Long, Long, Long, String, Double, Long)].collect().sortBy(_._1)
    assert(r.map(_._6).toSeq == again.map(_._6).toSeq)
    assert(r.map(_._6).distinct.length == r.length)
  }

  test("tokenCount edge cases") {
    val df = Seq((0L, " a  b\tc "), (1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(r(0L) == 3L && r(1L) == 0L && r(2L) == 0L)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (a broadcast of the query
  * set against a single scan of the corpus — embarrassingly parallel, no
  * shuffle until the per-query top-k). The scale path is random-hyperplane
  * LSH: bucket the corpus once (narrow pass), then probe only matching
  * buckets — candidate set shrinks by ~2^bits per table.
  */
object Ann {

  /** Dot product of two double-array columns (codegen'd higher-order fns). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Per-query exact top-k of a scored (query_id, vec_id, cosine) relation
    * via the [[graft.functions.BoundedTopK]] aggregate: map-side partial
    * aggregation reduces every partition to <= k rows per query BEFORE the
    * shuffle, which then carries <= k·P rows per query — NOT the full
    * scored relation, and with NO global sort (a
    * `row_number().over(Window.partitionBy(query))` plan shuffles and sorts
    * all N·Q scored rows: a scale-killer at 10^9 corpus rows). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.BoundedTopK
        .boundedTopK(col("cosine"), col("vec_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"),
        col("t.score").as("cosine"), col("t.rank").as("rank"))

  /** Exact brute-force top-k by cosine: for each row of `queries`
    * (query_id, embedding), the k corpus rows (vec_id, embedding) with the
    * highest cosine similarity. Ties broken by vec_id ascending
    * (deterministic). `queries` is broadcast — corpus scans once; the
    * bounded top-k aggregate keeps the post-scan shuffle at k·P rows per
    * query. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", queryId: String = "query_id"): DataFrame = {
    val c = corpus.select(col(corpusId).as("vec_id"),
      asDouble(col("embedding")).as("c_emb"))
    val q = queries.select(col(queryId).as("query_id"),
      asDouble(col("embedding")).as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        cosine(col("c_emb"), col("q_emb")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a signed value in [-1, 1] from a closed-form multiplicative hash —
    * fixed seed, no RNG state, and (unlike xxhash64) reproducible in plain
    * SQL, so the LSH operators get end-to-end DuckDB oracles that replicate
    * the bucketing exactly (same move as Synth's closed-form generators).
    * Keep in sync with the oracle SQL in SparkEntry. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod((plane * lit(1009L) + dim * lit(9176L) + lit(917L)) * lit(2654435761L),
      lit(2001L)) - 1000L).cast("double") / 1000.0

  /** Bucket-count sizing: bits so that an N-row corpus lands ~`targetBucket`
    * rows per bucket (bits = ceil-log2 of ceil(N / targetBucket), clamped to
    * [4, 24]). A FIXED bits default is a scale hazard — 8 bits = 256
    * buckets/table means ~4M rows/bucket at 10^9 vectors and a
    * near-quadratic per-bucket join; bits must grow with log2(corpus).
    *
    * INTEGER arithmetic (bit length of q-1), not ceil(ln/ln): at exact
    * powers of two the float ratio can land at k±1ulp and ceil() to k+1 on
    * one side while the oracle's log2 yields k — flipping every LSH bucket
    * between engine and oracle. The SQL mirror uses length(bin(q-1))
    * (sqlLshSigs); keep the two in sync. */
  def bitsFor(corpusSize: Long, targetBucket: Long = 64): Int = {
    val q = (math.max(corpusSize, 1) + targetBucket - 1) / targetBucket
    val b = if (q <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(q - 1)
    math.min(24, math.max(4, b))
  }

  /** LSH-bucketed approximate top-k: corpus and queries hashed with `tables`
    * independent signature functions of `bits` bits; candidates = corpus
    * rows sharing any (table, signature) bucket with the query; exact cosine
    * + top-k over candidates only. Recall grows with `tables`, candidate
    * cost shrinks with `bits`. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 12, tables: Int = 4,
      corpusId: String = "vec_id", queryId: String = "query_id"): DataFrame = {
    def bucketed(df: DataFrame, idAlias: String, embAlias: String): DataFrame = {
      val emb = asDouble(col("embedding"))
      df.select(col(idAlias), emb.as(embAlias),
          posexplode(array((0 until tables).map(t =>
            hyperplaneSigOffset(emb, bits, t * bits)): _*)))
        .withColumnRenamed("pos", "table")
        .withColumnRenamed("col", "sig")
    }
    val c = bucketed(corpus.withColumnRenamed(corpusId, "vec_id"), "vec_id", "c_emb")
    val q = bucketed(queries.withColumnRenamed(queryId, "query_id"), "query_id", "q_emb")
    val cands = c.join(q, Seq("table", "sig"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("c_emb"), col("q_emb")).as("cosine"))
      .groupBy("query_id", "vec_id").agg(first("cosine").as("cosine"))
    topKPerQuery(cands, k)
  }

  /** Signature with plane indices offset by `off` (independent tables). */
  private def hyperplaneSigOffset(emb: Column, bits: Int, off: Int): Column = {
    val dims = size(emb)
    (0 until bits).map { p =>
      val d = aggregate(
        zip_with(emb,
          transform(sequence(lit(0), dims - 1),
            i => planeComponent(lit(p + off), i)),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): all pairs
    * with cosine >= threshold, found via shared LSH buckets (scale path),
    * verified exactly. */
  def cosineNearDupPairs(
      corpus: DataFrame, threshold: Double,
      bits: Int = 8, tables: Int = 6,
      idCol: String = "vec_id"): DataFrame = {
    val emb = asDouble(col("embedding"))
    val sigs = corpus.select(col(idCol).as("vec_id"), emb.as("e"),
        posexplode(array((0 until tables).map(t =>
          hyperplaneSigOffset(emb, bits, t * bits)): _*)))
      .select(col("vec_id"), col("e"), col("pos").as("table"), col("col").as("sig"))
      .persist() // self-joined below: avoid recomputing hyperplane sigs per side
    val pairs = sigs.as("l").join(sigs.as("r"),
        col("l.table") === col("r.table") && col("l.sig") === col("r.sig") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        cosine(col("l.e"), col("r.e")).as("cosine"))
      .groupBy("a", "b").agg(first("cosine").as("cosine"))
      .filter(col("cosine") >= threshold)
    // result comes back persisted + computed; internal sig cache released
    // (same caller-owns-the-result contract as Dedup's pair operators)
    Dedup.materializeAndRelease(pairs, Seq(sigs))
  }
}

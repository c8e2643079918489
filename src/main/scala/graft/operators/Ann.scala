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

  /** Signature relation: (id, table, sig) ONLY — the embedding is consumed
    * inside the projection and never leaves the scan. The LSH bucket joins
    * must carry no array payload: a (query, vector) pair sharing b of the
    * `tables` buckets would otherwise ship both embedding arrays b times
    * through the shuffle (VERDICT r04 #3 — up to `tables`x join payload at
    * web scale). */
  private def sigOnly(df: DataFrame, idAlias: String,
      bits: Int, tables: Int): DataFrame = {
    val emb = asDouble(col("embedding"))
    df.select(col(idAlias),
        posexplode(array((0 until tables).map(t =>
          hyperplaneSigOffset(emb, bits, t * bits)): _*)))
      .select(col(idAlias), col("pos").as("table"), col("col").as("sig"))
  }

  /** LSH-bucketed approximate top-k: corpus and queries hashed with `tables`
    * independent signature functions of `bits` bits; candidates = corpus
    * rows sharing any (table, signature) bucket with the query; exact cosine
    * + top-k over candidates only. Recall grows with `tables`, candidate
    * cost shrinks with `bits`.
    *
    * Physical shape (r04 #3 rework): the bucket join moves (id, table, sig)
    * rows only; candidate id-pairs are DEDUPLICATED first (`distinct`), and
    * embeddings join in once per surviving pair — each pair's arrays cross
    * the wire once and its cosine is computed once, regardless of how many
    * buckets the pair shares. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 12, tables: Int = 4,
      corpusId: String = "vec_id", queryId: String = "query_id"): DataFrame = {
    val c = sigOnly(corpus.withColumnRenamed(corpusId, "vec_id"), "vec_id",
      bits, tables)
    val q = sigOnly(queries.withColumnRenamed(queryId, "query_id"), "query_id",
      bits, tables)
    val pairs = c.join(q, Seq("table", "sig"))
      .select(col("query_id"), col("vec_id")).distinct()
    val cEmb = corpus.select(col(corpusId).as("vec_id"),
      asDouble(col("embedding")).as("c_emb"))
    val qEmb = queries.select(col(queryId).as("query_id"),
      asDouble(col("embedding")).as("q_emb"))
    val cands = pairs
      .join(cEmb.hint("shuffle_hash"), "vec_id")
      .join(broadcast(qEmb), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine(col("c_emb"), col("q_emb")).as("cosine"))
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
    // id+sig only (no embedding in the self-join — r04 #3, see sigOnly);
    // persisted: a self-join evaluates its input subtree on both sides, and
    // the hyperplane projections are the expensive part of this pass
    val sigs = sigOnly(corpus.withColumnRenamed(idCol, "vec_id"), "vec_id",
      bits, tables).persist()
    val pairIds = sigs.as("l").join(sigs.as("r"),
        col("l.table") === col("r.table") && col("l.sig") === col("r.sig") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
      .distinct() // dedup id-pairs BEFORE any embedding moves
    val embs = corpus.select(col(idCol).as("id"), asDouble(col("embedding")).as("e"))
    val pairs = pairIds
      .join(embs.select(col("id").as("a"), col("e").as("ea")).hint("shuffle_hash"), "a")
      .join(embs.select(col("id").as("b"), col("e").as("eb")).hint("shuffle_hash"), "b")
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
    // result comes back persisted + computed; internal sig cache released
    // (same caller-owns-the-result contract as Dedup's pair operators)
    Dedup.materializeAndRelease(pairs, Seq(sigs))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Similarity search over the embeddings table (64-dim float vectors).
  *
  * Numeric determinism: every vector is quantized to BIGINT
  * (round(x * 10000)), dot products and norms are exact integer sums
  * (order-independent, identical in Spark and DuckDB), and cosine is a
  * fixed sequence of IEEE double ops over those exact integers — so
  * similarity values hash-match across engines, which float accumulation
  * never would (fold order differs).
  *
  * Scale design: brute-force is the correctness baseline (one broadcast
  * of the query vector, a single map-side pass, top-k via
  * TakeOrderedAndProject — no shuffle of the fact side). The LSH variant
  * buckets vectors by random-hyperplane sign signatures; probes touch
  * only Hamming<=1 buckets, so cost scales with bucket occupancy.
  */
object Similarity {

  /** Quantized integer view of an embedding. */
  def quant(c: Column): Column =
    transform(c, x => round(x.cast(DoubleType) * 10000).cast(LongType))

  /** Exact integer dot product of two quantized vectors. */
  def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  def inorm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** cosine = dot / (sqrt(na) * sqrt(nb)) — written in exactly this shape
    * in the oracle too. */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) / (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType)))

  /** N1 — brute-force cosine top-k against the query vector. */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(quant(col("embedding")).as("qv"))
    embeddings
      .select(col("vec_id"), quant(col("embedding")).as("v"))
      .join(broadcast(q)) // 1-row broadcast: map-side only
      .select(col("vec_id"),
        cosine(idot(col("v"), col("qv")), inorm2(col("v")), inorm2(col("qv"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane: sign(plane j, dim d) with
    * d 1-based, computed DRIVER-side into a literal array so per-row work
    * is one zip_with multiply-sum per plane (the previous element_at
    * formulation re-evaluated the whole quantization per element —
    * quadratic per row). */
  private def planeRow(j: Int, dim: Int): Seq[Long] =
    (1 to dim).map { d =>
      val h = java.lang.Math.floorMod((j * 131L + d + 7L) * 2654435761L, 2147483648L)
      if (h % 2 == 0) 1L else -1L
    }

  /** Hyperplane-sign signature of a quantized vector: bit j is set when
    * the projection onto pseudo-random plane j is non-negative. The
    * vector is let-bound (one-element transform) so it is quantized once
    * per row, not once per plane. */
  def signatureCol(v: Column, nBits: Int, dim: Int = 64): Column =
    Dedup.bind(v) { vv =>
      (0 until nBits).map { j =>
        val proj = aggregate(
          zip_with(vv, typedlit(planeRow(j, dim)), (x, p) => x * p),
          lit(0L), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** N2 — LSH-bucketed ANN: candidates share a signature within Hamming
    * <= 1 of the query's (nBits+1 probe buckets), then exact cosine
    * rerank. */
  def lshTopK(embeddings: DataFrame, queryVecId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(quant(col("embedding")).as("qv"))
      .withColumn("qsig", signatureCol(col("qv"), nBits))
    val probes = q.select(col("qv"),
      explode(array(col("qsig") +:
        (0 until nBits).map(j => col("qsig").bitwiseXOR(lit(1L << j))): _*)).as("psig"))
    // The signature index is the materialized artifact at scale — persist
    // so the quantize+project pipeline runs once, not per consumer.
    val sigs = embeddings.select(col("vec_id"), quant(col("embedding")).as("v"))
      .withColumn("sig", signatureCol(col("v"), nBits))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.join(broadcast(probes), col("sig") === col("psig"))
      .select(col("vec_id"),
        cosine(idot(col("v"), col("qv")), inorm2(col("v")), inorm2(col("qv"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}

/** Registered similarity queries (N-family). */
object SimilarityQueries extends graft.QueryModule {
  import Similarity._

  def defs: Seq[graft.QueryDef] = Seq(

    // N1 — brute-force cosine top-20, exact-integer arithmetic,
    // oracle-checked value for value.
    graft.QueryDef("n1_ann_bruteforce", Some(
      """WITH qe AS (
        |  SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS q,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings WHERE vec_id = 0),
        |ve AS (
        |  SELECT vec_id, CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT ve.vec_id, SUM(ve.x * qe.q) AS dot, SUM(ve.x * ve.x) AS nv
        |  FROM ve JOIN qe ON ve.i = qe.i GROUP BY ve.vec_id),
        |nq AS (SELECT SUM(q * q) AS n2 FROM qe)
        |SELECT vec_id,
        |  CAST(dot AS DOUBLE) / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST((SELECT n2 FROM nq) AS DOUBLE))) AS cos
        |FROM dots
        |ORDER BY cos DESC, vec_id ASC
        |LIMIT 20""".stripMargin))((s, d) =>
      bruteForceTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 20)),

    // N2 — LSH-bucketed ANN (engine-side hashing: rows-only; SimSpec
    // checks recall against N1 at sf0.001).
    graft.QueryDef("n2_ann_lsh", None)((s, d) =>
      lshTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10))
  )
}

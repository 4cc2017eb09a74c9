package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator (SCALE.md "sf1 rehearsal"): replicate
  * the driver-generated sf0.1 `documents`/`embeddings` tables N× with
  * DISJOINT ids and DISJOINT per-replica content, approximating organic
  * 10× growth for the headline dedup/ANN pipelines.
  *
  * Naive replication would be the WRONG fixture: exact clones give every
  * doc R-choose-2 cross-replica near-dup pairs, so the pair joins grow
  * quadratically in R for data reasons, not engine reasons, and the
  * linearity measurement is poisoned. Instead:
  *
  *  - documents: replica k > 0 suffixes every word with `_k` — token
  *    vocabularies are disjoint across replicas, so shingle/fingerprint
  *    blocking finds NO cross-replica candidates and the per-replica
  *    workload equals sf0.1's (pair output scales exactly linearly,
  *    like ingesting ten unrelated crawls). Doc lengths, word counts,
  *    and per-doc duplicate structure are preserved.
  *  - embeddings: replica k rotates the vector by k positions — norms
  *    and coordinate distributions preserved, cross-replica cosines
  *    ~random, so ANN candidate sets stay replica-local.
  *  - events: replica k shifts user_id/event_id by k·stride with
  *    timestamps unchanged — more users over the same window, the
  *    organic growth shape for a stream (per-user sequences preserved,
  *    cohort week range fixed).
  *  - replica 0 is bit-identical to the source (sf1 ⊇ sf0.1).
  *  - orders is copied unscaled — it only feeds the bench warm-up.
  *
  * ToolsSpec pins the invariants (id disjointness, replica-0 identity,
  * vocabulary disjointness, rotation-preserves-multiset).
  *
  * Usage: runMain graft.tools.MakeScale [inDir] [outDir] [replicas]
  */
object MakeScale {

  /** Id offset between replicas; must exceed any source id (driver data
    * tops out well below 10M; planted probe ids derive from
    * max(vec_id)+1 at query time, so they stay clear of any stride). */
  val ReplicaStride = 10000000L

  private def withReplicas(df: DataFrame, replicas: Int): DataFrame =
    df.select(col("*"), explode(sequence(lit(0), lit(replicas - 1))).as("k"))

  /** documents ×R: disjoint ids, per-replica disjoint token vocabulary
    * (`w` -> `w_k` for k > 0), n_chars recomputed over the new text. */
  def scaleDocs(df: DataFrame, replicas: Int): DataFrame =
    withReplicas(df, replicas)
      .select(
        (col("doc_id") + col("k") * ReplicaStride).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              w => concat(w, lit("_"), col("k"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** embeddings ×R: disjoint ids, replica k rotates the vector left by
    * k MOD dim positions — same norm and coordinate multiset,
    * cross-replica cosines ~random. Rotation is modular (round-18 fix:
    * a raw k-position rotate throws on negative slice lengths once
    * replicas exceed the embedding dimension — sf10 = 100 replicas vs
    * dim 64), and each wrap GENERATION g = k div dim applies the
    * Walsh sign pattern sign(p) = (−1)^popcount(p AND g) to the
    * coordinates (round-19 fix: the round-18 whole-vector parity flip
    * only disambiguated ADJACENT generations — replicas k and k+2·dim
    * carried bit-identical embeddings, silently re-poisoning the ANN
    * linearity fixture past 2·dim replicas). Walsh patterns are
    * pairwise DISTINCT for g < dim (g1 ≠ g2 < dim ⇒ g1 XOR g2 has a
    * set bit below dim, so some coordinate flips in one and not the
    * other) and differ in half the coordinates, so same-rotation
    * cross-generation cosines are signed sums near 0 — not the exact
    * ±1 twins of clones/flips. Norm and |coordinate| multiset are
    * preserved; replicas 0..dim-1 (generation 0: all-positive signs)
    * are bit-identical to the previous fixtures. Beyond dim
    * generations (replicas > dim², far past any rehearsal) patterns
    * WOULD repeat — so that case fails loudly via raise_error instead
    * of silently returning exact twins. */
  def scaleEmbeddings(df: DataFrame, replicas: Int): DataFrame = {
    val dim = size(col("embedding"))
    val rot = pmod(col("k"), dim)
    val rotated = concat(
      slice(col("embedding"), rot + 1, dim - rot),
      slice(col("embedding"), lit(1), rot))
    val gen = floor(col("k") / dim).cast("int")
    val signed = transform(rotated, (x, p) =>
      when(bit_count(p.bitwiseAND(gen)) % 2 === 1, -x).otherwise(x))
    withReplicas(df, replicas)
      .select(
        (col("vec_id") + col("k") * ReplicaStride).as("vec_id"),
        when(gen >= dim, raise_error(concat(
          lit("scaleEmbeddings: replica "), col("k").cast("string"),
          lit(" exceeds dim^2 at dim "), dim.cast("string"),
          lit(" - Walsh sign generations would repeat and recreate exact twins"))))
          .otherwise(signed).as("embedding"),
        col("label"))
  }

  /** events ×R: disjoint user_ids and event_ids, timestamps unchanged —
    * organic growth for an event stream is MORE USERS over the same
    * wall-clock window (ten unrelated products sharing one quarter),
    * not a longer history. Sessionization state therefore grows with
    * active users (the bounded-state claim under test) while the cohort
    * week range — and so e5's O(weeks²) output — stays fixed; per-user
    * event sequences are preserved bit-identically, and replica 0 is
    * the source. */
  def scaleEvents(df: DataFrame, replicas: Int): DataFrame =
    withReplicas(df, replicas)
      .select(
        (col("event_id") + col("k") * ReplicaStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * ReplicaStride).as("user_id"),
        col("event_type"), col("value"), col("props"))

  def main(args: Array[String]): Unit = {
    val in = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    scaleDocs(spark.read.parquet(s"$in/documents.parquet"), replicas)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    scaleEmbeddings(spark.read.parquet(s"$in/embeddings.parquet"), replicas)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    scaleEvents(spark.read.parquet(s"$in/events.parquet"), replicas)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    spark.read.parquet(s"$in/orders.parquet")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    println(s"[makescale] wrote ${replicas}x $in -> $out")
    spark.stop()
  }
}

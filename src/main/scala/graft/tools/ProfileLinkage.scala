package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-stage split for the SCALE.md `d23_record_linkage` /
  * `d24_containment` rehearsal rows. Two facts are on record here:
  *
  * 1. The candidate volume at the sf1 rehearsal scale grows 18.3× on
  *    10× data (6,004 → 109,792 blocked pairs; max block 13 → 14) —
  *    the fixture's `w_k` vocabulary suffixes densify the 12-char
  *    blocking prefix. Bounded max block = no quadratic breakdown.
  * 2. The dominant cost is NOT the join (0.6 s over cached keys at
  *    sf1) but the regexp normalization: one pass costs ~2 s at 50k
  *    docs, and the naive uncached formulation pays it 4× (filter
  *    pushdown re-substitution × two un-shared self-join sides),
  *    measured at 14.7 s. The shipped operators persist the one-pass
  *    key/gram projection (Dedup.linkageKeys / the d24 gram frame),
  *    so the stage budget is one normalization + one cached join.
  *
  * Stages:
  *   keys_naive  — the UNCACHED normalize+block projection (the
  *                 counterfactual: what filter-pushdown re-substitution
  *                 costs)
  *   keys        — Dedup.linkageKeys as shipped (cached, one pass)
  *   pairs       — + the blocked self-join and levenshtein threshold
  *   full_d23    — the complete registered d23
  *   full_d24    — the complete registered d24
  *
  * Usage: runMain graft.tools.ProfileLinkage [sfDir] [outFile]
  */
object ProfileLinkage {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val outFile = args.lift(1).getOrElse("PROFILE_linkage_stages.json")
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    def keysNaive = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("norm"))
      .where(length(col("norm")) >= 12)
      .select(col("doc_id"), substring(col("norm"), 1, 12).as("bk"),
        substring(col("norm"), 1, 40).as("sig"))
    val tKeysNaive = timed { noop(keysNaive) }

    def keys = graft.operators.Dedup.linkageKeys(graft.Tables.documents(spark, dir))
    val tKeys = timed { noop(keys) }
    val tPairs = timed {
      val k = keys
      noop(k.as("a").join(k.as("b"),
          col("b.bk") === col("a.bk") && col("b.doc_id") > col("a.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.sig"), col("b.sig")).cast(LongType).as("dist"))
        .where(col("dist") <= 20))
    }
    val tFull = timed { noop(graft.SparkEntry.queries("d23_record_linkage")(spark, dir)) }
    val tD24 = timed { noop(graft.SparkEntry.queries("d24_containment")(spark, dir)) }

    val json =
      s"""{"dir":"$dir","runs":$runs,"keys_naive_s":$tKeysNaive,"keys_s":$tKeys,""" +
      s""""pairs_s":$tPairs,"full_d23_s":$tFull,"full_d24_s":$tD24}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
  }
}

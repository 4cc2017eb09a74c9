package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-stage split for the d30_subblocked_linkage rehearsal row — the
  * round-14 panel's worst scaler (1.32 s sf0.1 → 11.65 s sf1, 8.8× on
  * 10× data; REHEARSAL_r14_newops.json). Isolates which stage grows:
  *
  *   corpus   — withHotBlockPairs fixture union (3 scans of documents)
  *   keys     — + linkageKeys (normalize + block, persisted inside)
  *   sub      — + subBlockedKeysPlan (block-count join + refinement,
  *              UNPERSISTED — the production subBlockedKeys persists
  *              internally, which is exactly the counterfactual the
  *              pairs stages below need to keep apart)
  *   pairs    — blocked self-join over the UNPERSISTED refinement:
  *              what re-executing the refinement plan per downstream
  *              reference costs
  *   subP     — the same pairs stage with the refinement PERSISTED
  *              (the production path)
  *   capped   — + cappedBlocks over the unpersisted refinement
  *   full     — the complete registered d30 (persisted path)
  *
  * Usage: runMain graft.tools.ProfileD30 [sfDir] [outFile]
  */
object ProfileD30 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val outFile = args.lift(1).getOrElse("PROFILE_d30_stages.json")
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
    import graft.operators.Dedup

    def timed(body: => Unit): Double = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def corpus = Dedup.withHotBlockPairs(graft.Tables.documents(spark, dir))
    val tCorpus = timed { noop(corpus) }
    def keys = Dedup.linkageKeys(corpus)
    val tKeys = timed { noop(keys) }
    // The PLAN variant, not subBlockedKeys itself: the production entry
    // point persists internally (round-15 change), which would make the
    // pairs_s stage below silently measure the persisted path and erase
    // the counterfactual this profile exists to record.
    def sub = Dedup.subBlockedKeysPlan(keys, maxBlock = 32)
    val tSub = timed { noop(sub) }
    def pairsOf(k: org.apache.spark.sql.DataFrame) = {
      val capped = Dedup.cappedBlocks(k, 32)
      capped.as("a")
        .join(capped.as("b"),
          col("b.bk") === col("a.bk") && col("b.doc_id") > col("a.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.sig"), col("b.sig")).cast(LongType).as("dist"))
        .where(col("dist") <= 20)
    }
    val tCapped = timed { noop(Dedup.cappedBlocks(sub, 32)) }
    val tPairs = timed { noop(pairsOf(sub)) }
    val tPairsPersisted = timed {
      val sp = sub.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try noop(pairsOf(sp)) finally { sp.unpersist(); () }
    }
    val tFull = timed {
      noop(graft.SparkEntry.queries("d30_subblocked_linkage")(spark, dir))
    }

    val json =
      s"""{"dir":"$dir","runs":$runs,"corpus_s":$tCorpus,"keys_s":$tKeys,""" +
      s""""sub_s":$tSub,"capped_s":$tCapped,"pairs_s":$tPairs,""" +
      s""""pairs_sub_persisted_s":$tPairsPersisted,"full_d30_s":$tFull}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
  }
}

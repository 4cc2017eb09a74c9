package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the t31 BPE segmentation pipeline
  * (local-iteration tool; not part of the driver contract). */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm
    val merges = time("train") {
      graft.operators.TextAnalysisQueries.bpeTrain(docs, 10).orderBy("round")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    }
    time("train2") {
      graft.operators.TextAnalysisQueries.bpeTrain(docs, 10).orderBy("round")
        .collect()
    }
    val words = docs.select(col("doc_id"),
        explode(split(graft.operators.Dedup.normText(col("text")), " ")).as("word"))
      .where(length(col("word")) > 0)
    time("word_explode_count")(words.write.format("noop").mode("overwrite").save())
    val dictPlain = words.select("word").distinct()
    time("dict_distinct")(dictPlain.write.format("noop").mode("overwrite").save())
    time("segment_full") {
      graft.operators.TextAnalysisQueries.bpeSegmentCounts(docs, merges)
        .write.format("noop").mode("overwrite").save()
    }
    time("segment_full2") {
      graft.operators.TextAnalysisQueries.bpeSegmentCounts(docs, merges)
        .write.format("noop").mode("overwrite").save()
    }
    // Threshold sweep (round-12, VERDICT advice #6): measure WHERE the
    // chained-replace codegen formulation stops beating the merge-loop
    // UDF, so `codegenMaxMerges` is a measured constant instead of a
    // guess. The merge TABLE SIZE is the only cost driver of the apply
    // (each merge is one replace pass over the word-seq string whether
    // or not it fires), so the real 10 trained merges are padded with
    // never-matching pairs to each probe size. Both paths run at every
    // size (min-of-2 after a warm run each); a codegen failure at depth
    // (64KB method limit → interpreted fallback) is part of the
    // measurement, not an error. Run with arg "threshold"; writes
    // PROFILE_bpe_threshold.json.
    if (args.contains("threshold")) {
      val sizes = Seq(10, 32, 100, 300, 1000, 3000)
      val lines = sizes.map { m =>
        val padded = merges ++ (merges.length until m).map(i => (s"$i", ""))
        def best(codegenMax: Int): Double =
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            graft.operators.TextAnalysisQueries
              .bpeSegmentCounts(docs, padded, codegenMax = codegenMax)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.drop(1).min // first run pays codegen compile; steady-state is the signal
        val cg = try best(Int.MaxValue) catch { case _: Throwable => -1.0 }
        val ud = best(0)
        val line = f"""{"merges":$m,"codegen_sec":$cg%.3f,"udf_sec":$ud%.3f}"""
        System.err.println(s"PROFILE threshold $line")
        line
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get("PROFILE_bpe_threshold.json"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}

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
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-isolated timing for the distill-mining family (round-21):
  * times the MINING stage alone (grid and LSH paths, noop sink) next
  * to the full registered queries, min-of-N warm in one JVM, so a
  * mining-stage change can be attributed separately from the export /
  * manifest stages that n42/n43 wrap around it.
  *
  * Usage: runMain graft.tools.ProfileMargin [sfDir] [runs]
  */
object ProfileMargin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"stage":"$name","min":${ts.min}%.3f,"all":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = graft.Tables.embeddings(spark, sfDir)
    val l0 = col("label") === 0
    val l1 = col("label") === 1
    time("mine_lsh")(noop(
      graft.operators.Similarity.marginMineLshScored(emb, l0, l1, k = 4)))
    time("mine_grid")(noop(
      graft.operators.Similarity.marginMinePairsScored(emb, l0, l1, k = 4)))
    time("n13_full")(noop(
      graft.SparkEntry.queries("n13_margin_mining")(spark, sfDir)))
    time("n43_full")(noop(
      graft.SparkEntry.queries("n43_distill_lsh")(spark, sfDir)))
    time("n42_full")(noop(
      graft.SparkEntry.queries("n42_distill_pairs")(spark, sfDir)))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds: for each named
  * query, registers a QueryExecutionListener, CONSTRUCTS AND RUNS the
  * query (noop sink, the bench's action), and writes every executed
  * plan — including the per-round plans of driver-looped operators,
  * which the returned frame's own explain() hides behind a
  * LogicalRDD/LocalRelation cut — plus the returned frame's formatted
  * plan to `<outDir>/<query>_<suffix>.txt`.
  *
  * Usage: runMain graft.tools.DumpPlans <q1,q2,...> [sfDir] [outDir] [suffix]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse("plans/r20")
    val suffix = args.lift(3).getOrElse("after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val sb = new StringBuilder
      sb.append(s"=== $name ($suffix) — every plan executed while building+running the query (noop sink) ===\n")
      var n = 0
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = sb.synchronized {
          n += 1
          sb.append(s"\n-- executed plan #$n (action: $funcName) --\n")
          sb.append(qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          ()
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val returned = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(3000) // listener bus is async; let it drain
      spark.listenerManager.unregister(listener)
      sb.synchronized {
        sb.append(s"\n-- RETURNED FRAME plan --\n").append(returned)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          sb.toString.getBytes("UTF-8"))
      }
      spark.catalog.clearCache()
      System.err.println(s"[plans] $name -> $outDir/${name}_$suffix.txt ($n executed plans)")
    }
    spark.stop()
  }
}

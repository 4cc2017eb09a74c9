package graft.tools

import org.apache.spark.sql.SparkSession

/** Fleet-wide mechanical plan audit (round-20): for EVERY registered
  * query, build the returned frame and count the red-flag operators in
  * its physical plan — exchanges, join strategies, cartesian products,
  * parquet scans whose PushedFilters is empty while a filter sits above
  * the scan. One TSV row per query on stdout. Queries that return a
  * materialized/local frame (matcut or driver-bounded collects) show
  * the serving plan only; their pipeline plans are captured separately
  * by DumpPlans — the `shape` column marks them.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [outFile]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("/tmp/plan_audit.tsv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    // `exchanges` counts SHUFFLE exchanges only (round-21 advice fix:
    // the old bare-"Exchange" count also matched BroadcastExchange and
    // ReusedExchange, so every broadcast join inflated the shuffle
    // red-flag column); broadcasts get their own column.
    sb.append("query\tshape\texchanges\tbcast_exchanges\tsmj\tbhj\tshj\tbnlj\tcartesian\tscans\tscans_nofilter_pushdown\terr\n")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def c(tok: String) = tok.r.findAllIn(p).length
        val shape =
          if (p.contains("LocalTableScan") && !p.contains("FileScan")) "local"
          else if (p.contains("Scan ExistingRDD")) "rdd-cut"
          else "lazy"
        val scans = c("FileScan parquet")
        val noPush = "PushedFilters: \\[\\]".r.findAllIn(p).length
        // Count per line, skipping ReusedExchange lines: a
        // ReusedExchange leaf EMBEDS the referenced exchange's
        // simpleString ("ReusedExchange [...], Exchange
        // hashpartitioning(...)"), so a whole-plan regex would count
        // the reused (not re-executed) exchange again.
        def cNew(tok: String) = p.linesIterator
          .filterNot(_.contains("ReusedExchange"))
          .map(l => tok.r.findAllIn(l).length).sum
        val shuffleEx = cNew("Exchange hashpartitioning") +
          cNew("Exchange rangepartitioning") + cNew("Exchange SinglePartition") +
          cNew("Exchange RoundRobinPartitioning")
        sb.append(s"$name\t$shape\t$shuffleEx\t${cNew("BroadcastExchange")}\t" +
          s"${c("SortMergeJoin")}\t" +
          s"${c("BroadcastHashJoin")}\t${c("ShuffledHashJoin")}\t" +
          s"${c("BroadcastNestedLoopJoin")}\t${c("CartesianProduct")}\t" +
          s"$scans\t$noPush\t\n")
      } catch { case t: Throwable =>
        sb.append(s"$name\terr\t-\t-\t-\t-\t-\t-\t-\t-\t-\t${t.getClass.getSimpleName}\n")
      }
      spark.catalog.clearCache()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes("UTF-8"))
    System.err.println(s"[audit] ${names.length} queries -> $outFile")
    spark.stop()
  }
}

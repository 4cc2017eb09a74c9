package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured confirmation for the SCALE.md n16 rehearsal diagnosis: the
  * kNN-graph candidate volume is corpus × nProbe·(N/nCells), so a cell
  * count PINNED across scales (the oracle fixture's nCells = 16) makes
  * the scoring stage grow quadratically with N, while the engine's √N
  * rule keeps it at the standard IVF N^1.5. This tool times
  * `Similarity.knnGraph` on one corpus at a list of cell counts —
  * index build and graph stage separately, min-of-`runs` each — and
  * prints/writes one JSON line per cell count.
  *
  * Usage: runMain graft.tools.ProfileKnn [sfDir] [outFile] [cells,...]
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val outFile = args.lift(1).getOrElse("REHEARSAL_n16_cells.json")
    val cellsList = args.lift(2).getOrElse("16,141").split(",").map(_.trim.toInt)
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
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    // a requested cell count of 0 exercises buildIvfIndex's DERIVED
    // default (nCells ~ sqrt(N)); the emitted line reports the count
    // the build actually used.
    val lines = cellsList.map { nCells =>
      var usedCells = nCells
      val (buildT, graphT) = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val idx = graft.operators.Similarity.buildIvfIndex(emb, nCells = nCells)
        usedCells = idx.centroids.length
        idx.assigned.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        graft.operators.Similarity.knnGraph(idx, k = 5, nProbe = 2)
          .write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        idx.unpersist()
        spark.catalog.clearCache()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }.reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
      val line = f"""{"n":$n,"nCells":$usedCells,"requested":$nCells,"build_sec":$buildT%.3f,"graph_sec":$graphT%.3f,"sf":"$dir"}"""
      println(line); line
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

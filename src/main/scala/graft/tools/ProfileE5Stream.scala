package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1 rehearsal for the e5 cohort-retention STREAMING twin — the one
  * heavy operator whose scale behavior the batch rehearsal table can't
  * show (its cost model is rollup growth, not query time). Measures, at
  * a given fixture scale:
  *
  *   rollup_sec  — one AvailableNow pass of `incrementalCohortPartials`
  *                 over the full events fixture (micro-batch write cost)
  *   rollup_rows — the partial's size: O(users × active weeks), the
  *                 quantity that must grow sublinearly in EVENTS for
  *                 the incremental path to pay at 100 TB
  *   read_sec    — `readCohortRetention` (merge + shared triangle stage)
  *   parity      — streamed triangle == batch e5 triangle (row-set
  *                 equality, the StreamingSpec invariant re-checked at
  *                 this scale)
  *
  * Usage: runMain graft.tools.ProfileE5Stream [sfDir] [outFile]
  */
object ProfileE5Stream {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val outFile = args.lift(1).getOrElse("PROFILE_e5_stream.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("e5prof").toString
    val src = s"$tmp/src"; val rollup = s"$tmp/rollup"; val ckpt = s"$tmp/ckpt"
    // stage the events fixture as the stream source (one file = one
    // AvailableNow pass; micro-batch splitting is the spec's concern,
    // scale cost is this pass's)
    new java.io.File(src).mkdirs()
    // the fixture may be a single parquet file (driver testdata) or a
    // Spark-written directory of part files (MakeScale output)
    val evPath = new java.io.File(s"$dir/events.parquet")
    if (evPath.isDirectory)
      evPath.listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$src/events-$i.parquet"))
        }
    else
      java.nio.file.Files.copy(evPath.toPath,
        java.nio.file.Paths.get(s"$src/events.parquet"))

    val t0 = System.nanoTime()
    graft.streaming.Streams.incrementalCohortPartials(spark, src, rollup, ckpt)
    val rollupSec = (System.nanoTime() - t0) / 1e9
    val rollupRows = spark.read.parquet(rollup).count()
    val nEvents = graft.Tables.events(spark, dir).count()

    val t1 = System.nanoTime()
    val streamed = graft.streaming.Streams.readCohortRetention(spark, rollup)
      .collect().map(_.toString).sorted.toSeq
    val readSec = (System.nanoTime() - t1) / 1e9

    val batch = graft.SparkEntry.queries("e5_cohort_retention")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val parity = streamed == batch

    val line = f"""{"sf":"$dir","n_events":$nEvents,"rollup_sec":$rollupSec%.3f,""" +
      f""""rollup_rows":$rollupRows,"read_sec":$readSec%.3f,"parity":$parity}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

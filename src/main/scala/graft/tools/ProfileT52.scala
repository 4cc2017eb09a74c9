package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-stage split for the SCALE.md `t52_effective_tokens` rehearsal
  * ratio (4.7× on 10× data): the diagnosis attributes the ratio to "two
  * linear stages stacked — the component label join and the per-doc
  * token count — emerging from under the sf0.1 floor". This tool gives
  * that claim the n16 treatment: each stage timed separately on the
  * same corpus (fresh caches per stage set, min-of-`runs`), so the
  * dominant stage is NAMED with a number and anything superlinear
  * hiding under the floor would surface as one stage's ratio, not the
  * query's.
  *
  * Stages (cumulative prefixes of the t52 plan, so stage deltas are
  * attributable):
  *   pairs      — the d6 MinHash pair graph (banded join)
  *   components — + pointer-jumping component resolution
  *   tokens     — the per-doc token-count scan ALONE (no dedup at all)
  *   full       — the complete t52 (label join + discount + lang agg)
  *
  * Usage: runMain graft.tools.ProfileT52 [sfDir] [outFile]
  */
object ProfileT52 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val outFile = args.lift(1).getOrElse("PROFILE_t52_stages.json")
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

    val q = graft.SparkEntry.queries

    val tPairs = timed {
      noop(graft.operators.DedupQueries.d6PairGraph(spark, dir))
    }
    val tComponents = timed {
      noop(graft.operators.Dedup.connectedComponentsFast(
        graft.operators.DedupQueries.d6PairGraph(spark, dir)))
    }
    val tTokens = timed {
      noop(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast(LongType).as("ntok")))
    }
    val tFull = timed { noop(q("t52_effective_tokens")(spark, dir)) }

    // The residual is everything AFTER the component resolution — the
    // token scan, the label join and the discount agg together (the
    // token scan is ALSO reported alone above; naming the residual
    // "label join" would double-credit those seconds to the join).
    val line = f"""{"sf":"$dir","pairs_sec":$tPairs%.3f,""" +
      f""""components_sec":$tComponents%.3f,"tokens_scan_sec":$tTokens%.3f,""" +
      f""""full_sec":$tFull%.3f,"residual_after_components_sec":${tFull - tComponents}%.3f}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

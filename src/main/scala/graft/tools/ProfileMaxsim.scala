package graft.tools

import org.apache.spark.sql.SparkSession

/** n41 DERIVED-CELLS rehearsal (round-16 verdict ask #4): the maxsim
  * gate pins nCells=16 so the oracle replays a constant, but the scale
  * claim ("√N-bounded candidate volume under derived cells") was
  * inherited from the doc-level IVF family and never MEASURED for
  * token-level IVF, whose occupancy distribution differs (tokens
  * cluster harder than docs — 4 rotations of each doc vector land in
  * correlated cells). This profile times, min-of-3 per stage:
  *
  *   maxsim_pinned   — the registered n41 fixture (nCells = 16)
  *   maxsim_derived  — the production path (nCells = 0 ⇒ √(4N) cells
  *                     derived from the token count by buildIvfIndex)
  *   n42_distill     — the round-16 distillation export (its mining
  *                     stage is n13's documented S×T broadcast grid —
  *                     the brute-force baseline whose corpus-scale
  *                     replacement is the banded-LSH candidate path,
  *                     so expect ~quadratic growth HERE by design)
  *
  * Run once per scale dir in a fresh JVM (the rehearsal protocol);
  * REHEARSAL_n41_derived.json merges the two runs.
  *
  * Usage: runMain graft.tools.ProfileMaxsim [sfDir] [outFile]
  */
object ProfileMaxsim {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("PROFILE_maxsim_derived.json")
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
    import graft.operators.Similarity

    def timed(body: => Unit): Double = (1 to runs).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = graft.Tables.embeddings(spark, dir)
    val nVecs = emb.count()
    val qids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val tPinned = timed { noop(Similarity.maxsimRerank(emb, qids, k = 10, nCells = 16)) }
    val tDerived = timed { noop(Similarity.maxsimRerank(emb, qids, k = 10, nCells = 0)) }
    val derivedCells =
      math.max(2L, math.round(math.sqrt((nVecs * 4).toDouble)))
    val tDistill = timed {
      noop(graft.SparkEntry.queries("n42_distill_pairs")(spark, dir))
    }
    val tDistillLsh = timed {
      noop(graft.SparkEntry.queries("n43_distill_lsh")(spark, dir))
    }
    val tSplit = timed {
      noop(graft.SparkEntry.queries("d33_leakage_safe_split")(spark, dir))
    }
    val tChunks = timed {
      noop(graft.SparkEntry.queries("t61_passage_chunks")(spark, dir))
    }

    val json =
      s"""{"dir":"$dir","runs":$runs,"n_vectors":$nVecs,""" +
      s""""maxsim_pinned16_s":$tPinned,"maxsim_derived_s":$tDerived,""" +
      s""""derived_cells":$derivedCells,"n42_distill_s":$tDistill,""" +
      s""""n43_distill_lsh_s":$tDistillLsh,"d33_split_s":$tSplit,""" +
      s""""t61_chunks_s":$tChunks}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
  }
}

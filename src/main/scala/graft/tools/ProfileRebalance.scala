package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 new-ops rehearsal: n44 (IVF rebalance APPLY) and n41c (the
  * incremental maxsim token store) timed at sf0.1 and at the MakeScale
  * 10× replica dir, fresh JVM per scale (the rehearsal protocol —
  * REHEARSAL_r17_newops.json merges the runs).
  *
  *   rebal_build_s  — the nightly build the apply amortizes against
  *                    (skewed gate fixture: corpus + ceil(3N/16) clones)
  *   rebal_apply_s  — applyIvfRebalance min-of-3: plan + per-cell
  *                    sub-Lloyd over the hot cells only + one map-pass
  *                    reassign + partitioned write. The scale claim:
  *                    grows with corpus size for the map pass but the
  *                    sub-Lloyd scans ONLY split-cell rows.
  *   mxs_stream_s   — one incrementalMaxsimTokenStore micro-batch over
  *                    ~10% of the documents (fresh checkpoint per run):
  *                    in-stream token derivation + frozen-model assign,
  *                    map-side only.
  *   mxs_serve_s    — maxsimRerankServed from the compacted store
  *                    (the n41b/n41c serving shape).
  *
  * Usage: runMain graft.tools.ProfileRebalance [sfDir] [outFile]
  */
object ProfileRebalance {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("PROFILE_rebalance.json")
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
    val root = java.nio.file.Files.createTempDirectory("graft_rebal_prof").toString

    // --- n44: the skewed gate fixture at this scale ---
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // clone id base = max(vec_id)+1, matching the n44 gate — the 10x
    // replica dirs stride ids past any hard-coded literal
    val stats = emb.agg(count(lit(1)).as("n"), max(col("vec_id")).as("mx")).head()
    val nVecs = stats.getLong(0)
    val nClones = (3 * nVecs + 15) / 16
    val idBase = stats.getLong(1) + 1L
    val clones = spark.range(nClones)
      .select((col("id") + idBase).as("vec_id"))
      .crossJoin(broadcast(
        emb.where(col("vec_id") === 0L).select(col("embedding"))))
      .select("vec_id", "embedding")
    val fixture = emb.unionByName(clones)
    val base = s"$root/base"
    val t0 = System.nanoTime()
    val built = Similarity.buildIvfIndex(fixture, nCells = 16)
    Similarity.writeIvfIndex(built, base)
    built.unpersist()
    val tBuild = (System.nanoTime() - t0) / 1e9
    var i = 0
    val tApply = timed {
      i += 1
      Similarity.applyIvfRebalance(spark, base, s"$root/out$i").count()
      ()
    }

    // --- n41c: one stream micro-batch + compacted serve ---
    val toks = Similarity.maxsimTokens(emb)
      .select(col("token_id").as("vec_id"), col("tv").as("embedding"))
    val mBase = s"$root/mxs-base"
    val builtM = Similarity.buildIvfIndex(toks, nCells = 16)
    val cut = (nVecs * 9) / 10
    Similarity.writeIvfIndex(Similarity.IvfIndex(builtM.centroids,
      builtM.assigned.where(expr("vec_id div 4") < cut)), mBase)
    builtM.unpersist()
    val batch = emb.where(col("vec_id") >= cut)
    def chunk(src: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_prof_chunk")
      batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      new java.io.File(src).mkdirs()
      val part = stage.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$src/c1.parquet"))
      ()
    }
    var j = 0
    val tStream = timed {
      j += 1
      val src = s"$root/mxs-src$j"
      chunk(src)
      graft.streaming.Streams.incrementalMaxsimTokenStore(
        spark, src, mBase, s"$root/mxs-appends$j", s"$root/mxs-ckpt$j")
    }
    val compacted = s"$root/mxs-compacted"
    Similarity.compactIvfAppendStore(spark, mBase, s"$root/mxs-appends$j", compacted)
    val tServe = timed {
      Similarity.maxsimRerankServed(spark, compacted,
        graft.Tables.embeddings(spark, dir),
        Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L), k = 10)
        .write.format("noop").mode("overwrite").save()
    }

    val json =
      s"""{"dir":"$dir","runs":$runs,"n_vectors":$nVecs,"n_clones":$nClones,""" +
      s""""rebal_build_s":$tBuild,"rebal_apply_s":$tApply,""" +
      s""""mxs_stream_s":$tStream,"mxs_serve_s":$tServe}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
  }
}

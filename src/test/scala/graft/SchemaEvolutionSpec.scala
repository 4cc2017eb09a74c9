package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-evolution guard for the source layer (round-10 postmortem:
  * the driver's testdata switched `events.ts` from TIMESTAMP(NANOS) —
  * surfaced as LongType under nanosAsLong — to TIMESTAMP(MICROS)
  * between rounds, and the hardcoded nanos assumption killed nine
  * queries). A 100 TB lake always mixes physical encodings across
  * partition generations, so the loaders must branch on the ACTUAL
  * column dtype. This spec writes one fixture per encoding the loader
  * claims to tolerate and asserts both load to identical event times,
  * in batch (Tables.events) and streaming (Streams.eventStream). */
class SchemaEvolutionSpec extends AnyFunSuite with SparkSuite {

  private val root = graft.util.TmpRoot("schema-evo")

  // One logical event table: epoch micros chosen with a non-zero
  // microsecond component so a millis-precision bug cannot pass.
  private val microsRows = Seq(
    (1L, 1735689600123456L, 7L, "view", 1.0, "{}"),
    (2L, 1735693201987654L, 7L, "click", 2.0, "{}"),
    (3L, 1735696803000001L, 9L, "purchase", 3.0, "{}"))

  private def writeFixtures(): (String, String) = {
    val s = spark
    import s.implicits._
    val asLongNanos = s"$root/events_nanos_long"
    val asMicrosTs = s"$root/events_micros_ts"
    // Generation A: ts as INT64 nanos — byte-identical to what the
    // parquet reader hands Spark for TIMESTAMP(NANOS) under
    // spark.sql.legacy.parquet.nanosAsLong=true.
    microsRows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(asLongNanos)
    // Generation B: ts as a native micros timestamp (Spark's default
    // parquet encoding — what the current testdata ships).
    microsRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("overwrite").parquet(asMicrosTs)
    (asLongNanos, asMicrosTs)
  }

  test("Tables.events normalizes both physical ts encodings to identical micros") {
    val (nanosDir, microsDir) = writeFixtures()
    def load(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    // Tables.events reads "$dir/events.parquet" — give each fixture that shape.
    val s = spark
    val fsNan = s"$root/gen_a"; val fsMic = s"$root/gen_b"
    s.read.parquet(nanosDir).write.mode("overwrite").parquet(s"$fsNan/events.parquet")
    s.read.parquet(microsDir).write.mode("overwrite").parquet(s"$fsMic/events.parquet")
    val a = load(fsNan)
    val b = load(fsMic)
    val expected = microsRows.map { case (id, us, _, _, _, _) => (id, us) }.sortBy(_._1)
    assert(a === expected)
    assert(b === expected)
    // And both land as a true TimestampType for every downstream operator.
    assert(Tables.events(spark, fsNan).schema("ts").dataType === TimestampType)
    assert(Tables.events(spark, fsMic).schema("ts").dataType === TimestampType)
  }

  test("Tables.events fails loudly on an unsupported physical ts type") {
    val dir = s"$root/gen_bad"
    val s = spark
    import s.implicits._
    microsRows.map { case (id, us, u, t, v, p) => (id, us.toString, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("Streams.eventStream probes the footer and normalizes both encodings") {
    val (nanosDir, microsDir) = writeFixtures()
    def streamOut(dir: String): Seq[(Long, Long)] = {
      val out = s"$dir-out"
      val q = graft.streaming.Streams.eventStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir-ckpt")
        .format("parquet").option("path", out).start()
      q.awaitTermination()
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    }
    val expected = microsRows.map { case (id, us, _, _, _, _) => (id, us) }.sortBy(_._1)
    assert(streamOut(nanosDir) === expected)
    assert(streamOut(microsDir) === expected)
  }

  test("Streams.eventStream starts on an empty source dir (micros default)") {
    // A file-source stream's normal startup state is a directory with
    // no parquet footers yet; the probe must fall back to the
    // current-generation default instead of throwing, and the stream
    // must then consume micros-ts files that land later.
    val dir = s"$root/empty_start"
    new java.io.File(dir).mkdirs()
    val stream = graft.streaming.Streams.eventStream(spark, dir)
    assert(stream.schema("ts").dataType === TimestampType)
    val s = spark
    import s.implicits._
    microsRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("append").parquet(dir)
    val out = s"$dir-out"
    val q = stream
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir-ckpt")
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(got === microsRows.map { case (id, us, _, _, _, _) => (id, us) }.sortBy(_._1))
  }

  test("mixed ts encodings in ONE dir fail loudly; per-generation union is the recipe") {
    // The adversarial case the eventStream doc-comment scopes out: a
    // directory whose FILES mix the nanos-long and micros-ts
    // generations. One footer wins the probe, the other file's column
    // can't be read as that type — the contract is LOUD failure (never
    // silently shifted timestamps), and the supported shape is one
    // stream per generation unioned upstream, which this test runs as
    // a working example.
    val (nanosDir, microsDir) = writeFixtures()
    val mixed = s"$root/mixed_gen"
    new java.io.File(mixed).mkdirs()
    def copyParquets(from: String, tag: String): Unit = {
      val files = new java.io.File(from).listFiles().filter(_.getName.endsWith(".parquet"))
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$mixed/$tag-$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyParquets(nanosDir, "gen-a")
    copyParquets(microsDir, "gen-b")
    // Batch and stream both fail loudly somewhere between schema probe
    // and materialization — never return shifted event times.
    assertThrows[Throwable] {
      val wrapped = s"$root/mixed_tbl"
      spark.read.parquet(mixed).write.mode("overwrite")
        .parquet(s"$wrapped/events.parquet") // may already throw here
      Tables.events(spark, wrapped).collect()
    }
    // The recipe: one eventStream PER generation dir, unioned — every
    // row normalized to identical micros.
    val out = s"$root/union-out"
    val a = graft.streaming.Streams.eventStream(spark, nanosDir)
    val b = graft.streaming.Streams.eventStream(spark, microsDir)
    val q = a.unionByName(b)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/union-ckpt")
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val one = microsRows.map { case (id, us, _, _, _, _) => (id, us) }
    assert(got === (one ++ one).sorted)
  }
}

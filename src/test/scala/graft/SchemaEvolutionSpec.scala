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
}

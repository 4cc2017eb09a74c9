package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.MakeScale

/** Invariants of the scale-rehearsal generator (SCALE.md "sf1
  * rehearsal"). The rehearsal's linearity measurement is only valid if
  * replication approximates ORGANIC growth — these pin exactly that:
  * exact clones would hand every doc R-choose-2 cross-replica near-dup
  * pairs and make pair joins grow quadratically for data reasons. */
class ToolsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma", "en", "web"),
    (2L, "delta beta", "en", "web"),
    (7L, "alpha beta gamma", "de", "pdf"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private lazy val embs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f, 4.0f), 0),
    (2L, Array(0.0f, -1.0f, 5.0f, 2.5f), 1))
    .toDF("vec_id", "embedding", "label")

  test("scaleDocs: ids disjoint across replicas, counts scale exactly") {
    val out = MakeScale.scaleDocs(docs, 3).cache()
    assert(out.count() === 9)
    assert(out.select("doc_id").distinct().count() === 9)
    // Replica membership is recoverable from the id stride.
    val perReplica = out.groupBy((col("doc_id") / MakeScale.ReplicaStride)
      .cast("long").as("k")).count().collect()
    assert(perReplica.length === 3 && perReplica.forall(_.getLong(1) == 3))
  }

  test("scaleDocs: replica 0 is bit-identical to the source") {
    val out = MakeScale.scaleDocs(docs, 3)
      .where(col("doc_id") < MakeScale.ReplicaStride)
    assert(out.except(docs).isEmpty && docs.except(out).isEmpty)
  }

  test("scaleDocs: token vocabularies are disjoint across replicas") {
    val toks = MakeScale.scaleDocs(docs, 3)
      .select((col("doc_id") / MakeScale.ReplicaStride).cast("long").as("k"),
        explode(split(col("text"), " ")).as("tok"))
    // No token appears in two different replicas -> shingle/fingerprint
    // blocking finds zero cross-replica candidates.
    val crossed = toks.groupBy("tok")
      .agg(countDistinct("k").as("nk")).where(col("nk") > 1).count()
    assert(crossed === 0)
    // Within a replica the duplicate structure is preserved: doc 1 and
    // doc 7 stay exact duplicates in every replica.
    val dupPairs = MakeScale.scaleDocs(docs, 3)
      .groupBy("text").count().where(col("count") > 1).count()
    assert(dupPairs === 3)
  }

  test("scaleDocs: per-doc shape (word count, n_chars) is consistent") {
    val bad = MakeScale.scaleDocs(docs, 3)
      .where(col("n_chars") =!= length(col("text")).cast("long")).count()
    assert(bad === 0)
    // Word counts per doc match the source doc's word count.
    val wc = MakeScale.scaleDocs(docs, 3)
      .select((col("doc_id") % MakeScale.ReplicaStride).as("orig"),
        size(split(col("text"), " ")).as("n")).distinct()
    val src = docs.select(col("doc_id").as("orig"),
      size(split(col("text"), " ")).as("n"))
    assert(wc.except(src).isEmpty)
  }

  test("scaleEvents: disjoint users/ids, per-user sequences preserved, week range fixed") {
    val evs = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-01-06 00:00:00"), 10L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2025-01-07 12:30:00"), 10L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2025-01-15 08:00:00"), 11L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = MakeScale.scaleEvents(evs, 3).cache()
    assert(out.count() === 9)
    assert(out.select("event_id").distinct().count() === 9)
    // User populations are disjoint across replicas (more users, never
    // merged activity), so sessionization/cohort state grows with R.
    val crossed = out.groupBy((col("user_id") % MakeScale.ReplicaStride).as("u"))
      .agg(countDistinct((col("user_id") / MakeScale.ReplicaStride)
        .cast("long")).as("nk"))
      .where(col("nk") =!= 3).count()
    assert(crossed === 0)
    // Replica 0 bit-identical.
    val r0 = out.where(col("event_id") < MakeScale.ReplicaStride)
    assert(r0.except(evs).isEmpty && evs.except(r0).isEmpty)
    // Timestamps unchanged — the cohort week RANGE (and so e5's
    // O(weeks²) output shape) is scale-invariant.
    val srcW = evs.select(to_date(date_trunc("week", col("ts"))).as("w")).distinct()
    val outW = out.select(to_date(date_trunc("week", col("ts"))).as("w")).distinct()
    assert(outW.except(srcW).isEmpty && srcW.except(outW).isEmpty)
    // Per-user event sequences preserved: replica k of user u has the
    // source user's exact (ts, event_type) sequence.
    val seqs = out.select((col("user_id") % MakeScale.ReplicaStride).as("orig"),
      col("ts"), col("event_type")).distinct()
    val srcSeqs = evs.select(col("user_id").as("orig"), col("ts"), col("event_type"))
    assert(seqs.except(srcSeqs).isEmpty && srcSeqs.except(seqs).isEmpty)
  }

  test("scaleEmbeddings: rotation preserves the coordinate multiset and norm") {
    val out = MakeScale.scaleEmbeddings(embs, 4).cache()
    assert(out.count() === 8)
    assert(out.select("vec_id").distinct().count() === 8)
    // Replica 0 identical.
    val r0 = out.where(col("vec_id") < MakeScale.ReplicaStride)
    assert(r0.except(embs).isEmpty && embs.except(r0).isEmpty)
    // Every replica's vector is a left-rotation: sorted coordinate list
    // (the multiset) and length match the source vector's.
    val shape = out.select(
      (col("vec_id") % MakeScale.ReplicaStride).as("orig"),
      size(col("embedding")).as("d"),
      array_sort(col("embedding")).as("sorted")).distinct()
    val srcShape = embs.select(col("vec_id").as("orig"),
      size(col("embedding")).as("d"),
      array_sort(col("embedding")).as("sorted"))
    assert(shape.except(srcShape).isEmpty)
    // And rotation is EXACT: replica k element i == source element
    // (i + k) mod d.
    val rows = out.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val srcMap = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, v) =>
      val k = (id / MakeScale.ReplicaStride).toInt
      val s = srcMap(id % MakeScale.ReplicaStride)
      val d = s.length
      (0 until d).foreach(i => assert(v(i) === s((i + k) % d)))
    }
  }

  test("scaleEmbeddings: wrap generations stay distinct past 2*dim replicas") {
    // dim = 4, 12 replicas = 3 wrap generations. The round-18 parity
    // flip made replicas k and k+2*dim bit-identical (exact cosine-+1
    // twins); the Walsh sign patterns are pairwise distinct per
    // generation g < dim, so EVERY replica of a source vector must be
    // distinct, while |coordinate| multiset and norm are preserved.
    val out = MakeScale.scaleEmbeddings(embs, 12).cache()
    assert(out.count() === 24)
    val byOrig = out.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .groupBy(_._1 % MakeScale.ReplicaStride)
    val srcMap = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    byOrig.foreach { case (orig, reps) =>
      assert(reps.length === 12)
      // the round-18 failure mode: k and k+2*dim carried identical
      // embeddings — now all 12 replicas are pairwise distinct
      assert(reps.map(_._2).distinct.length === 12,
        s"vec $orig has duplicate replica embeddings")
      val srcAbs = srcMap(orig).map(math.abs).sorted
      reps.foreach { case (_, v) =>
        assert(v.map(math.abs).sorted === srcAbs,
          s"vec $orig replica breaks the |coordinate| multiset")
      }
    }
    // generation 0 (replicas 0..dim-1) is still sign-free: exact
    // left-rotations of the source, bit-identical to the old fixture
    byOrig.foreach { case (orig, reps) =>
      val s = srcMap(orig)
      reps.filter(_._1 / MakeScale.ReplicaStride < 4).foreach { case (id, v) =>
        val k = (id / MakeScale.ReplicaStride).toInt
        (0 until 4).foreach(i => assert(v(i) === s((i + k) % 4)))
      }
    }
  }

  test("scaleEmbeddings: replicas past dim^2 fail loudly, not as silent twins") {
    // dim = 4 -> at most dim^2 = 16 replicas carry distinct sign
    // generations; replica 16 (generation 4) must raise, where the
    // pre-round-19 code silently reused generation-0 signs.
    val ex = intercept[Exception] {
      MakeScale.scaleEmbeddings(embs, 17).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("Walsh sign generations"))),
      s"expected the scaleEmbeddings raise_error, got: $ex")
  }
}

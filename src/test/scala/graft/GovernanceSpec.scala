package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Governance}

/** A takedown must erase the document set from EVERY artifact, or the
  * retracted text lives on in band tables and shingle frames.
  */
class GovernanceSpec extends AnyFunSuite with SparkSuite {

  test("takedown purge leaves no trace in the stored dedup index") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val ids = docs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("purge_id"))
    val purgedIds = ids.as[Long].collect().toSet
    assert(purgedIds.nonEmpty)

    val root = util.TmpRoot("gov-spec")
    val ix = Dedup.buildMinhashIndex(docs)
    Dedup.writeMinhashIndex(ix, s"$root/live")
    ix.unpersist()
    Governance.purgeStoredMinhashIndex(spark, s"$root/live", s"$root/purged", ids)

    // 1. no purged doc_id survives in either index table
    val purged = Dedup.readMinhashIndex(spark, s"$root/purged")
    assert(purged.banded.where(col("doc_id").isin(purgedIds.toSeq: _*)).count() == 0)
    assert(purged.sigs.where(col("doc_id").isin(purgedIds.toSeq: _*)).count() == 0)
    // 2. non-purged content is untouched (row-for-row)
    val live = Dedup.readMinhashIndex(spark, s"$root/live")
    assert(purged.sigs.count() ==
      live.sigs.where(!col("doc_id").isin(purgedIds.toSeq: _*)).count())

    // 3. the retraction is effective: re-submitting an exact copy of a
    // purged doc finds NO match in the purged index — while the live
    // index (pre-purge) still links it. Batch ids offset to stay
    // disjoint from corpus ids, per the d10 contract.
    val resubmit = Dedup.buildMinhashIndex(
      docs.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    try {
      val before = Dedup.dedupAgainstIndex(live, resubmit, threshold = 0.9)
      assert(before.count() >= purgedIds.size,
        "live index should match every re-submitted clone")
      val after = Dedup.dedupAgainstIndex(purged, resubmit, threshold = 0.9)
      val offenders = after.where(col("doc_a").isin(purgedIds.toSeq: _*))
      assert(offenders.count() == 0,
        "purged index still links re-submitted copies to erased docs")
    } finally resubmit.unpersist()
  }

  test("takedown purge removes vectors from the stored ANN index") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val ids = emb.where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("purge_id"))
    val purgedIds = ids.as[Long].collect().toSet
    assert(purgedIds.nonEmpty && !purgedIds.contains(1L))

    val root = util.TmpRoot("gov-vec")
    val built = Similarity.buildIvfIndex(emb)
    Similarity.writeIvfIndex(built, s"$root/live")
    built.unpersist()
    Governance.purgeStoredIvfIndex(spark, s"$root/live", s"$root/purged", ids)

    val purged = Similarity.readIvfIndex(spark, s"$root/purged")
    // no purged vector survives in the assignment frame
    assert(purged.assigned.where(col("vec_id").isin(purgedIds.toSeq: _*)).count() == 0)
    // non-purged rows intact, and the query path still serves
    val live = Similarity.readIvfIndex(spark, s"$root/live")
    assert(purged.assigned.count() ==
      live.assigned.where(!col("vec_id").isin(purgedIds.toSeq: _*)).count())
    val got = Similarity.ivfTopK(purged, queryVecId = 1L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10 && got.intersect(purgedIds).isEmpty,
      "purged vectors still retrievable from the ANN index")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-path utilities: bucketed co-located joins and skew salting.
  *
  * These are the physical-design levers SCALE.md commits to — written
  * as library operators with plan-asserting specs (ScaleOpsSpec) rather
  * than prose. On a real cluster the FTS term index and the entries
  * table are written bucketed so repeated joins/probes shuffle nothing;
  * skewed dimension joins are salted when AQE's runtime skew split
  * isn't available (e.g. forced sort-merge with a pathological key).
  */
object ScaleOps {

  /** Write a DataFrame as a bucketed+sorted managed table. Joins and
    * groupBys on the bucket keys then require NO exchange: each bucket
    * pairs 1:1 across tables (asserted in ScaleOpsSpec). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    key: String, moreKeys: String*): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Write partitioned by a derived low-cardinality key (e.g.
    * year(entry_date)): queries filtering on the partition column scan
    * only matching directories — PartitionFilters in the plan, asserted
    * in ScaleOpsSpec. The SURVEY §4 analog of the reference's B-tree
    * date indexes. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Salted equi-join for skewed keys: the fact side gets a
    * deterministic per-row salt derived from its unique id (stable
    * across retries — never rand()); the dimension side is exploded
    * across all salts. Result set identical to the plain join; the
    * shuffle spreads a hot key over `salts` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factUniqueId: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factUniqueId)), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}

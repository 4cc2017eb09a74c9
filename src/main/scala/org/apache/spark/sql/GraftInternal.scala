package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow shim into Spark's package-private session API (round-20):
  * build a DataFrame over an RDD of INTERNAL rows without the
  * external-Row round trip. `Dataset.rdd` deserializes every cached
  * InternalRow to a GenericRow and `createDataFrame` re-encodes it —
  * a full decode/encode pass per materialized-cut frame that exists
  * only because the public API speaks external rows. The internal
  * constructor is what Spark's own data sources use; semantics are
  * identical (same schema, same rows, non-streaming LogicalRDD).
  *
  * PRIVATE-API PIN: signature verified against the Spark 4.1.2 jars
  * this repo builds against (classic.SparkSession.internalCreateDataFrame
  * (RDD[InternalRow], StructType, isStreaming = false)). This file is
  * the single choke point for the shim — on any Spark upgrade,
  * re-check that method's existence and arity here first. */
object GraftInternal {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}

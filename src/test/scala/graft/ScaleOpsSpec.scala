package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** The scale levers must actually change the physical plan, not just
  * exist: bucketed joins shuffle nothing; salted joins return exactly
  * the plain-join rows. */
class ScaleOpsSpec extends AnyFunSuite with SparkSuite {

  test("bucketed tables join with no exchange on either side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    ScaleOps.writeBucketed(o, "b_orders", 8, "o_orderkey")
    ScaleOps.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", 8, "o_orderkey")
    // Disable broadcast conversion (planner + AQE): at test scale the
    // tables are tiny, but the point is the shuffle-free SMJ shape the
    // bucketing buys at fact-vs-fact scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT o.o_orderkey, o.o_totalprice, l.l_quantity
          |FROM b_orders o JOIN b_lineitem l USING (o_orderkey)""".stripMargin)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned writes prune to the matching partition directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/orders"
    val o = Tables.orders(spark, sf)
      .withColumn("order_year", org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate").cast("date")))
      .select("o_orderkey", "o_totalprice", "order_year")
    ScaleOps.writePartitioned(o, dir, "order_year")
    val q = spark.read.parquet(dir).where(col("order_year") === 1996)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter section:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*order_year[^\\]]*\\].*"),
      s"partition filter not pushed:\n$plan")
    // pruned scan reads strictly fewer files than the full table
    val expected = o.where(col("order_year") === 1996).count()
    assert(q.count() == expected)
  }

  test("salted join returns exactly the plain-join rows") {
    import spark.implicits._
    // skewed fact: 90% of rows hit one key
    val fact = (1L to 2000L).map(i => (i, if (i % 10 == 0) i % 7 else 1L))
      .toDF("row_id", "k")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (0L, "f")).toDF("k", "v")
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "k", "v").collect().map(_.toString).sorted
    val salted = ScaleOps.saltedJoin(fact, dim, "k", "row_id", salts = 8)
      .select("row_id", "k", "v").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join is deterministic across re-runs (no rand())") {
    import spark.implicits._
    val fact = (1L to 500L).map(i => (i, i % 3)).toDF("row_id", "k")
    val dim = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    def run() = ScaleOps.saltedJoin(fact, dim, "k", "row_id", salts = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("bloom semi-join: no false negatives, real pre-join pruning, exact result") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // fact keys 1..10000; build side = multiples of 100 (1% selectivity)
    val fact = (1L to 10000L).map(i => (i, i)).toDF("row_id", "k")
    val keys = (1L to 10000L).filter(_ % 100 == 0).map(Tuple1(_)).toDF("bk")
    val bits = ScaleOps.buildBloom(keys, "bk", nBits = 1 << 16)
    // no false negatives: EVERY build key passes the filter
    val passed = fact.where(ScaleOps.mightContain(col("k"), bits))
      .select("k").as[Long].collect().toSet
    assert((100L to 10000L by 100).forall(passed.contains),
      "bloom dropped a true key (false negative)")
    // the filter actually prunes: survivors are far below the full fact
    // side (FP rate at 2^16 bits / 100 keys is tiny)
    assert(passed.size < 1000, s"bloom barely pruned: ${passed.size} of 10000")
    // end-to-end equality with the plain semi-join
    val got = ScaleOps.bloomSemiJoin(fact, keys, "k", "bk", nBits = 1 << 16)
      .select("row_id").as[Long].collect().sorted.toSeq
    assert(got == (100L to 10000L by 100).toSeq)
  }

  test("schema evolution: old partitions read under the widened schema, pruning intact") {
    import spark.implicits._
    // year-partitioned store: 2023 written BEFORE the quality column
    // existed, 2024 after — exactly what a years-old 100 TB warehouse
    // looks like. mergeSchema must widen, old rows must surface null
    // (never a default that forges data), and partition pruning must
    // survive the merged read.
    val root = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.parquet(s"$root/year=2023")
    Seq((3L, "c", 0.9), (4L, "d", 0.2)).toDF("id", "payload", "quality")
      .write.parquet(s"$root/year=2024")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet == Set("id", "payload", "quality", "year"))
    val old = merged.where(col("year") === 2023)
    assert(old.where(col("quality").isNull).count() == 2,
      "pre-evolution rows must carry null quality, not an invented default")
    // quality filters silently drop old rows — the classic evolution
    // trap; the explicit backfill predicate keeps them visible
    assert(merged.where(col("quality") > 0.5).count() == 1)
    assert(merged.where(col("quality") > 0.5 || col("quality").isNull).count() == 3)
    // partition pruning survives the merged read
    val p = old.queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*year[^\\]]*\\].*"),
      s"pruning lost under mergeSchema:\n$p")
  }

  test("z-order layout: a y-range query overlaps fewer files than an x-sorted layout") {
    // orders keyed by (custkey, order-day); the query filters on day
    // only. In a custkey-sorted layout every file spans all days; in a
    // z-sorted layout files are z-runs, so a day range touches a strict
    // subset. Measured via per-file min/max of the day column — exactly
    // the statistics parquet row-group/file skipping uses.
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), (col("o_custkey") % 65536).as("x"),
        (datediff(col("o_orderdate"), lit("1992-01-01")) % 65536).as("y"))
      .withColumn("z", ScaleOps.zValue(col("x"), col("y")))
    val root = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    o.repartitionByRange(16, col("x"), col("o_orderkey"))
      .sortWithinPartitions("x").write.parquet(s"$root/by_x")
    o.repartitionByRange(16, col("z"), col("o_orderkey"))
      .sortWithinPartitions("z").write.parquet(s"$root/by_z")
    def filesOverlapping(path: String, lo: Int, hi: Int): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min("y").as("ymin"), max("y").as("ymax"))
        .where(col("ymin") <= hi && col("ymax") >= lo)
        .count()
    // a ~100-day window in the middle of the observed date range
    val (lo, hi) = (2250, 2349)
    val xFiles = filesOverlapping(s"$root/by_x", lo, hi)
    val zFiles = filesOverlapping(s"$root/by_z", lo, hi)
    assert(xFiles >= 12, s"x-sorted layout should overlap nearly every file, got $xFiles")
    assert(zFiles * 2 <= xFiles, s"z-sorted should skip at least half of x-sorted's $xFiles, got $zFiles")
    // same rows either way — layout changes cost, never the answer
    val expected = o.where(col("y").between(lo, hi)).count()
    assert(spark.read.parquet(s"$root/by_z")
      .where(col("y").between(lo, hi)).count() == expected)
  }
}

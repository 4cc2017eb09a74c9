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

  /** The k bit positions of a key under double hashing: h1 + i·h2 mod m,
    * with h1/h2 both Column xxhash64 (different tuple shapes give
    * independent hashes). Build and probe share THIS function, so the
    * two sides cannot drift — the classic Bloom bug is hashing with two
    * slightly different implementations. */
  private def bloomBits(key: Column, nBits: Int, nHashes: Int): Seq[Column] = {
    // both hashes pre-reduced mod m so h1 + i·h2 stays far from Long
    // overflow (ANSI mode makes wrap-around a hard error, not silence);
    // h2 is forced into [1, m) — an h2 of 0 would collapse all k probes
    // onto h1, degrading that key's false-positive rate k-fold. The
    // [1, m) forcing divides by m-1, so m must be >= 2; note this hash
    // scheme (h2 mod (m-1) + 1) is part of the bit layout — a filter
    // bitset persisted under an older scheme cannot be probed by this
    // one (build+probe are in-process today).
    require(nBits >= 2, s"bloom filter needs nBits >= 2, got $nBits")
    val h1 = pmod(xxhash64(key), lit(nBits.toLong))
    val h2 = pmod(xxhash64(key, lit(0x9e3779b97f4a7c15L)), lit(nBits.toLong - 1)) + lit(1L)
    (0 until nHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(nBits.toLong)))
  }

  /** Distributively build a Bloom filter over a key column: explode each
    * key to its k bit positions, then a typed Aggregator whose buffer is
    * the bitset itself — partials OR-merge, so the driver receives one
    * nBits/8-byte array no matter how many keys (never a collect of the
    * key set). */
  def buildBloom(keys: DataFrame, keyCol: String,
                 nBits: Int = 1 << 20, nHashes: Int = 3): Array[Long] = {
    import keys.sparkSession.implicits._
    keys.select(explode(array(
      bloomBits(col(keyCol), nBits, nHashes): _*)).as("bit"))
      .as[Long]
      .select(new graft.functions.BitsetAggregator(nBits).toColumn)
      .head()
  }

  /** Pure-Column Bloom membership test against the built bit array —
    * codegen-friendly (literal arrays + bitwiseAND; no UDF), so the
    * predicate evaluates inside the probe side's scan stage. */
  def mightContain(key: Column, bits: Array[Long], nHashes: Int = 3): Column = {
    val nBits = bits.length * 64
    val words = typedLit(bits.toSeq)
    val masks = typedLit((0 until 64).map(b => 1L << b))
    bloomBits(key, nBits, nHashes).map { h =>
      element_at(words, (h / 64 + 1).cast("int"))
        .bitwiseAND(element_at(masks, (h % 64 + 1).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-pruned semi-join — the pre-shuffle filter for selective
    * joins: when the build side is too big to broadcast but its KEY SET
    * fits a few hundred KB of bitset, filter the fact side map-side
    * BEFORE its shuffle, then run the exact semi-join over the
    * survivors to kill false positives. Fact rows that would die in the
    * join never pay the exchange — at 100 TB that is the difference
    * between shuffling the corpus and shuffling the ~selectivity
    * fraction that can match. Result set provably equals the plain
    * semi-join (false positives are filtered by the exact join; false
    * negatives are impossible). */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
                    keysKey: String, nBits: Int = 1 << 20,
                    nHashes: Int = 3): DataFrame = {
    val bits = buildBloom(keys, keysKey, nBits, nHashes)
    fact.where(mightContain(col(factKey), bits, nHashes))
      .join(keys.select(col(keysKey).as(factKey + "__k")),
        col(factKey) === col(factKey + "__k"), "left_semi")
  }

  /** Spread the low 16 bits of a long so each lands at an even bit
    * position — the classic Morton magic-mask chain, pure codegen'd
    * Column arithmetic (no UDF). */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key of two 16-bit coordinates: bit-interleaved so
    * rows close in BOTH dimensions are close on the one sort key. This
    * is the multi-dimensional clustering lever a single-column sort
    * can't give: sort files by z and a range predicate on EITHER
    * dimension (or both) overlaps only the files whose z-run crosses
    * the query box, so parquet min/max stats skip the rest. A layout
    * sorted by x alone answers y-range queries by reading everything.
    * ScaleOpsSpec measures exactly that file-skipping difference; the
    * zo1 gate row pins the bit arithmetic value-for-value. */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast(org.apache.spark.sql.types.LongType))
      .bitwiseOR(shiftleft(spread16(b.cast(org.apache.spark.sql.types.LongType)), 1))

  /** The DuckDB twin of [[zValue]] — same mask chain, same literals. */
  def zValueSql(a: String, b: String): String = {
    def spread(e: String): String = {
      val s1 = s"(($e) & 65535)"
      val s2 = s"(($s1 | ($s1 << 8)) & 16711935)"
      val s3 = s"(($s2 | ($s2 << 4)) & 252645135)"
      val s4 = s"(($s3 | ($s3 << 2)) & 858993459)"
      s"(($s4 | ($s4 << 1)) & 1431655765)"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }
}

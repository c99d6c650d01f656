package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{BloomAgg, BloomContains, TopFreq}
import graft.text.TextFunctions

/** Frequency-sketch operators: SpaceSaving heavy hitters and
  * bloom-filter join pruning (functions/TopFreq.scala,
  * functions/BloomFilter.scala).
  */
object HeavyHitterQueries {

  /** Top-10 most frequent corpus tokens via the SpaceSaving summary.
    *
    * The aggregate keeps a fixed 4096-entry buffer per task and shuffles
    * ONE summary per partition — a groupBy-count + top-k shuffles one
    * row per distinct token per task instead, which grows with the
    * vocabulary (urls/ids/typos make it effectively unbounded at
    * 100 TB). Capacity 4096 exceeds the gate corpora's whitespace
    * vocabulary at every validated sf (sf0.1: ~31 tokens; sf1: ~310;
    * sf10's 100-replica corpus: 3100), so counts are exact (err = 0,
    * SpaceSaving never evicts) and the gate pins the result against
    * an exact GROUP BY oracle. This constant has now been caught
    * under-sized TWICE by scale-up validation — 64 by sf1 (round 4)
    * and 1024 by sf10 (round 5) — and both failures were the sketch
    * HONORING its published contract: at sf10 the measured
    * overestimate (+17.8k on a true count of 9182) sat inside the
    * N/m ≈ 27k SpaceSaving bound, and the true top-10 was a perfect
    * 100-way replica tie no capacity-bounded sketch can order. That
    * is the real lesson for 100 TB: exact-top-k-by-hash is a GATE
    * construct valid only while capacity >= distinct; production use
    * is the approximate regime with the N/m error bound (and the
    * streaming twin's spec pins that bound under eviction).
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TopFreq.ensureRegistered(spark)
    val summary = Tables.widened(Tables.documents(spark, dir))
      .filter(length(trim($"text")) > 0)
      .select(explode(TextFunctions.wsTokens($"text")).as("token"))
      .agg(expr("graft_topfreq(token, 4096)").as("hh"))
    summary
      .select(explode(slice($"hh", 1, 10)).as("e"))
      .select($"e.item".as("token"), $"e.cnt".as("cnt"))
      .orderBy($"cnt".desc, $"token")
  }

  /** Join pruned by an explicit bloom filter: orders is filtered by
    * membership of o_custkey in a bloom built over the BUILDING-segment
    * customers, then exactly joined — identical rows to the plain join
    * (no false negatives), with the fact-side shuffle already shed at
    * the scan.
    *
    * The build side is collected to the driver as ONE fixed-size byte
    * array (the aggregate's merged buffer — 128 KiB here), then shipped
    * as a literal into the probe's codegen'd scan filter: the same
    * broadcast-a-summary shape as AQE's runtime bloom, but available
    * when the dimension side is a computed set AQE can't see, and
    * reusable across queries. At 1M bits / ~3k build keys the FP rate
    * is ~1e-11 — the residual FPs are removed by the exact join that
    * follows, so correctness never depends on the filter.
    */
  def qBloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BloomAgg.ensureRegistered(spark)
    BloomContains.ensureRegistered(spark)

    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")

    val bloom: Array[Byte] = cust
      .agg(expr("graft_bloom_agg(xxhash64(c_custkey), 1048576)"))
      .head.getAs[Array[Byte]](0)

    val pruned = Tables.orders(spark, dir)
      .filter(call_function("graft_bloom_contains", lit(bloom), xxhash64($"o_custkey")))

    pruned.join(cust, pruned("o_custkey") === cust("c_custkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("sum_price"))
      .orderBy($"o_orderpriority")
  }
}

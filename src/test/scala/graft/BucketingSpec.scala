package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.io.GraftIO

/** Bucketed-table co-located joins — the SURVEY §4 claim "co-locate
  * joins via bucketing" as executable evidence: two tables bucketed on
  * the join key into the same bucket count join with ZERO exchanges,
  * and (when sorted) zero sorts. On a cluster this converts the
  * per-join fact-table shuffle into a one-time layout cost at ingest.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join of two tables bucketed on the key runs with no exchange and no sort") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    GraftIO.writeBucketed(Tables.orders(spark, sf), "b_orders", s"$dir/orders",
      Seq("o_orderkey"), 8, sortCols = Seq("o_orderkey"))
    GraftIO.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", s"$dir/lineitem",
      Seq("l_orderkey"), 8, sortCols = Seq("l_orderkey"))
    try {
      // disable broadcast + AQE so the co-location is what avoids the
      // shuffle, not a broadcast fallback or a runtime re-plan
      // outputOrdering: since 3.0 Spark distrusts bucket sortedness
      // (files within a bucket are sorted individually, so >1 file per
      // bucket breaks it); writeBucketed aligns to ONE file per bucket,
      // which is exactly the case where trusting it is sound
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q"))
        val s = joined.queryExecution.explainString(FormattedMode)
        val exchanges = s.linesIterator.count(_.matches("""^\(\d+\) Exchange.*"""))
        // exactly one exchange: the 5-row aggregate after the join;
        // the JOIN itself is exchange-free (bucket-pairwise)
        assert(exchanges == 1, s"expected only the post-join agg exchange:\n$s")
        assert(s.contains("SortMergeJoin"), s"expected a sort-merge join:\n$s")
        // sortBy at write time also removes the pre-merge sorts
        val sortsBeforeJoin = s.linesIterator
          .takeWhile(!_.matches("""^\(\d+\) SortMergeJoin.*"""))
          .count(_.matches("""^\(\d+\) Sort.*"""))
        assert(sortsBeforeJoin == 0, s"expected no pre-join sorts:\n$s")
        // and the result is right: same as the unbucketed join
        val expect = Tables.lineitem(spark, sf)
          .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got === expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed2").toString
    GraftIO.writeBucketed(Tables.orders(spark, sf), "b_orders_p", s"$dir/orders",
      Seq("o_orderkey"), 8)
    try {
      // a filter-only query has no operator needing the bucket
      // distribution, so autoBucketedScan would switch to a plain scan
      // — force the bucketed read to observe the pruning
      val s = withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        spark.table("b_orders_p").filter($"o_orderkey" === 7L)
          .queryExecution.explainString(FormattedMode)
      }
      assert(s.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$s")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_p")
  }
}

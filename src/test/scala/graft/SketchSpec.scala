package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Error-bound checks for the sketch aggregates: the gate can only
  * rows-check them (DuckDB's approximation algorithms differ), so the
  * accuracy contract lives here, asserted against the exact values.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct counts are within the configured 2% rsd (5% tolerance)") {
    val approx = Analytics.qSketchStats(spark, sf)
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (0.05 * e).toLong),
        s"$k: approx $a vs exact $e exceeds 5%")
    }
  }

  test("approximate percentiles land within rank tolerance of the exact quantile") {
    val approx = Analytics.qSketchStats(spark, sf)
      .select($"event_type", $"p50_approx", $"p95_approx")
      .as[(String, Double, Double)].collect()
    val values = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (k, p50, p95) =>
      val vs = values(k)
      def rankOf(x: Double): Double = vs.count(_ <= x).toDouble / vs.length
      // percentile_approx(accuracy=1000) guarantees rank error <= 1/1000;
      // allow 1% for the rounding the query applies to the value itself
      assert(math.abs(rankOf(p50) - 0.50) <= 0.01, s"$k p50=$p50 rank=${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.01, s"$k p95=$p95 rank=${rankOf(p95)}")
    }
  }

  test("sketch aggregation plans as a single partial-agg shuffle") {
    val s = Analytics.qSketchStats(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = s.linesIterator.count(_.matches("""^\(\d+\) Exchange.*"""))
    // one shuffle for the group-by (plus the output sort)
    assert(exchanges <= 2, s"unexpected extra shuffles:\n$s")
    assert(s.contains("ObjectHashAggregate") || s.contains("HashAggregate"),
      s"expected partial aggregation:\n$s")
  }
}

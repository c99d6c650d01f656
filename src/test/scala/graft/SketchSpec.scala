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
      // percentile_approx(accuracy=1000) guarantees rank error <=
      // 1/1000; the query then rounds the VALUE to 2 decimals, and on
      // a tie-dense distribution a 0.005 value shift can move rank
      // arbitrarily — so bound by VALUE against the exact quantile
      // values at p±1% rank, widened by the rounding quantum (ties in
      // rank terms would make this a data-dependent flake)
      def exactAt(p: Double): Double = vs(((vs.length - 1) * p).toInt)
      def check(label: String, a: Double, p: Double): Unit = {
        val (lo, hi) = (exactAt(p - 0.01) - 0.006, exactAt(p + 0.01) + 0.006)
        assert(a >= lo && a <= hi, s"$k $label=$a outside [$lo, $hi]")
      }
      check("p50", p50, 0.50)
      check("p95", p95, 0.95)
    }
  }

  test("vocab sketch: exact tf/top-100, df within tolerance, no pair-level distinct shuffle") {
    import spark.implicits._
    val exact = graft.operators.PipelineQueries.textVocab(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sketch = graft.operators.PipelineQueries.textVocabSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tf is exact in both variants, so the ranked (token, tf) lists
    // must be IDENTICAL — only df may differ
    assert(exact.map(t => (t._1, t._2)).toSeq === sketch.map(t => (t._1, t._2)).toSeq)
    val dfExact = exact.map(t => t._1 -> t._3).toMap
    sketch.foreach { case (tok, _, dfApprox) =>
      val e = dfExact(tok).toDouble
      assert(math.abs(dfApprox - e) <= math.max(1.0, 0.05 * e),
        s"df($tok): sketch $dfApprox vs exact $e beyond 5%")
    }
    // the scale point: the sketch plan must NOT contain the exact
    // variant's Expand/distinct pair stage — df aggregates into HLL
    // registers map-side
    val plan = graft.operators.PipelineQueries.textVocabSketch(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Expand"), s"pair-level distinct survived:\n$plan")
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

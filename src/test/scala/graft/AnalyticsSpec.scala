package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("all declared queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle has matching column names") {
    // Oracle compare sorts columns by name — a missing alias breaks the
    // hash even when values match. Guard the contract statically.
    SparkEntry.oracleSql.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"oracle $name has no query")
    }
  }

  test("q1 aggregates match a hand computation") {
    import spark.implicits._
    val rows = operators.Analytics.q1PricingSummary(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
    val expectTotal = li.count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == expectTotal)
    // 3 flags x 2 statuses at most
    assert(rows.length <= 6 && rows.length >= 1)
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = operators.Analytics.q3ShippingPriority(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q_window_top_customers has rank <= 3 per segment") {
    val rows = operators.Analytics.qWindowTopCustomers(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.values.foreach(rs => assert(rs.length <= 3))
    assert(rows.forall(_.getAs[Int]("rk") <= 3))
  }

  test("q_rollup_sales includes grand total row equal to full count") {
    val rows = operators.Analytics.qRollupSales(spark, sf).collect()
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length == 1)
    assert(total.head.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }
}

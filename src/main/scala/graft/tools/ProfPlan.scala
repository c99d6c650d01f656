package graft.tools

import graft.Harness

/** Scratch: plan shape of the column profiler — expect ONE parquet
  * scan and ONE Expand (the exact multi-distinct), nothing else. */
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val spark = Harness.buildSession(args(0), "8")
    val df = graft.Tables.orders(spark, args(0))
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields
    val aggs = count(lit(1)) +: fields.toSeq.flatMap { f =>
      val c = col(f.name)
      Seq(sum(when(c.isNull, 1L).otherwise(0L)), countDistinct(c), min(c), max(c))
    }
    df.agg(aggs.head, aggs.tail: _*).explain("formatted")
    spark.stop()
  }
}

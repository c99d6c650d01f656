package graft.tools

import org.apache.spark.sql.functions._

import graft.{Harness, Tables}

/** Phase diagnostic for io_profile_columns (4.1 s controlled at sf0.1
  * — unexamined since r7): attributes the cell between the Expand-based
  * multi-countDistinct plan and alternatives, each run REPEAT times
  * keeping the min. Not part of the library surface.
  *
  * Run: `runMain graft.tools.ProfileDiag <sfDir> [repeat]`
  */
object ProfileDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df = Tables.orders(spark, dir)
    val fields = df.schema.fields

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to repeat).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profdiag] $name%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // A: the shipped plan — one agg, 9 countDistinct => Expand x10
    time("A_full_current") {
      graft.operators.IoQueries.profileColumns(df).collect()
    }

    // A1: the big agg alone (no local-table tail)
    val aggsAll: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n_rows") +: fields.toSeq.flatMap { f =>
        val c = col(f.name)
        Seq(coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)),
          countDistinct(c), min(c), max(c))
      }
    time("A1_big_agg_only") { df.agg(aggsAll.head, aggsAll.tail: _*).collect() }

    // B: non-distinct aggregates only (no Expand) — the Expand cost is A1-B
    val aggsNd: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n_rows") +: fields.toSeq.flatMap { f =>
        val c = col(f.name)
        Seq(coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)), min(c), max(c))
      }
    time("B_nondistinct_only") { df.agg(aggsNd.head, aggsNd.tail: _*).collect() }

    // C: one countDistinct per column, sequential single-col scans
    time("C_distincts_sequential") {
      fields.foreach { f => df.select(col(f.name)).agg(countDistinct(col(f.name))).collect() }
    }

    // D: non-distinct agg + per-column distincts, all submitted
    // concurrently (guide 2.6): wall-clock = slowest job, not the sum
    time("D_concurrent") {
      import scala.concurrent._
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(java.util.concurrent.Executors.newFixedThreadPool(10))
      val jobs =
        Future(df.agg(aggsNd.head, aggsNd.tail: _*).collect()) +:
          fields.toSeq.map { f =>
            Future(df.select(col(f.name)).agg(countDistinct(col(f.name))).collect())
          }
      Await.result(Future.sequence(jobs), 600.seconds)
    }

    // E: per-partition pre-dedup then global: map-side distinct via
    // repartition-free two-level aggregate, one column
    time("E_one_distinct_okey") {
      df.select(col("o_orderkey")).agg(countDistinct(col("o_orderkey"))).collect()
    }
    time("E_one_distinct_comment") {
      df.select(col("o_comment")).agg(countDistinct(col("o_comment"))).collect()
    }

    spark.stop()
  }
}

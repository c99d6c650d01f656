package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.GraftIO

/** Measures what z-ordering actually buys: file-level min/max pruning
  * on BOTH clustered dimensions, vs a linear sort that only prunes its
  * leading column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Session clone whose range-exchange "sample" is the full dataset:
    * repartitionByRange boundaries are normally reservoir-sampled with
    * a seed derived from the RDD id — a session-global counter that
    * shifts with concurrent suites, jittering the written file
    * geometry (and once tipping `zOrder` from 12 to 13 under full-suite
    * load). With the sample size above the row count the boundaries
    * are exact equal-count splits, so the layout this spec measures is
    * identical on every run. Cloned so the setting can't race other
    * suites sharing the JVM-wide session. */
  private lazy val zspark: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", 1 << 20)
    s
  }

  // the per-file ranges come from the REAL index builder, so the
  // pruning measured here exercises the same stats readPruned uses
  private def fileRanges(path: String, a: String, b: String): DataFrame =
    GraftIO.buildStatsIndex(spark, path, Seq(a, b))
      .select(col("file"),
        col(s"min_$a").as("a_lo"), col(s"max_$a").as("a_hi"),
        col(s"min_$b").as("b_lo"), col(s"max_$b").as("b_hi"))

  /** Files whose [lo, hi] stats overlap [qLo, qHi] — the set a
    * stats-pruning reader must open. */
  private def overlapping(ranges: DataFrame, dim: String, qLo: Long, qHi: Long): Long =
    ranges.filter(col(s"${dim}_lo") <= qHi && col(s"${dim}_hi") >= qLo).count()

  test("z-order prunes both dimensions; linear sort only its own") {
    val li = Tables.lineitem(zspark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val nFiles = 16
    val base = Files.createTempDirectory("zorder").toString
    val zPath = s"$base/z"
    val linPath = s"$base/linear"

    GraftIO.writeZOrdered(li, zPath, Seq("l_orderkey", "l_partkey"), nFiles)
    li.repartitionByRange(nFiles, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.parquet(linPath)

    // roundtrip: clustering must not change the data
    val back = spark.read.parquet(zPath)
    assert(back.count() == li.count())
    assert(back.select(sum($"l_orderkey"), sum($"l_partkey")).first() ==
      li.select(sum($"l_orderkey"), sum($"l_partkey")).first())

    val zR = fileRanges(zPath, "l_orderkey", "l_partkey")
    val linR = fileRanges(linPath, "l_orderkey", "l_partkey")
    val zFiles = zR.count()
    assert(zFiles >= nFiles / 2, s"expected ~$nFiles z files, got $zFiles")

    // query windows: the middle ~1/16 of each dimension's range
    def window(c: String): (Long, Long) = {
      val r = li.agg(min(col(c)).cast("long"), max(col(c)).cast("long")).first()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val mid = (lo + hi) / 2
      val w = math.max(1L, (hi - lo) / 32)
      (mid - w, mid + w)
    }
    val (oLo, oHi) = window("l_orderkey")
    val (pLo, pHi) = window("l_partkey")

    val zOrder = overlapping(zR, "a", oLo, oHi)
    val zPart = overlapping(zR, "b", pLo, pHi)
    val linOrder = overlapping(linR, "a", oLo, oHi)
    val linPart = overlapping(linR, "b", pLo, pHi)

    // the linear layout is perfect on its own column and useless on the
    // other; z-order prunes BOTH (neither perfectly)
    assert(linOrder <= 3, s"linear layout should nail its own column, opened $linOrder")
    assert(linPart >= linR.count() * 9 / 10,
      s"linear layout should be useless on the non-sorted column, opened $linPart")
    assert(zOrder <= zFiles * 3 / 4, s"z-order should prune dim A: $zOrder of $zFiles")
    assert(zPart <= zFiles * 3 / 4, s"z-order should prune dim B: $zPart of $zFiles")
  }
}

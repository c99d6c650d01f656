package graft

import org.apache.spark.sql.functions._

import graft.operators.SampleQueries

/** Weighted sampling contracts: exact agreement with a driver-side
  * recomputation of the Efraimidis-Spirakis keys, and the
  * weight-proportional skew the scheme exists for. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  // the r11 sha-based draw, re-derived with ZERO Spark expressions:
  // first 13 hex chars of sha256(id-as-decimal-string), parsed as 52
  // bits — the same arithmetic the DuckDB oracle states
  private def u(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 13), 16) + 1.0) /
      (Math.pow(2, 52) + 2)
  }

  test("selection equals a driver-side recomputation of the ES keys") {
    val got = SampleQueries.qSampleWeighted(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (l, rs) => l -> rs.sortBy(_._2).map(_._3).toSeq }

    // the recompute mirrors the query's w > 0 domain filter (zero-mass
    // docs — empty or NULL text — are outside the ES scheme); a
    // null-safe coalesce keeps the typed collect from throwing on
    // NULL-text corpora
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        coalesce(length($"text").cast("long"), lit(0L)).as("w"))
      .as[(Long, String, Long)].collect()
      .filter(_._3 > 0)
    val expected = docs.groupBy(_._2).map { case (l, ds) =>
      l -> ds.map { case (id, _, w) => (id, math.pow(u(id), 1.0 / w)) }
        .sortBy { case (id, key) => (-key, id) }.take(5).map(_._1).toSeq
    }
    assert(got == expected)
  }

  test("longer documents are over-represented relative to uniform") {
    val meanAll = Tables.documents(spark, sf)
      .agg(avg(length($"text"))).first().getDouble(0)
    val meanSampled = SampleQueries.qSampleWeighted(spark, sf)
      .agg(avg($"weight")).first().getDouble(0)
    assert(meanSampled > meanAll,
      s"weighted sample mean length $meanSampled should exceed corpus mean $meanAll")
  }
}

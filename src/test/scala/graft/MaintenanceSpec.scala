package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, EventQueries, MaintenanceQueries}

/** Invariants for the round-4 maintenance/timeseries/edit-distance
  * operators that the hash gate can't express: interval consistency,
  * grid density, planted-pair recovery. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 history: intervals chain, at most one current version per key") {
    val h = MaintenanceQueries.ioScd2History(spark, sf)
      .select($"o_orderkey", $"version_seq", $"end_seq", $"is_current")
      .as[(Long, Long, Option[Long], Boolean)]
      .collect()
      .groupBy(_._1)
    assert(h.nonEmpty)
    h.foreach { case (key, versions) =>
      val sorted = versions.sortBy(_._2)
      // versions chain: each closed version ends exactly where history
      // recorded the key's next change
      sorted.foreach { case (_, seq, end, current) =>
        assert(end.forall(_ > seq), s"key $key: end_seq must follow version_seq")
        assert(current == end.isEmpty, s"key $key: is_current <=> open interval")
      }
      assert(sorted.count(_._4) <= 1, s"key $key: at most one current version")
    }
    // deleted keys (closed by a tombstone) have NO current version
    val deleted = h.filter { case (k, _) => k % 7 == 3 && k < 10000000 }
    assert(deleted.nonEmpty)
    deleted.foreach { case (key, versions) =>
      assert(!versions.exists(_._4), s"deleted key $key must have no current version")
    }
  }

  test("incremental aggregate merge equals direct recomputation in-engine") {
    val merged = MaintenanceQueries.qIncrementalAgg(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_price_cents"))
      .orderBy($"l_returnflag")
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("gap fill: grid is dense and fill conserves observed days") {
    val out = EventQueries.eventsGapFill(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val days = out.map(_._1)
    assert(days.max - days.min + 1 == days.length, "day summary has no holes")
    out.foreach { case (day, nUsers, nObserved, _) =>
      assert(nObserved <= nUsers, s"day $day: observed users bounded by grid users")
    }
    // total observed (user, day) cells must equal the raw daily cells
    val rawCells = Tables.events(spark, sf)
      .select($"user_id", expr("ts div 86400000000000").as("d")).distinct().count()
    assert(out.map(_._3).sum == rawCells)
  }

  test("edit-blocked dedup finds every planted two-substitution twin") {
    val pairs = DedupQueries.dedupEditBlocked(spark, sf)
      .as[(Long, Long, Long)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").as("len")).as[(Long, Int)].collect()
    docs.filter(_._2 >= 30).foreach { case (id, _) =>
      val d = byPair.get((id, id + 1000000L))
      assert(d.exists(_ <= 2), s"planted twin of doc $id must be found (dist <= 2)")
    }
  }
}

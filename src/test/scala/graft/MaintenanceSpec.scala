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

  test("as-of lookup covers every live key exactly once at the probe time") {
    // at seq 1 nothing is deleted yet (tombstones land at seq 2), so
    // the as-of state must hold exactly one version per key: all base
    // keys plus all synthetic new keys
    val nKeys = MaintenanceQueries.ioScd2Asof(spark, sf)
      .agg(sum($"n_keys")).first().getLong(0)
    val base = Tables.orders(spark, sf).select($"o_orderkey").distinct().count()
    val newKeys = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 11 === 0).select($"o_orderkey").distinct().count()
    assert(nKeys == base + newKeys, s"as-of state: $nKeys vs ${base + newKeys}")
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

  test("windowed dedup agrees with a driver-side keep-chain walk") {
    val out = operators.EventQueries.eventsDedupWindow(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val horizon = 3600L * 1000 * 1000 * 1000
    val expected = Tables.events(spark, sf)
      .select(($"event_id" % 1000).as("d"), $"ts", $"event_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (d, occs) =>
        var last = -2L * horizon; var n = 0L; var idSum = 0L
        occs.map(o => (o._2, o._3)).sorted.foreach { case (ts, id) =>
          if (ts - last > horizon) { last = ts; n += 1; idSum += id }
        }
        d -> (n, idSum)
      }
    assert(out == expected)
  }

  test("shard export: deterministic assignment, files round-trip, totals conserved") {
    val docs = Tables.documents(spark, sf)
    val assigned = operators.IoQueries.shardAssign(docs, 8)
    // assignment is a pure function of doc_id: recomputing gives the
    // same shard for every doc
    val twice = assigned.select($"doc_id", $"shard")
      .join(operators.IoQueries.shardAssign(docs, 8)
        .select($"doc_id", $"shard".as("shard2")), "doc_id")
    assert(twice.filter($"shard" =!= $"shard2").count() == 0)

    val base = java.nio.file.Files.createTempDirectory("shards").toString
    io.GraftIO.write(assigned, base, partitionBy = Seq("shard"))
    val back = spark.read.parquet(base)
    assert(back.count() == docs.count())
    assert(back.select(sum($"doc_id")).first().getLong(0) ==
      docs.select(sum($"doc_id")).first().getLong(0))
    // every shard directory exists (hash spreading over small n)
    assert(back.select($"shard").distinct().count() == 8)
  }

  test("edit-blocked dedup finds every planted two-substitution twin") {
    val pairs = DedupQueries.dedupEditBlocked(spark, sf)
      .as[(Long, Long, Long)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").as("len")).as[(Long, Int)].collect()
    docs.filter(_._2 >= 30).foreach { case (id, _) =>
      val d = byPair.get((id, id + 1000000000L))
      assert(d.exists(_ <= 2), s"planted twin of doc $id must be found (dist <= 2)")
    }
  }

  test("snapshot diff classifies exactly the mutated doc_ids") {
    val got = operators.MaintenanceQueries.ioSnapshotDiff(spark, sf)
      .as[(Long, String)].collect().toMap
    val ids = Tables.documents(spark, sf).select($"doc_id").as[Long].collect()
    val expected =
      ids.filter(_ % 17 == 3).map(_ -> "removed") ++
      ids.filter(_ % 17 == 5).map(_ -> "changed") ++
      ids.filter(_ % 17 == 7).map(id => (-id - 1L) -> "added")
    assert(got == expected.toMap)
    // unchanged docs never appear
    assert(!got.keySet.exists(id => id >= 0 && id % 17 != 3 && id % 17 != 5))
  }
}

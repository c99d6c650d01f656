package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Long-lived-dataset maintenance operators: the jobs that keep a
  * 100 TB warehouse consistent as change batches arrive — slowly-
  * changing-dimension history and incremental materialized-aggregate
  * maintenance. Complements `GraftIO.compact` (file maintenance) and
  * `Merge.upsert` (latest-state CDC apply, io_merge_upsert): upsert
  * answers "what is the current row", SCD2 answers "what was the row
  * at change k", and the incremental aggregate answers "refresh the
  * rollup without rescanning the base".
  *
  * Both operators are pure key-shuffle plans: the SCD2 window
  * partitions on the business key (cardinality scales with the data),
  * and the aggregate merge shuffles only per-group partial states —
  * never the base table.
  */
object MaintenanceQueries {

  /** The io_merge_upsert change feed, restated once so the SCD2 gate
    * derives its versions from the same synthetic CDC stream: base
    * rows arrive as inserts at seq 0; every key % 5 == 0 gets a price
    * update at seq 1; every key % 7 == 3 a delete at seq 2; every key
    * % 11 == 0 spawns a brand-new key at seq 1. Prices are carried as
    * exact cents (round-half-up of price*100, identical in DuckDB). */
  private def changeLog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("long").as("price_cents"))
    // new synthetic keys must sit strictly above EVERY real key — a
    // fixed offset would collide at a large-enough sf, producing
    // duplicate (key, seq) rows and a nondeterministic lead(). One
    // scalar aggregate (scan planning-scale, not data movement).
    // max() is NULL on an empty base — fall through to 0 so a
    // zero-row input yields a zero-row change log instead of a
    // driver-side getLong crash.
    val maxKey = base.agg(max($"o_orderkey")).first()
    val newKeyBase = (if (maxKey.isNullAt(0)) -1L else maxKey.getLong(0)) + 1L
    val inserts = base.select($"o_orderkey", lit("I").as("op"), lit(0L).as("seq"),
      $"o_orderstatus", $"price_cents")
    val updates = base.filter($"o_orderkey" % 5 === 0)
      .select($"o_orderkey", lit("U").as("op"), lit(1L).as("seq"),
        $"o_orderstatus", ($"price_cents" + 10000L).as("price_cents"))
    val deletes = base.filter($"o_orderkey" % 7 === 3)
      .select($"o_orderkey", lit("D").as("op"), lit(2L).as("seq"),
        $"o_orderstatus", $"price_cents")
    val newKeys = base.filter($"o_orderkey" % 11 === 0)
      .select(($"o_orderkey" + newKeyBase).as("o_orderkey"), lit("I").as("op"),
        lit(1L).as("seq"), lit("N").as("o_orderstatus"), lit(100L).as("price_cents"))
    inserts.unionByName(updates).unionByName(deletes).unionByName(newKeys)
  }

  /** THE SCD2 interval derivation, shared by the history build and the
    * as-of read so the two cannot diverge: every change (tombstones
    * included) closes its predecessor via lead(seq) over the business
    * key; a version is a NON-delete change carrying its own seq and
    * the closing end_seq (null = open). */
  private def versions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byKey = Window.partitionBy($"o_orderkey").orderBy($"seq")
    changeLog(spark, dir)
      .withColumn("end_seq", lead($"seq", 1).over(byKey))
      .withColumn("n_changes", count(lit(1)).over(Window.partitionBy($"o_orderkey")))
      .filter($"op" =!= "D") // tombstones close history, they are not versions
  }

  /** SCD type-2 history build: every non-delete change opens a version
    * effective at its own seq and closed by the NEXT change on the key
    * (update or delete alike — a tombstone closes the last version by
    * supplying its end_seq, so `is_current` = open interval is exact
    * without inspecting the closing op). One window over the business key —
    * the key's change count is bounded (a handful of CDC batches), so
    * per-partition state stays tiny at any corpus size.
    *
    * Output is restricted to keys with more than one change row — the
    * keys whose history is non-trivial — keeping the gate result
    * focused (the single-version majority is pure insert passthrough).
    */
  def ioScd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    versions(spark, dir)
      .filter($"n_changes" >= 2)
      .select($"o_orderkey",
        $"seq".as("version_seq"),
        $"end_seq",
        $"o_orderstatus",
        $"price_cents",
        ($"end_seq".isNull).as("is_current"))
      .orderBy($"o_orderkey", $"version_seq")
  }

  /** Point-in-time (AS OF) lookup over the SCD2 history — the read
    * side of slowly-changing dimensions: the state of every key as of
    * change seq 1 is the version whose validity interval contains it
    * (version_seq <= t < end_seq, open end = ∞). Runs on the FULL
    * history (no n_changes gate — single-version keys are part of the
    * world state), one interval filter + aggregate; the aggregate by
    * status keeps the gate result compact while the hash still covers
    * every key's resolved version via the sums. */
  def ioScd2Asof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asOfSeq = 1L
    versions(spark, dir)
      .filter($"seq" <= asOfSeq &&
        ($"end_seq".isNull || $"end_seq" > asOfSeq))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_keys"),
        sum($"o_orderkey").as("sum_key"),
        sum($"price_cents").as("sum_price_cents"))
      .orderBy($"o_orderstatus")
  }

  /** Incremental materialized-aggregate maintenance: the rollup
    * (count, sum) by l_returnflag is refreshed by AGGREGATING ONLY THE
    * DELTA and merging partial states with the stored snapshot —
    * sum-of-sums and sum-of-counts — never rescanning the base. The
    * gate splits lineitem into a base (12/13) and a delta batch (1/13),
    * maintains the view, and the oracle recomputes from scratch over
    * the whole table: a hash match IS the proof that the merge algebra
    * equals recomputation. Money is summed in exact cents so the
    * equality is bit-exact, not float-lucky. */
  def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def partialAgg(df: DataFrame): DataFrame =
      df.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity").cast("long").as("sum_qty"),
          sum(round(graft.functions.Guards.finiteOrNull($"l_extendedprice") * 100)
            .cast("long")).as("sum_price_cents"))

    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
    val snapshot = partialAgg(li.filter($"l_orderkey" % 13 =!= 5))
    val deltaAgg = partialAgg(li.filter($"l_orderkey" % 13 === 5))

    snapshot.unionByName(deltaAgg)
      .groupBy($"l_returnflag")
      .agg(sum($"n").as("n"),
        sum($"sum_qty").as("sum_qty"),
        sum($"sum_price_cents").as("sum_price_cents"))
      .orderBy($"l_returnflag")
  }

  /** Crawl-snapshot diff: which documents were added, removed, or
    * changed between two corpus snapshots — the planning step of every
    * incremental pipeline (recrawl ingestion, incremental dedup,
    * freshness tracking): downstream stages re-process only the diff,
    * never the unchanged bulk.
    *
    * Snapshot B is derived deterministically from the documents table
    * (so both engines construct the identical pair): doc_id % 17 == 3
    * vanishes (removed), % 17 == 5 gets ' v2' appended (changed),
    * % 17 == 7 additionally re-appears under -doc_id - 1 (added) —
    * negated ids are disjoint from the non-negative real id space at
    * ANY corpus size (an additive offset would collide once the corpus
    * outgrew it, silently fanning out the join).
    *
    * Plan at 100 TB: both sides reduce to (doc_id, md5(text)) AT THE
    * SCAN — the diff join shuffles 32-byte digests co-partitioned on
    * doc_id, never document payloads (the dedup_exact discipline), and
    * a full outer join classifies each key in one pass. Output is only
    * the non-identical keys (the diff is small by nature; emitting
    * "unchanged" rows would make the output linear in the corpus). */
  def ioSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.documents(spark, dir)
      .select($"doc_id", md5($"text").as("dig"))
    val docs = Tables.documents(spark, dir)
    val b = docs.filter($"doc_id" % 17 =!= 3)
      .select($"doc_id",
        when($"doc_id" % 17 === 5, concat($"text", lit(" v2"))).otherwise($"text").as("text"))
      .union(docs.filter($"doc_id" % 17 === 7)
        .select((-$"doc_id" - 1).cast("long").as("doc_id"), $"text"))
      .select($"doc_id", md5($"text").as("dig"))

    a.as("a").join(b.as("b"), $"a.doc_id" === $"b.doc_id", "full_outer")
      .select(coalesce($"a.doc_id", $"b.doc_id").as("doc_id"),
        when($"a.doc_id".isNull, lit("added"))
          .when($"b.doc_id".isNull, lit("removed"))
          .when($"a.dig" =!= $"b.dig", lit("changed")).as("status"))
      .filter($"status".isNotNull)
      .orderBy($"doc_id")
  }
}

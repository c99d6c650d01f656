package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed merge (CDC upsert/delete) of a change batch into a base
  * table — the maintenance operation behind every long-lived dataset:
  * nightly corrections, GDPR deletes, late-arriving rows.
  *
  * Semantics (per key):
  *   - change op `"D"`      → key removed from the result
  *   - change op `"I"`/`"U"` → change row replaces (or adds) the key
  *   - no change            → base row passes through
  * Multiple changes for one key are resolved by `seqCol` (highest
  * sequence wins), so a same-batch insert-then-delete lands as a
  * delete — replaying a CDC stream in one merge is well-defined.
  *
  * Plan shape at 100 TB: ONE anti-join of base against the change
  * keys plus a union with the surviving changes. The change batch is
  * small relative to base (a day's CDC vs the full corpus), so AQE
  * broadcasts it and base is NEVER shuffled; with a huge batch the
  * anti-join degrades gracefully to a key-shuffle join. No window
  * over base, no full rewrite logic here — callers rewrite only the
  * partitions the merge touched.
  */
object Merge {

  /** @param base    current table state
    * @param changes change batch: base's columns plus `opCol` and
    *                (optionally) `seqCol`
    * @param keys    merge key columns (present in both inputs)
    * @param opCol   change-type column: "I"/"U" upsert, "D" delete
    * @param seqCol  ordering column resolving multiple changes per
    *                key (highest wins); None asserts at most one
    *                change per key (unchecked — resolution would need
    *                the same aggregate the caller is avoiding)
    */
  def merge(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "merge: at least one key column required")
    val dataCols = base.columns.filterNot(keys.contains)
    val keyCols: Seq[Column] = keys.map(col)

    val latest = seqCol match {
      case Some(seq) =>
        // max_by on a (seq, op, data...) struct: a single partial-agg
        // shuffle of the (small) batch; struct comparison makes the
        // winner total even under duplicate sequence numbers
        val payload = struct((col(seq) +: col(opCol) +: dataCols.map(col)): _*)
        changes.groupBy(keyCols: _*)
          .agg(max(payload).as("w"))
          .select((keyCols :+ col(s"w.$opCol").as(opCol))
            ++ dataCols.map(c => col(s"w.$c").as(c)): _*)
      case None => changes.select((keyCols :+ col(opCol)) ++ dataCols.map(col): _*)
    }

    val untouched = base.join(latest.select(keyCols: _*), keys, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").drop(opCol)
    untouched.unionByName(upserts)
  }
}

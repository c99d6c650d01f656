package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-match) join — the time-series operator Spark has
  * no built-in for (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Backward semantics: for each left row, attach the right row with the
  * LARGEST right-time <= left-time among rows sharing the join key
  * (inclusive); `forward` attaches the SMALLEST right-time >= left-time.
  * Unmatched left rows keep a NULL match struct (left-outer).
  *
  * Spark-first plan — NOT a range join: both sides are tagged and
  * unioned, shuffled ONCE on the key, and sorted within each key
  * partition by (time, side) so a running `last(matchStruct, ignoreNulls)`
  * window carries the latest right payload forward onto every left row.
  * Cost is one shuffle + one sort — the same O(n log n) a SortMergeJoin
  * would pay — while an inequality-join formulation would explode to
  * O(left × right) per key and a per-key `groupBy(max)` would shuffle
  * twice. Right rows sort BEFORE left rows at equal times, which is what
  * makes the bound inclusive. At 100 TB the key (e.g. user) scales with
  * the data, so the shuffle stays uniform; a hot key costs one large
  * sort partition, not a cross product.
  *
  * Requirements: the two time columns must already share a comparable
  * type (they meet in a union); with `tolerance` they must be numeric
  * (epoch nanos recommended). Right rows with a NULL key or time are
  * dropped (SQL semantics: they can match nothing); left rows with NULL
  * key/time come back unmatched.
  */
object AsofJoin {

  /** @param rightAlias name of the output struct column carrying the
    *                   matched right row (NULL when unmatched)
    * @param tolerance  max |left-time − right-time| for a match to
    *                   stand, in the time columns' own units
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightAlias: String = "matched",
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKey, leftTime, rightKey, rightTime, rightAlias, tolerance,
      forwardDir = false)

  /** Earliest right row at-or-after the left time (symmetric twin). */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightAlias: String = "matched",
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKey, leftTime, rightKey, rightTime, rightAlias, tolerance,
      forwardDir = true)

  private def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightAlias: String, tolerance: Option[Long],
      forwardDir: Boolean): DataFrame = {
    val reserved = Set("__k", "__t", "__side", "__l", "__r", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty, s"input columns collide with AsofJoin internals: ${clash.mkString(", ")}")
    require(!left.columns.contains(rightAlias),
      s"rightAlias '$rightAlias' collides with a left column; pass a different alias")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)

    val lt = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rt = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(right.columns.map(col).toSeq: _*).as("__r"))

    // ascending time for backward, descending for forward: either way
    // the right row "seen most recently" by the running window is the
    // direction's best match, and side 0 < 1 keeps equal times inclusive.
    // NULL left times sort FIRST in both directions so they precede
    // every right row and come back unmatched, per the contract.
    val timeOrd: Column = if (forwardDir) col("__t").desc_nulls_first else col("__t").asc_nulls_first
    val w = Window.partitionBy(col("__k")).orderBy(timeOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lt.unionByName(rt)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = tolerance match {
      case Some(tol) =>
        val age =
          if (forwardDir) col("__m").getField(rightTime) - col("__t")
          else col("__t") - col("__m").getField(rightTime)
        matched.withColumn("__m", when(age <= tol, col("__m")))
      case None => matched
    }
    bounded.select(col("__l.*"), col("__m").as(rightAlias))
  }
}

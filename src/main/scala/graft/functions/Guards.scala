package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column guards for corrupt-measurement tolerance. */
object Guards {

  /** NaN/±Infinity → NULL, finite values unchanged. The quantization
    * boundary every money/metric aggregate uses (`round(v*100)
    * .cast("long")`) is an ANSI CAST_OVERFLOW on a non-finite double —
    * one corrupt sensor value would kill a 100 TB job mid-stage.
    * Mapping to NULL instead routes the row through the aggregates'
    * standard null-skip semantics (it drops from sums and counts of
    * the value, not from row counts), which is the documented posture
    * for measurement garbage — loud failure stays reserved for
    * genuine finite-value overflow, which ANSI still catches. No-op
    * on finite data. */
  def finiteOrNull(c: Column): Column =
    when(isnan(c) || abs(c) > lit(Double.MaxValue), lit(null)).otherwise(c)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for extreme key skew.
  *
  * AQE's skew-join splitting handles most skew at runtime, but it only
  * splits PARTITIONS of a sort-merge join — a single key hot enough to
  * dwarf one task (the celebrity-user / null-key / default-value
  * pattern at 100 TB) still lands every row on one core, and
  * aggregation-over-join pipelines can't always take the AQE path.
  * Salting re-keys the join explicitly: the skewed (big) side gets a
  * deterministic salt in [0, salt), the small side is replicated once
  * per salt value, and the join key becomes (key, salt) — the hot key
  * spreads over `salt` tasks at the cost of replicating the small side
  * `salt` times.
  *
  * The salt is a HASH OF THE BIG SIDE'S ROW (all columns), not a
  * random number: task retries recompute identical salts, so no row
  * can be duplicated or lost under speculative execution — the same
  * determinism argument as GraftIO's chunk routing.
  */
object SaltedJoin {

  /** Inner-join `big` to `small` on `bigKey === smallKey`, salted.
    * Column names must not collide across the frames (as with any
    * Spark join by expression). `salt` trades hot-key spread against
    * small-side replication — 8-32 covers most real skew.
    *
    * `saltExpr` defaults to a hash of the big side's row. CAVEAT: if
    * the hot rows are BYTE-IDENTICAL (the repeated-sentinel pattern),
    * identical rows hash to the same salt and still pile onto one
    * task — pass a distinguishing deterministic expression instead
    * (a source row id / offset column). A random salt would spread
    * them but breaks retry determinism: a recomputed partition would
    * re-salt rows differently, duplicating or dropping matches. */
  def join(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      salt: Int = 16,
      saltExpr: Option[Column] = None): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "a column named __salt already exists; rename it before salting")
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val sd = saltExpr.getOrElse(xxhash64(bigCols: _*))
    val b = big.withColumn("__salt", pmod(sd, lit(salt.toLong)))
    val s = small.withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    b.join(s, b("__salt") === s("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}

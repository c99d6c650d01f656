package graft.tools

import org.apache.spark.sql.SparkSession

/** Compares two Verify output trees (e.g. a `local[32]` run and a
  * `local-cluster[4,8,...]` run) query by query as MULTISETS — the
  * cross-master half of the correctness story: the gate proves each
  * query against DuckDB in one JVM; this proves the same plans survive
  * real executor-boundary serialization (closure/broadcast/custom-
  * aggregate-buffer serde, netty shuffle, executor-side codegen) by
  * demanding bit-identical row multisets from a multi-process run.
  *
  * Multiset equality via two-sided `exceptAll` — order-insensitive on
  * purpose (replicated masters reorder partitions), exact on values
  * (every gate query already rounds/quantizes any float it emits, so
  * partitioning-order float drift would be a REAL finding, not noise).
  *
  * Exit code = number of mismatching queries; one line per query.
  */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def queryDirs(root: String): Set[String] =
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSet

    val names = queryDirs(dirA)
    val missing = names.diff(queryDirs(dirB)) ++ queryDirs(dirB).diff(names)
    var bad = missing.size
    missing.toSeq.sorted.foreach(n => println(s"MISSING $n (present on one side only)"))

    names.intersect(queryDirs(dirB)).toSeq.sorted.foreach { n =>
      val a = spark.read.parquet(s"$dirA/$n")
      val b = spark.read.parquet(s"$dirB/$n")
      val schemaA = a.schema.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
      val schemaB = b.schema.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
      if (schemaA != schemaB) {
        bad += 1
        println(s"SCHEMA-DIFF $n: $schemaA vs $schemaB")
      } else {
        // align column order before exceptAll (it is positional)
        val cols = schemaA.map(_._1).map(a.col)
        val aa = a.select(cols: _*)
        val bb = b.select(schemaA.map(_._1).map(b.col): _*)
        val onlyA = aa.exceptAll(bb).count()
        val onlyB = bb.exceptAll(aa).count()
        if (onlyA == 0 && onlyB == 0) println(s"OK $n (${aa.count()} rows)")
        else { bad += 1; println(s"ROW-DIFF $n: $onlyA rows only in A, $onlyB only in B") }
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(bad)
  }
}

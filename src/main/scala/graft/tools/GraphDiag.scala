package graft.tools

import org.apache.spark.sql.functions._

import graft.{Harness, Tables}

/** Scratch diagnostic: what does graph_pagerank's edge cache actually
  * cost in storage bytes under each layout? Builds the undirected
  * edge frame three ways — the pre-r7 layout (long keys, unsorted),
  * keys narrowed to int, and int + sortWithinPartitions(src) (the
  * production layout since r7) — materializes each cache and prints
  * the MemoryStore/DiskStore block totals, so the BASELINE.md claim
  * about the bytes diet is a measurement, not an estimate. Not part
  * of the library surface. */
object GraphDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def e0(keyType: String) = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).cast(keyType).as("src"),
        ($"l_suppkey" * 2 + 1).cast(keyType).as("dst"))
      .distinct()
      .select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("e"))
      .select($"e.src", $"e.dst")

    def measure(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = cached.count()
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum
      val disk = infos.map(_.diskSize).sum
      println(f"[diag] $tag rows=$n mem=${mem / 1e6}%.1f MB disk=${disk / 1e6}%.1f MB " +
        f"bytes_per_row=${(mem + disk).toDouble / n}%.2f")
      cached.unpersist(blocking = true)
    }

    measure("long_unsorted", e0("bigint").repartition($"src"))
    measure("int_unsorted", e0("int").repartition($"src"))
    measure("int_sorted", e0("int").repartition($"src").sortWithinPartitions($"src"))
    spark.stop()
  }
}

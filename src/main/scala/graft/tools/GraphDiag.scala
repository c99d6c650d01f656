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
  /** graphPagerank's distinct (src, dst) pair build, keyType-parameterized
    * — ONE definition shared by both diag modes so a change to the edge
    * construction cannot leave the diag measuring a stale layout. */
  private def pairs(spark: org.apache.spark.sql.SparkSession, dir: String, keyType: String) = {
    import spark.implicits._
    Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).cast(keyType).as("src"),
        ($"l_suppkey" * 2 + 1).cast(keyType).as("dst"))
      .distinct()
  }

  /** Both orientations exploded from one pass, same as production. */
  private def exploded(df: org.apache.spark.sql.DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("e"))
      .select($"e.src", $"e.dst")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

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

    if (args.length > 1 && args(1) == "rounds") rounds(spark, dir)
    else {
      measure("long_unsorted", exploded(pairs(spark, dir, "bigint")).repartition($"src"))
      measure("int_unsorted", exploded(pairs(spark, dir, "int")).repartition($"src"))
      measure("int_sorted",
        exploded(pairs(spark, dir, "int")).repartition($"src").sortWithinPartitions($"src"))
    }
    spark.stop()
  }

  /** `rounds` mode: replays graphPagerank's exact loop with a
    * per-round tap — edge-cache memory/disk split after
    * materialization (does the cache FIT storage memory, or is the
    * "all rounds re-read from disk" attribution real?), per-round
    * wall time, and per-round shuffle/spill byte totals from a stage
    * listener. Key width comes from the same production probe
    * (GraphQueries.pagerankKeyType) and checkpointing follows the
    * same gate + per-round deletion as production, so the replay is
    * plan-for-plan and cost-for-cost. This exists to turn
    * BASELINE.md's sf100 residual attribution into a measurement. */
  private def rounds(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import spark.implicits._
    // ONE threshold drives BOTH the edge-cache layout probe and the
    // checkpoint gate, exactly as graphPagerank threads its
    // ckptMinEdges into pagerankSortedLayout — a replay of a
    // custom-threshold run (SPARK_GRAFT_CKPT_MIN_EDGES) must pick the
    // same layout, or the diag measures a plan production never ran
    val ckptMinEdges = sys.env.get("SPARK_GRAFT_CKPT_MIN_EDGES").map(_.toLong)
      .getOrElse(graft.operators.GraphQueries.PagerankCheckpointMinEdges)
    // stage-metrics tap + settle-then-reset drain shared with CellDiag
    // (tools.MetricsDrain — ONE definition of the settle heuristic and
    // the metric set; the round-9 review caught the drifting copies)
    val metrics = new MetricsDrain(spark)
    def drain(tag: String, t0: Long): Unit = metrics.drain(tag, t0)

    val sc = spark.sparkContext
    sc.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_prdiag_ckpt").toString)
    def deleteCheckpoint(file: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(file)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
    var t0 = System.nanoTime()
    val keyType = graft.operators.GraphQueries.pagerankKeyType(spark, dir)
    val sorted = graft.operators.GraphQueries.pagerankSortedLayout(spark, dir, ckptMinEdges)
    println(s"[diag] keyType=$keyType sortedLayout=$sorted")
    val hashed = exploded(pairs(spark, dir, keyType)).repartition($"src")
    val edges = (if (sorted) hashed.sortWithinPartitions($"src") else hashed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeCount = edges.count()
    val info = spark.sparkContext.getRDDStorageInfo
    val mem = info.map(_.memSize).sum; val disk = info.map(_.diskSize).sum
    println(f"[diag] edges rows=$edgeCount mem=${mem / 1e9}%.2f GB disk=${disk / 1e9}%.2f GB " +
      f"bytes_per_row=${(mem + disk).toDouble / edgeCount}%.2f " +
      f"cached_in_memory=${disk == 0L}")
    drain("build", t0)

    t0 = System.nanoTime()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.count()
    drain("deg", t0)

    // same gate as production: below the threshold graphPagerank runs
    // un-checkpointed rounds, and the diag must measure that plan
    val checkpointRounds = edgeCount >= ckptMinEdges
    println(s"[diag] checkpointRounds=$checkpointRounds")
    var prevCheckpoint: Option[String] = None
    var ranks = edges.select($"src".as("id")).distinct()
      .select($"id", lit(1000000L).as("r"))
    (1 to 5).foreach { i =>
      t0 = System.nanoTime()
      val contribs = ranks.withColumnRenamed("id", "src")
        .join(deg.hint("shuffle_hash"), "src")
        .select($"src", expr("r div outdeg").as("c"))
      ranks = edges
        .join(contribs.hint("shuffle_hash"), "src")
        .groupBy($"dst".as("id"))
        .agg(sum($"c").as("s"))
        .select($"id", (lit(150000L) + expr("(85 * s) div 100")).as("r"))
      if (checkpointRounds) {
        val cached = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val next = cached.checkpoint()
        cached.unpersist()
        prevCheckpoint.foreach(deleteCheckpoint)
        prevCheckpoint = graft.similarity.ConnectedComponents.checkpointFileOf(
          next.queryExecution.toRdd)
        ranks = next
      }
      val i2 = spark.sparkContext.getRDDStorageInfo
      val em = i2.map(_.memSize).sum; val ed = i2.map(_.diskSize).sum
      drain(s"round$i", t0)
      println(f"[diag] round$i storage now mem=${em / 1e9}%.2f GB disk=${ed / 1e9}%.2f GB")
      System.gc()
    }
    t0 = System.nanoTime()
    println("[diag] top1=" + ranks.orderBy($"r".desc, $"id").limit(1).collect().mkString)
    drain("topn", t0)
    edges.unpersist(); deg.unpersist()
    prevCheckpoint.foreach(deleteCheckpoint)
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{Harness, Tables}

/** Phase-level diagnostic for the two round-9 heavy cells that
  * reproduced super-linear decades in matched isolated runs
  * (io_dsv_roundtrip, text_lm_score): splits each query into its
  * phases and taps per-phase shuffle/spill bytes via [[MetricsDrain]],
  * so the decade residual gets attributed to a PHASE and a RESOURCE
  * instead of argued about. Phase plans MIRROR the production queries
  * exactly (the dsv mode reuses ioDsvRoundtrip's conditional chunking
  * — a diag measuring a plan production no longer runs adjudicates
  * nothing, the GraphDiag lesson). Not part of the library surface.
  *
  * Run: `runMain graft.tools.CellDiag <dsv|lm> <sfDir>`
  */
object CellDiag {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val drain = new MetricsDrain(spark)

    mode match {
      case "dsv" =>
        val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag")
        val li = Tables.lineitem(spark, dir).select(cols.map(col): _*)
        val out = s"/tmp/graft_celldiag_dsv_${math.abs(dir.hashCode)}"
        // SAME conditional chunking as production ioDsvRoundtrip:
        // repartition to one gzip member per core only when the scan
        // has fewer splits than cores
        val cores = spark.sparkContext.defaultParallelism
        val chunks = if (li.rdd.getNumPartitions >= cores) 0 else cores
        println(s"[diag] chunks=$chunks scanParts=${li.rdd.getNumPartitions}")
        var t0 = System.nanoTime()
        graft.io.GraftIO.write(li, out, graft.io.GraftIO.Dsv, gzip = true, sep = "|",
          chunks = chunks)
        drain.drain("write", t0)
        t0 = System.nanoTime()
        val agg = graft.io.GraftIO.read(spark, out, graft.io.GraftIO.Dsv,
            sep = "|", schema = Some(li.schema))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_price"),
            sum($"l_orderkey").as("sum_okey"), sum($"l_partkey").as("sum_pkey"))
        agg.collect()
        drain.drain("read_agg", t0)
      case "lm" =>
        // phase split mirrors textLmScore exactly
        val docGrams = graft.operators.CorpusQueries
          .bigramInstances(Tables.widened(Tables.documents(spark, dir)))
          .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var t0 = System.nanoTime()
        docGrams.count()
        drain.drain("doc_grams", t0)
        t0 = System.nanoTime()
        val model = graft.operators.CorpusQueries
          .lmBigramModelFromCounts(docGrams.groupBy($"g").agg(sum($"cnt").as("c2")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        model.count()
        drain.drain("model", t0)
        t0 = System.nanoTime()
        docGrams.join(model, "g")
          .groupBy($"doc_id")
          .agg(sum($"cnt").as("n_bigrams"), sum($"cnt" * $"bp").as("sum_bp"))
          .select($"doc_id", $"n_bigrams", $"sum_bp",
            floor($"sum_bp" / $"n_bigrams").cast("long").as("avg_bp"))
          .write.format("noop").mode("overwrite").save()
        drain.drain("score_join", t0)
        docGrams.unpersist(); model.unpersist()
      case "zstats" =>
        // phase split mirrors ioStatsPruneScan exactly (r12: the cell
        // ran at EXACTLY 1.00x between 8 and 32 cores — attribute the
        // core-count-independent term)
        val li = Tables.lineitem(spark, dir)
          .select($"l_orderkey", $"l_partkey", $"l_quantity", $"l_returnflag")
        val out = s"/tmp/graft_celldiag_zstats_${math.abs(dir.hashCode)}"
        val files = math.max(16, li.rdd.getNumPartitions / 2)
        println(s"[diag] files=$files scanParts=${li.rdd.getNumPartitions}")
        var t0 = System.nanoTime()
        graft.io.GraftIO.writeZOrdered(li, out,
          Seq("l_orderkey", "l_partkey"), files = files)
        drain.drain("zorder_write", t0)
        t0 = System.nanoTime()
        val index = graft.io.GraftIO.buildStatsIndex(
          spark, out, Seq("l_orderkey", "l_partkey"))
        drain.drain("stats_index", t0)
        t0 = System.nanoTime()
        val r = index.agg(min($"min_l_partkey").cast("long"),
          max($"max_l_partkey").cast("long")).first()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val (qLo, qHi) = (lo + (hi - lo) * 2 / 5, lo + (hi - lo) * 3 / 5)
        drain.drain("range_bounds", t0)
        t0 = System.nanoTime()
        graft.io.GraftIO.readPruned(spark, index, "l_partkey", qLo, qHi)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("sum_qty"),
            sum($"l_orderkey").as("sum_okey"))
          .collect()
        drain.drain("pruned_read_agg", t0)
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/tmp/graft_sf1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val k = 2
    val docs = Tables.widened(Tables.documents(spark, dir)).select($"doc_id", $"text")
    docs.count()
    val mutated = docs.select(($"doc_id" + 1000000L).as("doc_id"),
      when(length($"text") < 30, $"text")
        .when($"doc_id" % 2 === 0,
          concat(substring($"text", 1, 10), lit("Q"),
            expr("substring(text, 12, 11)"), lit("Z"),
            expr("substring(text, 24, length(text))")))
        .otherwise(
          concat(substring($"text", 1, 10), lit("Q"),
            expr("substring(text, 11, 9)"), lit("Z"),
            expr("substring(text, 21, length(text))")))
        .as("text"))
    val corpus = docs.union(mutated)
    val withLen = corpus.select($"doc_id", $"text", length($"text").cast("long").as("len"))
    def segStart(i: Int, dl: Int) = {
      val third = expr(s"(len - $dl) div 3")
      i match { case 0 => lit(1L); case 1 => third + 1L; case 2 => third * 2L + 1L }
    }
    def segLen(i: Int, dl: Int) = {
      val third = expr(s"(len - $dl) div 3")
      if (i < 2) third else (($"len" - dl) - third * 2L)
    }
    val segStructs = (0 until 3).map { i =>
      struct(lit(i).as("idx"),
        when(segLen(i, 0) >= 1,
          xxhash64($"text".substr(segStart(i, 0).cast("int"), segLen(i, 0).cast("int")))).as("seg"))
    }
    val segs = withLen.select($"doc_id", $"len", explode(array(segStructs: _*)).as("x"))
      .select($"doc_id", $"len", $"x.idx", $"x.seg").filter($"seg".isNotNull)
    time("segs")(println(segs.count()))
    val probeStructs = for {
      dl <- 0 to k; i <- 0 until 3; d <- -k to k
      if math.abs(d) + math.abs(dl - d) <= k
    } yield {
      val start = segStart(i, dl) + d
      val sl = segLen(i, dl)
      struct(($"len" - dl).as("plen"), lit(i).as("idx"),
        when($"len" - dl >= 3 && sl >= 1 && start >= 1 && start + sl - 1 <= $"len",
          xxhash64($"text".substr(start.cast("int"), sl.cast("int")))).as("seg"))
    }
    val probes = withLen.select($"doc_id", explode(array(probeStructs: _*)).as("x"))
      .select($"doc_id", $"x.plen", $"x.idx", $"x.seg")
      .filter($"seg".isNotNull).distinct()
    time("probes distinct")(println(probes.count()))
    val candidates = segs.as("a").join(probes.as("b"),
        $"a.idx" === $"b.idx" && $"a.len" === $"b.plen" &&
          $"a.seg" === $"b.seg" && $"a.doc_id" =!= $"b.doc_id")
      .select(least($"a.doc_id", $"b.doc_id").as("id_a"),
        greatest($"a.doc_id", $"b.doc_id").as("id_b"))
      .distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidates")(println(candidates.count()))
    val joined = candidates
      .join(corpus.select($"doc_id".as("id_a"), $"text".as("ta")), "id_a")
      .join(corpus.select($"doc_id".as("id_b"), $"text".as("tb")), "id_b")
    time("joins only")(println(joined.count()))
    time("joins again")(println(joined.count()))
    val pairs = joined
      .select($"id_a", $"id_b", levenshtein($"ta", $"tb", k).cast("long").as("dist"))
      .filter($"dist" >= 0 && $"dist" <= k)
    time("verify with lev")(println(pairs.count()))
    val pairsB = candidates
      .join(broadcast(corpus.select($"doc_id".as("id_a"), $"text".as("ta"))), "id_a")
      .join(broadcast(corpus.select($"doc_id".as("id_b"), $"text".as("tb"))), "id_b")
      .select($"id_a", $"id_b", levenshtein($"ta", $"tb", k).cast("long").as("dist"))
      .filter($"dist" >= 0 && $"dist" <= k)
    time("verify broadcast-corpus")(println(pairsB.count()))
    spark.stop()
  }
}

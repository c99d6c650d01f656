package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.filtering.EventFilter
import graft.io.GraftIO

/** Cross-cutting robustness: chunk-routing determinism (the task-retry
  * guarantee), drop-partitions read, compiled filters on streams, and
  * reference edge semantics. */
class RobustnessSpec extends AnyFunSuite with SparkSpec {

  test("chunked write routes rows identically across rewrites (retry determinism)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "k")
    val d1 = Files.createTempDirectory("graft_det").toString
    val d2 = Files.createTempDirectory("graft_det").toString
    GraftIO.write(df, d1, GraftIO.Dsv, chunks = 4)
    GraftIO.write(df, d2, GraftIO.Dsv, chunks = 4)
    val c1 = spark.read.schema(df.schema).option("sep", "\t").option("header", "true").csv(d1)
    val c2 = spark.read.schema(df.schema).option("sep", "\t").option("header", "true").csv(d2)
    // same rows land in the same chunk id both times: per-chunk multiset equal
    def perChunk(path: String) =
      spark.read.schema(df.schema).option("sep", "\t").option("header", "true")
        .csv(path).withColumn("f", input_file_name())
        .withColumn("chunk", regexp_extract($"f", "part-(\\d+)", 1))
        .groupBy($"chunk").agg(sum(hash($"id", $"v", $"k")).as("h"), count(lit(1)).as("n"))
        .orderBy($"chunk").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(perChunk(d1) === perChunk(d2))
    assert(c1.count() === 500 && c2.count() === 500)
  }

  test("z-order write survives a degenerate (constant) clustering column") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, 7L, s"r$i")).toDF("a", "c", "v")
    val d = Files.createTempDirectory("graft_zdeg").toString + "/z"
    // constant column: min == max → every row lands in bucket 0 on that
    // dim; the interleave degrades to a sort on the other column
    GraftIO.writeZOrdered(df, d, Seq("a", "c"), files = 4)
    val back = spark.read.parquet(d)
    assert(back.count() == 200)
    assert(back.agg(sum($"a")).first().getLong(0) == (1 to 200).map(_.toLong).sum)
  }

  test("z-order write rejects fewer than two clustering columns") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    assertThrows[IllegalArgumentException] {
      GraftIO.writeZOrdered(df, "/tmp/never", Seq("a"), files = 2)
    }
  }

  test("z-order write rejects more than eight clustering columns") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val nine = (1 to 9).map(_ => "a")
    val e = intercept[IllegalArgumentException] {
      GraftIO.writeZOrdered(df, "/tmp/never", nine, files = 2)
    }
    assert(e.getMessage.contains("at most 8"))
  }

  test("writeNamed: all-partition-column frame fails with the real constraint named") {
    import spark.implicits._
    val df = Seq(("x", 1L), ("y", 2L), ("x", 3L)).toDF("k", "v")
    // every column a partition column + dropPartitions=true means the
    // data files would have zero columns — Spark cannot write that; the
    // error should say so instead of a zero-arg-hash analysis failure
    val e = intercept[IllegalArgumentException] {
      GraftIO.writeNamed(df, "/tmp/never", GraftIO.Dsv,
        partitionBy = Seq("k", "v"), suffixes = Seq("c0.tsv", "c1.tsv"))
    }
    assert(e.getMessage.contains("zero columns"))
  }

  test("writeNamed: null partition value fails with a clear error and no stranded tmp") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L), (None, 2L)).toDF("k", "v")
    val out = Files.createTempDirectory("graft_nullpart").toString + "/e"
    val e = intercept[IllegalArgumentException] {
      GraftIO.writeNamed(df, out, GraftIO.Dsv, partitionBy = Seq("k"))
    }
    assert(e.getMessage.contains("partition column 'k' contains null"))
    assert(!new java.io.File(out + ".__graft_named_tmp").exists(),
      "failed writeNamed stranded its temporary tree")
  }

  test("read with restorePartitions=false drops hive partition columns") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "part")
    val out = Files.createTempDirectory("graft_dropparts").toString
    GraftIO.write(df, out, GraftIO.Parquet, partitionBy = Seq("part"))
    val kept = GraftIO.read(spark, out, GraftIO.Parquet)
    val dropped = GraftIO.read(spark, out, GraftIO.Parquet, restorePartitions = false)
    assert(kept.columns.toSet === Set("id", "v", "part"))
    assert(dropped.columns.toSet === Set("id", "v"))
    assert(dropped.count() === 2)
  }

  test("compiled event filter applies unchanged to a streaming source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val filters =
      """[{"event_type": ["purchase"]},
        |  {"event_type": ["click"], "value": [{"numeric": [">=", 50]}]}]""".stripMargin
    val q = df.filter(EventFilter.compile(filters, df)).writeStream
      .format("memory").queryName("filtered_stream").outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (new Timestamp(60000), "purchase", 5.0),
        (new Timestamp(61000), "click", 10.0),
        (new Timestamp(62000), "click", 99.0),
        (new Timestamp(63000), "view", 99.0))
      q.processAllAvailable()
      val got = spark.table("filtered_stream")
        .select($"event_type", $"value").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got === Set(("purchase", 5.0), ("click", 99.0)))
    } finally q.stop()
  }

  test("empty filter OBJECT matches everything (all([]) is True in the reference)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    assert(df.filter(EventFilter.compile("""[{}]""", df)).count() === 2)
  }

  test("criteria that are neither list nor dict are skipped (reference parity)") {
    import spark.implicits._
    // filtering.py:149-154 appends results only for list/dict criteria;
    // a scalar criteria value contributes nothing -> all([]) -> True
    val df = Seq(("a", 1)).toDF("k", "v")
    assert(df.filter(EventFilter.compile("""[{"k": "scalar-ignored"}]""", df)).count() === 1)
  }

  test("jsonlines read surfaces corrupt records instead of failing the scan") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("corrupt").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "part-0.json"),
      "{\"a\": 1, \"b\": \"x\"}\n{\"a\": 2, \"b\": \"y\"}\nnot json at all\n")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the default): the bad line lands in the corrupt
    // column with data columns null — the scan never throws
    // (cached: Spark disallows queries touching ONLY the corrupt
    // column against the raw scan — UNSUPPORTED_FEATURE otherwise)
    val permissive = GraftIO.read(spark, dir, GraftIO.JsonLines,
      schema = Some(schema),
      options = Map("columnNameOfCorruptRecord" -> "_corrupt_record")).cache()
    try {
      assert(permissive.count() === 3)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(permissive.filter(col("a").isNotNull).count() === 2)
    } finally permissive.unpersist()
    // DROPMALFORMED via options passthrough: bad lines vanish
    val dropped = GraftIO.read(spark, dir, GraftIO.JsonLines,
      schema = Some(StructType(schema.fields.take(2))),
      options = Map("mode" -> "DROPMALFORMED"))
    assert(dropped.count() === 2)
  }

  test("empty partitioned write reads back as an empty frame (schema sidecar)") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p").limit(0)
    val out = Files.createTempDirectory("graft_emptypart").toString + "/d"
    // a partitioned write of zero rows produces no partition dirs and
    // no data files — only the schema sidecar makes it readable
    GraftIO.write(df, out, GraftIO.Parquet, partitionBy = Seq("p"), chunks = 2)
    val back = GraftIO.read(spark, out, GraftIO.Parquet)
    assert(back.count() === 0)
    assert(back.columns.toSet === Set("id", "v", "p"))
    assert(back.schema("id").dataType === org.apache.spark.sql.types.LongType)
    // drop-partitions read drops the sidecar-recorded partition columns
    val noParts = GraftIO.read(spark, out, GraftIO.Parquet, restorePartitions = false)
    assert(noParts.columns.toSet === Set("id", "v"))
    // the sidecar must NOT shadow real data: a non-empty write to the
    // same layout reads back its rows (sidecar ignored by the listing)
    val full = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p")
    GraftIO.write(full, out, GraftIO.Parquet, partitionBy = Seq("p"))
    assert(GraftIO.read(spark, out, GraftIO.Parquet).count() === 2)
  }

  test("sidecar fallback column ORDER matches a non-empty partitioned read " +
      "when the partition column is NOT trailing") {
    import spark.implicits._
    // partition column `p` sits FIRST in the writer frame; a non-empty
    // read still returns data columns first with `p` appended last —
    // the empty-dataset fallback must produce the same order or a
    // positional union/append over the two cases silently misaligns
    val full = Seq(("x", 1L, "a"), ("y", 2L, "b")).toDF("p", "id", "v")
    val outFull = Files.createTempDirectory("graft_midpart").toString + "/d"
    GraftIO.write(full, outFull, GraftIO.Parquet, partitionBy = Seq("p"))
    val fullBack = GraftIO.read(spark, outFull, GraftIO.Parquet)
    assert(fullBack.columns.toSeq === Seq("id", "v", "p"))
    val outEmpty = Files.createTempDirectory("graft_midpart_e").toString + "/d"
    GraftIO.write(full.limit(0), outEmpty, GraftIO.Parquet, partitionBy = Seq("p"))
    val emptyBack = GraftIO.read(spark, outEmpty, GraftIO.Parquet)
    assert(emptyBack.columns.toSeq === fullBack.columns.toSeq)
    // multi-level, both non-trailing, declared order (q, p) preserved
    val multi = Seq(("x", 1L, "u", "a")).toDF("q", "id", "p", "v")
    val outM = Files.createTempDirectory("graft_midpart_m").toString + "/d"
    GraftIO.write(multi.limit(0), outM, GraftIO.Parquet, partitionBy = Seq("q", "p"))
    assert(GraftIO.read(spark, outM, GraftIO.Parquet).columns.toSeq ===
      Seq("id", "v", "q", "p"))
  }

  test("sidecar fallback partition-column TYPE keeps the writer's declared " +
      "type (documented divergence from non-empty directory-name inference)") {
    import spark.implicits._
    val df = Seq((1L, 7L)).toDF("id", "p")
    // non-empty: partition values type-infer from directory names —
    // p=7 lands as INT regardless of the writer's LONG declaration
    val outFull = Files.createTempDirectory("graft_ptype").toString + "/d"
    GraftIO.write(df, outFull, GraftIO.Parquet, partitionBy = Seq("p"))
    assert(GraftIO.read(spark, outFull, GraftIO.Parquet).schema("p").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // empty: no directory names exist to infer from, so the fallback
    // keeps the declared type — value-dependent inference (int vs long
    // by magnitude) is unknowable at zero rows; this pin DOCUMENTS the
    // divergence rather than pretending it away
    val outEmpty = Files.createTempDirectory("graft_ptype_e").toString + "/d"
    GraftIO.write(df.limit(0), outEmpty, GraftIO.Parquet, partitionBy = Seq("p"))
    assert(GraftIO.read(spark, outEmpty, GraftIO.Parquet).schema("p").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("empty dsv partitioned write reads back all-string, like a non-empty one") {
    import spark.implicits._
    val df = Seq((1L, "a", "x")).toDF("id", "v", "p").limit(0)
    val out = Files.createTempDirectory("graft_emptydsv").toString + "/d"
    GraftIO.write(df, out, GraftIO.Dsv, partitionBy = Seq("p"))
    // a non-empty dsv read without an explicit schema yields STRING
    // data columns; the sidecar fallback must match or the schema
    // would flip with row count
    val back = GraftIO.read(spark, out, GraftIO.Dsv)
    assert(back.count() === 0)
    assert(back.schema("id").dataType === org.apache.spark.sql.types.StringType)
    assert(back.schema("v").dataType === org.apache.spark.sql.types.StringType)
  }

  test("SaveMode.Ignore no-op write does not clobber the schema sidecar") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val v1 = Seq((1L, "a", "x")).toDF("id", "v", "p").limit(0)
    val out = Files.createTempDirectory("graft_ignore").toString + "/d"
    GraftIO.write(v1, out, GraftIO.Parquet, partitionBy = Seq("p"))
    // a later Ignore write with a DIFFERENT schema writes nothing —
    // the sidecar must keep describing the v1 dataset
    val v2 = Seq((1, 2.0, "x", true)).toDF("a", "b", "p", "c").limit(0)
    GraftIO.write(v2, out, GraftIO.Parquet, partitionBy = Seq("p"), mode = SaveMode.Ignore)
    val back = GraftIO.read(spark, out, GraftIO.Parquet)
    assert(back.columns.toSet === Set("id", "v", "p"))
  }

  test("CDC/SCD2/partitioned-roundtrip gate queries survive zero-row inputs") {
    // empty partitions and first-run datasets are normal at warehouse
    // scale; the max(o_orderkey) key-base probe and the partitioned
    // roundtrip each crashed on zero rows before this was pinned
    val dir = Files.createTempDirectory("graft_emptysf").toString
    Tables.orders(spark, sf).limit(0).write.parquet(s"$dir/orders.parquet")
    Tables.events(spark, sf).limit(0).write.parquet(s"$dir/events.parquet")
    assert(graft.operators.IoQueries.ioMergeUpsert(spark, dir).count() === 0)
    assert(graft.operators.MaintenanceQueries.ioScd2History(spark, dir).count() === 0)
    assert(graft.operators.MaintenanceQueries.ioScd2Asof(spark, dir).count() === 0)
    assert(graft.operators.IoQueries.ioPartitionedRoundtrip(spark, dir).count() === 0)
  }
}

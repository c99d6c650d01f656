package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{FileSystems, GraftIO}

class IoSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_iospec").toString

  test("pathFor mirrors reference get_path semantics") {
    assert(FileSystems.pathFor("prefix", Seq("a", "b"), Seq(1, 2), Some("suffix"))
      == "prefix/a=1/b=2/suffix")
    assert(FileSystems.pathFor("prefix") == "prefix")
    // trailing slash stripped when suffix empty
    assert(FileSystems.pathFor("p", Seq("a"), Seq(1), Some("")) == "p/a=1")
    // unique name when suffix None
    val u1 = FileSystems.pathFor("p", Nil, Nil, None)
    val u2 = FileSystems.pathFor("p", Nil, Nil, None)
    assert(u1 != u2 && u1.startsWith("p/"))
    // mismatched lengths / null values rejected
    intercept[IllegalArgumentException] {
      FileSystems.pathFor("p", Seq("a"), Seq(1, 2), Some(""))
    }
    intercept[IllegalArgumentException] {
      FileSystems.pathFor("p", Seq("a"), Seq(null), Some(""))
    }
  }

  test("FileSystems basic ops: write/read/ls/find/glob/cp/mv/rm/exists") {
    val fs = FileSystems(spark)
    val root = freshDir()
    fs.mkdirs(s"$root/sub/deep")
    fs.writeString(s"$root/sub/deep/a.txt", "hello graft")
    assert(fs.exists(s"$root/sub/deep/a.txt"))
    assert(fs.readString(s"$root/sub/deep/a.txt") == "hello graft")
    assert(fs.find(root).exists(_.endsWith("a.txt")))
    assert(fs.glob(s"$root/*/deep/*.txt").nonEmpty)
    fs.cp(s"$root/sub/deep/a.txt", s"$root/b.txt")
    assert(fs.readString(s"$root/b.txt") == "hello graft")
    fs.mv(s"$root/b.txt", s"$root/c.txt")
    assert(!fs.exists(s"$root/b.txt") && fs.exists(s"$root/c.txt"))
    assert(fs.ls(root).nonEmpty)
    assert(fs.modified(s"$root/c.txt") > 0)
    fs.rm(root)
    assert(!fs.exists(root))
  }

  test("dsv gzip roundtrip preserves values exactly") {
    import spark.implicits._
    val df = Seq((1L, "a|b", 1.5), (2L, "", 0.0), (3L, "z\\q", -2.25))
      .toDF("id", "s", "v")
    val out = freshDir() + "/d"
    GraftIO.write(df, out, GraftIO.Dsv, gzip = true, sep = "|")
    val back = GraftIO.read(spark, out, GraftIO.Dsv, sep = "|",
      schema = Some(df.schema))
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // gzip actually applied
    val fs = FileSystems(spark)
    assert(fs.find(out).exists(_.endsWith(".gz")))
  }

  test("jsonlines roundtrip preserves values") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5), (2L, "with \"quotes\"", -0.5)).toDF("id", "s", "v")
    val out = freshDir() + "/j"
    GraftIO.write(df, out, GraftIO.JsonLines)
    val back = GraftIO.read(spark, out, GraftIO.JsonLines, schema = Some(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("partitioned write creates hive layout; chunks bound file count") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i * 1.0))
      .toDF("id", "parity", "v")
    val out = freshDir() + "/p"
    GraftIO.write(df, out, GraftIO.Parquet, partitionBy = Seq("parity"), chunks = 2)
    val fs = FileSystems(spark)
    val files = fs.find(out).filter(_.endsWith(".parquet"))
    assert(files.exists(_.contains("parity=even")) && files.exists(_.contains("parity=odd")))
    // ~2 chunks per partition directory (repartition targets, not exact law)
    val perDir = files.groupBy(f => f.substring(0, f.lastIndexOf('/')))
    perDir.values.foreach(fl => assert(fl.length <= 4, s"too many files: $fl"))
    // read restores partition col; dropped when restorePartitions=false
    val back = GraftIO.read(spark, out, GraftIO.Parquet)
    assert(back.columns.toSet == Set("id", "parity", "v"))
    assert(back.count() == 100)
    val noPart = GraftIO.read(spark, out, GraftIO.Parquet, restorePartitions = false)
    assert(!noPart.columns.contains("parity"))
  }

  test("orc roundtrip preserves values; zlib compression applied") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "", -0.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "s", "v")
    val out = freshDir() + "/o"
    GraftIO.write(df, out, GraftIO.Orc, gzip = true)
    val back = GraftIO.read(spark, out, GraftIO.Orc)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    val fs = FileSystems(spark)
    assert(fs.find(out).exists(_.endsWith(".zlib.orc")))
  }

  test("options passthrough overrides defaults (pandas_kwargs analogue)") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None: Option[String])).toDF("id", "s")
    val out = freshDir() + "/opts"
    // write nulls as a custom marker, read them back through the same
    // marker — both sides riding the options map, overriding the
    // built-in null handling
    GraftIO.write(df, out, GraftIO.Dsv, options = Map("nullValue" -> "__NA__"))
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(out)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(raw === Seq("a", "__NA__"))
    val back = GraftIO.read(spark, out, GraftIO.Dsv, schema = Some(df.schema),
      options = Map("nullValue" -> "__NA__"))
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("schema evolution: mergeSchema option unions parquet batch schemas") {
    import spark.implicits._
    val out = freshDir() + "/evolve"
    GraftIO.write(Seq((1L, "a")).toDF("id", "s"), out + "/b1", GraftIO.Parquet)
    GraftIO.write(Seq((2L, 3.5)).toDF("id", "v"), out + "/b2", GraftIO.Parquet)
    val merged = GraftIO.read(spark, out + "/*", GraftIO.Parquet,
      options = Map("mergeSchema" -> "true"))
    assert(merged.columns.toSet === Set("id", "s", "v"))
    assert(merged.count() === 2)
    val row1 = merged.filter($"id" === 1L).collect()(0)
    assert(row1.getAs[String]("s") === "a" && row1.isNullAt(row1.fieldIndex("v")))
  }

  test("all-string dsv read matches reference default dtype=str") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("n", "s")
    val out = freshDir() + "/s"
    GraftIO.write(df, out, GraftIO.Dsv, sep = "\t")
    val back = GraftIO.read(spark, out, GraftIO.Dsv, sep = "\t")
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("profileColumns: null counting, exact distinct, typed-then-rendered min/max") {
    import spark.implicits._
    // the gate table has no nulls, so pin null semantics here: nulls
    // are excluded from distinct AND from min/max in both engines
    val df = Seq(
      (1L, Some("b"), Some(1.25)),
      (2L, None, Some(2.0)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(2.0))
    ).toDF("id", "s", "d")
    val p = graft.operators.IoQueries.profileColumns(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    // doubles render as half-up integer cents AFTER the typed min/max
    assert(p("d") === ((4L, 1L, 2L, "125", "200")))
  }

  test("profileColumns: an empty table profiles as zero counts, not an NPE") {
    import spark.implicits._
    val empty = Seq((1L, "a")).toDF("id", "s").limit(0)
    val p = graft.operators.IoQueries.profileColumns(empty)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((0L, 0L, 0L, null, null)))
    assert(p("s") === ((0L, 0L, 0L, null, null)))
  }
}

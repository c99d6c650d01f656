package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSimilarity, TextScanCounts}
import graft.similarity.Similarity

/** Native CosineSimilarity expression: equivalence with the
  * declarative higher-order formulation, SQL registration through
  * GraftExtensions, and both eval paths. */
class FunctionsSpec extends AnyFunSuite with SparkSpec {

  test("native cosine == higher-order cosine on real embeddings") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding").limit(50)
    val pairs = emb.as("a").crossJoin(emb.as("b")).filter($"a.vec_id" < $"b.vec_id")
    val diffs = pairs.select(
        (Similarity.cosine($"a.embedding", $"b.embedding") -
          Similarity.cosineHof($"a.embedding", $"b.embedding")).as("d"))
      .agg(max(abs($"d"))).collect()(0).getDouble(0)
    assert(diffs === 0.0, "native and HOF cosine must agree bit-for-bit")
  }

  test("graft_cosine is registered via spark.sql.extensions") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("interpreted eval matches codegen") {
    val xs = Array(1.0f, 2.0f, -3.0f)
    val ys = Array(0.5f, -1.0f, 2.0f)
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(xs,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(ys,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interp = expr.eval(null).asInstanceOf[Double]
    val dot = xs.zip(ys).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = dot / (math.sqrt(xs.map(x => x.toDouble * x).sum) *
      math.sqrt(ys.map(y => y.toDouble * y).sum))
    assert(math.abs(interp - expected) < 1e-15)
  }

  test("null input yields null; ensureRegistered is idempotent") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(Similarity.cosine($"a", $"b").as("c")).collect()(0)
    assert(r.isNullAt(0))
    CosineSimilarity.ensureRegistered(spark)
    CosineSimilarity.ensureRegistered(spark) // second call is a no-op
  }

  test("text scan counts: interpreted eval matches codegen; null yields null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq("the a 一二三 x!?", " \t mixed the\tder le ", "", "🙂 the 🚀")
    // interpreted path: direct eval on the expression
    val interp = cases.map { s =>
      val row = TextScanCounts(org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4),
        row.getArray(5).toIntArray.toSeq)
    }
    // codegen path: through the registered function in a projection
    val fromDf = cases.toDF("t")
      .select(graft.text.TextFunctions.scanCounts(col("t")).as("c"))
      .collect().map { r =>
        val row = r.getStruct(0)
        (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4),
          row.getSeq[Int](5))
      }
    assert(interp === fromDf.toSeq)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(graft.text.TextFunctions.scanCounts(col("t"))).collect()(0)
    assert(nullRow.isNullAt(0))
    TextScanCounts.ensureRegistered(spark)
    TextScanCounts.ensureRegistered(spark) // second call is a no-op
  }

  test("graft_topk keeps the k largest (score desc, tag asc) across partitions") {
    import spark.implicits._
    graft.functions.TopK.ensureRegistered(spark)
    // ties on score exercise the byte-lexicographic tag tie-break; the
    // null-score row must be skipped; repartition(7) forces partial
    // buffers + serialize/merge on the combine path
    val rows = Seq(
      ("g1", Some(0.5), "bb", "x1"), ("g1", Some(0.5), "ab", "x2"),
      ("g1", Some(0.9), "zz", "x3"), ("g1", Some(0.1), "aa", "x4"),
      ("g1", None, "nn", "x5"), ("g1", Some(0.5), "aa", "x6"),
      ("g2", Some(-0.0), "a", "y1"), ("g2", Some(0.0), "b", "y2"),
    ).toDF("g", "s", "t", "e").repartition(7)
    val out = rows.groupBy($"g")
      .agg(call_function("graft_topk", $"s", $"t", $"e", lit(3)).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "x")))
      .select($"g", $"pos", $"x.score", $"x.tag", $"x.extra")
      .as[(String, Int, Double, String, String)].collect().sorted
    assert(out.filter(_._1 == "g1").sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq ===
      Seq((0.9, "zz", "x3"), (0.5, "aa", "x6"), (0.5, "ab", "x2")))
    // -0.0 TIES 0.0 (the window-sort / ORDER BY convention), so the
    // tag breaks the tie: "a" ranks first
    assert(out.filter(_._1 == "g2").sortBy(_._2).map(r => (r._3, r._4)).toSeq ===
      Seq((-0.0, "a"), (0.0, "b")))
  }

  test("graft_topk equals an in-memory reference on random tie-heavy data") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    graft.functions.TopK.ensureRegistered(spark)
    // small score/tag alphabets force score ties (tag tie-break) and
    // include a supplementary-plane tag, where UTF-8 byte order and
    // Java String order DISAGREE with each other's neighbors
    val rowGen = for {
      g <- Gen.choose(1, 3)
      sc <- Gen.oneOf(0.0, 0.25, 0.5, 1.0)
      tag <- Gen.oneOf("a", "ab", "b", "z", "\ud83d\ude42x", "~")
    } yield (g, sc, tag)
    def byteLt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    for (round <- 1 to 10) {
      val k = 1 + round % 4
      val rows = Gen.listOfN(60, rowGen)
        .apply(Gen.Parameters.default, Seed(7000 + round)).get
        .zipWithIndex.map { case ((g, sc, t), i) => (g, sc, t + "_" + i) }
      val got = rows.toDF("g", "s", "t").repartition(5)
        .groupBy($"g")
        .agg(call_function("graft_topk", $"s", $"t", lit(""), lit(k)).as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "x")))
        .select($"g", $"pos", $"x.score", $"x.tag")
        .as[(Int, Int, Double, String)].collect()
        .groupBy(_._1).map { case (g, xs) =>
          g -> xs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
        }
      val want = rows.groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(r => (r._2, r._3))
          .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && byteLt(a._2, b._2)))
          .take(k).toSeq
      }
      assert(got === want, s"round $round k=$k")
    }
  }
}

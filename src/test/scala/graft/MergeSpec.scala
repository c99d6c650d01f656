package graft

import org.apache.spark.sql.functions._

import graft.io.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("merge applies upserts, inserts, and deletes by key") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L), // update
      (3L, "c", 30.0, "D", 1L),  // delete
      (9L, "i", 90.0, "I", 1L)   // insert
    ).toDF("k", "s", "v", "op", "seq")
    val got = Merge.merge(base, changes, Seq("k"), seqCol = Some("seq"))
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0), (9L, "i", 90.0)))
  }

  test("highest sequence wins when one key has several changes") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),
      (2L, "b3", 22.0, "U", 3L), // latest update wins
      (2L, "bx", 0.0, "U", 2L),
      (4L, "d2", 41.0, "U", 1L),
      (4L, "d", 40.0, "D", 2L)   // later delete beats earlier update
    ).toDF("k", "s", "v", "op", "seq")
    val got = Merge.merge(base, changes, Seq("k"), seqCol = Some("seq"))
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b3", 22.0), (3L, "c", 30.0)))
  }

  test("merge without seqCol passes single changes through") {
    val changes = Seq((1L, "a2", 11.0, "U")).toDF("k", "s", "v", "op")
    val got = Merge.merge(base, changes, Seq("k"))
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(got.head == ((1L, "a2", 11.0)) && got.size == 4)
  }

  test("composite keys and column order independence") {
    val b2 = base.withColumn("k2", $"k" % 2).select($"k", $"k2", $"s", $"v")
    val changes = Seq((1L, 1L, "x", 99.0, "U", 1L))
      .toDF("k", "k2", "s", "v", "op", "seq")
      // changes arrive with columns in a different order than base
      .select($"op", $"seq", $"v", $"s", $"k2", $"k")
    val got = Merge.merge(b2, changes, Seq("k", "k2"), seqCol = Some("seq"))
    assert(got.columns.toSeq == b2.columns.toSeq)
    assert(got.filter($"k" === 1L).as[(Long, Long, String, Double)].head()
      == ((1L, 1L, "x", 99.0)))
  }

  test("empty change batch is the identity") {
    val changes = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "s", "v", "op", "seq")
    assert(Merge.merge(base, changes, Seq("k"), seqCol = Some("seq")).count() == 4)
  }

  test("merge requires keys") {
    intercept[IllegalArgumentException] { Merge.merge(base, base, Nil) }
  }
}

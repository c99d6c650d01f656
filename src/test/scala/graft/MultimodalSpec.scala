package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def row(id: Long, payload: Array[Byte], w: Int = 100, h: Int = 50,
      frames: Int = 30): MediaRow =
    MediaRow(id, "image", payload, w, h, 16000, frames)

  test("decode stub is deterministic and batch-shaped") {
    import spark.implicits._
    val data = Seq(
      row(1, "hello world".getBytes("UTF-8")),
      row(2, Array[Byte](0, 1, 2, 127, -1, -128)),
      row(3, Array.empty[Byte]))
    val ds = spark.createDataset(data).repartition(2)
    val f1 = Multimodal.decodeAndFeaturize(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeAndFeaturize(ds).collect().sortBy(_.media_id)
    assert(f1.map(_.hist_digest).toSeq === f2.map(_.hist_digest).toSeq)
    assert(f1.map(_.n_bytes).toSeq === Seq(11L, 6L, 0L))
    assert(f1(2).mean_byte_bp === 0L) // empty payload guarded
    // mean of "hello world" bytes, in basis points
    val expectedMean = "hello world".getBytes("UTF-8").map(_ & 0xff).sum * 10000L / 11
    assert(f1(0).mean_byte_bp === expectedMean)
  }

  test("feature stage preserves partitioning (no shuffle in the plan)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(row(1, Array[Byte](1, 2, 3)))).repartition(3)
    def exchanges(plan: String): Int =
      plan.toLowerCase.linesIterator.count(_.contains("exchange"))
    val before = exchanges(ds.queryExecution.executedPlan.toString)
    val after = exchanges(
      Multimodal.decodeAndFeaturize(ds).queryExecution.executedPlan.toString)
    assert(after === before, "decode stage must not add a shuffle")
  }

  test("frame sampling and resize plan") {
    assert(Multimodal.frameSampleCount(0, 10) === 0)
    assert(Multimodal.frameSampleCount(1, 10) === 1)
    assert(Multimodal.frameSampleCount(10, 10) === 1)
    assert(Multimodal.frameSampleCount(11, 10) === 2)
    import spark.implicits._
    val df = Seq((1L, 640, 480), (2L, 100, 50), (3L, 256, 256))
      .toDF("media_id", "width", "height")
    val got = Multimodal.resizePlan(df, 256)
      .select($"media_id", $"out_width", $"out_height")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set((1L, 256, 192), (2L, 100, 50), (3L, 256, 256)))
  }
}

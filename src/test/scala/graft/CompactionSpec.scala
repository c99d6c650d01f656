package graft

import org.apache.spark.sql.functions._

import graft.io.{FileSystems, GraftIO}

/** Small-file compaction: rewrites a fragmented dataset into
  * target-sized files without changing its contents. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses a many-file dataset into the computed file count") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val src = s"$dir/src"; val out = s"$dir/out"
    // fragment: 32 chunks of a small table → 32 tiny files
    GraftIO.write(Tables.events(spark, sf), src, chunks = 32)
    val fss = FileSystems(spark)
    def dataFiles(p: String) = fss.find(p)
      .filterNot { f =>
        // metadata, not data: _SUCCESS, checksums, the schema sidecar
        val name = f.substring(f.lastIndexOf('/') + 1)
        name.startsWith("_") || name.startsWith(".") || f.endsWith(".crc")
      }
    assert(dataFiles(src).length > 8, "fragmentation setup failed")

    // generous target → everything fits one file
    val n = GraftIO.compact(spark, src, out, targetBytes = 1L << 30)
    assert(n === 1L)
    assert(dataFiles(out).length === 1)

    // contents unchanged
    val a = GraftIO.read(spark, src).orderBy($"event_id").collect()
    val b = GraftIO.read(spark, out).orderBy($"event_id").collect()
    assert(a === b)
  }

  test("hive-partitioned compact sizes files per directory, not per task") {
    val dir = java.nio.file.Files.createTempDirectory("compact3").toString
    val src = s"$dir/src"; val out = s"$dir/out"
    GraftIO.write(Tables.events(spark, sf), src,
      partitionBy = Seq("event_type"), chunks = 8)
    val fss = FileSystems(spark)
    def dataFiles(p: String) = fss.find(p)
      .filterNot { f =>
        // metadata, not data: _SUCCESS, checksums, the schema sidecar
        val name = f.substring(f.lastIndexOf('/') + 1)
        name.startsWith("_") || name.startsWith(".") || f.endsWith(".crc")
      }
    val n = GraftIO.compact(spark, src, out, targetBytes = 1L << 30,
      partitionBy = Seq("event_type"))
    // 5 event types × 1 file per dir — NOT tasks × dirs
    assert(n === 5L)
    assert(dataFiles(out).length === 5, dataFiles(out).mkString("\n"))
    val a = GraftIO.read(spark, src).orderBy($"event_id").collect()
    val b = GraftIO.read(spark, out).orderBy($"event_id").collect()
    assert(a.length === b.length)
  }

  test("compact refuses in-place operation") {
    val dir = java.nio.file.Files.createTempDirectory("compact4").toString
    GraftIO.write(Tables.region(spark, sf), s"$dir/d")
    intercept[IllegalArgumentException] {
      GraftIO.compact(spark, s"$dir/d", s"$dir/d")
    }
  }

  test("compact sizes the file count from the source bytes") {
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString
    val src = s"$dir/src"; val out = s"$dir/out"
    GraftIO.write(Tables.events(spark, sf), src, chunks = 16)
    val fss = FileSystems(spark)
    val total = fss.find(src)
      .filterNot(f => f.endsWith("_SUCCESS") || f.endsWith(".crc"))
      .map(fss.size).sum
    val target = math.max(1L, total / 3)
    val n = GraftIO.compact(spark, src, out, targetBytes = target)
    assert(n === (total + target - 1) / target)
  }
}

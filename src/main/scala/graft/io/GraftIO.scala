package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dataset read/write facade — the Spark-native twin of the reference
  * `datatoolz.io.DataIO` (reference: datatoolz/io.py:16-206).
  *
  * | reference                        | here                                   |
  * |----------------------------------|----------------------------------------|
  * | filetype parquet/dsv/jsonlines   | same (`Format`)                        |
  * | gzip=True                        | `compression=gzip` writer/reader codec |
  * | partition_by=[...]               | `DataFrameWriter.partitionBy` (hive)   |
  * | suffix=[c1,c2] (chunked output)  | `chunks=n` → n files per partition     |
  * | drop_partitions                  | `restorePartitions=false` on read      |
  * | threaded multi-file read         | distributed scan of path/glob          |
  * | partition_transformer            | `FileSystems.pathFor` (path builder)   |
  *
  * Scale posture: the reference materializes each partition on the
  * driver and uploads with a thread pool; here every partition is
  * written by the executor that owns it, output layout is hive-style so
  * downstream readers partition-prune, and `maxRecordsPerFile` bounds
  * file sizes at 100 TB.
  */
object GraftIO {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Dsv extends Format { val name = "dsv" }
  case object JsonLines extends Format { val name = "jsonlines" }

  object Format {
    def apply(name: String): Format = name match {
      case "parquet"           => Parquet
      case "dsv" | "csv" | "tsv" => Dsv
      case "jsonlines" | "json"  => JsonLines
      case other => throw new IllegalArgumentException(s"Unsupported format: $other")
    }
  }

  /** Write `df` under `path`.
    *
    * @param partitionBy   hive-style output partitioning columns
    * @param gzip          gzip-compress data files (parquet: gzip codec)
    * @param sep           dsv delimiter (reference default: tab)
    * @param header        dsv header line
    * @param chunks        target output files per partition (reference
    *                      `suffix=[...]` list length); 0 = leave as-is
    * @param maxRecordsPerFile upper bound per file (scale guard), 0 = off
    */
  def write(
      df: DataFrame,
      path: String,
      format: Format = Parquet,
      gzip: Boolean = false,
      sep: String = "\t",
      header: Boolean = true,
      partitionBy: Seq[String] = Nil,
      chunks: Int = 0,
      maxRecordsPerFile: Long = 0L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {

    // chunks per hive-partition: repartition on (partition cols, random
    // chunk id) so each partition directory gets ~`chunks` files written
    // by distinct tasks — the distributed analogue of the reference's
    // suffix-list chunking (io.py:92-99).
    val out =
      if (chunks <= 0) df
      else if (partitionBy.isEmpty) df.repartition(chunks)
      else df.repartition(
        (partitionBy.map(col) :+ pmod(spark_partition_id() + monotonically_increasing_id(), lit(chunks))): _*)

    val writer0 = out.write.mode(mode)
    val writer = if (partitionBy.nonEmpty) writer0.partitionBy(partitionBy: _*) else writer0
    val withMax = if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile.toString) else writer

    format match {
      case Parquet =>
        withMax.option("compression", if (gzip) "gzip" else "snappy").parquet(path)
      case Dsv =>
        withMax
          .option("sep", sep).option("header", header.toString)
          // defaults quote an empty string as `""` and write null as an
          // unquoted empty field — which is exactly what makes the
          // roundtrip lossless (read maps them back asymmetrically).
          .option("escape", "\\")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
          .option("compression", if (gzip) "gzip" else "none")
          .csv(path)
      case JsonLines =>
        withMax
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
          .option("compression", if (gzip) "gzip" else "none")
          .json(path)
    }
  }

  /** Read a dataset (single file, directory tree, or glob) written by
    * `write` — or by anything else speaking the same formats.
    *
    * @param schema optional explicit schema (reference reads dsv as
    *               all-string by default — pass None + inferSchema=false
    *               for that exact behavior)
    * @param restorePartitions when false, hive partition columns parsed
    *               from the directory layout are dropped (reference
    *               `drop_partitions` analogue on the read side)
    */
  def read(
      spark: SparkSession,
      path: String,
      format: Format = Parquet,
      gzip: Boolean = false, // codec auto-detected by extension; kept for API parity
      sep: String = "\t",
      header: Boolean = true,
      schema: Option[StructType] = None,
      inferSchema: Boolean = false,
      restorePartitions: Boolean = true): DataFrame = {

    val reader0 = spark.read
    val reader = schema.map(reader0.schema).getOrElse(reader0)
    val df = format match {
      case Parquet => reader.parquet(path)
      case Dsv =>
        reader
          .option("sep", sep).option("header", header.toString)
          // the writer quotes empty strings (`""`) and leaves nulls as
          // unquoted empty fields; with the default nullValue="" BOTH
          // would collapse to null on read — shift nullValue to a
          // sentinel no real field contains so `""` survives as "".
          .option("escape", "\\")
          .option("nullValue", "__graft_reserved_null__")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
          .option("inferSchema", inferSchema.toString)
          .csv(path)
      case JsonLines => reader.json(path)
    }
    if (restorePartitions) df
    else {
      // partition columns are exactly those present in the dir layout;
      // compare against data-file schema to find them
      val dataCols = df.columns
      val fromDirs = dataCols.filter { c =>
        path.contains(s"$c=") || FileSystems(spark).find(path).exists(_.contains(s"/$c="))
      }
      df.drop(fromDirs: _*)
    }
  }
}

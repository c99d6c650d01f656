package graft.io

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Unified filesystem facade over Hadoop's `FileSystem` API.
  *
  * Re-expression of the reference `datatoolz.filesystem.FileSystem`
  * (reference: datatoolz/filesystem.py:13-129): one interface for local
  * and object storage. Where the reference wraps fsspec/s3fs with a
  * custom STS-assume chain, the Spark-native equivalent is scheme
  * dispatch through Hadoop: `file://`, `hdfs://`, `s3a://`, ... all
  * resolve via `Path.getFileSystem(conf)`, and credentials/role assume
  * live in Hadoop conf (`fs.s3a.assumed.role.arn`,
  * `fs.s3a.aws.credentials.provider`, `fs.s3a.endpoint`) — so executors
  * get the exact same view as the driver, which no pythonic
  * driver-side fs wrapper can offer on a cluster.
  */
class FileSystems(conf: Configuration) {

  private def fs(path: String): FileSystem = new Path(path).getFileSystem(conf)

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  def mkdirs(path: String): Boolean = fs(path).mkdirs(new Path(path))

  /** Delete (recursively for directories). Returns true if removed. */
  def rm(path: String, recursive: Boolean = true): Boolean =
    fs(path).delete(new Path(path), recursive)

  /** Non-recursive listing, like reference `ls`. */
  def ls(path: String): Seq[FileStatus] =
    fs(path).listStatus(new Path(path)).toSeq

  /** Recursive file listing, like reference `find` (io.py:144). */
  def find(path: String): Seq[String] = {
    val f = fs(path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else if (f.getFileStatus(p).isFile) Seq(p.toString)
    else {
      val it = f.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) buf += it.next().getPath.toString
      buf.result()
    }
  }

  /** Glob expansion (`*`, `?`, `[abc]`, `{a,b}`). */
  def glob(pattern: String): Seq[String] =
    fs(pattern).globStatus(new Path(pattern)) match {
      case null => Seq.empty
      case arr  => arr.toSeq.map(_.getPath.toString)
    }

  def cp(src: String, dst: String): Boolean = {
    val sfs = fs(src); val dfs = fs(dst)
    FileUtil.copy(sfs, new Path(src), dfs, new Path(dst), false, conf)
  }

  def mv(src: String, dst: String): Boolean =
    fs(src).rename(new Path(src), new Path(dst))

  def modified(path: String): Long =
    fs(path).getFileStatus(new Path(path)).getModificationTime

  def open(path: String): java.io.InputStream = fs(path).open(new Path(path))

  def create(path: String, overwrite: Boolean = true): java.io.OutputStream =
    fs(path).create(new Path(path), overwrite)

  /** Read a whole file as UTF-8 text (test/debug convenience). */
  def readString(path: String): String = {
    val in = open(path)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def writeString(path: String, content: String): Unit = {
    val out = create(path)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}

object FileSystems {
  def apply(spark: SparkSession): FileSystems =
    new FileSystems(spark.sparkContext.hadoopConfiguration)

  def local(): FileSystems = new FileSystems(new Configuration())

  /** Hive-style path builder, mirroring reference `DataIO.get_path`
    * (io.py:37-59): ("prefix", [a,b], [1,2], "suffix") ->
    * "prefix/a=1/b=2/suffix". A null suffix yields a unique filename.
    */
  def pathFor(prefix: String, partitions: Seq[String] = Nil,
              values: Seq[Any] = Nil, suffix: Option[String] = Some("")): String = {
    require(partitions.length == values.length && values.forall(_ != null),
      "`partitions` and `values` lengths must match and `values` must not contain null")
    val parts = partitions.zip(values).map { case (f, v) => s"$f=$v" }
    val suf = suffix.getOrElse(s"${System.nanoTime()}-${UUID.randomUUID()}")
    (Seq(prefix) ++ parts ++ Seq(suf)).filter(_.nonEmpty).mkString("/")
      .stripSuffix("/")
  }
}

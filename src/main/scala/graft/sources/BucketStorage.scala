package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

/** Storage seam for the graft-bucket connector: every byte the connector
  * reads or writes goes through one of these, so the same reader/writer/
  * commit code runs against the local filesystem in tests and a Hadoop
  * `FileSystem` (HDFS, S3A, file://) on a real cluster. Implementations
  * are stateless objects — tasks resolve their storage from the path
  * itself ([[BucketStorages.forPath]]), so nothing needs to ride the
  * closure except the path string.
  *
  * All text IO is explicit UTF-8 (the TSV codec escapes every control
  * character it cares about, so the charset is the only platform
  * dependence left to pin down).
  */
trait BucketStorage extends Serializable {
  def reader(path: String): BufferedReader
  /** Truncating create; parent directories must already exist. */
  def create(path: String): BufferedWriter
  def readAllLines(path: String): Seq[String]
  def writeAllLines(path: String, lines: Seq[String]): Unit
  def exists(path: String): Boolean
  def nonEmptyFile(path: String): Boolean
  /** Replace-existing move. DRIVER-ONLY: the V2 commit path calls this
    * single-threaded after all tasks report, so the winner's file can
    * safely displace anything already at `dst`. Executor tasks must use
    * [[commit]] instead — this method is not safe under concurrent
    * original+speculative attempts of the same partition. */
  def rename(src: String, dst: String): Unit
  /** Executor-safe publish of a deterministically-produced file: move
    * `src` into place only if `dst` is absent; if another attempt of the
    * same partition already committed (contents are identical by
    * construction), drop `src` and keep the existing `dst`. Never deletes
    * an existing destination, so a killed attempt can't leave a committed
    * bucket file missing. */
  def commit(src: String, dst: String): Unit
  def delete(path: String): Unit
  /** Touch an empty file if absent (keeps bucket partition values aligned
    * across co-bucketed tables). */
  def createEmpty(path: String): Unit
  def mkdirs(path: String): Unit
  def deleteRecursive(path: String): Unit
  /** Names of immediate subdirectories (catalog namespace listing). */
  def listSubdirs(dir: String): Seq[String]
  /** Names of immediate regular files (driver-side litter sweep). */
  def listFiles(dir: String): Seq[String]
}

/** Plain `java.io`/`java.nio` storage for scheme-less local paths. */
object LocalBucketStorage extends BucketStorage {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  override def reader(path: String): BufferedReader =
    Files.newBufferedReader(Paths.get(path), UTF_8)
  override def create(path: String): BufferedWriter =
    Files.newBufferedWriter(Paths.get(path), UTF_8)
  override def readAllLines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path), UTF_8).asScala.toSeq
  override def writeAllLines(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), lines.asJava, UTF_8)
  override def exists(path: String): Boolean = Files.exists(Paths.get(path))
  override def nonEmptyFile(path: String): Boolean = {
    val p = Paths.get(path); Files.exists(p) && Files.size(p) > 0
  }
  override def rename(src: String, dst: String): Unit =
    Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.REPLACE_EXISTING)
  override def commit(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    if (Files.exists(d)) Files.deleteIfExists(s)
    else try Files.move(s, d) // no REPLACE_EXISTING: a concurrent winner survives
    catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(s) }
  }
  override def delete(path: String): Unit =
    Files.deleteIfExists(Paths.get(path))
  override def createEmpty(path: String): Unit = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Files.createFile(p)
  }
  override def mkdirs(path: String): Unit =
    Files.createDirectories(Paths.get(path))
  override def deleteRecursive(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      import java.util.Comparator
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }
  override def listSubdirs(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Nil
    else {
      val list = Files.list(p)
      try list.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toList
      finally list.close()
    }
  }
  override def listFiles(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Nil
    else {
      val list = Files.list(p)
      try list.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.getFileName.toString).toList
      finally list.close()
    }
  }
}

/** Hadoop-`FileSystem` storage for URI paths (`hdfs://`, `s3a://`,
  * `file://`, ...). The `FileSystem` is resolved per path from a
  * process-local `Configuration` — on a cluster that picks up the
  * deployed core-site/hdfs-site, in tests `file://` resolves to
  * `LocalFileSystem`, which is how HadoopStorageSpec exercises this
  * implementation without a cluster. */
object HadoopBucketStorage extends BucketStorage {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  // one Configuration per JVM; FileSystem.get caches per scheme+authority
  @transient private lazy val conf = new org.apache.hadoop.conf.Configuration()
  private def fs(p: String): FileSystem = new HPath(p).getFileSystem(conf)

  override def reader(path: String): BufferedReader =
    new BufferedReader(new InputStreamReader(fs(path).open(new HPath(path)), UTF_8))
  override def create(path: String): BufferedWriter =
    new BufferedWriter(new OutputStreamWriter(
      fs(path).create(new HPath(path), true), UTF_8))
  override def readAllLines(path: String): Seq[String] = {
    val in = reader(path)
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toList
    finally in.close()
  }
  override def writeAllLines(path: String, lines: Seq[String]): Unit = {
    val out = create(path)
    try lines.foreach { l => out.write(l); out.newLine() }
    finally out.close()
  }
  override def exists(path: String): Boolean = fs(path).exists(new HPath(path))
  override def nonEmptyFile(path: String): Boolean = {
    val f = fs(path); val p = new HPath(path)
    f.exists(p) && f.getFileStatus(p).getLen > 0
  }
  override def rename(src: String, dst: String): Unit = {
    val f = fs(src); val d = new HPath(dst)
    // Hadoop rename is not replace-existing on every FS. This method is
    // DRIVER-ONLY (V2 commit, after all tasks report), so delete-then-
    // rename is single-threaded and race-free there; executor tasks go
    // through commit() below, which never deletes a destination.
    if (f.exists(d)) f.delete(d, false)
    require(f.rename(new HPath(src), d), s"rename $src -> $dst failed")
  }
  override def commit(src: String, dst: String): Unit = {
    val f = fs(src); val s = new HPath(src); val d = new HPath(dst)
    if (f.exists(d)) f.delete(s, false)
    else if (!f.rename(s, d)) {
      // Hadoop rename returns false when dst appeared concurrently: a
      // twin attempt won with identical contents — drop our copy.
      require(f.exists(d), s"commit $src -> $dst failed with no winner")
      f.delete(s, false)
    }
  }
  override def delete(path: String): Unit =
    fs(path).delete(new HPath(path), false)
  override def createEmpty(path: String): Unit = {
    val f = fs(path); val p = new HPath(path)
    if (!f.exists(p)) f.create(p, false).close()
  }
  override def mkdirs(path: String): Unit = fs(path).mkdirs(new HPath(path))
  override def deleteRecursive(path: String): Unit =
    fs(path).delete(new HPath(path), true)
  override def listSubdirs(dir: String): Seq[String] = {
    val f = fs(dir); val p = new HPath(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }
  override def listFiles(dir: String): Seq[String] = {
    val f = fs(dir); val p = new HPath(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.getName)
  }
}

object BucketStorages {
  /** Scheme-based dispatch: URI paths go through Hadoop, bare paths
    * through java.io — no config plumbing, and the choice serializes as
    * the path string the task already carries. */
  def forPath(path: String): BucketStorage =
    if (path.contains("://")) HadoopBucketStorage else LocalBucketStorage
}

package graft.sources

import java.io.BufferedWriter
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import graft.Exact.dec
import graft.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-bucket`: a full DataSourceV2 connector whose tables are written
  * pre-bucketed and pre-sorted on one key, and whose scans REPORT that
  * layout to Catalyst ([[SupportsReportPartitioning]] →
  * `KeyGroupedPartitioning(bucket(n, key))`, [[SupportsReportOrdering]] →
  * `key ASC` per partition). With
  * `spark.sql.sources.v2.bucketing.enabled=true`, joining two co-bucketed
  * graft-bucket tables is a storage-partitioned join: NO exchange and NO
  * sort at query time — the modern (Iceberg-style) replacement for the
  * legacy `bucketedTableScan.outputOrdering` flag that
  * [[graft.operators.Relational3.bucketedJoin]] needs (NOTES.md round-5
  * candidate). At 100 TB this is the difference between paying the fact-
  * fact shuffle on every query and paying it once at write time.
  *
  * The scan builder also implements [[SupportsPushDownRequiredColumns]]
  * and [[SupportsPushDownFilters]]: pruned columns are never materialized
  * and pushed predicates are evaluated row-by-row inside the reader.
  * Filters ACCEPTED by `pushFilters` are removed from the plan and never
  * re-checked by Spark — the reader's evaluation is a correctness
  * dependency and must match Spark SQL comparison semantics exactly
  * (e.g. -0.0 = 0.0); only filters returned as residual are re-applied
  * above the scan.
  *
  * The storage format itself is deliberately simple (one TSV file per
  * bucket + a 3-line meta file) — the point of this module is the
  * CONNECTOR contract (schema inference, layout reporting, pushdown,
  * `InternalRow` production), not a new columnar codec; parquet already
  * exists. Mirrors the reference's object-store tables (SURVEY.md O2/O3),
  * re-expressed as a V2 catalog surface.
  */
object GraftBucketFormat {

  /** Table metadata carried in `_graft_bucket_meta`: key column, bucket
    * count, schema DDL (one line each). */
  case class Meta(key: String, buckets: Int, schema: StructType)

  val MetaFile = "_graft_bucket_meta"

  def readMeta(path: String): Meta = {
    val lines = BucketStorages.forPath(path).readAllLines(s"$path/$MetaFile")
    Meta(lines(0), lines(1).toInt, StructType.fromDDL(lines(2)))
  }

  def bucketFile(path: String, b: Int): String = f"$path/b=$b%05d.tsv"

  /** Deterministic bucket id for a long key — both writer and any future
    * re-writer must agree, so it is fixed here once. */
  def bucketOf(key: Long, n: Int): Int = (((key % n) + n) % n).toInt

  // ---- row codec: TSV with \t \n \\ escaped, nulls as \N --------------

  private def escape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '\t' => b.append("\\t")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case c    => b.append(c)
      }
      i += 1
    }
    b.result()
  }

  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 1
          case 't'  => b.append('\t'); i += 1
          case 'n'  => b.append('\n'); i += 1
          case 'r'  => b.append('\r'); i += 1
          case o    => b.append(c) // lone backslash, keep as-is
        }
      } else b.append(c)
      i += 1
    }
    b.result()
  }

  private[sources] def encodeField(v: Any, dt: DataType): String =
    if (v == null) "\\N"
    else dt match {
      case StringType => escape(v.toString)
      case DateType => v match {
        // Row.get returns java.time.LocalDate when
        // spark.sql.datetime.java8API.enabled is on, java.sql.Date otherwise
        case d: java.time.LocalDate => d.toEpochDay.toString
        case d: java.sql.Date       => d.toLocalDate.toEpochDay.toString
        case o => throw new IllegalArgumentException(s"date value $o: ${o.getClass}")
      }
      case _          => v.toString // int/long/double/boolean
    }

  /** Encode one field straight from an InternalRow — the write-path twin
    * of [[encodeField]]; both must emit the text [[decodeField]] parses
    * (dates are already epoch-day ints internally). */
  private[sources] def encodeInternalField(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "\\N"
    else dt match {
      case StringType  => escape(row.getUTF8String(i).toString)
      case IntegerType => row.getInt(i).toString
      case LongType    => row.getLong(i).toString
      case DoubleType  => row.getDouble(i).toString
      case BooleanType => row.getBoolean(i).toString
      case DateType    => row.getInt(i).toString
      case other => throw new IllegalArgumentException(
        s"graft-bucket does not support $other")
    }

  /** Parse one field to its Catalyst-internal value (UTF8String for
    * strings, epoch-day Int for dates). */
  private[sources] def decodeField(s: String, dt: DataType): Any =
    if (s == "\\N") null
    else dt match {
      case StringType  => UTF8String.fromString(unescape(s))
      case IntegerType => s.toInt
      case LongType    => s.toLong
      case DoubleType  => s.toDouble
      case BooleanType => s.toBoolean
      case DateType    => s.toLong.toInt // days since epoch
      case other => throw new IllegalArgumentException(
        s"graft-bucket does not support $other")
    }

  private[sources] val SupportedTypes: Set[DataType] =
    Set(StringType, IntegerType, LongType, DoubleType, BooleanType, DateType)

  /** Distributed bucketed-sorted write: rows are routed to their bucket,
    * sorted by (bucket, key) within partitions, and streamed to exactly
    * one file per bucket. Missing buckets get empty files so both sides
    * of a future join expose the identical partition-value set (no
    * `pushPartValues` dependency). The key must be a non-null integral
    * column.
    *
    * Tasks write attempt-unique temp files and publish them via
    * [[BucketStorage.commit]] only at the end of a fully-drained
    * partition — a retried or speculative attempt either commits first
    * or finds an identical file already in place (partition contents are
    * deterministic after the sort) and drops its own copy. A destination
    * is never deleted, so a zombie attempt killed mid-publish can't
    * un-commit a bucket. Leftover `*.tmp` files from failed attempts are
    * swept driver-side before the meta file lands. */
  def write(df: DataFrame, path: String, key: String, numBuckets: Int): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(key), s"missing key column $key")
    require(schema.fields.forall(f => SupportedTypes.contains(f.dataType)),
      s"unsupported type in ${schema.simpleString}")
    val storage = BucketStorages.forPath(path)
    storage.deleteRecursive(path)
    storage.mkdirs(path)

    val fields = schema.fields
    val keyIdx = schema.fieldIndex(key)
    val n = numBuckets
    df.withColumn("__graft_bucket",
        pmod(col(key).cast("long"), lit(n.toLong)).cast("int"))
      .repartition(n, col("__graft_bucket"))
      .sortWithinPartitions(col("__graft_bucket"), col(key))
      .drop("__graft_bucket") // recomputed per row below; column only routed/sorted
      .foreachPartition { (rows: Iterator[Row]) =>
        val store = BucketStorages.forPath(path)
        val tc = org.apache.spark.TaskContext.get()
        val uid = if (tc == null) "driver" else s"${tc.partitionId()}-${tc.taskAttemptId()}"
        var cur = -1
        var out: BufferedWriter = null
        val written = scala.collection.mutable.ListBuffer.empty[Int]
        def tmpFile(b: Int) = s"${bucketFile(path, b)}.$uid.tmp"
        rows.foreach { r =>
          val b = bucketOf(r.get(keyIdx) match {
            case i: Int => i.toLong
            case l: Long => l
          }, n)
          if (b != cur) {
            if (out != null) out.close()
            out = store.create(tmpFile(b))
            written += b
            cur = b
          }
          val line = new StringBuilder
          var i = 0
          while (i < fields.length) {
            if (i > 0) line.append('\t')
            line.append(encodeField(r.get(i), fields(i).dataType))
            i += 1
          }
          out.write(line.result()); out.newLine()
        }
        if (out != null) out.close()
        written.foreach(b => store.commit(tmpFile(b), bucketFile(path, b)))
      }
    // fill buckets that received no rows (empty files keep partition
    // values aligned across co-bucketed tables)
    (0 until n).foreach(b => storage.createEmpty(bucketFile(path, b)))
    // sweep *.tmp litter from failed/killed attempts — reads enumerate
    // bucket files by name so litter is invisible to scans, but it
    // accumulates; the job is complete here, so any surviving tmp is junk
    storage.listFiles(path).filter(_.endsWith(".tmp"))
      .foreach(f => storage.delete(s"$path/$f"))
    storage.writeAllLines(s"$path/$MetaFile", Seq(key, n.toString, schema.toDDL))
  }

  // ---- pushed-filter evaluation over decoded internal values ----------

  /** A pushed filter compiled to a predicate over the full-schema decoded
    * row. Only flat comparisons on supported types are accepted. */
  private[sources] def compileFilter(
      schema: StructType, f: Filter): Option[Array[Any] => Boolean] = {
    def idx(c: String): Option[Int] =
      if (schema.fieldNames.contains(c)) Some(schema.fieldIndex(c)) else None
    def cmp(c: String, v: Any)(test: Int => Boolean): Option[Array[Any] => Boolean] =
      idx(c).flatMap { i =>
        val dt = schema.fields(i).dataType
        toInternal(v, dt).map { lit =>
          row => row(i) != null && test(compare(row(i), lit, dt))
        }
      }
    f match {
      case sources.IsNotNull(c) => idx(c).map(i => row => row(i) != null)
      case sources.EqualTo(c, v) => cmp(c, v)(_ == 0)
      case sources.GreaterThan(c, v) => cmp(c, v)(_ > 0)
      case sources.GreaterThanOrEqual(c, v) => cmp(c, v)(_ >= 0)
      case sources.LessThan(c, v) => cmp(c, v)(_ < 0)
      case sources.LessThanOrEqual(c, v) => cmp(c, v)(_ <= 0)
      case _ => None
    }
  }

  private def toInternal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => None
    case (s: String, StringType) => Some(UTF8String.fromString(s))
    case (i: Int, IntegerType) => Some(i)
    case (l: Long, LongType) => Some(l)
    case (d: Double, DoubleType) => Some(d)
    case (b: Boolean, BooleanType) => Some(b)
    case (d: java.sql.Date, DateType) => Some(d.toLocalDate.toEpochDay.toInt)
    case (d: java.time.LocalDate, DateType) => Some(d.toEpochDay.toInt)
    case _ => None
  }

  private def compare(a: Any, b: Any, dt: DataType): Int = dt match {
    case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case IntegerType | DateType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    // + 0.0 collapses -0.0 to 0.0 (IEEE), matching Spark SQL where
    // -0.0 = 0.0; Double.compare alone would order them apart and an
    // ACCEPTED EqualTo(col, 0.0) would silently drop stored -0.0 rows
    // (accepted filters are trusted, not re-checked — see pushFilters)
    case DoubleType => java.lang.Double.compare(
      a.asInstanceOf[Double] + 0.0d, b.asInstanceOf[Double] + 0.0d)
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case other => throw new IllegalArgumentException(other.toString)
  }
}

/** V2 entry point — `spark.read.format("graft-bucket").load(path)` (short
  * name via META-INF/services registration). */
class GraftBucketTableProvider extends TableProvider with DataSourceRegister {
  import GraftBucketFormat._

  override def shortName(): String = "graft-bucket"

  private def path(options: JMap[String, String]): String = {
    val p = options.get("path")
    require(p != null, "graft-bucket requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    readMeta(path(options)).schema

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] = {
    val m = readMeta(path(options))
    Array(Expressions.bucket(m.buckets, m.key))
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val p = path(properties)
    new GraftBucketTable(p, readMeta(p))
  }
}

class GraftBucketTable(path: String, meta: GraftBucketFormat.Meta)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-bucket `$path`"
  override def schema(): StructType = meta.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(meta.buckets, meta.key))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftBucketScanBuilder(path, meta)

  /** Full-load V2 write: the engine is told the distribution and order
    * this layout needs ([[RequiresDistributionAndOrdering]]) and plans
    * the shuffle + sort itself — the caller never pre-partitions. Appends
    * into already-loaded buckets would break the one-sorted-file-per-
    * bucket invariant, so they are refused up front. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(
      in.fields.map(f => (f.name, f.dataType)).toSeq ==
        meta.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"write schema ${in.simpleString} != table schema ${meta.schema.simpleString}")
    val storage = BucketStorages.forPath(path)
    val loaded = (0 until meta.buckets).exists { b =>
      storage.nonEmptyFile(GraftBucketFormat.bucketFile(path, b))
    }
    require(!loaded,
      s"graft-bucket `$path` already holds data: the layout is full-load " +
        "(one sorted file per bucket) — use createOrReplace, not append")
    new WriteBuilder {
      override def build(): Write = new GraftBucketWrite(path, meta)
    }
  }
}

/** The write plan: declares `clustered(bucket(n, key))` distribution and
  * `(bucket(n, key), key)` ordering, `n` output partitions — Catalyst
  * resolves the transform through the catalog's bucket function and
  * inserts the exchange + sort. Tasks stream rows to one temp file per
  * bucket; the driver commit renames winners into place (speculative or
  * retried attempts lose the rename, never corrupt a bucket) and fills
  * empty buckets so partition values stay aligned for SPJ reads. */
class GraftBucketWrite(path: String, meta: GraftBucketFormat.Meta)
    extends Write with RequiresDistributionAndOrdering with BatchWrite {

  override def description(): String =
    s"GraftBucketWrite path=$path buckets=${meta.buckets} key=${meta.key}"

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.bucket(meta.buckets, meta.key)))
  override def requiredNumPartitions(): Int = meta.buckets
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.bucket(meta.buckets, meta.key), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column(meta.key), SortDirection.ASCENDING))

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftBucketWriterFactory(path, meta)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val storage = BucketStorages.forPath(path)
    val files = messages.flatMap { case m: GraftBucketCommit => m.files }
    val clashes = files.groupBy(_._1).filter(_._2.length > 1)
    require(clashes.isEmpty,
      s"buckets ${clashes.keys.mkString(",")} written by more than one task " +
        "— the required clustered distribution was not honored")
    files.foreach { case (b, tmp) =>
      storage.rename(s"$path/$tmp", GraftBucketFormat.bucketFile(path, b))
    }
    (0 until meta.buckets).foreach { b =>
      storage.createEmpty(GraftBucketFormat.bucketFile(path, b))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val storage = BucketStorages.forPath(path)
    messages.foreach {
      case m: GraftBucketCommit =>
        m.files.foreach { case (_, tmp) => storage.delete(s"$path/$tmp") }
      case _ =>
    }
  }
}

case class GraftBucketCommit(files: Seq[(Int, String)]) extends WriterCommitMessage

class GraftBucketWriterFactory(path: String, meta: GraftBucketFormat.Meta)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftBucketDataWriter(path, meta, s"$partitionId-$taskId")
}

/** Streams InternalRows into per-bucket temp files, enforcing (loudly)
  * the ordering contract the Write declared: buckets arrive grouped, keys
  * ascending within a bucket. */
class GraftBucketDataWriter(
    path: String, meta: GraftBucketFormat.Meta, taskUid: String)
    extends DataWriter[InternalRow] {
  import GraftBucketFormat._

  private val fields = meta.schema.fields
  private val keyIdx = meta.schema.fieldIndex(meta.key)
  private val keyIsLong = fields(keyIdx).dataType == LongType
  private var cur = -1
  private var lastKey = Long.MinValue
  private var out: BufferedWriter = _
  private val seen = scala.collection.mutable.Set.empty[Int]
  private val files = scala.collection.mutable.ListBuffer.empty[(Int, String)]

  private val storage = BucketStorages.forPath(path)

  private def closeCur(): Unit = if (out != null) { out.close(); out = null }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(keyIdx), s"null ${meta.key} cannot be bucketed")
    val k = if (keyIsLong) row.getLong(keyIdx) else row.getInt(keyIdx).toLong
    val b = bucketOf(k, meta.buckets)
    if (b != cur) {
      require(seen.add(b),
        s"bucket $b re-surfaced after other buckets — required ordering not honored")
      closeCur()
      val tmp = f"b=$b%05d.tsv.$taskUid.tmp"
      out = storage.create(s"$path/$tmp")
      files += b -> tmp
      cur = b
      lastKey = Long.MinValue
    }
    require(k >= lastKey, s"keys not ascending within bucket $b")
    lastKey = k
    val line = new StringBuilder
    var i = 0
    while (i < fields.length) {
      if (i > 0) line.append('\t')
      line.append(encodeInternalField(row, i, fields(i).dataType))
      i += 1
    }
    out.write(line.result()); out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    closeCur()
    GraftBucketCommit(files.toList)
  }

  override def abort(): Unit = {
    closeCur()
    files.foreach { case (_, tmp) => storage.delete(s"$path/$tmp") }
  }

  override def close(): Unit = closeCur()
}

class GraftBucketScanBuilder(path: String, meta: GraftBucketFormat.Meta)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = meta.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept what the reader can evaluate row-exactly (flat comparisons on
    * supported types); only the rest stays residual. Claiming a filter
    * here lets Spark also PRUNE the filtered column when the projection
    * doesn't need it — returning everything as residual would force the
    * column to survive for the re-check. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(f =>
      GraftBucketFormat.compileFilter(meta.schema, f).isDefined)
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftBucketScan(path, meta, required, pushed)
}

class GraftBucketScan(
    path: String, meta: GraftBucketFormat.Meta,
    required: StructType, pushed: Array[Filter])
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportOrdering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftBucketScan path=$path buckets=${meta.buckets} key=${meta.key} " +
      s"ReadSchema=${required.simpleString} PushedFilters=${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until meta.buckets)
      .map(b => GraftBucketPartition(GraftBucketFormat.bucketFile(path, b), b))
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBucketReaderFactory(meta.schema, required, pushed)

  /** One partition per bucket value: storage-partitioned joins match these
    * values across co-bucketed tables instead of shuffling either side. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(meta.buckets, meta.key)), meta.buckets)

  /** Files are written sorted by the key, so a sort-merge join needs no
    * Sort either — reported only while the key survives pruning. */
  override def outputOrdering(): Array[SortOrder] =
    if (required.fieldNames.contains(meta.key))
      Array(Expressions.sort(
        Expressions.column(meta.key), SortDirection.ASCENDING))
    else Array.empty
}

case class GraftBucketPartition(file: String, bucketId: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

class GraftBucketReaderFactory(
    dataSchema: StructType, required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  import GraftBucketFormat._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketPartition]
    val fields = dataSchema.fields
    val projection = required.fieldNames.map(dataSchema.fieldIndex)
    val predicates = pushed.flatMap(compileFilter(dataSchema, _))

    new PartitionReader[InternalRow] {
      private val in = BucketStorages.forPath(p.file).reader(p.file)
      private var row: GenericInternalRow = _

      override def next(): Boolean = {
        var line = in.readLine()
        while (line != null) {
          // limit -1 keeps trailing empty fields; a single-string-column
          // row holding "" legitimately encodes to an empty line, so no
          // blank-line skip (empty bucket FILES yield no lines at all)
          val parts = line.split("\t", -1)
          require(parts.length == fields.length,
            s"${p.file}: ${parts.length} fields, schema has ${fields.length}")
          val full = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            full(i) = decodeField(parts(i), fields(i).dataType)
            i += 1
          }
          if (predicates.forall(_(full))) {
            row = new GenericInternalRow(projection.map(full(_)))
            return true
          }
          line = in.readLine()
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** Catalog plugin (`spark.sql.catalog.<name>=graft.sources.GraftCatalog`,
  * `spark.sql.catalog.<name>.warehouse=<dir>`): resolves
  * `<name>.<ns...>.<table>` to graft-bucket directories under the
  * warehouse, and — the part that makes storage-partitioned joins REAL —
  * serves the `bucket` function so Catalyst can resolve the scan's
  * `bucket(n, key)` transform into a `TransformExpression` and match it
  * across join sides. A bare `format(...).load(path)` read has no
  * function catalog, so its KeyGroupedPartitioning silently degrades to
  * unknown and the join shuffles; this is why Iceberg ships a
  * FunctionCatalog and why this connector does too. */
class GraftCatalog extends org.apache.spark.sql.connector.catalog.TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  import GraftBucketFormat._
  import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
  import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
  import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null, s"spark.sql.catalog.$name.warehouse must be set")
  }
  override def name(): String = catalogName

  private def tableDir(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!BucketStorages.forPath(dir).exists(s"$dir/$MetaFile"))
      throw new NoSuchTableException(ident)
    new GraftBucketTable(dir, readMeta(dir))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = (warehouse +: namespace.toSeq).mkString("/")
    val storage = BucketStorages.forPath(ns)
    storage.listSubdirs(ns)
      .filter(d => storage.exists(s"$ns/$d/$MetaFile"))
      .map(d => Identifier.of(namespace, d))
      .toArray
  }

  // tables are written by GraftBucketFormat.write, not DDL — read-only here
  override def dropTable(ident: Identifier): Boolean = false
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only; write via GraftBucketFormat.write")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog is read-only; write via GraftBucketFormat.write")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket") GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The `bucket(n, key)` function behind the reported transform. Catalyst
  * binds it to type-check the transform and to prove both join sides
  * bucket identically (`canonicalName` equality); the definition MUST
  * stay in lockstep with [[GraftBucketFormat.bucketOf]], which is what
  * the writer used to place the rows. */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): graft-bucket bucket id = ((key % n) + n) % n"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, key), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(keyType == IntegerType || keyType == LongType,
      s"bucket key must be integral, got $keyType")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val k = if (keyType == LongType) input.getLong(1) else input.getInt(1).toLong
        Integer.valueOf(GraftBucketFormat.bucketOf(k, n))
      }
    }
  }
}

/** Catalog queries exercising the connector end to end. */
object BucketV2 {

  private def stage(sub: String): String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft_v2_bucket", sub).toString

  /** Storage-partitioned join through the V2 connector: both fact tables
    * staged co-bucketed (16 buckets) and key-sorted, then joined with NO
    * exchange and NO sort below the join (V2SourceSpec pins both). Same
    * revenue-by-status shape as `q_bucketed_join`, whose sort elision
    * needs the legacy bucketed-scan flag — this is the modern replacement. */
  def v2BucketJoin(s: SparkSession, d: String): DataFrame = {
    // the warehouse path is FIXED (catalog plugins are cached by name per
    // session — a warehouse that varied with `d` would silently pin the
    // first value); per-sf table names keep scale factors apart instead
    val wh = stage("warehouse")
    val sfx = math.abs(d.hashCode)
    GraftBucketFormat.write(
      lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      s"$wh/fact/li_$sfx", "l_orderkey", 16)
    GraftBucketFormat.write(
      orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
      s"$wh/fact/ord_$sfx", "o_orderkey", 16)
    // catalog + planner confs go on a CLONED session, never the caller's:
    // the returned frame is lazy, so a set/try/finally here would restore
    // the confs before planning ever reads them, and setting them on `s`
    // would leak SPJ planner behavior into every later query in a shared
    // session. The clone shares the SparkContext (same executors/caches)
    // but owns its conf and catalog manager.
    val s2 = org.apache.spark.sql.graftbridge.SparkBridge.cloneSession(s)
    s2.conf.set("spark.sql.catalog.graft_v2", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.graft_v2.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    s2.table(s"graft_v2.fact.li_$sfx").hint("merge")
      .join(s2.table(s"graft_v2.fact.ord_$sfx"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"), 12, 2) *
            (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"), 3, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  /** Column pruning + predicate pushdown through the V2 reader: the scan
    * materializes 2 of 5 columns and drops filtered rows before they
    * become InternalRows. Both filters are ACCEPTED by the scan builder,
    * so the reader's evaluation is authoritative — Spark re-checks only
    * residual (unaccepted) filters. */
  def v2ScanPushdown(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"orders_full_${math.abs(d.hashCode)}")
    GraftBucketFormat.write(
      orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("o_date")),
      out, "o_orderkey", 8)
    s.read.format("graft-bucket").load(out)
      .filter(col("o_totalprice") > 450000.0 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_v2_bucket_join" -> (v2BucketJoin _),
    "q_v2_scan_pushdown" -> (v2ScanPushdown _))

  val oracle: Map[String, String] = Map(
    "q_v2_bucket_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_v2_scan_pushdown" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 450000.0 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Parquet table loaders for the driver-generated star schema + extension
  * tables (see /root/repo/TESTDATA.md). Reads are plain `spark.read.parquet`
  * so Catalyst predicate pushdown / column pruning apply to every query
  * built on top — at 100 TB these scans are partition-pruned and
  * column-pruned by the optimizer, nothing to hand-tune here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS, naive) across testdata generations, so the loader
    * adapts to the footer schema instead of assuming one encoding:
    *
    *  - NANOS: Spark's vectorized reader rejects it outright. Read raw
    *    nanos (legacy long mode) and convert with *integer* division —
    *    `DIV 1000` keeps full precision where a double round-trip would
    *    corrupt epoch-nanos (~1.7e18 > 2^53). DuckDB truncates ns→µs the
    *    same way, so oracle comparisons line up.
    *  - MICROS (naive): Spark reads TIMESTAMP_NTZ; cast to session-local
    *    TIMESTAMP (session tz is pinned UTC) — the same instant DuckDB's
    *    `epoch_ms` assigns a naive timestamp.
    * Either way callers see one `ts: TIMESTAMP` column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(key)
    // A prior value of "true" is indistinguishable from an earlier NANOS
    // load's intentional sticky setting (see the LongType branch below) —
    // leave it in place rather than churn it through unset/set, so a
    // still-live NANOS frame in the same session keeps planning
    // correctly. (Restoring "true" to "true" would be a no-op anyway;
    // skipping the write also avoids the race window where a concurrent
    // NANOS load's sticky flag could be clobbered mid-action.)
    def restore(): Unit = prior match {
      case Some("true") => ()
      case Some(v)      => s.conf.set(key, v)
      case None         => s.conf.unset(key)
    }
    s.conf.set(key, "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // NANOS encoding: the parquet reader re-reads this conf at every
        // action's physical planning, so it must REMAIN set for the
        // lifetime of any execution over this frame — intentionally left
        // sticky on this branch only.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        restore()
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType =>
        restore()
        raw
      case other =>
        restore()
        throw new IllegalStateException(
          s"events.ts: unsupported parquet timestamp encoding $other — " +
            "expected TIMESTAMP(NANOS) (read as long), TIMESTAMP(MICROS, " +
            "naive) (TIMESTAMP_NTZ), or plain TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** File-level fingerprint of `dir/name.parquet` without reading data:
    * file count : total bytes : md5 over the RECURSIVE per-file
    * (relative-path : length : mtime) listing. Recursive because a
    * partitioned table nests its part files under partition directories
    * whose own dir-entry length is 0 — a flat listing would fingerprint
    * an unchanging shell; per-file entries because the coarse
    * (count, total, max-mtime) triple misses a same-file-count,
    * same-total-size rewrite landing within one mtime granule, and a
    * `_served` face would then serve a stale index over the rewritten
    * table. Used by the `_served` faces' build-once markers and the
    * shared-cluster snapshot to invalidate session-cached artifacts
    * when the table underneath changes. */
  def filesFingerprint(s: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      // the table may be a single file or a (possibly partitioned)
      // directory tree of part files. listFiles returns QUALIFIED paths
      // (scheme-prefixed) — relativize against the qualified root, or
      // the strip is a silent no-op and the hash keys on the absolute
      // location (same data addressed via a moved/re-spelled path would
      // spuriously rebuild)
      val rootStr = fs.makeQualified(p).toString
      val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        files += ((f.getPath.toString.stripPrefix(rootStr),
          f.getLen, f.getModificationTime))
      }
      val sorted = files.sortBy(_._1)
      val md = java.security.MessageDigest.getInstance("MD5")
      sorted.foreach { case (rel, len, mt) =>
        md.update(s"$rel:$len:$mt;".getBytes("UTF-8"))
      }
      s"${sorted.length}:${sorted.map(_._2).sum}:" +
        md.digest().map(b => f"${b & 0xff}%02x").mkString
    }
  }

  /** Scale-adaptive parallelism floor for CPU-heavy NARROW work riding a
    * scan (guide: per-task work lives in the stage that reads the input).
    *
    * Why: the fixture tables are single-file, single-ROW-GROUP parquet,
    * and Spark assigns a parquet row group to exactly one split — so
    * every pre-exchange stage of every catalog query runs as ONE task no
    * matter what `maxPartitionBytes`/`openCostInBytes` say. All per-row
    * compute that sits before the first shuffle (codec decode, shingle
    * hashing, MinHash partial aggregation, HOF token batteries) was
    * measured running single-core on a 32-core box (round-20 baseline:
    * q_image_pipeline 4.1 s, q_pdf_transforms 3.7 s close — almost pure
    * single-task compute).
    *
    * What it does: when the frame's planned partition count is BELOW the
    * cluster's total core count, insert one round-robin repartition up to
    * that count; otherwise return the frame untouched. The gate makes the
    * helper scale-correct by construction:
    *
    *  - small input (the only case where a scan plans fewer partitions
    *    than cores): the added exchange moves at most the input itself —
    *    here ≤ ~600 KiB — and buys core-count parallelism for the
    *    CPU-bound projection above it;
    *  - 100 TB input: the scan already plans orders of magnitude more
    *    partitions than cores, the gate is false, NO new exchange — the
    *    helper cannot regress the large-scale plan.
    *
    * The target is `defaultParallelism` (local[n] → n; cluster → total
    * executor cores), NOT a constant — the driver re-benches at a lower
    * core count and the widened stage scales with it.
    *
    * Call it on the narrow (scan/filter/project-only) input of a
    * compute-heavy projection or mapPartitions. Do NOT call it above an
    * exchange: the partition-count probe plans the frame, and under AQE
    * that would materialize upstream query stages. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 1 || df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}

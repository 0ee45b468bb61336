package graft

import org.apache.spark.sql.functions._

/** Loader-contract coverage for the footer-adaptive events reader:
  * unknown ts encodings fail loudly AT THE LOADER, and the
  * nanosAsLong conf is scoped — restored on non-NANOS branches, sticky
  * (documented) only when the input really is NANOS-encoded. */
class TablesSpec extends SparkFunSuite {

  private val KEY = "spark.sql.legacy.parquet.nanosAsLong"

  test("events loader: unknown ts encoding throws at the loader, not downstream") {
    import spark.implicits._
    val dir = TempDirs.scratch("graft_tables_bad_").resolve("sf").toString
    // ts as INT — neither NANOS(long), MICROS-NTZ, nor TIMESTAMP
    Seq((1L, 42), (2L, 43)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet timestamp encoding"))
    // and the conf experiment above did not leak into the session
    // (getOption surfaces the conf DEFAULT "false" — the leak would be a
    // sticky "true")
    assert(!spark.conf.getOption(KEY).contains("true"),
      s"$KEY leaked after the error branch")
  }

  test("filesFingerprint sees nested part files and same-size renames") {
    val root = TempDirs.scratch("graft_tables_fp_")
    val tbl = root.resolve("t.parquet")
    val b0 = tbl.resolve("bucket=0"); val b1 = tbl.resolve("bucket=1")
    java.nio.file.Files.createDirectories(b0)
    java.nio.file.Files.createDirectories(b1)
    val fa = b0.resolve("part-a"); val fb = b1.resolve("part-b")
    java.nio.file.Files.writeString(fa, "xx")
    java.nio.file.Files.writeString(fb, "yy")
    def fp() = Tables.filesFingerprint(spark, root.toString, "t")
    val fp1 = fp()
    assert(fp1.startsWith("2:4:"),
      s"fingerprint must count the NESTED part files (got $fp1) — " +
        "a flat listing sees only the partition dirs")
    // same file count, same total bytes, rewrite INSIDE a partition dir
    // at a different mtime — the coarse triple missed this entirely
    // (partition-dir entries have length 0 and their mtime is untouched
    // by a child rewrite on many filesystems)
    java.nio.file.Files.writeString(fa, "zz")
    java.nio.file.Files.setLastModifiedTime(fa,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(fa).toMillis + 5000))
    val fp2 = fp()
    assert(fp2 !== fp1, "nested same-size rewrite not detected")
    // same count, same total size, same mtimes — a RENAME still flips it
    val mt = java.nio.file.Files.getLastModifiedTime(fa)
    java.nio.file.Files.move(fa, b0.resolve("part-c"))
    java.nio.file.Files.setLastModifiedTime(b0.resolve("part-c"), mt)
    val fp3 = fp()
    assert(fp3 !== fp2, "same-size rename not detected")
    // and the hash keys on RELATIVE paths: the same tree at a different
    // location fingerprints identically (mv preserves mtimes), so a
    // relocated-but-unchanged dataset does not spuriously rebuild
    val root2 = TempDirs.scratch("graft_tables_fp2_")
    java.nio.file.Files.move(tbl, root2.resolve("t.parquet"))
    assert(Tables.filesFingerprint(spark, root2.toString, "t") === fp3,
      "fingerprint depends on the table's absolute location")
  }

  test("events loader: nanosAsLong conf scoped per the input's encoding") {
    val prior = spark.conf.getOption(KEY)
    try {
      spark.conf.unset(KEY)
      val df = Tables.events(spark, sf)
      val isNanos = spark.conf.getOption(KEY).contains("true")
      if (isNanos)
        // NANOS input: the conf must stay set — the reader re-reads it at
        // every action (documented sticky branch). Prove the read works.
        assert(df.select(count(lit(1))).head().getLong(0) > 0)
      else {
        // non-NANOS input: restored (not left sticky at "true")
        assert(!spark.conf.getOption(KEY).contains("true"),
          s"$KEY not restored")
        assert(df.schema("ts").dataType ===
          org.apache.spark.sql.types.TimestampType)
      }
    } finally prior match {
      case Some(v) => spark.conf.set(KEY, v)
      case None    => spark.conf.unset(KEY)
    }
  }
}

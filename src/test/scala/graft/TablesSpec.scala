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

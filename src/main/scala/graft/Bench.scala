package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every catalog query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is executed to a `noop` sink — unlike `count()`, that forces
  * every projected column to actually be computed (count() lets Catalyst
  * prune the expensive expressions away and would flatter the numbers).
  * A tiny warmup action runs first so session/codegen init isn't billed
  * to the first query.
  *
  * Between queries: drop cached blocks and run a GC — round-1 benching
  * showed cross-query pollution (a 2 s projection billed 86 s right after
  * the streaming queries' state-store churn); each timing should charge
  * the query, not its predecessor's garbage.
  *
  * Optional args: query names to bench (default: the whole catalog).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: session + codegen + parquet reader init
    spark.range(1000).selectExpr("sum(id)").collect()
    val only: Option[Set[String]] = if (args.nonEmpty) Some(args.toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // millisecond precision keeps the ONE json line as short as possible:
    // the driver captures a bounded output tail, and full-precision
    // doubles once pushed the line start past the buffer (round 2's
    // BENCH json arrived truncated → unparseable)
    def f(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

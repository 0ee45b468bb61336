package graft

import graft.operators.{Dedup, EventsOps}
import org.apache.spark.sql.functions._

/** Randomized property evidence for round-9's two semantics-sensitive
  * changes: the floor-division bucketing helpers (sign-correctness against
  * Math.floorDiv, the JVM's floor reference) and the LSH hot-bucket guard
  * (soundness: never invents a pair; completeness: never disconnects an
  * exact-duplicate group, whatever the cap). Seeded, so deterministic. */
class GuardPropertySpec extends SparkFunSuite {

  test("floorBucket/floorBucketMs match Math.floorDiv across signs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(2000)(rnd.nextLong() % 10000000000L) ++
      Seq(-1L, 0L, 1L, 3599999L, 3600000L, -3599999L, -3600000L, -3600001L)
    val df = samples.toDF("ms")
    for (unit <- Seq(3600000L, 86400000L)) {
      val got = df.select(col("ms"),
        EventsOps.floorBucket("ms", unit).as("b"),
        EventsOps.floorBucketMs("ms", unit).as("bm")).collect()
      for (r <- got) {
        val ms = r.getLong(0)
        assert(r.getLong(1) === Math.floorDiv(ms, unit),
          s"floorBucket($ms, $unit)")
        assert(r.getLong(2) === Math.floorDiv(ms, unit) * unit,
          s"floorBucketMs($ms, $unit)")
      }
    }
  }

  test("guard is sound and exact-dup-complete on random corpora, any cap") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def randText() =
      Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 1 to 3) {
      // duplicate groups of very different sizes (some above, some below
      // any tested cap) plus a random tail that may collide by chance
      val groupTexts = Seq.fill(4)(randText())
      val rows = (0 until 4).flatMap { g =>
        (0 until Seq(40, 25, 8, 2)(g)).map(i => (g * 1000L + i, groupTexts(g)))
      } ++ (0 until 30).map(i => (5000L + i, randText()))
      val docs = { import spark.implicits._; rows.toDF("doc_id", "text") }
      val unguarded = Dedup.minhashPairsGuarded(docs, 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (cap <- Seq(3, 10, 30)) {
        val guarded = Dedup.minhashPairsGuarded(docs, cap).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // SOUND: the guard only ever drops candidates, it invents none
        assert(guarded.subsetOf(unguarded),
          s"trial $trial cap $cap invented ${guarded -- unguarded}")
        // COMPLETE on exact duplicates: identical-text groups stay one
        // component under union-find over the guarded pairs
        val parent = collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        guarded.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra max rb) = ra min rb
        }
        rows.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
          val roots = grp.map(t => find(t._1)).distinct
          assert(roots.size === 1,
            s"trial $trial cap $cap split identical group ${grp.map(_._1)}")
        }
      }
    }
  }
}

package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization ADC contract: structure, determinism, and a
  * measured (informational) agreement with exact L2 ranking. */
class PqSpec extends SparkFunSuite {

  test("ADC top-3 is well-formed and deterministic") {
    val a = Similarity.knnPq(spark, sf).collect()
    val b = Similarity.knnPq(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((q, rows) <- byQ) {
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L), s"query $q ranks")
      assert(rows.forall(_.getLong(1) != q), s"query $q returned itself")
      assert(rows.forall(_.getDouble(3) >= 0.0), s"query $q negative distance")
    }
  }

  test("Lloyd-refined codebooks reduce the quantization error, default untouched") {
    val e0 = Similarity.pqQuantError(spark, sf, 0)
    val e2 = Similarity.pqQuantError(spark, sf, 2)
    info(f"PQ quantization error: seed=$e0%.4f, 2 Lloyd iters=$e2%.4f")
    assert(e2 < e0, f"refinement did not reduce quantization error: $e2%.4f >= $e0%.4f")
    // and the refined path stays deterministic
    assert(e2 === Similarity.pqQuantError(spark, sf, 2))
    // catalog default (lloydIters=0) must be byte-stable under the new conf
    val a = Similarity.knnPq(spark, sf).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.pq.lloydIters", "2")
    val refined =
      try Similarity.knnPq(spark, sf).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.pq.lloydIters")
    val b = Similarity.knnPq(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
    assert(refined.nonEmpty)
  }

  test("ADC agrees substantially with exact L2 top-3") {
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val exact = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr("vec_dist2_d(qemb, emb)").as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d2"), col("cid"))))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.knnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(pq).size.toDouble / exact.size
    info(f"PQ ADC vs exact-L2 top-3 overlap: $overlap%.3f")
    // 8×16 codebooks on this NEAR-ISOTROPIC synthetic corpus are a coarse
    // quantizer (same corpus property that caps IVF recall — see knnIvf's
    // scaladoc): measured overlap is ~0.14 at sf0.001, vs chance 3/n ≈
    // 0.005 — ~28× better than random. The bar guards "meaningfully
    // better than chance", not high recall, which this corpus cannot show.
    assert(overlap >= 0.10, f"ADC ranking near-random: overlap $overlap%.3f")
  }
}

package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.col

class RelationalSpec extends SparkFunSuite {

  test("q1_agg: six flag/status groups, counts sum to filtered lineitem") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length === 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp '1998-09-02'").count()
    assert(total === expected)
  }

  test("q_topk: descending by totalprice, k=20") {
    val prices = Relational.topK(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q_join_left preserves nations with zero customers") {
    val rows = Relational.joinLeft(spark, sf).collect()
    assert(rows.length === 25) // all nations survive the left join
    assert(rows.forall(_.getAs[Long]("n_customers") >= 0))
  }

  test("semi + anti partition the dimension") {
    val semi = Relational.joinSemi(spark, sf).count()
    val anti = Relational.joinAnti(spark, sf).count()
    assert(semi <= Tables.supplier(spark, sf).count())
    // anti's probe side is lineitems at near-full quantity — complement
    // of the parts that DO have such a line; non-empty by fixture design
    assert(anti === Tables.part(spark, sf).count() -
      Tables.lineitem(spark, sf).filter(col("l_quantity") >= 48)
        .select("l_partkey").distinct().count())
    assert(anti > 0, "anti-join gate must be non-vacuous at sf0.001")
  }

  test("set EXCEPT is non-empty and disjoint from the subtracted side") {
    val except = Relational.setExcept(spark, sf)
    val big = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").cast("long").as("ck"))
    assert(except.count() > 0, "EXCEPT gate must be non-vacuous at sf0.001")
    assert(except.join(big, Seq("ck"), "left_semi").count() === 0)
  }

  test("custom physical operator top-k equals the window form") {
    val viaOp = operators.Relational3.topkCustomOp(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")))
    val viaWindow = operators.Relational.windowRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")))
    assert(viaOp.toSeq === viaWindow.toSeq)
  }

  test("top-k aggregator equals the window row_number form") {
    val viaAgg = operators.Relational3.topkPerGroup(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("rn")))
    val viaWindow = operators.Relational.windowRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("rn")))
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("q_window_rank: rn is 1..3 within each customer") {
    val rows = Relational.windowRank(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 3))
  }

  test("rollup has grand-total row equal to table count") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("flag") == "ALL" &&
      r.getAs[String]("status") == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === Tables.lineitem(spark, sf).count())
  }

  test("q_agg_approx: HLL++ estimates within 3-sigma of exact distinct counts") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // the query itself carries the 3-sigma tolerance check as boolean
    // columns (oracle pins them TRUE); re-derive the exact side here so a
    // miswired exact path can't self-certify
    val rows = Relational.aggApprox(spark, sf).collect()
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("orders"), r.getAs[Long]("parts"))).toMap
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet === exact.keySet)
    for (r <- rows) {
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("exact_orders") === exact(flag)._1, s"$flag orders")
      assert(r.getAs[Long]("exact_parts") === exact(flag)._2, s"$flag parts")
      assert(r.getAs[Boolean]("orders_within_3rsd"), s"$flag orders tolerance")
      assert(r.getAs[Boolean]("parts_within_3rsd"), s"$flag parts tolerance")
    }
  }

  test("approx_percentile tracks the exact percentile within its accuracy bound") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = Tables.events(spark, sf)
      .agg(
        expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("approx"),
        expr("percentile(value, array(0.5, 0.95))").as("exact"))
      .collect().head
    val approx = rows.getAs[scala.collection.Seq[Double]]("approx")
    val exact = rows.getAs[scala.collection.Seq[Double]]("exact")
    // accuracy=1000 bounds RANK error at n/1000; translate to a value
    // tolerance via the observed spread rather than assuming a distribution
    val spread = exact.last - exact.head max 1.0
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.1 * spread, s"approx $a vs exact $e")
    }
  }
}

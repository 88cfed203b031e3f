package graft

import graft.plans.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain equi-join while
  * spreading each key over saltFactor partitions. */
class SkewSpec extends SparkTestBase {

  test("salted join equals the plain join on a skewed key") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    val salted = SkewJoin.saltedEquiJoin(orders, customer,
        "o_custkey", "c_custkey", 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(plain == salted)
  }

  test("hybrid salted join equals the plain join (hot keys routed salted)") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    Seq(0, 3, 50).foreach { hotN =>
      val hybrid = SkewJoin.hybridSaltedJoin(orders, customer,
          "o_custkey", "c_custkey", saltFactor = 8, hotKeyCount = hotN)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(plain == hybrid, s"hotKeyCount=$hotN")
    }
  }

  test("salted join equals plain join for arbitrary salt factors (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val orders = Tables.load(spark, sf, "orders").limit(200).cache()
    val customer = Tables.load(spark, sf, "customer").cache()
    val plainCnt = orders
      .join(customer, col("o_custkey") === col("c_custkey")).count()
    val prop = forAll(Gen.chooseNum(1, 16)) { k =>
      SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey", k)
        .count() == plainCnt
    }
    prop.check(_.withMinSuccessfulTests(5))
  }

  test("gram aggregator matches the sum-of-products formulation") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val embs = Tables.load(spark, sf, "embeddings").limit(50)
    val k = 4
    val shortVecs = embs.select(slice(col("embedding"), 1, k).as("v"))
    val gram = udaf(new graft.functions.GramAggregator(k),
      ExpressionEncoder[Seq[Float]]())
    val tri = shortVecs.select(gram(col("v")).as("g")).head().getSeq[Double](0)
    val expected = shortVecs.select(
      (for (i <- 0 until k; j <- i until k) yield
        sum(element_at(col("v"), i + 1).cast("double") *
          element_at(col("v"), j + 1).cast("double"))): _*)
      .head()
    tri.indices.foreach { idx =>
      assert(math.abs(tri(idx) - expected.getDouble(idx)) < 1e-9)
    }
  }
}

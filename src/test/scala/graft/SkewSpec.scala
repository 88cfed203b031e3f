package graft

import graft.plans.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain equi-join while
  * spreading each key over saltFactor partitions — and AQE's runtime
  * skew-join split (the path the 100 TB plan relies on first, before the
  * manual salting fallback) must actually ENGAGE on planted skew. */
class SkewSpec extends SparkTestBase {

  /** Run `body` under temporary SQL confs, restoring priors after. */
  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join split engages on a planted hot key, and " +
      "hybridSaltedJoin is result-identical on the same frames") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // Planted skew: key 0 carries 200k rows; keys 1..50 carry ~100 each.
    // The hot partition is >>5x the median, so OptimizeSkewedJoin must
    // split it once thresholds are scaled to test size.
    val left = spark.range(200000)
      .select(lit(0L).as("k"), col("id").as("lv"))
      .unionAll(spark.range(5000)
        .select((col("id") % 50 + 1).as("k"), col("id").as("lv")))
    val right = spark.range(51).select(col("id").as("rk"),
      (col("id") * 10).as("rv"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the production-default skew thresholds down to test bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // forbid broadcast so the join stays SMJ (the skew-split target)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // coalescing can re-merge the split partitions' read side
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right, col("k") === col("rk"))
      // collect() executes joined's OWN QueryExecution (count() would
      // build a separate one and leave this AdaptiveSparkPlan non-final)
      val n = joined.collect().length
      assert(n == 200000 + 5000) // every row matched exactly once
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      // query stages are traversal leaves, so assert on the plan string:
      // the SMJ must carry the skew marker and the hot side's shuffle
      // read must be the skew-split one
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the join as skew-split:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"no skew-split shuffle read in the final plan:\n$finalPlan")
    }
    // The manual salting fallback must be result-identical on the SAME
    // planted-skew frames (count + per-key aggregate)
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .orderBy("k").collect().toSeq
    val hybrid = SkewJoin.hybridSaltedJoin(
        left, right, "k", "rk", saltFactor = 8, hotKeyCount = 1)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .orderBy("k").collect().toSeq
    assert(plain == hybrid)
  }

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

package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.ml.recommendation.ALSModel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Antidote-data generation (paper §4, Alg. 1): append a small budget of
  * synthetic users whose ratings are optimized by projected gradient
  * descent to reduce a societal metric (polarization here) of the
  * re-factorized matrix.
  *
  * Division of labor mirrors the paper and is the 100 TB-safe split:
  *  - Spark (distributed): ratings assembly, ALS re-training, factor
  *    moment aggregates (ū, S — k and k×k reductions over n users).
  *  - Driver (Breeze): everything sized by the antidote budget —
  *    X is k̃×m with k̃ = ⌈α·n⌉ (tens to hundreds of rows), and the
  *    gradient needs V (m×k) which is item-dimension-sized, not
  *    data-sized. For very large m, the V·(…) products block over item
  *    ranges; the fixtures never need that path.
  */
object Antidote {

  /** Deterministic hash-pseudo-random init in [1,5] (no rand(): the same
    * arithmetic formula runs in the DuckDB oracle — SURVEY §7.4.4). */
  def ratingFormula(userId: Column, itemId: Column): Column =
    round(lit(1) + lit(4) *
      ((userId * lit(2654435761L) + itemId * lit(40503L)) % 1000) / lit(999.0), 6)

  /** (n_users, max_user_id) — computed once and shared across budgets. */
  def userStats(ratings: DataFrame): (Long, Long) = {
    val row = ratings.agg(
      countDistinct(col("user_id")).as("n"), max(col("user_id")).as("mx")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** k̃ = ⌈α·n_users⌉ synthetic users (ids above max real id) × all items. */
  def init(spark: SparkSession, ratings: DataFrame, alpha: Double): DataFrame =
    init(spark, ratings, alpha, userStats(ratings))

  def init(spark: SparkSession, ratings: DataFrame, alpha: Double,
      stats: (Long, Long)): DataFrame = {
    val (n, mx) = stats
    val k = math.ceil(alpha * n).toLong
    val items = ratings.select("item_id").distinct()
    spark.range(1, k + 1)
      .select((lit(mx) + col("id")).as("user_id"))
      .crossJoin(broadcast(items))
      .select(col("user_id"), col("item_id"),
        ratingFormula(col("user_id"), col("item_id")).as("rating"))
  }

  /** Mean user factor ū and mean outer-product second moment S = E[u uᵀ],
    * computed distributedly (k and k² cells — constant-size reductions). */
  def factorMoments(model: ALSModel): (DenseVector[Double], DenseMatrix[Double]) = {
    val k = model.rank
    val uf = model.userFactors // (id INT, features ARRAY<FLOAT>)
    val sums = uf.select(
      (Seq(count(lit(1)).cast(DoubleType).as("n")) ++
        (0 until k).map(i =>
          sum(element_at(col("features"), i + 1).cast(DoubleType)).as(s"m$i")) ++
        (for (i <- 0 until k; j <- i until k) yield
          sum(element_at(col("features"), i + 1).cast(DoubleType) *
            element_at(col("features"), j + 1).cast(DoubleType)).as(s"s${i}_$j"))): _*)
      .head()
    val n = sums.getDouble(0)
    val uBar = DenseVector.tabulate(k)(i => sums.getDouble(1 + i) / n)
    val s = DenseMatrix.zeros[Double](k, k)
    var idx = 1 + k
    for (i <- 0 until k; j <- i until k) {
      val v = sums.getDouble(idx) / n
      s(i, j) = v; s(j, i) = v
      idx += 1
    }
    (uBar, s)
  }

  /** Polarization of the model's predictions over ALL (user,item) pairs in
    * closed form: (1/m) Σ_i [v_iᵀ S v_i − (ūᵀ v_i)²] — no n×m
    * materialization (SURVEY §2.J / D4). */
  def polarization(model: ALSModel): Double = {
    val (uBar, s) = factorMoments(model)
    val items = model.itemFactors.select("features").collect()
    val vals = items.map { r =>
      val v = DenseVector(r.getSeq[Float](0).map(_.toDouble).toArray)
      val m1 = v dot (s * v)
      val m2 = uBar dot v
      m1 - m2 * m2
    }
    vals.sum / vals.length
  }

  /** Full Alg. 1 loop: init X, then `steps` projected-GD iterations, each
    * re-factorizing [R; X] and descending polarization. Returns the final
    * X and the objective trace (evaluated per iteration). */
  def optimize(spark: SparkSession, ratings: DataFrame, alpha: Double,
      steps: Int, cfg: AlsEngine.Config = AlsEngine.Config(),
      eta: Double = 1e4): (DataFrame, Seq[Double]) = {
    var x = init(spark, ratings, alpha).cache()
    val trace = Seq.newBuilder[Double]
    trace += polarization(AlsEngine.train(ratings.unionByName(x), cfg))
    for (_ <- 1 to steps) {
      val next = step(spark, ratings, x, cfg, eta).cache()
      next.count() // materialize before unpersisting the predecessor
      x.unpersist()
      x = next
      trace += polarization(AlsEngine.train(ratings.unionByName(x), cfg))
    }
    (x, trace.result())
  }

  /** One projected-GD step on X (Alg. 1): descend polarization through the
    * ridge closed form u_a = (VᵀV + λ·m·I)⁻¹ Vᵀ x_a (V fixed), then
    * box-project into [1,5]. Returns the updated antidote rows.
    *
    * The m-dimensional chain ∂U/∂x_a = V A⁻¹ Vᵀ · (2/(m·n))(V u_a − V ū)
    * collapses to V·w_a with w_a = (2/(m·n)) A⁻¹ B (u_a − ū), B = VᵀV —
    * so the driver only ever touches k-dim/k×k quantities; X itself and
    * every item-dimension product stay DISTRIBUTED (Vᵀx_a is a broadcast
    * join + groupBy, the update x−η·v_i·w_a a zip_with). This is what
    * makes the step valid at 100 TB (and ~3× faster than a driver
    * round-trip of X even at sf0.1). */
  def step(spark: SparkSession, ratings: DataFrame, x: DataFrame,
      cfg: AlsEngine.Config = AlsEngine.Config(), eta: Double = 1.0): DataFrame = {
    import spark.implicits._

    val aug = ratings.unionByName(x).cache()
    val model = AlsEngine.train(aug, cfg)
    val k = cfg.rank

    val (uBar, _) = factorMoments(model)
    val nTot = model.userFactors.count().toDouble
    val m = model.itemFactors.count().toDouble

    // B = VᵀV — k×k reduction over item factors via the typed Gram
    // aggregator (partial-aggregates map-side; merges associatively).
    val f = col("features")
    val gram = udaf(new graft.functions.GramAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val tri = model.itemFactors.select(gram(f).as("g")).head().getSeq[Double](0)
    val b = DenseMatrix.zeros[Double](k, k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      b(i, j) = tri(idx); b(j, i) = tri(idx)
      idx += 1
    }
    val a = b + (DenseMatrix.eye[Double](k) * (cfg.regParam * m))

    // t_a = Vᵀ x_a per antidote user: broadcast-join X with item factors,
    // aggregate k weighted sums — result is k̃×k, tiny on the driver.
    val vdf = model.itemFactors
      .select(col("id").as("item_idx"), col("features"))
    val xi = x.select(col("user_id"), col("item_id"),
      col("item_id").cast(IntegerType).as("item_idx"),
      col("rating").cast(DoubleType).as("rating"))
    val tRows = xi.join(broadcast(vdf), "item_idx")
      .groupBy("user_id")
      .agg(sum(col("rating") * element_at(f, 1).cast(DoubleType)).as("t0"),
        (1 until k).map(i => sum(col("rating") *
          element_at(f, i + 1).cast(DoubleType)).as(s"t$i")): _*)
      .collect()

    val c = 2.0 / (m * nTot)
    val wRows = tRows.map { r =>
      val t = DenseVector.tabulate(k)(i => r.getDouble(1 + i))
      val ua = a \ t                       // ridge closed form
      val wa = (a \ (b * (ua - uBar))) * c // gradient coefficients
      (r.getLong(0), wa.toArray.toSeq)
    }.toSeq
    val wdf = wRows.toDF("user_id", "w")

    // Distributed update + box projection: x ← clip(x − η·(v_i·w_a), 1, 5).
    val dot = aggregate(
      zip_with(col("features"), col("w"), (p, q) => p.cast(DoubleType) * q),
      lit(0.0), (acc, v) => acc + v)
    val out = xi.join(broadcast(vdf), "item_idx")
      .join(broadcast(wdf), "user_id")
      .select(col("user_id"), col("item_id"),
        round(least(lit(5.0), greatest(lit(1.0),
          col("rating") - lit(eta) * dot)), 6).as("rating"))
    aug.unpersist()
    out
  }
}

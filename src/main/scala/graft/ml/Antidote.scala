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

  /** k̃ = ⌈α·n_users⌉ synthetic users (ids above max real id) × all items. */
  def init(spark: SparkSession, ratings: DataFrame, alpha: Double): DataFrame = {
    val row = ratings.agg(
      countDistinct(col("user_id")).as("n"), max(col("user_id")).as("mx")).head()
    val (n, mx) = (row.getLong(0), row.getLong(1))
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

  /** One projected-GD step on X (Alg. 1): descend polarization through the
    * ridge closed form u_a = (VᵀV + λ·m·I)⁻¹ Vᵀ x_a (V fixed), then
    * box-project into [1,5]. Returns the updated antidote rows. */
  def step(spark: SparkSession, ratings: DataFrame, x: DataFrame,
      cfg: AlsEngine.Config = AlsEngine.Config(), eta: Double = 1.0): DataFrame = {
    import spark.implicits._

    val model = AlsEngine.train(ratings.unionByName(x), cfg)
    val k = cfg.rank

    // V (m×k) — item-dimension-sized driver state.
    val itemRows = model.itemFactors.collect()
    val m = itemRows.length
    val itemIds = itemRows.map(_.getInt(0))
    val idIndex = itemIds.zipWithIndex.toMap
    val v = DenseMatrix.tabulate(m, k)((i, j) =>
      itemRows(i).getSeq[Float](1)(j).toDouble)

    val (uBar, _) = factorMoments(model)
    val nTot = model.userFactors.count().toDouble
    val meanPred = v * uBar // mean_i ≈ ūᵀ v_i per item

    // Ridge system A = VᵀV + λ·m·I (MLlib scales reg by the user's
    // rating count; antidote users rate all m items).
    val a = (v.t * v) + (DenseMatrix.eye[Double](k) * (cfg.regParam * m))

    val xRows = x.select(col("user_id").cast(LongType),
      col("item_id").cast(LongType), col("rating").cast(DoubleType))
      .as[(Long, Long, Double)].collect()
    val updated = xRows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (userId, rows) =>
        val xa = DenseVector.zeros[Double](m)
        rows.foreach { case (_, item, r) => xa(idIndex(item.toInt)) = r }
        val ua = a \ (v.t * xa)         // u_a = A⁻¹ Vᵀ x_a
        val rhat = v * ua                // R̂_a
        val g = (rhat - meanPred) * (2.0 / (m * nTot)) // ∂U/∂R̂_a
        val grad = v * (a \ (v.t * g))  // ∂U/∂x_a = V A⁻¹ Vᵀ g
        val xNew = xa - grad * eta
        itemIds.indices.map { i =>
          val clipped = math.min(5.0, math.max(1.0, xNew(i)))
          (userId, itemIds(i).toLong, math.rint(clipped * 1e6) / 1e6)
        }
    }
    updated.toDF("user_id", "item_id", "rating")
  }
}

package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Matrix-factorization engine: MLlib blocked ALS, the distributed
  * counterpart of the reference's per-user/per-item ridge loop (paper
  * §3.1 masked least squares — identical objective, block-parallel
  * solver).
  */
object AlsEngine {

  case class Config(rank: Int = 8, regParam: Double = 0.1, maxIter: Int = 10,
      seed: Long = 42L)

  /** Train on ratings(user_id BIGINT, item_id BIGINT, rating DOUBLE).
    * ALS wants int ids; fixture keys fit comfortably. */
  def train(ratings: DataFrame, cfg: Config = Config()): ALSModel = {
    val prepared = ratings.select(
      col("user_id").cast(IntegerType).as("user"),
      col("item_id").cast(IntegerType).as("item"),
      col("rating").cast(FloatType).as("rating"))
    new ALS()
      .setRank(cfg.rank)
      .setRegParam(cfg.regParam)
      .setMaxIter(cfg.maxIter)
      .setSeed(cfg.seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setColdStartStrategy("drop")
      .fit(prepared)
  }

  /** Predictions for the known cells (long form — never the dense n×m). */
  def predictKnown(model: ALSModel, ratings: DataFrame): DataFrame =
    model.transform(ratings.select(
      col("user_id").cast(IntegerType).as("user"),
      col("item_id").cast(IntegerType).as("item"),
      col("rating").cast(FloatType).as("rating")))
      .select(col("user").cast(LongType).as("user_id"),
        col("item").cast(LongType).as("item_id"),
        col("rating").cast(DoubleType).as("rating"),
        col("prediction").cast(DoubleType).as("p"))

  /** RMSE of the model on the given cells. */
  def rmse(model: ALSModel, ratings: DataFrame): DataFrame =
    predictKnown(model, ratings)
      .agg(round(sqrt(avg((col("rating") - col("p")) *
        (col("rating") - col("p")))), 6).as("rmse"))
}

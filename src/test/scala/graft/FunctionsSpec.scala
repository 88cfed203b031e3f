package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Native DotProduct expression vs the HOF fallback: must be bit-equal
  * (same left-to-right double accumulation), SQL-callable, and codegen'd. */
class FunctionsSpec extends SparkTestBase {

  test("native graft_dot is bit-equal to the HOF formulation") {
    val embs = Tables.load(spark, sf, "embeddings")
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val both = embs.select(
      call_function("graft_dot", col("embedding"), col("embedding"))
        .as("native"), hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("graft_dot is registered for SQL via GraftExtensions") {
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb_t")
    val v = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM emb_t ORDER BY vec_id LIMIT 1")
      .head().getDouble(0)
    assert(v > 0)
  }

  test("cosine self-similarity is 1 under the native path") {
    val embs = Tables.load(spark, sf, "embeddings")
    val bad = embs.select(
      VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9)
    assert(bad.count() == 0)
  }
}

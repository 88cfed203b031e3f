package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sf1 fixture generator for the scale-ladder run
  * (VERDICT r9 task 1): 10× the sf0.1 row counts, same schemas and value
  * ranges, zero randomness — every column is a pure function of the row
  * key via xxhash64, so repeated generation is byte-stable and results
  * are partitioning-independent. Two deliberate departures from the
  * driver fixture's content (r10 tasks 3/8): documents draw from a
  * 10 000-word Zipf vocabulary (natural shingle/simhash candidate
  * densities) and embeddings carry planted 32-cluster structure
  * (meaningful ANN recall) — see the per-table comments.
  *
  * The driver's own fixtures are read-only and stop at sf0.1; this
  * writes under target/ (never /root/testdata) so the engine can be
  * measured one decade further. Layout matches the fixture contract:
  * `<out>/<table>.parquet`. The events table is written as a SINGLE
  * parquet file (coalesce+rename) because the streaming replay lists
  * files with `pathGlobFilter=events.parquet`, which matches file names,
  * not directory names; the big batch tables are written as multi-part
  * directories so scans parallelize the way a production table would.
  *
  * Usage: runMain graft.GenData [outDir] [scale]
  *   scale multiplies the sf0.1 row counts (default 10 = sf1).
  */
object GenData {

  private val Mkt = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val PType = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO",
    "SMALL", "STANDARD")
  private val PAdj = Seq("blue", "cold", "hot", "large", "small", "shiny",
    "plain", "round")
  private val PNoun = Seq("anvil", "bolt", "gear", "gizmo", "plate",
    "ring", "rod", "widget")
  private val Prio = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val EvType = Seq("view", "click", "purchase", "signup", "error")
  private val Langs = Seq("en", "de", "fr", "es", "zh")

  /** Deterministic value in [0, n) from the key column and a stream id. */
  private def h(key: org.apache.spark.sql.Column, stream: Int, n: Long) =
    pmod(xxhash64(key, lit(stream)), lit(n))

  private def pick(key: org.apache.spark.sql.Column, stream: Int,
      vs: Seq[String]) =
    element_at(array(vs.map(lit): _*), (h(key, stream, vs.size) + 1)
      .cast(IntegerType))

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/sf1"
    val scale = if (args.length > 1) args(1).toInt else 10
    val spark = Verify.session()
    write(spark, out, scale)
    println(s"""{"gen":"$out","scale":$scale,"ok":true}""")
    spark.stop()
  }

  def write(spark: SparkSession, out: String, scale: Int): Unit = {
    val nCust = 15000L * scale
    val nSupp = 1000L * scale
    val nPart = 20000L * scale
    val nOrd = 150000L * scale
    val nEvt = 100000L * scale
    val nDoc = 5000L * scale
    val nEmb = 2000L * scale

    def save(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // dimension tables small enough to copy verbatim from the fixture
    spark.read.parquet("/root/testdata/sf0.1/region.parquet")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/nation.parquet")

    val cust = spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      h(col("id"), 1, 25).cast(IntegerType).as("c_nationkey"),
      (lit(1000.0) + h(col("id"), 2, 900000) / 100.0).as("c_acctbal"),
      pick(col("id"), 3, Mkt).as("c_mktsegment"))
    save(cust, "customer", 4)

    val supp = spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      h(col("id"), 4, 25).cast(IntegerType).as("s_nationkey"),
      (lit(1000.0) + h(col("id"), 5, 900000) / 100.0).as("s_acctbal"))
    save(supp, "supplier", 2)

    // The part-name space GROWS with the catalog (r12 sf10 finding:
    // 8 adj × 8 noun = 64 names over 2 M parts made every same-name
    // group ~30 k rows, so edit-distance survivor sets — q_fuzzy_join —
    // were output-quadratic, 676 s at sf10, the same degeneracy the
    // 31-word doc vocabulary caused in r10). A third Zipf-spelled word
    // whose domain scales ~nPart/300 (clamped to the 10 000-word
    // bijective spelling space) holds expected same-name group size
    // O(1) per decade, so near-duplicate pair counts grow with the
    // data, not its square — names stay realistic (brand-word word
    // catalog-code) and DuckDB recomputes the identical column.
    val nameSuffixes = math.max(1L, math.min(10000L, nPart / 300L))
    val part = spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(col("id"), 6, PAdj), lit(" "),
        pick(col("id"), 7, PNoun), lit(" "),
        // stream 42: unused anywhere else — 27 was events.user_id's
        // stream, which correlated p_name's third word with it via the
        // same base hash under two moduli (ADVICE r13)
        zipfWord(h(col("id"), 42, nameSuffixes))).as("p_name"),
      concat(lit("Brand#"), (h(col("id"), 8, 25) + 1)).as("p_brand"),
      pick(col("id"), 9, PType).as("p_type"),
      (h(col("id"), 10, 50) + 1).cast(IntegerType).as("p_size"),
      (lit(900.0) + col("id") % 100000 / 10.0).as("p_retailprice"))
    save(part, "part", 4)

    val orders = spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      h(col("id"), 11, nCust).as("o_custkey"),
      pick(col("id"), 12, Seq("O", "F", "P")).as("o_orderstatus"),
      (lit(1000.0) + h(col("id"), 13, 49900000) / 100.0).as("o_totalprice"),
      timestamp_add("DAY", h(col("id"), 14, 2400).cast(IntegerType),
        lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
        .as("o_orderdate"),
      pick(col("id"), 15, Prio).as("o_orderpriority"))
    save(orders, "orders", 8)

    // lineitem derives from orders so join keys are consistent: 1–7
    // lines per order (avg 4 → ~6 M rows at scale 10)
    val li = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey"), col("o_orderdate"))
      .withColumn("l_linenumber",
        explode(sequence(lit(1),
          (h(col("o_orderkey"), 16, 7) + 1).cast(IntegerType))))
    val liKey = col("o_orderkey") * 10 + col("l_linenumber")
    val lineitem = li.select(
      col("o_orderkey").as("l_orderkey"),
      h(liKey, 17, nPart).as("l_partkey"),
      h(liKey, 18, nSupp).as("l_suppkey"),
      col("l_linenumber"),
      (h(liKey, 19, 50) + 1).cast(DoubleType).as("l_quantity"),
      (lit(900.0) + h(liKey, 20, 10410000) / 100.0).as("l_extendedprice"),
      (h(liKey, 21, 11) / 100.0).as("l_discount"),
      (h(liKey, 22, 9) / 100.0).as("l_tax"),
      pick(liKey, 23, Seq("N", "A", "R")).as("l_returnflag"),
      pick(liKey, 24, Seq("O", "F")).as("l_linestatus"),
      timestamp_add("DAY", (h(liKey, 25, 95) + 1).cast(IntegerType),
        col("o_orderdate")).as("l_shipdate"))
    save(lineitem, "lineitem", 16)

    // events: ids ordered by ts (the slice-prefix property the streaming
    // maintainers rely on); 30 days of activity, avg gap = 30 d / n with
    // ±1 s jitter kept below half the gap so ordering never flips
    val gapUs = 30L * 86400L * 1000000L / nEvt
    val events = spark.range(nEvt).select(
      col("id").as("event_id"),
      timestamp_add("MICROSECOND",
        col("id") * gapUs + h(col("id"), 26, math.max(1L, gapUs / 2)),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).as("ts"),
      h(col("id"), 27, nCust).as("user_id"),
      pick(col("id"), 28, EvType).as("event_type"),
      (h(col("id"), 29, 56022) / 100.0).as("value"),
      format_string("{\"k\": %d}", h(col("id"), 30, 100)).as("props"))
    // single FILE (not directory): the streaming replay's
    // pathGlobFilter=events.parquet matches leaf file names
    val tmp = s"$out/_events_tmp"
    events.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), conf)
    val partFile = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part under $tmp"))
    val dst = new org.apache.hadoop.fs.Path(s"$out/events.parquet")
    fs.delete(dst, true)
    fs.rename(partFile, dst)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)

    // documents: 8–110 words drawn Zipf(1)-ish from a 10 000-word
    // synthetic vocabulary (VERDICT r10 task 8 — the old 31-word vocab
    // made sf1 shingle/simhash candidate densities adversarial). Each
    // slot draws u ~ U[0,1) from the row hash and inverts the Zipf CDF
    // via rank = floor(10000^u) ∈ [1, 9999] (P(rank=k) ≈ 1/(k·ln 10⁴)),
    // then spells the rank as a unique 3-syllable pseudo-word, so word
    // frequencies follow a natural long-tail law while generation stays
    // a pure per-row expression (no dictionary shuffle, no driver data).
    save(documentsDf(spark, nDoc), "documents", 4)

    // embeddings: 32 hash-seeded centroids (coordinates uniform in
    // [-1, 1)) plus bounded per-dim jitter in [-0.2, 0.2] (VERDICT r10
    // task 3 — planted cluster structure so sign-LSH / IVF recall
    // numbers mean something: a probe's true top-k neighbours sit inside
    // its own cluster, and an index that prunes to the wrong lists pays
    // in measured recall, not noise). label keeps its [0, 10) range
    // (centroid mod 10) so label-conditioned queries (knn, kmeans,
    // centroids) now see geometry consistent with the label.
    save(embeddingsDf(spark, nEmb), "embeddings", 2)
  }

  /** The documents builder, public so specs can pin the vocabulary
    * statistics without generating the full fixture. */
  def documentsDf(spark: SparkSession, nDoc: Long): DataFrame =
    spark.range(nDoc)
      .withColumn("n_words", (h(col("id"), 31, 103) + 8).cast(IntegerType))
      .select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), col("n_words")), j => {
          val u = pmod(xxhash64(col("id") * 1000 + j, lit(32)),
            lit(1000000L)) / 1000000.0
          val rank = floor(pow(lit(10000.0), u)).cast(IntegerType)
          zipfWord(rank)
        }), " ").as("text"),
        pick(col("id"), 33, Langs).as("lang"),
        concat(lit("src"), h(col("id"), 34, 20)).as("source"))
      .withColumn("n_chars", length(col("text")))

  /** The embeddings builder, public so specs can pin ANN recall on the
    * planted-cluster geometry without generating the full fixture. */
  def embeddingsDf(spark: SparkSession, nEmb: Long): DataFrame =
    spark.range(nEmb)
      .withColumn("cluster", h(col("id"), 35, 32).cast(IntegerType))
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("cluster") * 64 + j, lit(41)), lit(2000001))
            / 1000000.0 - 1.0)
            + (pmod(xxhash64(col("id") * 64 + j, lit(36)), lit(400001))
              / 1000000.0 - 0.2))
            .cast(FloatType)).as("embedding"),
        (col("cluster") % 10).as("label"))

  private val SylA = Seq("ba", "ce", "di", "fo", "gu", "ha", "je", "ki",
    "lo", "mu", "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "yo", "zu")
  private val SylB = Seq("bel", "cor", "dan", "fir", "gol", "hem", "jun",
    "kan", "lim", "mor", "nev", "pol", "qua", "rus", "sel", "tor", "vin",
    "wex", "yar", "zem")
  private val SylC = Seq("ad", "eb", "ic", "od", "uf", "ag", "eh", "ij",
    "ok", "ul", "am", "en", "ip", "oq", "ur", "as", "et", "iv", "ow",
    "ux", "az", "ey", "ib", "oc", "ud")

  /** Bijective rank → pseudo-word spelling: rank ∈ [0, 9999] maps to
    * syllables (rank mod 20, rank/20 mod 20, rank/400 mod 25) — 10 000
    * unique 6-char words, no dictionary broadcast needed. */
  private def zipfWord(rank: org.apache.spark.sql.Column) = {
    def at(vs: Seq[String], i: org.apache.spark.sql.Column) =
      element_at(array(vs.map(lit): _*), (i + 1).cast(IntegerType))
    concat(at(SylA, pmod(rank, lit(20))),
      at(SylB, pmod((rank / 20).cast(IntegerType), lit(20))),
      at(SylC, pmod((rank / 400).cast(IntegerType), lit(25))))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (north-star extension).
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set against the full corpus,
  *    exact cosine, per-query top-k. Exact and oracle-checkable; the
  *    candidate stream is embarrassingly parallel, the only shuffle is the
  *    final per-query top-k (tiny: queries × k rows after partial ranking).
  *  - LSH (random hyperplane / SRP): deterministic pseudo-random projection
  *    signs bucket vectors; only same-bucket pairs are scored. L tables ×
  *    P planes trade recall vs candidate count — the 100 TB path.
  *
  * All math is double-precision Column expressions (codegen'd, no UDFs).
  */
object Similarity {

  /** Cosine similarity of two array<float|double> columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query id. `queries` must be small enough
    * to broadcast (it is the page of ids being searched, not the corpus).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("query_vec"), col("vec")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** ANN top-k via SRP-LSH: L tables of P planes; same-bucket candidates are
    * exact-rescored, then per-query top-k. Recall rises with L; candidate
    * count falls with P.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int,
              numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    val tables = (0 until numTables).map { t =>
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("table", lit(t))
        .withColumn("bucket", srpBucketPacked(col("vec"), numPlanes, t))
    }.reduce(_ unionByName _)
    val q = tables.filter(col("id").isin(queryIds: _*))
      .select(col("table").as("q_table"), col("bucket").as("q_bucket"),
        col("id").as("query_id"), col("vec").as("query_vec"))
    val cand = tables.join(broadcast(q),
        col("table") === col("q_table") && col("bucket") === col("q_bucket") &&
        col("id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("id").as("neighbor_id"), col("vec"))
      .distinct()
      .withColumn("cos", cosine(col("query_vec"), col("vec")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Packed SRP bucket: bit p set iff dot(vec, r_{table,p}) > 0. */
  private[ops] def srpBucketPacked(vec: Column, numPlanes: Int, table: Int): Column = {
    val perPlane = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x.cast("double") *
            when(pmod(xxhash64(lit(table), lit(p), d), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (s, v) => s + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    perPlane.reduce(_ + _)
  }
}

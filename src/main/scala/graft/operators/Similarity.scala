package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - `bruteForceTopK`: exact baseline — queries × corpus join, cosine,
  *     windowed top-k. Correct at any scale where |queries|·|corpus| pairs
  *     are affordable (broadcast the query side: the join is then a
  *     shuffle-free broadcast nested loop over corpus partitions).
  *   - `srpBuckets` / `lshAnnTopK`: sign-random-projection LSH — hash each
  *     vector to a `bits`-bit code from deterministic pseudo-random
  *     hyperplanes, probe only the corpus bucket(s) matching the query's
  *     code. At 100 TB the corpus is bucketed once (write-time partition),
  *     each query touches |corpus|/2^bits vectors.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. Ranking uses rounded
    * cosine with id tiebreak so results are replayable across engines.
    * Norms are precomputed per side so the |Q|×|C| pair loop does only the
    * dot product (same arithmetic as inline norms — parity-safe). */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"))
    val rank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9))
      .withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Attach the SRP-LSH bucket code (bits-bit int) to each vector. */
  def srpBuckets(
      vectors: DataFrame,
      vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val code = (0 until bits)
      .map(b => VectorFunctions.srpBit(col(vecCol), b).cast("long") * (1L << b))
      .reduce(_ + _)
    vectors.withColumn("bucket", code)
  }

  /** ANN top-k: candidates share the query's LSH bucket; exact cosine +
    * top-k only within the bucket. Recall improves with fewer bits (bigger
    * buckets) — callers trade bits vs probe cost. */
  def lshAnnTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bits: Int = 8,
      k: Int = 10): DataFrame = {
    val q = srpBuckets(queries, vecCol, bits)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"),
        VectorFunctions.norm(col(vecCol)).as("qn"))
    val c = srpBuckets(corpus, vecCol, bits)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"),
        VectorFunctions.norm(col(vecCol)).as("cn"))
    val rank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(VectorFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9))
      .withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}

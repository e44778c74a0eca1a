package graft.dataprep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (task brief): brute-force cosine top-k as the correctness baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path —
  * buckets turn the O(n·q) scan into an equi-join on bucket id, the
  * same shape an IVF index gives a 100 TB corpus.
  */
object Similarity {

  val LshPlanes = 6

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * a fixed integer mix (no Math.random — reproducible across runs and
    * expressible as a Column for codegen). */
  private def planeWeight(p: Int, dim: Int): Double = {
    var h = p.toLong * 1315423911L + dim.toLong * 0x9E3779B97F4A7C15L
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    (Math.floorMod(h, 2001L) - 1000L) / 1000.0
  }

  /** Sign-bit bucket id of an embedding under `LshPlanes` hyperplanes. */
  def lshBucket(dim: Int) = {
    (0 until LshPlanes).map { p =>
      val dotP = (0 until dim).map(i =>
        element_at(col("embedding"), i + 1).cast("double") * lit(planeWeight(p, i)))
        .reduce(_ + _)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force cosine top-k against the query vector `queryVecId`.
    * The query side is a 1-row broadcast; the scan side stays fully
    * parallel; top-k is TakeOrderedAndProject (no global sort). */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    embeddings.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed ANN: candidates share the query's hyperplane bucket;
    * exact cosine re-rank inside the bucket only. */
  def lshTopK(embeddings: DataFrame, dim: Int, queryVecId: Long = 0L, k: Int = 5): DataFrame = {
    val withBucket = embeddings.withColumn("bucket", lshBucket(dim))
    val q = withBucket.where(col("vec_id") === queryVecId)
      .select(col("bucket").as("q_bucket"), col("embedding").as("q_emb"))
    withBucket.where(col("vec_id") =!= queryVecId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("bucket"),
        round(VectorOps.cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: one narrow map (dot product as a
  *    `zip_with`/`aggregate` expression, codegen'd) + TakeOrderedAndProject.
  *    At 100 TB this is a full scan but zero shuffle: each task computes its
  *    partition's local top-k and only k rows per task reach the driver.
  *  - LSH-bucketed ANN (random hyperplanes): bucket = sign-bit string of
  *    projections onto fixed pseudo-random planes. Search touches only the
  *    query's bucket (partition-prunable if the table is written
  *    partitionBy(bucket)); near-dup joins become bucket-equi-joins instead
  *    of O(n²).
  *
  * All arithmetic is double, sequential left-to-right (Spark `aggregate`
  * folds in array order) — deterministic across runs and engines.
  */
object Similarity {

  /** Sequential-order dot product of two numeric-array columns, in double.
    * Native expression ([[graft.plans.VecDot]]) — bit-identical to the
    * `aggregate(zip_with(...))` composition it replaces, minus the
    * per-element lambda interpretation and intermediate array. */
  def dot(a: Column, b: Column): Column = graft.plans.VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Top-k rows by cosine similarity to a constant query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: nPlanes x dim, components in
    * [-1, 1), from a fixed LCG — plan literals, identical across runs. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toDouble % 2048.0) / 1024.0 - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** LSH bucket id: one bit per hyperplane (sign of the projection). */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeArr = array(p.map(lit): _*)
      when(dot(vecCol, planeArr) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: restrict to the query's LSH bucket, then exact cosine rank.
    * `planes` must be shared between indexing and query time. */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, nPlanes: Int = 8): DataFrame = {
    val dim = query.size
    val planes = hyperplanes(nPlanes, dim)
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      val d = p.zip(query).map { case (pv, qv) => pv * qv }.sum
      if (d >= 0) 1L << j else 0L
    }.reduce(_ | _)
    val q = array(query.map(v => lit(v)): _*)
    df.withColumn("bucket", lshBucket(col(vecCol), planes))
      .filter(col("bucket") === lit(qBucket))
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-dup pairs: bucket-equi-join then exact cosine filter.
    * Only same-bucket pairs are materialized (the LSH blocks the O(n²)). */
  def cosineNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    // norms are computed once per vector BEFORE the bucket join — inside the
    // join each pair costs one dot product, not three
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .distinct()
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (the point of each choice):
  *  - exact dedup is a hash-groupBy on a 128-bit digest — one shuffle keyed
  *    by digest, perfectly partitionable, no skew (md5 is uniform);
  *  - MinHash+LSH turns the O(n²) near-dup problem into
  *    shingle -> signature (narrow) -> band explode -> bucket join (shuffle
  *    keyed by band value) -> candidate verify. At 100 TB only the band
  *    tuples shuffle (n_docs × n_bands small rows), never text × text;
  *  - SimHash is a single groupBy over exploded tokens, then a chunk-keyed
  *    self-join (pigeonhole: hamming<=k needs chunks=k+1);
  *  - verification (exact Jaccard on candidate pairs) touches only the
  *    candidate set, so false positives cost, false negatives are bounded by
  *    band math.
  */
object Dedup {

  // ---- exact ----

  /** Exact dedup digest groups: digest, surviving (min) id, multiplicity. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the lowest-id row per distinct text. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ---- shingles / jaccard ----

  /** k-word shingles (distinct), whitespace-tokenized; documents shorter
    * than k words contribute their full text as the single shingle. */
  def shingles(text: Column, k: Int): Column = {
    val w = split(text, " ")
    val n = size(w)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - lit(k)),
          i => concat_ws(" ", slice(w, i + lit(1), lit(k)))))
      .otherwise(array(text)))
  }

  /** Exact Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** All pairs within `df` (blocked by `blockCol` to bound the quadratic)
    * with word-k-shingle Jaccard >= threshold. The block join is an equi-join
    * on the block key — shuffle-partitioned, no cartesian. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, k: Int, threshold: Double): DataFrame = {
    val withSh = df.select(col(idCol), col(blockCol), shingles(col(textCol), k).as("sh"))
    val a = withSh.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- MinHash + LSH ----

  /** Deterministic (a, b) coefficients for the minhash family, from a fixed
    * LCG seed — literals in the plan, identical across runs/retries. */
  def minhashCoeffs(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 33) }
    (0 until numHashes).map { _ => (next() % MinhashPrime + 1, next() % MinhashPrime) }
  }

  /** Mersenne prime 2^31-1: keeps a*h+b within a long. */
  val MinhashPrime: Long = 2147483647L

  /** MinHash signature (array of numHashes longs) over a shingle array:
    * sig_i = min over shingles of (a_i * (xxhash64(sh) mod p) + b_i) mod p. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column = {
    val coeffs = minhashCoeffs(numHashes)
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingleArr,
        sh => pmod(lit(a) * pmod(xxhash64(sh), lit(MinhashPrime)) + lit(b),
          lit(MinhashPrime))))
    }: _*)
  }

  /** LSH candidate pairs: one band per signature position (r=1, b=numHashes
    * — chosen so that P[candidate | jaccard s] = 1-(1-s)^b, i.e. recall
    * ~1-2^-16 at s=0.5 with 16 hashes; the verify step then removes false
    * positives). Returns distinct (id_a, id_b). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(shingles(col(textCol), k), numHashes).as("sig"))
    val bands = sigs.select(col("id"),
        posexplode(col("sig")).as(Seq("band", "hash")))
    val a = bands.select(col("band"), col("hash"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("hash"), col("id").as("id_b"))
    a.join(b, Seq("band", "hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline with exact-Jaccard verification of
    * candidates: output pairs whose true word-k-shingle Jaccard >= threshold.
    * (The verify join re-attaches shingle sets only for candidate ids.) */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, threshold: Double = 0.5): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, numHashes)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash ----

  /** 64-bit SimHash over whitespace tokens: bit j of the output is 1 iff the
    * sum over tokens of (+1 if bit j of xxhash64(token) else -1) is > 0.
    * Computed via explode + single groupBy (one shuffle keyed by doc id). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      out: String = "simhash"): DataFrame = {
    val tok = df.select(col(idCol),
        explode(array_distinct(split(col(textCol), " "))).as("_tok"))
      .withColumn("_h", xxhash64(col("_tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"_b$j")
    }
    val summed = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { j =>
      when(col(s"_b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), hash.as(out))
  }

  /** SimHash near-dup candidate pairs with hamming distance <= maxDist,
    * found by chunk-LSH (pigeonhole: maxDist+1 chunks, equal chunk => join),
    * then exact popcount verification. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val nChunks = maxDist + 1
    val chunkBits = 64 / nChunks
    val hashes = simhash(df, idCol, textCol)
    val chunked = hashes.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until nChunks).map { c =>
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(lit((1L << chunkBits) - 1))
      }: _*)).as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "ckey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}

package graft.functions

import graft.plans.VecDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for the embedding store: split each vector
  * into `m` subspaces, k-means each subspace independently (`ks` codes),
  * and store one byte-sized code per subspace instead of the float
  * subvector — a 64-dim float32 vector compresses 32x (256 bytes -> 8
  * codes). At 100 TB of embeddings this is the difference between a
  * vector store that fits executor memory for rerank and one that
  * doesn't; it composes with [[IVF]] exactly as in the FAISS IVF-PQ
  * layout (coarse cell for pruning, PQ codes for in-cell scoring).
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * full-precision, a per-subspace lookup table of
  * `dist(querySlice, codebook[s][j])` is built once (m x ks doubles —
  * driver metadata), and each stored vector's approximate distance is m
  * table lookups summed — a narrow codegen'd map over the codes column,
  * no vector arithmetic per row.
  *
  * Exactness discipline: table terms are quantized to integer NANOUNITS
  * (floor(term*1e9 + 0.5)) BEFORE summation — the perplexity trick — so
  * the per-row sum is associative long addition and the correctness gate
  * recomputes codes AND ADC scores in SQL exactly. Training reuses
  * [[IVF.train]] per subspace (deterministic seeding, exact-average Lloyd
  * updates); train on a sample at real scale, as all PQ deployments do.
  */
object PQ {

  /** m codebooks of ks centroids of dim/m doubles each. */
  final case class Model(codebooks: Seq[Seq[Seq[Double]]]) {
    def m: Int = codebooks.size
    def ks: Int = codebooks.head.size
    def dsub: Int = codebooks.head.head.size
  }

  /** Train per-subspace codebooks: `m` independent [[IVF.train]] runs over
    * the sliced column. */
  def train(df: DataFrame, vecCol: String, idCol: String, m: Int, ks: Int,
      iters: Int = 2): Model = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Model((0 until m).map { s =>
      IVF.train(
        df.select(col(idCol), slice(col(vecCol), s * dsub + 1, dsub).as("_sub")),
        "_sub", idCol, k = ks, iters = iters).centroids
    })
  }

  /** Per-subspace argmin code (squared L2, lower-code tie-break), as an
    * array<int> of length m — the stored representation. */
  def encode(vec: Column, model: Model): Column = {
    val dsub = model.dsub
    array(model.codebooks.zipWithIndex.map { case (book, s) =>
      val sub = slice(vec, s * dsub + 1, dsub)
      val selfDot = VecDot(sub, sub)
      array_min(array(book.zipWithIndex.map { case (c, j) =>
        val cArr = array(c.map(lit): _*)
        val cn2 = c.map(x => x * x).sum
        struct(
          (selfDot - lit(2.0) * VecDot(sub, cArr) + lit(cn2)).as("dist"),
          lit(j).as("code"))
      }: _*)).getField("code")
    }: _*)
  }

  /** ADC lookup table for `query`, quantized to nano-units: table(s)(j) =
    * floor(1e9 * Σ_d (q_sd − c_sd)² + 0.5), summed left-to-right — the
    * same fold the SQL oracle runs. */
  def adcTable(query: Seq[Double], model: Model): Seq[Seq[Long]] = {
    val dsub = model.dsub
    model.codebooks.zipWithIndex.map { case (book, s) =>
      val q = query.slice(s * dsub, (s + 1) * dsub)
      book.map { c =>
        val term = q.zip(c).foldLeft(0.0) { case (acc, (qd, cd)) =>
          acc + (qd - cd) * (qd - cd)
        }
        math.floor(term * 1e9 + 0.5).toLong
      }
    }
  }

  /** m table lookups summed from a prebuilt nano-unit table. */
  def adcDistFromTable(codes: Column, table: Seq[Seq[Long]]): Column =
    table.zipWithIndex.map { case (row, s) =>
      element_at(array(row.map(lit): _*), element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  /** Approximate squared-L2 (in nano-units) of each encoded row to the
    * query: m integer table lookups summed — associative, engine-exact. */
  def adcDist(codes: Column, query: Seq[Double], model: Model): Column =
    adcDistFromTable(codes, adcTable(query, model))

  /** Top-k by ADC distance over an encoded frame (idCol, codesCol). */
  def searchADC(encoded: DataFrame, idCol: String, codesCol: String,
      query: Seq[Double], model: Model, k: Int): DataFrame =
    encoded
      .withColumn("adc_dist_nano", adcDist(col(codesCol), query, model))
      .orderBy(col("adc_dist_nano"), col(idCol))
      .limit(k)
      .select(idCol, "adc_dist_nano")

  /** Residual of each vector against its assigned coarse centroid, as
    * array<double> — elementwise `cast(x as double) - c_d`, the exact
    * subtraction the SQL oracle mirrors. */
  def residual(vec: Column, coarse: IVF.Model): Column = {
    val centLit = array(coarse.centroids.map(c => array(c.map(lit): _*)): _*)
    val cent = element_at(centLit, IVF.assign(vec, coarse) + 1)
    zip_with(vec, cent, (x, c) => x.cast("double") - c)
  }

  /** Train codebooks on coarse-cell RESIDUALS — the true FAISS IVF-PQ
    * form: residuals concentrate around zero regardless of which cell a
    * vector lives in, so one codebook serves all cells at much lower
    * quantization error than raw-vector codes. */
  def trainResidual(df: DataFrame, vecCol: String, idCol: String,
      coarse: IVF.Model, m: Int, ks: Int, iters: Int = 2): Model =
    train(df.select(col(idCol), residual(col(vecCol), coarse).as("_res")),
      "_res", idCol, m = m, ks = ks, iters = iters)

  /** OFFLINE residual encode — the index build: (id, ivf_cell, pq_codes),
    * the FAISS inverted-list payload. The residual derives from the
    * already-computed cell column (no second argmin), and a deployment
    * lands this `partitionBy("ivf_cell")` so probes are partition pruning;
    * raw vectors are no longer needed at search time. Encoding runs once
    * per corpus, like [[IVF.writeIndexed]]. */
  def encodeResidual(df: DataFrame, vecCol: String, idCol: String,
      coarse: IVF.Model, pq: Model): DataFrame = {
    val centLit = array(coarse.centroids.map(c => array(c.map(lit): _*)): _*)
    val res = zip_with(col(vecCol),
      element_at(centLit, col("ivf_cell") + 1),
      (x, c) => x.cast("double") - c)
    df.withColumn("ivf_cell", IVF.assign(col(vecCol), coarse))
      .withColumn("_res", res)
      .select(col(idCol), col("ivf_cell"), encode(col("_res"), pq).as("pq_codes"))
  }

  /** Write the residual-encoded index cell-partitioned (the probe side of
    * the layout contract). */
  def writeResidualIndexed(df: DataFrame, vecCol: String, idCol: String,
      coarse: IVF.Model, pq: Model, path: String): Unit =
    encodeResidual(df, vecCol, idCol, coarse, pq)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("ivf_cell")
      .parquet(path)

  /** Residual IVF-PQ search over the STORED codes: probe `nProbe` cells
    * (partition pruning over a [[writeResidualIndexed]] layout); each
    * probed cell scores against a PER-CELL ADC table built from the
    * query's residual to that cell's centroid (nProbe × m × ks longs —
    * driver metadata). The corpus' raw vectors are never touched. */
  def searchIVFPQResidual(encoded: DataFrame, idCol: String,
      coarse: IVF.Model, pq: Model, query: Seq[Double],
      topK: Int, nProbe: Int): DataFrame = {
    val probed = coarse.centroids.zipWithIndex.map { case (c, j) =>
      val d = query.zip(c).foldLeft(0.0) { case (acc, (qd, cd)) =>
        acc + (qd - cd) * (qd - cd)
      }
      (d, j)
    }.sorted.take(nProbe).map(_._2)
    def cellTable(cell: Int): Seq[Seq[Long]] = {
      val cent = coarse.centroids(cell)
      pq.codebooks.zipWithIndex.map { case (book, s) =>
        val off = s * pq.dsub
        book.map { pc =>
          var acc = 0.0
          var i = 0
          while (i < pq.dsub) {
            val d = (query(off + i) - cent(off + i)) - pc(i)
            acc += d * d
            i += 1
          }
          math.floor(acc * 1e9 + 0.5).toLong
        }
      }
    }
    val distExpr = probed.foldRight(lit(null).cast("long"): Column) {
      case (c, acc) =>
        when(col("ivf_cell") === c,
          adcDistFromTable(col("pq_codes"), cellTable(c))).otherwise(acc)
    }
    encoded.filter(col("ivf_cell").isin(probed: _*))
      .withColumn("adc_dist_nano", distExpr)
      .orderBy(col("adc_dist_nano"), col(idCol))
      .limit(topK)
      .select(idCol, "adc_dist_nano")
  }

  /** OFFLINE raw-vector encode: (id, ivf_cell, pq_codes) — like
    * [[encodeResidual]] but with cell-independent codes (one codebook,
    * one ADC table per query; slightly lower recall than residual codes,
    * every arithmetic step SQL-provable with a single table). */
  def encodeWithCells(df: DataFrame, vecCol: String, idCol: String,
      coarse: IVF.Model, pq: Model): DataFrame =
    df.withColumn("ivf_cell", IVF.assign(col(vecCol), coarse))
      .select(col(idCol), col("ivf_cell"),
        encode(col(vecCol), pq).as("pq_codes"))

  /** IVF-PQ search over STORED raw-vector codes: the coarse quantizer
    * prunes to `nProbe` cells (partition pruning over a cell-partitioned
    * layout), one ADC table scores the survivors. Probe selection happens
    * driver-side on the k coarse centroids (metadata). */
  def searchIVFPQ(encoded: DataFrame, idCol: String,
      coarse: IVF.Model, pq: Model, query: Seq[Double],
      topK: Int, nProbe: Int): DataFrame = {
    val probed = coarse.centroids.zipWithIndex.map { case (c, j) =>
      val d = query.zip(c).foldLeft(0.0) { case (acc, (qd, cd)) =>
        acc + (qd - cd) * (qd - cd)
      }
      (d, j)
    }.sorted.take(nProbe).map(_._2)
    encoded.filter(col("ivf_cell").isin(probed: _*))
      .withColumn("adc_dist_nano", adcDist(col("pq_codes"), query, pq))
      .orderBy(col("adc_dist_nano"), col(idCol))
      .limit(topK)
      .select(idCol, "adc_dist_nano")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the standard
  * pre-step (whitening/compaction) before semantic dedup and ANN at scale
  * (SemDeDup normalizes and reduces before clustering; FAISS OPQ/PCA
  * transforms are routine). The 100 TB division of labor mirrors [[IVF]]:
  *
  *  - **Fit** touches the corpus exactly once, through
  *    [[graft.plans.VecMomentsAgg]] — a single partial-aggregable pass
  *    whose only shuffle payload is one ~17 KB integer buffer per
  *    partition. Covariance, eigenvectors, and explained variance are then
  *    a d×d DRIVER-side computation (d = 64 → microseconds) — model-sized
  *    state, never data.
  *  - **Project** is a pure narrow map: `y_j = <v, c_j> − <mean, c_j>`
  *    with the trained components shipped as plan literals (the
  *    [[IVF.assign]] contract) — fused into the scan, zero shuffle, and
  *    independently recomputable by an oracle from the same literals.
  *
  * Determinism: the moment buffer is integer (milli-quantized at the row,
  * associative long sums — any partition order gives the same covariance),
  * and the driver eigensolver is a fixed-iteration power method with
  * deflation, deterministic init, and a fixed sign convention — so
  * train() is bit-stable across runs, not just ulp-close.
  */
object PCA {

  /** `mean` is the d-vector of component means; `components` holds k unit
    * eigenvectors (descending eigenvalue); `variances` the matching
    * eigenvalues (explained variance per component). */
  case class Model(mean: Seq[Double], components: Seq[Seq[Double]],
      variances: Seq[Double])

  /** One-pass distributed fit: moments via [[graft.plans.VecMomentsAgg]],
    * then covariance + top-k power iteration on the driver. */
  def train(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    val flat = df.agg(graft.plans.VecMomentsAgg(col(vecCol), dim).as("m"))
      .head().getSeq[Long](0)
    val n = flat(0).toDouble
    require(n > 1, "need at least two vectors to fit PCA")
    val mean = Array.tabulate(dim)(i => flat(1 + i) / 1e3 / n)
    // E[x_i x_j] from the upper triangle, then center: C = E - mean meanᵀ
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val e = flat(t) / 1e6 / n
        val c = e - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val eig = topEigen(cov, k)
    Model(mean.toSeq, eig.map(_._2.toSeq), eig.map(_._1))
  }

  /** Fixed-iteration power method with deflation on a small symmetric
    * matrix. Init = the basis vector of the largest diagonal entry (ties
    * to the lowest index); after convergence the sign is pinned so the
    * largest-|.| component is positive — fully deterministic. */
  private[graft] def topEigen(c0: Array[Array[Double]], k: Int,
      iters: Int = 200): Seq[(Double, Array[Double])] = {
    val d = c0.length
    val c = c0.map(_.clone())
    val found = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    (0 until k).map { _ =>
      var v = new Array[Double](d)
      var best = 0
      var i = 1
      while (i < d) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
      v(best) = 1.0
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        var r = 0
        while (r < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += c(r)(j) * v(j); j += 1 }
          w(r) = s
          r += 1
        }
        // Gram-Schmidt against already-found components: deflation alone
        // reintroduces them at float noise scale, and a near-degenerate
        // spectrum (flat variance profile) amplifies that noise — the
        // re-orthogonalization guarantees pairwise orthogonality to
        // machine precision regardless of eigenvalue gaps
        found.foreach { u =>
          var dp = 0.0
          var j = 0
          while (j < d) { dp += w(j) * u(j); j += 1 }
          j = 0
          while (j < d) { w(j) -= dp * u(j); j += 1 }
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0) { var j = 0; while (j < d) { w(j) /= nrm; j += 1 } }
        v = w
        it += 1
      }
      found += v
      // pin sign: largest-|.| component positive (ties to lowest index)
      var arg = 0
      i = 1
      while (i < d) { if (math.abs(v(i)) > math.abs(v(arg))) arg = i; i += 1 }
      if (v(arg) < 0) { var j = 0; while (j < d) { v(j) = -v(j); j += 1 } }
      // Rayleigh quotient then deflate
      var lambda = 0.0
      i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        lambda += v(i) * s
        i += 1
      }
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { c(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (lambda, v)
    }
  }

  /** Projection columns `p0..p(k-1)`: `<v, c_j> − offset_j` where
    * `offset_j = <mean, c_j>` is folded on the driver — components and
    * offsets are plan literals, the map is narrow and codegen-friendly. */
  def projections(vec: Column, model: Model): Seq[Column] =
    model.components.zipWithIndex.map { case (comp, j) =>
      val offset = comp.zip(model.mean).map { case (c, m) => c * m }
        .reduceLeft(_ + _)
      (Similarity.dot(vec, array(comp.map(lit): _*)) - lit(offset))
        .as(s"p$j")
    }

  /** Project a frame: id + the k centered principal coordinates. */
  def project(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame =
    df.select(col(idCol) +: projections(col(vecCol), model): _*)

  /** Whitened projection: each coordinate scaled by 1/√λ_j so every output
    * dimension has unit variance — the form distance-based consumers
    * (k-means, OPQ, SemDeDup's clustering) actually want, since unwhitened
    * PCA lets the top component dominate every distance. The scales are
    * driver-folded literals (`fmtD`-round-trippable like the components);
    * still a pure narrow map. */
  def projectWhitened(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame = {
    val cols = projections(col(vecCol), model).zip(model.variances)
      .zipWithIndex.map { case ((p, v), j) =>
        (p / lit(math.sqrt(v))).as(s"w$j")
      }
    df.select(col(idCol) +: cols: _*)
  }
}

package graft

import graft.functions.{PCA, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, GraftTestSpark.Sf0001)
  lazy val model = PCA.train(emb, "embedding", dim = 64, k = 4)

  test("train: orthonormal components, descending explained variance, bit-stable") {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- model.components.indices; j <- i until model.components.size) {
      val d = dot(model.components(i), model.components(j))
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"comp $i not unit")
      else assert(math.abs(d) < 1e-6, s"comps $i,$j not orthogonal: $d")
    }
    assert(model.variances.zip(model.variances.tail)
      .forall { case (a, b) => a >= b - 1e-12 }, model.variances.toString)
    assert(model.variances.forall(_ > 0))
    // integer moments -> identical model on refit, not just ulp-close
    val again = PCA.train(emb, "embedding", dim = 64, k = 4)
    assert(again == model)
  }

  test("project: coordinate sample variance matches the eigenvalue and is centered") {
    val p = PCA.project(emb, "embedding", "vec_id", model)
    val n = p.count().toDouble
    val stats = p.agg(
      avg($"p0"), avg($"p0" * $"p0"),
      avg($"p1" * $"p1"), avg($"p2" * $"p2"), avg($"p3" * $"p3")).head()
    // centered up to the milli-quantization of the fitted mean
    assert(math.abs(stats.getDouble(0)) < 1e-3)
    // E[p_j^2] ≈ lambda_j (population variance; quantization noise ~1e-4)
    val e2 = Seq(stats.getDouble(1), stats.getDouble(2), stats.getDouble(3),
      stats.getDouble(4))
    e2.zip(model.variances).zipWithIndex.foreach { case ((got, want), j) =>
      assert(math.abs(got - want) < 0.05 * want + 1e-3,
        s"component $j: E[p^2]=$got vs lambda=$want")
    }
    assert(n > 100)
  }

  test("moment buffers merge associatively: fit(A ∪ B) == fit(A) ⊕ fit(B)") {
    // the incremental-fit contract: nightly batches can extend the model
    // by merging integer moment buffers — exact, order-independent
    val a = emb.filter($"vec_id" % 2 === 0)
    val b = emb.filter($"vec_id" % 2 === 1)
    def moments(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(graft.plans.VecMomentsAgg($"embedding", 64).as("m"))
        .head().getSeq[Long](0)
    val whole = moments(emb)
    val merged = moments(a).zip(moments(b)).map { case (x, y) => x + y }
    assert(whole == merged)
  }

  test("topEigen agrees with a hand-checkable 2x2 and handles deflation") {
    // [[3,1],[1,3]] has eigenpairs (4, [1,1]/sqrt2), (2, [1,-1]/sqrt2)
    val eig = PCA.topEigen(Array(Array(3.0, 1.0), Array(1.0, 3.0)), 2)
    assert(math.abs(eig(0)._1 - 4.0) < 1e-9)
    assert(math.abs(eig(1)._1 - 2.0) < 1e-9)
    val s2 = 1.0 / math.sqrt(2.0)
    assert(eig(0)._2.map(math.abs).forall(x => math.abs(x - s2) < 1e-9))
    assert(math.abs(eig(1)._2(0) + eig(1)._2(1)) < 1e-9)
  }

  test("projection is reproducible through literal round-trip (narrow map)") {
    val p1 = PCA.project(emb, "embedding", "vec_id", model)
      .orderBy("vec_id").collect()
    val p2 = PCA.project(emb, "embedding", "vec_id", model)
      .orderBy("vec_id").collect()
    assert(p1.sameElements(p2))
    // no shuffle in the projection plan
    val plan = PCA.project(emb, "embedding", "vec_id", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

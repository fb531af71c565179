package graft

import graft.functions.Entity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntitySpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  def a = Seq((1L, "Acme Corporation"), (2L, "Globex Industries"),
    (3L, "Initech LLC"), (4L, "Umbrella Corp"))
    .toDF("aid", "aname")
  def b = Seq((10L, "ACME Corporation"), (11L, "Globex Industry"),
    (12L, "Wayne Enterprises"), (13L, "initech llc"))
    .toDF("bid", "bname")

  private def brute(threshold: Double): Set[(Long, Long)] = {
    val ag = a.select($"aid", Entity.charGrams("aname", 3).as("ga"))
    val bg = b.select($"bid", Entity.charGrams("bname", 3).as("gb"))
    ag.crossJoin(bg)
      .withColumn("inter", size(array_intersect($"ga", $"gb")))
      .withColumn("jac", $"inter".cast("double") /
        (size($"ga") + size($"gb") - $"inter"))
      .filter($"jac" >= threshold)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
  }

  test("similarNamePairs equals the brute-force all-pairs at several thresholds") {
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val got = Entity.similarNamePairs(a, "aid", "aname", b, "bid", "bname",
        k = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(t), s"threshold $t")
    }
  }

  test("case-insensitive exact name matches score jaccard 1.0") {
    val m = Entity.similarNamePairs(a, "aid", "aname", b, "bid", "bname",
      k = 3, threshold = 0.99)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(m == Set((1L, 10L, 1.0), (3L, 13L, 1.0)))
  }

  test("names shorter than k never match") {
    val tiny = Seq((1L, "ab")).toDF("aid", "aname")
    assert(Entity.similarNamePairs(tiny, "aid", "aname",
      b, "bid", "bname", k = 3, threshold = 0.1).count() == 0)
  }
}

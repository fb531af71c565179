package graft.tools

import graft.functions.{Dedup, IVF, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does semantic_dedup's time go at sf0.1 — pair generation, or the
  * connected-components loop (and which part of each iteration)? */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.embeddings(spark, sfDir)
    e.count() // warm the scan
    val model = time("train k=8")(IVF.train(e, "embedding", "vec_id", k = 8))
    val pairs = Similarity.semanticPairs(e, "embedding", "vec_id", model, 0.4)
    time("pairs count (cold)")(println("  pairs = " + pairs.count()))
    time("pairs count (warm)")(pairs.count())
    val assigned = e.withColumn("c", IVF.assign(col("embedding"), model))
    time("assign only")(assigned.count())
    time("cells")(assigned.groupBy("c").count().collect()
      .foreach(r => println(s"  cell ${r.get(0)}: ${r.getLong(1)}")))
    // replicate the CC loop with per-round timing
    locally {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val edges = time("edges persist+count") {
        val ed = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .persist(lvl)
        ed.count(); ed
      }
      var labels = time("labels init") {
        val l = edges.select(col("src").as("id")).distinct()
          .withColumn("cluster_id", col("id")).persist(lvl)
        l.count(); l
      }
      var iter = 0
      var prev = java.math.BigDecimal.ZERO
      var go = true
      while (go && iter < 20) {
        val t0 = System.nanoTime()
        val viaEdges = edges
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"), col("cluster_id"))
        val neigh = labels.unionAll(viaEdges)
          .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
        val jumped = neigh
          .join(labels.select(col("id").as("cluster_id"), col("cluster_id").as("_pl")),
            Seq("cluster_id"), "left")
          .select(col("id"),
            least(col("cluster_id"), coalesce(col("_pl"), col("cluster_id")))
              .as("cluster_id"))
        val next = jumped.localCheckpoint(true)
        val cur = {
          val d = next.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
          if (d == null) java.math.BigDecimal.ZERO else d
        }
        labels = next
        println(f"[profile] cc round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s sum=$cur")
        go = cur.compareTo(prev) != 0
        prev = cur
        iter += 1
      }
    }
    time("full semanticDedup (fixed)")(
      Similarity.semanticDedup(e, "embedding", "vec_id", model, 0.4).count())
    time("cc alone (fixed)")(
      Dedup.connectedComponents(e.select(col("vec_id")), "vec_id", pairs).count())
    spark.stop()
  }
}

package graft.tools
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfTA {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](l:String)(f: =>T):T={val t0=System.nanoTime();val r=f;println(f"PROF $l ${(System.nanoTime()-t0)/1e9}%.2f s");r}
    (1 to 2).foreach { i =>
      val tr = time(s"train$i"){graft.functions.Classifier.train(docs,"doc_id","text",col("lang")==="en",dim=64,iters=3)}
      time(s"apply$i"){graft.functions.Classifier.linearScoreWith(docs,"doc_id","text",tr,dim=64)
        .select(xxhash64(col("doc_id"),col("n_features"),col("score_micronats")).as("h")).agg(bit_xor(col("h"))).head()}
    }
    spark.stop()
  }
}

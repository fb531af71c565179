package graft

import graft.functions.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.GraftArrow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Arrow columnar decode seam: batch shape, parity with the row-wise
  * seam, and null payload handling. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def docs = Multimodal.attachBinary(
    Tables.documents(spark, GraftTestSpark.Sf0001))

  test("mapDecodeArrow == mapDecode row for row (columnar seam parity)") {
    val arrow = Multimodal.mapDecodeArrow(docs, "doc_id", "payload")
      .as[(Long, Long, Int)].collect().toSet
    val rowwise = Multimodal.mapDecode(docs, "doc_id", "payload")
      .as[(Long, Long, Int)].collect().toSet
    assert(arrow.nonEmpty)
    assert(arrow == rowwise)
  }

  test("real PNG round trip: ImageIO decode recovers the pixel formula exactly") {
    val ids = Seq(0L, 1L, 5L, 12L, 123L, 4567L)
    val df = ids.toDF("doc_id")
    // the payload is a real PNG (magic bytes), not a stand-in
    val png = Multimodal.synthesizePng(df, "doc_id")
      .filter($"doc_id" === 0L).head().getAs[Array[Byte]]("png")
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val out = Multimodal.decodeImage(
        Multimodal.synthesizePng(df, "doc_id"), "doc_id", "png")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    ids.foreach { id =>
      val w = (4 + id % 5).toInt
      val h = (4 + id % 7).toInt
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(out(id) == ((w, h, sum)), s"id=$id")
    }
  }

  test("real WAV round trip: javax.sound decode recovers the PCM formula exactly") {
    val ids = Seq(0L, 1L, 7L, 42L, 999L)
    val df = ids.toDF("doc_id")
    // the payload is a real RIFF/WAVE file, not a stand-in
    val wav = Multimodal.synthesizeWav(df, "doc_id")
      .filter($"doc_id" === 0L).head().getAs[Array[Byte]]("wav")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val out = Multimodal.decodeAudio(
        Multimodal.synthesizeWav(df, "doc_id"), "doc_id", "wav")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    ids.foreach { id =>
      val n = (8 + id % 5).toInt
      val sum = (0 until n).map(i => (id * 37 + i * 101) % 2001 - 1000).sum
      assert(out(id) == ((n, sum, 8000)), s"id=$id")
    }
  }

  test("mapArrowBatches: batches respect batchSize and cover every row") {
    val in = docs.select($"doc_id".cast("long"), $"payload")
    val total = in.count()
    val batchRows = GraftArrow.mapArrowBatches(in, batchSize = 64) { root =>
      Iterator.single(root.getRowCount)
    }.collect()
    assert(batchRows.forall(n => n > 0 && n <= 64), batchRows.toSeq)
    assert(batchRows.map(_.toLong).sum == total)
  }

  test("mapDecodeArrow: null payloads decode to (id, 0, 0)") {
    val in = Seq((1L, "ab"), (2L, null), (3L, "")).toDF("doc_id", "txt")
      .withColumn("payload", $"txt".cast("binary")).drop("txt")
    val out = Multimodal.mapDecodeArrow(in, "doc_id", "payload")
      .as[(Long, Long, Int)].collect().toMap2
    assert(out(1L) == (('a'.toInt + 'b'.toInt).toLong, 2))
    assert(out(2L) == ((0L, 0)))
    assert(out(3L) == ((0L, 0)))
  }

  private implicit class TupleOps(rows: Array[(Long, Long, Int)]) {
    def toMap2: Map[Long, (Long, Int)] =
      rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}

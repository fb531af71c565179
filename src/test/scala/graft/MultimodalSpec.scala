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

  test("imageDHash matches an arithmetic replay of the fixture formula " +
    "(decode really round-trips the grid)") {
    val ids = Seq(0L, 3L, 17L, 42L, 123L)
    val in = Multimodal.synthesizePng(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.imageDHash(in, "doc_id", "png")
      .as[(Long, Long)].collect().toMap
    // independent replay: pixel(x, y) = (id*31 + x*7 + y*13) % 256 on the
    // same integer-floor 8x8 grid — never touches the engine's decoder
    def expected(id: Long): Long = {
      val w = (4 + id % 5).toInt; val h = (4 + id % 7).toInt
      def px(x: Int, y: Int): Long =
        java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L)
      (for { j <- 0 until 8; i <- 0 until 7
             if px((i + 1) * w / 8, j * h / 8) > px(i * w / 8, j * h / 8) }
        yield 1L << (j * 7 + i)).sum
    }
    ids.foreach(id => assert(got(id) == expected(id), s"id $id"))
  }

  test("dhashNearDupPairs: exact recall at hamming <= 3, block-disjoint " +
    "hashes never pair") {
    val h0 = 0x00ABCDEF012345L
    val h2 = h0 ^ 0x03L // 2 bits flipped, same low block candidate
    val h3 = h0 ^ (1L << 2) ^ (1L << 20) ^ (1L << 40) // 3 bits, 3 blocks
    // 4 bits across all 4 blocks: beyond the guarantee AND over threshold
    val hFar = h0 ^ (1L << 2) ^ (1L << 20) ^ (1L << 34) ^ (1L << 50)
    val df = Seq((1L, h0), (2L, h2), (3L, h3), (4L, hFar))
      .toDF("doc_id", "dhash")
    val got = Multimodal.dhashNearDupPairs(df, "doc_id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 2)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) == 3)
    assert(!got.contains((1L, 4L)), "no shared block -> not a candidate")
    // h2 vs h3: differ in bits {0,1} vs {2,20,40} -> hamming 5, dropped
    assert(!got.contains((2L, 3L)))
  }

  test("dhashAgainstIndex: cross-set probe == brute-force cross hamming " +
    "filter (exact recall), same-signature hits kept") {
    val h0 = 0x00ABCDEF012345L
    val newH = Seq((100L, h0), (101L, h0 ^ 0x07L), (102L, ~h0 & ((1L << 56) - 1)))
      .toDF("doc_id", "dhash")
    val corpus = Seq((1L, h0), (2L, h0 ^ (1L << 30)), (3L, 0x12345678901234L))
      .toDF("doc_id", "dhash")
    val got = Multimodal.dhashAgainstIndex(newH, corpus, "doc_id",
        maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // brute force replay
    val want = (for {
      (ni, nh) <- Seq((100L, h0), (101L, h0 ^ 0x07L),
        (102L, ~h0 & ((1L << 56) - 1)))
      (ci, ch) <- Seq((1L, h0), (2L, h0 ^ (1L << 30)),
        (3L, 0x12345678901234L))
      hm = java.lang.Long.bitCount(nh ^ ch)
      if hm <= 3
    } yield (ni, ci, hm)).toSet
    assert(got == want)
    assert(got.contains((100L, 1L, 0)), "identical signature must pair")
  }
}

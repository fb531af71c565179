package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB multimodal pipeline actually uses (bytes in parquet,
  * metadata queryable without decoding). The container has no external
  * image/audio libs, so the audio/video decode steps are clearly-marked
  * deterministic STUBS (`fakeDecode*`); IMAGE decode is REAL — the JDK
  * ships PNG/JPEG codecs in `javax.imageio`, and [[decodeImage]] runs them
  * through the same partition-wise seam ([[synthesizePng]] builds the
  * deterministic PNG fixtures whose decoded samples an external engine can
  * predict from the id alone). Everything around the stubs — schema, batch
  * shape, partition behavior, the mapPartitions/Arrow seams where a
  * JNI/FFmpeg codec would sit — is real and tested.
  */
object Multimodal {

  val MetaSchema: StructType = StructType.fromDDL(
    "format STRING, byte_len BIGINT, width INT, height INT")

  /** Attach a binary payload + metadata struct. In production the payload
    * comes from the source (e.g. Cassandra blob / object store); here the
    * testdata has no blob column so document text stands in for the bytes —
    * the schema and plumbing are what's under test. */
  def attachBinary(df: DataFrame, srcCol: String = "text",
      payloadCol: String = "payload"): DataFrame = {
    val bin = col(srcCol).cast("binary")
    df.withColumn(payloadCol, bin)
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        length(bin).cast("bigint").as("byte_len"),
        pmod(length(bin), lit(640)).cast("int").as("width"),
        pmod(length(bin), lit(480)).cast("int").as("height")))
  }

  /** STUB decoder — deterministic fake "feature extraction" from bytes.
    * A real implementation decodes the image and emits an embedding; the
    * Spark-side contract (binary in, fixed-width float array out, computed
    * per-partition with no driver involvement) is identical. The fake is a
    * per-index scaling of the payload's rolling-hash fingerprint
    * ([[graft.plans.RollingHash]] — exact 64-bit integer arithmetic), so an
    * external engine can recompute every feature value and the gate can
    * hash-compare them instead of trusting us. */
  def fakeDecodeFeatures(df: DataFrame, payloadCol: String = "payload",
      dim: Int = 8): DataFrame = {
    // fp < 1e9+7, so fp * dim stays far below 2^63: exact in any engine
    val fp = graft.plans.RollingHash(col(payloadCol).cast("string"))
    val featureArr = array((0 until dim).map { j =>
      ((fp * lit(j + 1L)) % lit(1000L)).cast("double") / 1000.0
    }: _*)
    df.withColumn("features", featureArr)
  }

  /** Resize stub: a real implementation decodes, scales to fit the target
    * box preserving aspect ratio, and re-encodes; the deterministic fake
    * computes the scaled dimensions (the metadata contract downstream
    * pipelines consume) and truncates the payload proportionally — the
    * Spark-side shape (narrow map, metadata struct update, binary in/out)
    * is the real contract. */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int,
      payloadCol: String = "payload"): DataFrame = {
    val w = col("media_meta.width")
    val h = col("media_meta.height")
    // scale = min(targetW/w, targetH/h, 1.0) in floored 1/1000ths — explicit
    // floor() on every division so Spark (truncating casts) and any oracle
    // engine (rounding casts) compute identical dimensions
    val scaleMil = least(
      when(w > 0, floor(lit(targetW * 1000L) / w)).otherwise(lit(1000L)),
      when(h > 0, floor(lit(targetH * 1000L) / h)).otherwise(lit(1000L)),
      lit(1000L)).cast("long")
    df.withColumn("resized_meta", struct(
        lit("fake/resized").as("format"),
        floor(col("media_meta.byte_len") * scaleMil / 1000L).cast("bigint").as("byte_len"),
        floor(w * scaleMil / 1000L).cast("int").as("width"),
        floor(h * scaleMil / 1000L).cast("int").as("height")))
      .withColumn("resized_payload",
        expr(s"substring($payloadCol, 1, CAST(resized_meta.byte_len AS INT))"))
  }

  /** Frame sampling stub: byte-range slices standing in for video frames —
    * `substring` on binary is a zero-copy range read, the same access
    * pattern a frame sampler has. Emits one row per sampled frame. */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      frameBytes: Int = 64, everyNth: Int = 4): DataFrame = {
    // floor() on both engines (a bare double->int cast truncates in Spark
    // but rounds in DuckDB — floor makes the semantics explicit)
    val nFrames = greatest(
      floor(length(col(payloadCol)) / lit(frameBytes * everyNth)).cast("int"), lit(1))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - lit(1))))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame_idx * ${frameBytes * everyNth} + 1, $frameBytes)"))
  }

  /** The real-decoder seam, Arrow-columnar form (the preferred seat): the
    * decoder sees `VectorSchemaRoot` batches — ids in a BigIntVector,
    * payloads in a VarBinaryVector read zero-copy — exactly the interface a
    * vectorized JNI codec (libjpeg/FFmpeg) consumes. The stub "decode" is a
    * byte-sum over each payload, proving the columnar plumbing (batch
    * shape, per-batch iteration, null handling) without media libs.
    * Output schema matches [[mapDecode]] so the two seams are
    * interchangeable (pinned by the gate + ScalaTest). */
  def mapDecodeArrow(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    val out = org.apache.spark.sql.GraftArrow.mapArrowBatches(in, batchSize) {
      root =>
        val ids = root.getVector(0).asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val payloads = root.getVector(1).asInstanceOf[org.apache.arrow.vector.VarBinaryVector]
        (0 until root.getRowCount).iterator.map { i =>
          val id = if (ids.isNull(i)) 0L else ids.get(i)
          if (payloads.isNull(i)) (id, 0L, 0)
          else {
            // ??? <- real vectorized decoder goes here; deterministic stand-in:
            val bytes = payloads.get(i)
            var sum = 0L
            var j = 0
            while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
            (id, sum, bytes.length)
          }
        }
    }
    out.toDF(idCol, "byte_sum", "byte_len")
  }

  /** The row-wise decoder seam ([[mapDecodeArrow]] is the columnar,
    * preferred form): partition-wise pass over (id, payload) with an
    * arbitrary per-row decoder — where a scalar JNI/ImageIO call would plug
    * in. */
  def mapDecode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ??? <- real decoder goes here; deterministic stand-in:
        it.map { case (id, bytes) =>
          val checksum = if (bytes == null) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
          (id, checksum, if (bytes == null) 0 else bytes.length)
        }
      }
    out.toDF(idCol, "byte_sum", "byte_len")
  }

  // ---- real image decode (JDK ImageIO — no external deps) ----

  /** Deterministic 8-bit grayscale PNG bytes for an id: w = 4 + id%5,
    * h = 4 + id%7, pixel(x,y) = (id*31 + x*7 + y*13) % 256, encoded by the
    * JDK's real PNG writer. PNG grayscale is lossless, so every decoded
    * sample is predictable from the id alone — which is what lets the gate
    * verify a REAL codec round trip against an independent SQL oracle. */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(id, 5L)).toInt
    val h = (4 + java.lang.Math.floorMod(id, 7L)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One real PNG payload per row of `df` ([[pngBytes]] of the id),
    * computed per partition with no driver involvement — the fixture
    * generator standing where an object-store read of the raw media bytes
    * would sit in production. */
  def synthesizePng(df: DataFrame, idCol: String,
      payloadCol: String = "png"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, pngBytes(id))))
      .toDF(idCol, payloadCol)
  }

  /** Incremental image near-dup: probe a NEW batch's dHash signatures
    * against a PERSISTED corpus signature index ((id, dhash) parquet —
    * 16 bytes a row; the expensive decode+hash of the corpus is the
    * offline index build, so the nightly ingest decodes ONLY its own
    * batch). Same four-block pigeonhole as [[dhashNearDupPairs]]
    * (exact recall at hamming <= 3) with the signature collapse on both
    * sides; cross-set pairs keep same-signature hits (hamming 0 — the
    * re-encode case an image ingest mostly sees). Output:
    * (id_new, id_corp, hamming). */
  def dhashAgainstIndex(newHashes: DataFrame, index: DataFrame,
      idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 blocks guarantee exact recall only up to hamming 3")
    // persisted: the new batch's hashes feed the block pass AND the
    // expansion join — without this the batch re-decodes per consumer
    val nh = Caches.operatorPersist(newHashes.select(
      col(idCol).as("id_new"), col("dhash").as("_hn")))
    val ih = index.select(col(idCol).as("id_corp"), col("dhash").as("_hc"))
    def blocksOf(df: DataFrame, h: String): DataFrame = df.select(col(h))
      .distinct()
      .select(col(h), posexplode(array((0 to 3).map(t =>
        shiftright(col(h), 14 * t).bitwiseAND(lit(16383L))): _*)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "blockv")
    val sigPairs = blocksOf(nh, "_hn")
      .join(blocksOf(ih, "_hc"), Seq("t", "blockv"))
      .select("_hn", "_hc").distinct()
      .withColumn("hamming", expr("bit_count(_hn ^ _hc)").cast("int"))
      .filter(col("hamming") <= maxHamming)
    nh.join(broadcast(sigPairs), Seq("_hn"))
      .join(ih, Seq("_hc"))
      .select("id_new", "id_corp", "hamming")
  }

  // ---- real audio decode (JDK javax.sound.sampled — no external deps) ----

  /** Deterministic 16-bit mono PCM WAV bytes for an id: n = 8 + id%5
    * samples at 8 kHz, sample(i) = ((id*37 + i*101) % 2001) - 1000,
    * encoded by the JDK's real WAV writer. PCM WAV is lossless, so every
    * decoded sample is predictable from the id alone — the audio analogue
    * of [[pngBytes]]. */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val n = (8 + java.lang.Math.floorMod(id, 5L)).toInt
    val buf = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      buf.putShort((java.lang.Math.floorMod(id * 37 + i * 101L, 2001L) - 1000L).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(buf.array()), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One real WAV payload per row ([[wavBytes]] of the id) — see
    * [[synthesizePng]]. */
  def synthesizeWav(df: DataFrame, idCol: String,
      payloadCol: String = "wav"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, wavBytes(id))))
      .toDF(idCol, payloadCol)
  }

  /** REAL audio decode through the partition-wise seam: the JDK's
    * `javax.sound.sampled` WAV codec parses each payload and emits
    * (n_samples, sample_sum, sample_rate) — signed 16-bit little-endian
    * PCM samples summed exactly, the decode-verify triple for audio
    * payloads. Same seam shape as [[decodeImage]]. */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unexpected WAV format for id=$id: $fmt")
          val raw = ais.readAllBytes()
          var sum = 0L
          var j = 0
          while (j + 1 < raw.length) {
            sum += ((raw(j) & 0xff) | (raw(j + 1) << 8)).toShort
            j += 2
          }
          (id, raw.length / 2, sum, fmt.getSampleRate.toInt)
        }
      }
    out.toDF(idCol, "n_samples", "sample_sum", "sample_rate")
  }

  /** Perceptual difference hash (dHash) of each decoded image: the
    * image-dedup primitive of multimodal training pipelines. Each payload
    * is REALLY decoded (ImageIO), sampled on a fixed 8×8 grid by
    * integer-floor nearest sampling (sx = i·w div 8 — deterministic,
    * unlike area-average resize whose rounding is library-specific), and
    * each row's 7 left-to-right brightness comparisons become one bit:
    * a 56-bit signature that survives re-encoding and small edits.
    * Output: (idCol, dhash BIGINT). Per-partition work, no shuffle. */
  def imageDHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload of id=$id is not a decodable image")
          val raster = img.getRaster
          val w = img.getWidth
          val h = img.getHeight
          var hash = 0L
          var j = 0
          while (j < 8) {
            val sy = j * h / 8
            var i = 0
            while (i < 7) {
              val a = raster.getSample(i * w / 8, sy, 0)
              val b = raster.getSample((i + 1) * w / 8, sy, 0)
              if (b > a) hash |= 1L << (j * 7 + i)
              i += 1
            }
            j += 1
          }
          (id, hash)
        }
      }
    out.toDF(idCol, "dhash")
  }

  /** Near-duplicate image pairs from dHash signatures, WITHOUT the n²
    * cross join: the 56-bit hash splits into four disjoint 14-bit blocks;
    * two hashes within hamming distance `maxHamming` ≤ 3 must agree on at
    * least one whole block (pigeonhole — 3 differing bits cannot touch
    * all 4 blocks), so candidates come from four block-keyed equi-joins
    * (the Manku 2007 multi-block scheme [[graft.plans.SimHash64]] uses
    * for text, here in relational form) and only candidates pay the
    * exact `bit_count(xor)` verify. Recall is EXACT at maxHamming ≤ 3.
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def dhashNearDupPairs(hashes: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 blocks guarantee exact recall only up to hamming 3")
    // Signature collapse (the same clique-taming move Dedup's simhash
    // path makes): re-encodes and exact duplicates share ONE dhash, so
    // block-keying runs over DISTINCT signatures — clique-quadratic
    // blowup never reaches the candidate join, only the final pair
    // expansion (which IS the answer). The hash frame is (id, long) —
    // persisted because four consumers would otherwise re-decode every
    // image per consumer.
    val h = Caches.operatorPersist(
      hashes.select(col(idCol).as("id"), col("dhash")))
    val sigs = h.select("dhash").distinct()
    val blocks = sigs
      .select(col("dhash"),
        posexplode(array((0 to 3).map(t =>
          shiftright(col("dhash"), 14 * t).bitwiseAND(lit(16383L))): _*)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "blockv")
    val sigPairs = blocks.as("a").join(blocks.as("b"),
        col("a.t") === col("b.t") && col("a.blockv") === col("b.blockv") &&
          col("a.dhash") < col("b.dhash"))
      .select(col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= maxHamming)
    // distinct-signature pairs are candidate metadata — broadcast them
    // into the two expansion joins; (ha < hb) already makes each id pair
    // unique, so no distinct runs over the expanded output
    val cross = h.as("x")
      .join(broadcast(sigPairs), col("x.dhash") === col("ha"))
      .join(h.as("y"), col("y.dhash") === col("hb"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"), col("hamming"))
    // identical signatures: the clique expansion is the answer itself —
    // one equi-join on the hash, no candidate stage at all
    val same = h.as("x").join(h.as("y"),
        col("x.dhash") === col("y.dhash") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0).as("hamming"))
    same.unionByName(cross)
  }

  /** REAL image decode through the partition-wise seam: the JDK's
    * `javax.imageio` codecs (PNG/JPEG) parse each payload and emit
    * (width, height, pix_sum = sum of band-0 samples) — the decode-verify
    * triple an ingest pipeline checks before trusting upstream metadata.
    * Same seam shape as [[mapDecode]]; swapping in a JNI codec is a
    * one-line change inside the iterator. */
  def decodeImage(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload of id=$id is not a decodable image")
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          (id, img.getWidth, img.getHeight, sum)
        }
      }
    out.toDF(idCol, "width", "height", "pix_sum")
  }
}

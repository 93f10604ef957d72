package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with feature extraction as a batched
  * per-partition pipeline (the Scala analogue of `mapInPandas`: one
  * Iterator-to-Iterator transform per partition, processing fixed-size
  * batches so a decoder amortizes codec/model setup per batch and bounds
  * memory).
  *
  * IMAGE decode and resize are REAL: [[ImageIoDecoder]] and
  * [[ImageIoTranscoder]] use the JDK's own `javax.imageio` codecs (PNG,
  * JPEG, BMP, GIF, WBMP — no external libraries needed), with per-row
  * fallback to the byte-level fakes for payloads the readers cannot
  * parse. AUDIO decode is REAL for uncompressed PCM containers:
  * [[WavDecoder]] parses WAV/AIFF/AU via the JDK's
  * `javax.sound.sampled`. Compressed audio (MP3/AAC/OGG) and VIDEO
  * frame sampling remain deterministic byte-level stubs
  * ([[FakeDecoder]], [[sampleFrames]]) because this container ships no
  * such codecs — the batching, schema, and partition flow they run
  * through are the real production shape; swap the
  * [[Decoder]]/[[Transcoder]] implementation to productionize.
  *
  * Scale notes: feature extraction is map-only (no shuffle); payload
  * columns should be read with a pushed projection so scans don't drag
  * blobs through stages that only need metadata; batch size bounds
  * per-task memory at 100 TB of media.
  */
object Media {

  /** Canonical media schema: opaque payload + typed metadata. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType),
    StructField("first_byte", IntegerType),
    StructField("last_byte", IntegerType),
    StructField("checksum", LongType)))

  /** A decoder turns one batch of payloads into one batch of feature
    * rows matching its `schema`. Real implementations (JPEG decode → CNN
    * features, audio → spectrogram, video → frame sample) plug in here.
    */
  trait Decoder extends Serializable {
    def schema: StructType = featureSchema
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row]
  }

  /** Guarded in-memory ImageIO decode shared by [[ImageIoDecoder]] and
    * [[ImageIoTranscoder]]: null for null/empty/undecodable payloads.
    * NonFatal, not just IOException — the JDK codecs throw
    * RuntimeExceptions on malformed payloads (CMMException for corrupt
    * ICC profiles, index errors on truncated GIF/BMP), and one bad blob
    * must take the caller's per-row fallback, not the task. setUseCache
    * keeps the default path from spilling a temp file per image.
    */
  private def tryDecode(b: Array[Byte]): java.awt.image.BufferedImage =
    if (b == null || b.isEmpty) null
    else {
      javax.imageio.ImageIO.setUseCache(false)
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => null }
    }

  /** Deterministic stand-in for the decode step (STUB — see class doc). */
  object FakeDecoder extends Decoder {
    def features(b0: Array[Byte]): Row = {
      val b = if (b0 == null) Array.emptyByteArray else b0 // null ≡ empty
      val checksum = ((b.length.toLong * 31 +
        (if (b.nonEmpty) (b.head & 0xff) + (b.last & 0xff) else 0)) % 9973)
      Row(b.length,
        if (b.nonEmpty) b.head & 0xff else 0,
        if (b.nonEmpty) b.last & 0xff else 0,
        checksum)
    }
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] =
      payloads.map(features)
  }

  /** REAL image decode via `javax.imageio` — the JDK ships PNG, BMP, GIF,
    * JPEG and WBMP readers, so no external codecs are needed. Decodes true
    * pixel dimensions plus a corner-pixel checksum through the exact same
    * batched per-partition plumbing as [[FakeDecoder]]. Payloads ImageIO
    * cannot read (unknown container, truncated file) fall back to the
    * byte-level fake features with `decoded = false` — the honest
    * no-codec path, kept per-row rather than per-job so one corrupt blob
    * in 100 TB of media doesn't fail the task.
    */
  object ImageIoDecoder extends Decoder {
    override val schema: StructType = StructType(Seq(
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", IntegerType),
      StructField("checksum", LongType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] =
      payloads.map { b0 =>
        val b = if (b0 == null) Array.emptyByteArray else b0
        val img = tryDecode(b)
        if (img == null) {
          val f = FakeDecoder.features(b)
          Row(false, 0, 0, f.getInt(0), f.getLong(3))
        } else
          Row(true, img.getWidth, img.getHeight, b.length,
            (img.getRGB(0, 0).toLong & 0xFFFFFF) * 31 +
              (img.getRGB(img.getWidth - 1, img.getHeight - 1).toLong
                & 0xFFFFFF))
      }
  }

  /** Batched per-partition feature extraction over a PRUNED (key, payload)
    * projection — the `.rdd` hop materializes exactly two columns through
    * the Row encoder, so metadata columns never ride the Java heap and the
    * parquet scan reads only what the decode needs. Map-only, no shuffle.
    * Output: (`keyCol`, features struct).
    */
  def featureTable(df: DataFrame, keyCol: String,
                   decoder: Decoder = FakeDecoder,
                   batchSize: Int = 64): DataFrame = {
    val slim = df.select(col(keyCol), col("payload"))
    val outSchema = StructType(Seq(slim.schema.head,
      StructField("features", decoder.schema)))
    val rdd = slim.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](1)))
        batch.lazyZip(feats).map((r, f) => Row(r.get(0), f))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Convenience: all input columns + the `features` struct, via
    * [[featureTable]] joined back on `keyCol`. REQUIRES `keyCol` to be
    * unique per row (duplicate keys fan the join out multiplicatively and
    * cross-match features). Prefer [[featureTable]] directly when
    * downstream only needs (key, features): this join re-reads the input
    * and shuffles it on the key, which is only worth paying when the
    * metadata columns are actually wanted alongside.
    */
  def extractFeatures(df: DataFrame, decoder: Decoder = FakeDecoder,
                      batchSize: Int = 64,
                      keyCol: String = "doc_id"): DataFrame =
    df.join(featureTable(df, keyCol, decoder, batchSize), keyCol)

  /** A transcoder turns one batch of payloads into one batch of resized
    * payloads. Real implementations (JPEG decode → scale → re-encode)
    * plug in here.
    */
  trait Transcoder extends Serializable {
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int, h: Int): Seq[Array[Byte]]
  }

  /** Deterministic stand-in for the resize step (STUB — see class doc):
    * nearest-neighbor index mapping over the raw bytes to exactly w×h
    * output bytes.
    */
  object FakeTranscoder extends Transcoder {
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int, h: Int): Seq[Array[Byte]] =
      payloads.map { b =>
        if (b == null || b.isEmpty) b // null/empty payloads pass through
        else Array.tabulate(w * h)(i => b((i.toLong * b.length / (w * h)).toInt))
      }
  }

  /** REAL image resize via the JDK alone: ImageIO decode → Graphics2D
    * nearest-neighbor scale (deterministic — no multi-tap filter kernels)
    * → PNG re-encode. Payloads the readers cannot decode fall back
    * per-row to [[FakeTranscoder]]'s byte mapping, mirroring
    * [[ImageIoDecoder]]'s contract that one corrupt blob never fails the
    * task.
    */
  object ImageIoTranscoder extends Transcoder {
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int,
                    h: Int): Seq[Array[Byte]] = {
      payloads.map { b =>
        val img = tryDecode(b)
        if (img == null) FakeTranscoder.resizeBatch(Seq(b), w, h).head
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    }
  }

  /** Batched per-partition resize: replaces `payload` with the transcoded
    * bytes and records the target dimensions in `width`/`height` columns —
    * REPLACING any pre-existing width/height (they describe the old
    * payload; keeping both would duplicate the column names and break
    * by-name access downstream). Same mapInPandas-style batch shape as
    * [[featureTable]] — a real codec amortizes setup per batch and memory
    * is bounded by `batchSize × payload`.
    */
  def resize(df: DataFrame, width: Int, height: Int,
             transcoder: Transcoder = FakeTranscoder,
             batchSize: Int = 64): DataFrame = {
    val in = df.drop("width", "height")
    val payloadIdx = in.schema.fieldIndex("payload")
    val rdd = in.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val resized = transcoder.resizeBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)), width, height)
        batch.lazyZip(resized).map((r, p) =>
          Row.fromSeq(r.toSeq.updated(payloadIdx, p) :+ width :+ height))
      }
    }
    val outSchema = StructType(in.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType)))
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** REAL audio decode via `javax.sound.sampled` — WAV/AIFF/AU container
    * parsing and PCM access ship in the JDK's java.desktop module, no
    * external codecs needed (the same situation as ImageIO for PNG).
    * Reports the container's declared format (sample rate, channels,
    * frame count) plus an exact signed-16-bit PCM sample sum (both byte
    * orders: WAV is little-endian, AIFF/AU big-endian), through the
    * same batched per-partition plumbing as [[ImageIoDecoder]]. Payloads
    * that are not signed 16-bit PCM (or not audio at all) take the
    * per-row fallback (`decoded = false`, byte-level features) — one
    * alien blob never fails the task. Compressed formats (MP3, AAC,
    * OGG) have no JDK codec and correctly land on the fallback.
    */
  object WavDecoder extends Decoder {
    override val schema: StructType = StructType(Seq(
      StructField("decoded", BooleanType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("pcm_sum", LongType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] =
      payloads.map { b0 =>
        val b = if (b0 == null) Array.emptyByteArray else b0
        decodeOne(b) match {
          case Some(row) => row
          case None =>
            val f = FakeDecoder.features(b)
            Row(false, 0, 0, 0L, f.getLong(3))
        }
      }
    private def decodeOne(b: Array[Byte]): Option[Row] =
      if (b.isEmpty) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val fmt = in.getFormat
          val ok = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && in.getFrameLength >= 0
          if (!ok) None
          else {
            // Both byte orders: WAV is little-endian PCM, AIFF/AU are
            // big-endian — all three are JDK-parseable and all three
            // must land on the real path, not the fallback.
            val be = fmt.isBigEndian
            val bytes = in.readAllBytes()
            var sum = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              sum += (if (be) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                      else (bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
              i += 2
            }
            Some(Row(true, fmt.getSampleRate.toInt, fmt.getChannels,
              in.getFrameLength, sum))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic synthetic WAV: signed 16-bit little-endian PCM mono at
    * 8 kHz, (16 + id%32) frames, sample k = ((id·31 + k·17) mod 65536) −
    * 32768 — every field of what [[WavDecoder]] must report (format,
    * frame count, exact PCM sum) is a pure integer function of the id, so
    * an engine with no audio stack predicts the decode output exactly
    * (the q72 gate, mirroring [[syntheticPng]]/q71 for images).
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 16 + (id % 32).toInt
    val data = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = (((id * 31 + k * 17) % 65536) - 32768).toInt
      data(2 * k) = (s & 0xff).toByte
      data(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Adds a `payload` column of [[syntheticWav]] bytes per id — the
    * derived payload table feeding q72's decode gate. Fixture generator,
    * not a scale path (see [[syntheticImages]]).
    */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", udf(syntheticWav _).apply(col(idCol)))

  /** Deterministic synthetic PNG: a (2 + id%7) × (2 + id%5) RGB image,
    * flat id-derived base fill, both corner pixels set to id-derived
    * colors, losslessly PNG-encoded by the JDK writer. The generation
    * parameters are pure integer functions of the id, so an engine that
    * cannot decode PNG at all can still predict exactly what
    * [[ImageIoDecoder]] must report (true dimensions + corner-pixel
    * checksum) — which is what puts the REAL decode path under the
    * driver's cross-engine hash gate (q71) instead of only ScalaTest.
    * Dimensions start at 2 so the two corners are distinct pixels.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 2 + (id % 7).toInt
    val h = 2 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = (((id * 37) % 256) * 0x010101).toInt
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, base)
    def chan(m: Long): Int = ((id * m) % 256).toInt
    img.setRGB(0, 0, (chan(1) << 16) | (chan(7) << 8) | chan(13))
    img.setRGB(w - 1, h - 1, (chan(17) << 16) | (chan(19) << 8) | chan(23))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Adds a `payload` column of [[syntheticPng]] bytes per id — the
    * derived payload table feeding q71's decode gate. A per-row UDF is
    * acceptable here: this manufactures a fixture, it is not a scale
    * path (real pipelines read payloads from storage).
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", udf(syntheticPng _).apply(col(idCol)))

  /** SOLID-COLOR variant of [[syntheticPng]] for the RESIZE gate (q75):
    * every pixel is the same id-derived color, so the resized image is
    * the same solid color at the target dimensions REGARDLESS of the
    * scaler's sampling choices — which is what makes the full
    * decode → scale → PNG re-encode → decode roundtrip exactly
    * predictable by an engine with no image stack (corner-pixel
    * positions after scaling are implementation detail; a uniform image
    * erases them).
    */
  def syntheticSolidPng(id: Long): Array[Byte] = {
    val w = 2 + (id % 7).toInt
    val h = 2 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def chan(m: Long): Int = ((id * m) % 256).toInt
    val c = (chan(1) << 16) | (chan(7) << 8) | chan(13)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** `payload` column of [[syntheticSolidPng]] bytes per id (q75). */
  def syntheticSolidImages(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", udf(syntheticSolidPng _).apply(col(idCol)))

  /** Deterministic frame sampling stub: pick every `stride`-th byte
    * window as a "frame" (the real thing would seek keyframes). Shows the
    * explode-to-frames shape: one row per sampled frame.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 16,
                   stride: Int = 64): DataFrame = {
    val nFrames = greatest(
      ((length(col("payload")) - frameBytes) / stride).cast("int"), lit(0))
    df.withColumn("frame_no", explode(sequence(lit(0), nFrames)))
      .withColumn("frame", col("payload")
        .substr(col("frame_no") * stride + 1, lit(frameBytes)))
  }
}

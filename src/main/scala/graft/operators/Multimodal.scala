package graft.operators

import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal (image/audio/video) column operators.
  *
  * The data model: media travels as an opaque `binary` column next to typed
  * metadata — Spark shuffles and stores bytes without interpreting them,
  * and all interpretation happens in per-partition batch decoders (the
  * Scala analogue of `mapInPandas`: one iterator pass per partition, no
  * per-row lambda dispatch, bounded memory).
  *
  * IMAGES decode for real: [[ImageIoDecoder]] and [[resizeImage]] ride
  * the JDK's headless `javax.imageio` (PNG/JPEG/GIF/BMP — no external
  * jar needed). Audio/video codecs are not in this container, so those
  * paths keep the deterministic [[StubDecoder]] fake (real byte
  * inspection, fabricated dimensions) behind the same [[BinaryDecoder]]
  * seam; swap in javacv/ffmpeg off-container. The Spark-side plumbing
  * (schema, batching, partition sizing) is identical either way.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = true)))

  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Row
    /** Schema of the rows [[decode]] produces; media kinds with different
      * metadata (audio vs image) override it and [[decodeMeta]] follows. */
    def schema: StructType = metaSchema
  }

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Deterministic fake decoder: real byte inspection, fabricated
    * dimensions, `format = null`. The plumbing fixture for payloads that
    * are NOT images (audio/video codecs are absent in this container);
    * for real PNG/JPEG decoding use [[ImageIoDecoder]]. */
  object StubDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): Row = {
      val h = fnv(bytes)
      val w = 64 + (((h % 1024) + 1024) % 1024).toInt
      Row(bytes.length.toLong,
        if (bytes.isEmpty) -1 else bytes(0) & 0xff,
        h, w, (w * 3) / 4, null)
    }
  }

  /** REAL image codec on the JDK's headless `javax.imageio` (no external
    * jar): true width/height and the reader's format name for any
    * PNG/JPEG/GIF/BMP payload. Payloads ImageIO cannot decode fall back
    * to the [[StubDecoder]] byte-derived row (format = null), so mixed
    * binary columns decode in one pass without failing the batch. */
  object ImageIoDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): Row = {
      readImage(bytes) match {
        case Some((fmt, img)) =>
          Row(bytes.length.toLong,
            if (bytes.isEmpty) -1 else bytes(0) & 0xff,
            fnv(bytes), img.getWidth, img.getHeight, fmt)
        case None => StubDecoder.decode(bytes)
      }
    }
  }

  /** Decode bytes with the registered ImageIO reader, returning the
    * format name ("png", "JPEG", …, lower-cased) and the buffered image. */
  private def readImage(bytes: Array[Byte])
      : Option[(String, java.awt.image.BufferedImage)] = {
    if (bytes == null || bytes.length == 0) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          Some((fmt, reader.read(0)))
        } catch { case _: java.io.IOException => None }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Decode a binary column into a typed metadata struct, one partition
    * batch at a time. Output schema = input ++ `<outCol>: metaSchema`. */
  def decodeMeta(df: DataFrame, binCol: String, outCol: String = "media_meta",
                 decoder: BinaryDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, decoder.schema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else decoder.decode(bytes)
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Sample `n` evenly-spaced fixed-size frames (chunks) from a binary
    * payload — the video-frame-sampling plumbing with a byte-slice stub in
    * place of a real frame grabber. Emits one row per frame:
    * (…, frame_idx, frame_bytes). */
  def frameSample(df: DataFrame, binCol: String, n: Int,
                  frameBytes: Int = 16): DataFrame = {
    require(n > 0)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val step = math.max(1, bytes.length / n)
          (0 until math.min(n, bytes.length)).iterator.map { i =>
            val start = i * step
            val end = math.min(bytes.length, start + frameBytes)
            Row.fromSeq(row.toSeq ++ Seq(i, bytes.slice(start, end)))
          }
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Fixed-dimension feature vector from a binary payload: byte histogram
    * folded into `dim` buckets, L1-normalized. A deterministic stand-in
    * for an embedding/feature model with the same plumbing contract —
    * fixed output dimension, per-partition batch extraction, null-safe.
    * Swap the histogram for a real model call off-container. */
  def featureExtract(df: DataFrame, binCol: String, dim: Int = 16,
                     outCol: String = "features"): DataFrame = {
    require(dim > 0 && 256 % dim == 0, "dim must divide 256")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val fold = 256 / dim
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val feats =
          if (bytes == null || bytes.isEmpty) Array.fill(dim)(0.0)
          else {
            val hist = new Array[Double](dim)
            var i = 0
            while (i < bytes.length) { hist((bytes(i) & 0xff) / fold) += 1.0; i += 1 }
            val total = bytes.length.toDouble
            var k = 0
            while (k < dim) { hist(k) /= total; k += 1 }
            hist
          }
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Resize stub: normalize every payload to exactly `targetBytes` by
    * truncate-or-zero-pad — a real resize's shape contract (fixed output
    * size regardless of input) with a byte operation in place of pixel
    * resampling. Null payloads stay null. */
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int,
                 outCol: String = "resized"): DataFrame = {
    require(targetBytes > 0)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out =
          if (bytes == null) null
          else java.util.Arrays.copyOf(bytes, targetBytes) // truncates or 0-pads
        Row.fromSeq(row.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image resize: decode with ImageIO, scale to exactly
    * (width × height) with bilinear interpolation, re-encode as PNG.
    * Same per-partition batch plumbing as [[resizeStub]]; payloads that
    * are not decodable images (and null payloads) produce null — a
    * training pipeline filters those rather than shipping fake pixels.
    * Deterministic: JDK PNG encoding carries no timestamps and bilinear
    * scaling is pure raster math. */
  def resizeImage(df: DataFrame, binCol: String,
                  width: Int, height: Int,
                  outCol: String = "resized"): DataFrame = {
    require(width > 0 && height > 0)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out = if (bytes == null) null else readImage(bytes) match {
          case None => null
          case Some((_, img)) =>
            val scaled = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            bos.toByteArray
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Deterministic PNG fixture generator for the codec gates: appends a
    * real PNG payload whose dimensions are pure functions of the id —
    * width = 16 + id % 32, height = 8 + id % 16 — with id-seeded pixels,
    * so a SQL oracle can predict the decoded dimensions arithmetically
    * while the bytes themselves exercise the full encode/decode path.
    * `patternMod > 0` seeds dims and pixels from `id % patternMod`
    * instead of the id, planting EXACT duplicate images across ids in a
    * way the oracle predicts arithmetically (the image-dedup gate). */
  def generatePng(df: DataFrame, idCol: String,
                  outCol: String = "payload",
                  patternMod: Long = 0L): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val rawId = row.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        val id = if (patternMod > 0) rawId % patternMod else rawId
        val w = 16 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 97) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** 64-bit difference hash (dHash) of an image payload — the standard
    * perceptual fingerprint for image dedup: decode, software-bilinear
    * downscale to 9×8 grayscale, bit i set when pixel (x+1) is brighter
    * than pixel x in its row. Identical pixels hash identically
    * regardless of container bytes; re-encodes and mild resizes move few
    * bits, so near-dups live at small Hamming distance. Pure Java2D
    * software raster — deterministic across JVMs. NULL / undecodable
    * payloads hash to NULL (they cannot be "similar" to anything).
    * Appends `<outCol>: long`. Map-only; at 100 TB this runs in the scan
    * stage and the 8-byte hash is all that ever shuffles. */
  def perceptualHash64(df: DataFrame, binCol: String,
                       outCol: String = "phash"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val hash: Any = readImage(if (bytes == null) Array.emptyByteArray
          else bytes) match {
          case None => null
          case Some((_, img)) => dHash64(img)
        }
        Row.fromSeq(row.toSeq :+ hash)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  private[operators] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def gray(px: Int): Int = {
          val rgb = small.getRGB(px, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        if (gray(x + 1) > gray(x)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Candidate near-duplicate image pairs at Hamming distance ≤
    * `maxHamming` on the dHash, WITHOUT an all-pairs compare: the 64-bit
    * hash splits into `maxHamming + 1`-wise bands (rounded up to a
    * power-of-two count ≤ 16), pairs equi-join on (band index, band
    * value) — pigeonhole guarantees ≤ maxHamming flipped bits leave at
    * least one band intact — then the exact popcount filter keeps true
    * pairs and `distinct` collapses multi-band meetings. Returns
    * (id1, id2, hamming int) with id1 < id2.
    *
    * Scale shape: the corpus shuffles once on band values (8 bytes +
    * id per band row); candidate volume is governed by band width
    * (16/8/4 bits) exactly like the MinHash-LSH text path. Cluster the
    * pairs with [[Dedup.connectedComponents]] and keep-min, as the text
    * near-dup pipeline does. */
  def nearDupImagePairs(df: DataFrame, idCol: String, binCol: String,
                        maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      "maxHamming in [0, 15]: 16 bands of 4 bits are the thinnest useful cut")
    // smallest power-of-two band count > maxHamming (pigeonhole: more
    // bands than flippable bits leaves one band intact); divides 64
    var nBands = 1
    while (nBands < maxHamming + 1) nBands <<= 1
    val width = 64 / nBands
    val hashed = perceptualHash64(df, binCol).filter(col("phash").isNotNull)
      .select(col(idCol).as("__pid"), col("phash"))
    val banded = hashed.select(col("__pid"), col("phash"),
      explode(sequence(lit(0), lit(nBands - 1))).as("__b"))
      .withColumn("__bv",
        expr(s"shiftrightunsigned(phash, __b * $width)")
          .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1)))
    val l = banded.select(col("__pid").as("id1"), col("phash").as("__h1"),
      col("__b"), col("__bv"))
    val r = banded.select(col("__pid").as("id2"), col("phash").as("__h2"),
      col("__b"), col("__bv"))
    l.join(r, Seq("__b", "__bv"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(__h1 ^ __h2)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Audio metadata row shape: header facts (sample rate, channels,
    * frame count, encoding) plus one PCM statistic (max absolute 16-bit
    * sample) proving the decoder read the DATA chunk, not just the
    * header. `format = null` marks the non-audio stub fallback. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("pcm_max", IntegerType, nullable = false),
    StructField("format", StringType, nullable = true)))

  /** REAL audio codec on the JDK's `javax.sound.sampled` (no external
    * jar): WAV/AIFF/AU decode to true sample rate, channel count, frame
    * length and a max-|sample| scan of the 16-bit PCM payload. The same
    * honesty upgrade [[ImageIoDecoder]] made for images — the JDK ships
    * these codecs, so "no codec in container" does not excuse a stub.
    * Payloads the sound stack cannot parse fall back to a byte-derived
    * stub row (`format = null`, -1 sentinels), so mixed binary columns
    * decode in one pass without failing the batch. */
  object AudioDecoder extends BinaryDecoder {
    override def schema: StructType = audioMetaSchema
    def decode(bytes: Array[Byte]): Row = {
      readAudio(bytes) match {
        case Some((fmt, frames, pcmMax)) =>
          Row(bytes.length.toLong, fnv(bytes),
            fmt.getSampleRate.toInt, fmt.getChannels, frames, pcmMax,
            fmt.getEncoding.toString.toLowerCase(java.util.Locale.ROOT))
        case None =>
          Row(bytes.length.toLong, fnv(bytes), -1, -1, -1L, -1, null)
      }
    }
  }

  private def readAudio(bytes: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Long, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // a decoded stream can never legitimately exceed the payload it
        // came from (PCM containers store samples verbatim); a header
        // whose declared sizes imply more is malformed — bail to the stub
        // row instead of letting readAllBytes allocate from a lie
        val data = ais.readNBytes(bytes.length max 64)
        // trailing-data probe must be frame-aligned: the single-byte
        // read() overload throws for any frame size != 1 (every 16-bit
        // PCM stream), which the NonFatal catch would turn into a stub
        // row for ALL valid audio
        if (ais.readNBytes(math.max(fmt.getFrameSize, 1)).nonEmpty) return None
        // max |sample| over 16-bit frames (little-endian unless the
        // format says otherwise); non-16-bit payloads report 0
        var pcmMax = 0
        if (fmt.getSampleSizeInBits == 16) {
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            val a = math.abs(s.toInt)
            if (a > pcmMax) pcmMax = a
            i += 2
          }
        }
        Some((fmt, ais.getFrameLength, pcmMax))
      } finally ais.close()
    } catch {
      // NonFatal, not just the two declared exceptions: WAV/AIFF header
      // parsing inside AudioSystem throws RuntimeExceptions on crafted
      // sizes (NegativeArraySize, ArrayIndexOutOfBounds) and the
      // documented contract is "falls back without failing the batch" —
      // one malformed payload in a 100 TB scan must cost one stub row,
      // never a task retry storm
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic WAV generator for gates/specs: 16-bit PCM mono/stereo
    * with rate, frame count and a CONSTANT sample amplitude that are all
    * pure functions of the id — so an external SQL oracle can predict
    * every decoded field arithmetically. Encoded with the same JDK sound
    * stack the decoder reads ([[AudioDecoder]] round trip). */
  def generateWav(df: DataFrame, idCol: String,
                  outCol: String = "payload",
                  silencePad: Boolean = false,
                  squareWave: Boolean = false): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        val rate = 8000 + (id % 8).toInt * 1000
        val channels = 1 + (id % 2).toInt
        val frames = 50 + (id % 100).toInt
        val amp = (id % 500).toInt // constant signal -> pcm_max == amp
        // squareWave flips the sign every P = 1 + id % 4 frames, so a
        // zero-crossing counter's outcome is floor((frames-1)/P) per id
        val period = 1 + (id % 4).toInt
        // silencePad brackets the signal with id-derived silent frames
        // (lead = id % 10, tail = id % 5) so a trim operator's outcome
        // is arithmetically predictable per id
        val lead = if (silencePad) (id % 10).toInt else 0
        val tail = if (silencePad) (id % 5).toInt else 0
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val total = lead + frames + tail
        val data = new Array[Byte](total * channels * 2)
        var i = lead * channels * 2
        val signalEnd = (lead + frames) * channels * 2
        while (i < signalEnd) {
          val frameIdx = i / (channels * 2) - lead
          val s =
            if (squareWave && (frameIdx / period) % 2 == 1) -amp else amp
          data(i) = (s & 0xff).toByte
          data(i + 1) = ((s >> 8) & 0xff).toByte
          i += 2
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, total.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Leading/trailing-silence measurement for 16-bit PCM payloads — the
    * VAD-lite trim every speech-data pipeline runs before chunking: a
    * frame is LOUD when any channel's |sample| exceeds `threshold`;
    * the report is (n_frames, lead_frames, tail_frames, kept_frames)
    * with kept the inclusive loud span (all-silent audio reports
    * lead = n, tail = 0, kept = 0 — "everything is leading silence").
    * Appends the four long columns; NULL/undecodable/non-16-bit
    * payloads report NULLs. Map-only real decode, same partition-batch
    * contract as [[decodeMeta]]. */
  def trimSilence(df: DataFrame, binCol: String,
                  threshold: Int = 0): DataFrame = {
    require(threshold >= 0, "threshold must be >= 0")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", LongType), StructField("lead_frames", LongType),
      StructField("tail_frames", LongType), StructField("kept_frames", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val stats: Seq[Any] = decodePcm16(bytes) match {
          case None => Seq(null, null, null, null)
          case Some((channels, data)) =>
            val frameBytes = channels * 2
            val n = data.length / frameBytes
            def loud(f: Int): Boolean = {
              var c = 0
              while (c < channels) {
                val i = f * frameBytes + c * 2
                val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
                if (math.abs(s.toInt) > threshold) return true
                c += 1
              }
              false
            }
            var first = 0
            while (first < n && !loud(first)) first += 1
            if (first == n) Seq(n.toLong, n.toLong, 0L, 0L)
            else {
              var last = n - 1
              while (last > first && !loud(last)) last -= 1
              Seq(n.toLong, first.toLong, (n - 1 - last).toLong,
                (last - first + 1).toLong)
            }
        }
        Row.fromSeq(row.toSeq ++ stats)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Decode a payload to (channels, little-endian 16-bit PCM bytes) —
    * None for NULL/undecodable/non-16-bit/big-endian input. */
  private def decodePcm16(bytes: Array[Byte]): Option[(Int, Array[Byte])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          // drain to EOF: a stream whose decoded PCM exceeds the
          // container size (compressed encodings) must not silently
          // truncate and under-count frames downstream
          val data = ais.readAllBytes()
          Some((fmt.getChannels, data))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Zero-crossing count over channel 0 of a 16-bit PCM payload — the
    * classic VAD/voicing feature next to [[trimSilence]]'s energy gate
    * (high ZCR = fricatives/noise, low = voiced speech or tone). A
    * crossing is a STRICT sign change between consecutive frames
    * (`s[i-1] · s[i] < 0`); zero samples are sign-less and never count,
    * so silence contributes nothing. Appends (n_frames, n_crossings);
    * NULL/undecodable/non-16-bit payloads report NULLs. Map-only real
    * decode, same partition-batch contract as [[decodeMeta]]. */
  def zeroCrossingStats(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", LongType), StructField("n_crossings", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val stats: Seq[Any] = decodePcm16(bytes) match {
          case None => Seq(null, null)
          case Some((channels, data)) =>
            val frameBytes = channels * 2
            val n = data.length / frameBytes
            var crossings = 0L
            var prev = 0
            var i = 0
            while (i < n) {
              val off = i * frameBytes
              val s = ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toInt
              if (prev * s < 0) crossings += 1
              if (s != 0) prev = s
              i += 1
            }
            Seq(n.toLong, crossings)
        }
        Row.fromSeq(row.toSeq ++ stats)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Pure-SQL byte statistics over a binary column — the parts of media
    * handling that do NOT need a codec stay declarative (and oracle-
    * checkable): payload size and first byte. */
  def byteStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("first_byte",
        when(length(col(binCol)) > 0,
          conv(substring(hex(col(binCol)), 1, 2), 16, 10).cast("int"))
          .otherwise(lit(-1)))

  // ---------------------------------------------------------------------
  // Video containers: REAL header parsing (AVI/RIFF chunk walk and MP4/
  // ISO-BMFF box walk, both pure JDK byte arithmetic — no codec jar
  // involved). What stays stubbed is only FRAME PIXEL decode, which
  // needs an actual video codec absent from this container; everything a
  // curation pipeline filters on BEFORE decoding — container, codec
  // fourcc, dimensions, frame count, frame rate, duration — is read
  // from the genuine on-disk structures here.
  // ---------------------------------------------------------------------

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("container", StringType, nullable = true),
    StructField("codec", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("fps_num", LongType, nullable = true),
    StructField("fps_den", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an AVI (RIFF) header: walks `RIFF/AVI LIST hdrl` for the
    * `avih` main header (total frames, width, height) and the first
    * video stream's `strh` (handler fourcc, dwRate/dwScale — the exact
    * rational frame rate) per the public AVI RIFF spec (msdn
    * AVIMAINHEADER/AVISTREAMHEADER layouts). Returns null when the
    * payload is not a well-formed AVI. duration_ms =
    * n_frames·1000·scale/rate in exact long arithmetic. */
  private def parseAvi(b: Array[Byte]): Row = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return null
    var totalFrames = -1L; var w = -1; var h = -1
    var codec: String = null; var rate = -1L; var scale = -1L
    // flat chunk walk: LIST headers are descended into (skip the 4-byte
    // list type), plain chunks are inspected or skipped; chunk sizes are
    // word-aligned per RIFF
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(b, o)
        val sz = u32le(b, o + 4).toInt
        val body = o + 8
        if (body + sz > end || sz < 0) return
        id match {
          case "LIST" => if (sz >= 4) walk(body + 4, body + sz)
          case "avih" if sz >= 40 =>
            totalFrames = u32le(b, body + 16)
            w = u32le(b, body + 32).toInt
            h = u32le(b, body + 36).toInt
          case "strh" if sz >= 36 && fourcc(b, body) == "vids" =>
            if (codec == null) {
              codec = fourcc(b, body + 4)
              scale = u32le(b, body + 20)
              rate = u32le(b, body + 24)
            }
          case _ => ()
        }
        o = body + sz + (sz & 1)
      }
    }
    walk(12, math.min(b.length, 12 + u32le(b, 4).toInt - 4))
    if (totalFrames < 0 || rate <= 0 || scale <= 0) null
    else Row("avi", codec, w, h, totalFrames, rate, scale,
      totalFrames * 1000L * scale / rate)
  }

  /** Parse an MP4 (ISO base media) header: walks the `moov` box tree for
    * `mvhd` (movie timescale + duration), the first video `trak`'s
    * `tkhd` (16.16 fixed-point width/height), its `mdia/mdhd` media
    * timescale, `stbl/stsd` sample-entry fourcc, and `stbl/stts`
    * (n_frames = Σ sample counts; fps = media_timescale / first delta)
    * per ISO/IEC 14496-12. Returns null for non-BMFF payloads.
    * duration_ms = mvhd duration·1000/timescale in exact longs. */
  private def parseMp4(b: Array[Byte]): Row = {
    if (b.length < 8 || fourcc(b, 4) != "ftyp") return null
    var timescale = -1L; var duration = -1L
    var w = -1; var h = -1; var codec: String = null
    var mediaTimescale = -1L; var nFrames = -1L; var firstDelta = -1L
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val sz = u32be(b, o).toInt
        val tp = fourcc(b, o + 4)
        if (sz < 8 || o + sz > end) return
        val body = o + 8
        tp match {
          case t if containers(t) => walk(body, o + sz)
          case "mvhd" if sz >= 8 + 24 =>
            // version 0 layout: ver/flags(4) ctime(4) mtime(4)
            // timescale(4) duration(4)
            timescale = u32be(b, body + 12)
            duration = u32be(b, body + 16)
          case "tkhd" if sz >= 8 + 84 && w < 0 =>
            // v0: width/height are the LAST two 16.16 fields of the box
            w = (u32be(b, o + sz - 8) >> 16).toInt
            h = (u32be(b, o + sz - 4) >> 16).toInt
          case "mdhd" if sz >= 8 + 24 && mediaTimescale < 0 =>
            mediaTimescale = u32be(b, body + 12)
          case "stsd" if sz >= 8 + 16 && codec == null =>
            // ver/flags(4) entry_count(4) then first sample entry:
            // size(4) fourcc(4)
            codec = fourcc(b, body + 12)
          case "stts" if sz >= 8 + 8 && nFrames < 0 =>
            val n = u32be(b, body + 4).toInt
            if (8 + 8 + n * 8 <= sz) {
              var i = 0; var total = 0L
              while (i < n) {
                total += u32be(b, body + 8 + i * 8)
                if (i == 0) firstDelta = u32be(b, body + 12)
                i += 1
              }
              nFrames = total
            }
          case _ => ()
        }
        o += sz
      }
    }
    walk(0, b.length)
    if (timescale <= 0 || duration < 0) null
    else Row("mp4", codec, w, h, nFrames,
      if (mediaTimescale > 0) mediaTimescale else -1L,
      if (firstDelta > 0) firstDelta else -1L,
      duration * 1000L / timescale)
  }

  /** Container-sniffing video header decoder: real AVI and MP4 parsing
    * behind the standard [[BinaryDecoder]] seam (null meta for payloads
    * that are neither). Frame PIXELS are the only thing this container
    * cannot decode — pair with [[frameSample]]'s byte-slice stub until a
    * real codec is attached off-container. */
  object VideoContainerDecoder extends BinaryDecoder {
    override def schema: StructType = videoMetaSchema
    def decode(bytes: Array[Byte]): Row = {
      val avi = parseAvi(bytes)
      if (avi != null) avi else parseMp4(bytes)
    }
  }

  /** Deterministic REAL-container video fixtures: even ids get an AVI
    * (RIFF hdrl/avih/strl/strh/strf + empty movi) with MJPG fourcc, odd
    * ids an MP4 (ftyp + moov[mvhd,trak[tkhd,mdia[mdhd,minf[stbl[stsd,
    * stts]]]]] + mdat) with avc1 — every header field a pure function
    * of the id, so a SQL oracle predicts the parsed metadata
    * arithmetically while the bytes exercise the genuine parsers. */
  def generateVideo(df: DataFrame, idCol: String,
                    outCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        val bytes =
          if (id % 2 == 0) aviBytes(id) else mp4Bytes(id)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Header parameters for the generated AVI of `id` (see
    * [[generateVideo]]); the oracle mirrors these expressions. */
  def aviParams(id: Long): (Int, Int, Long, Long) =
    (32 + (id % 64).toInt, 24 + (id % 48).toInt, // w, h
      30 + id % 60, 10 + id % 20) // frames, fps (scale 1)

  private def aviBytes(id: Long): Array[Byte] = {
    val (w, h, frames, rate) = aviParams(id)
    def chunk(id4: String, body: Array[Byte]): Array[Byte] =
      ascii(id4) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(tp: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", ascii(tp) ++ body)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(1000000L / rate), 0, avih, 0, 4) // usec/frame
    System.arraycopy(le32(frames), 0, avih, 16, 4)
    System.arraycopy(le32(1L), 0, avih, 24, 4) // one stream
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)
    val strh = new Array[Byte](56)
    System.arraycopy(ascii("vids"), 0, strh, 0, 4)
    System.arraycopy(ascii("MJPG"), 0, strh, 4, 4)
    System.arraycopy(le32(1L), 0, strh, 20, 4) // dwScale
    System.arraycopy(le32(rate), 0, strh, 24, 4) // dwRate
    System.arraycopy(le32(frames), 0, strh, 32, 4) // dwLength
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    System.arraycopy(le32(40L), 0, strf, 0, 4)
    System.arraycopy(le32(w.toLong), 0, strf, 4, 4)
    System.arraycopy(le32(h.toLong), 0, strf, 8, 4)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", chunk("00dc", le32(id))) // one token frame chunk
    val payload = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(payload.length.toLong) ++ payload
  }

  /** Header parameters for the generated MP4 of `id` (see
    * [[generateVideo]]); the oracle mirrors these expressions. */
  def mp4Params(id: Long): (Int, Int, Long, Long, Long, Long) = {
    val timescale = 600 + id % 400
    val nFrames = 25 + id % 75
    val delta = 20 + id % 30
    (32 + (id % 64).toInt, 24 + (id % 48).toInt, // w, h
      timescale, nFrames * delta + id % 7, // mvhd duration (non-round)
      nFrames, delta)
  }

  private def mp4Bytes(id: Long): Array[Byte] = {
    val (w, h, timescale, duration, nFrames, delta) = mp4Params(id)
    def box(tp: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ ascii(tp) ++ body
    val ftyp = box("ftyp", ascii("isom") ++ be32(512L) ++ ascii("isomiso2"))
    val mvhd = box("mvhd", new Array[Byte](12) ++ be32(timescale) ++
      be32(duration) ++ new Array[Byte](80))
    val tkhd = {
      val body = new Array[Byte](84)
      be32((w.toLong << 16)).copyToArray(body, 76)
      be32((h.toLong << 16)).copyToArray(body, 80)
      box("tkhd", body)
    }
    val mdhd = box("mdhd", new Array[Byte](12) ++ be32(timescale) ++
      be32(duration) ++ new Array[Byte](4))
    val stsd = box("stsd", new Array[Byte](4) ++ be32(1L) ++
      be32(16L) ++ ascii("avc1") ++ new Array[Byte](8))
    val stts = box("stts", new Array[Byte](4) ++ be32(1L) ++
      be32(nFrames) ++ be32(delta))
    val stbl = box("stbl", stsd ++ stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", le32(id))
    ftyp ++ moov ++ mdat
  }

  // ---------------------------------------------------------------------
  // REAL video frame decode. Two genuine codec paths, both pure JDK:
  //  - "DIB " (BI_RGB): AVI `00db` chunks carry uncompressed bottom-up
  //    BGR24 rows (4-byte-aligned) — the raw-video AVI layout; pixel
  //    sums are exact integer arithmetic over the chunk bytes.
  //  - "MJPG": AVI `00dc` chunks carry real JPEG images, decoded by
  //    javax.imageio (the JDK ships a JPEG codec) — Motion-JPEG is a
  //    first-class capture/CCTV format, not a toy.
  // This retires the frame-pixel stub for these two codecs; only
  // inter-frame codecs (H.264 etc.) remain off-container.
  // ---------------------------------------------------------------------

  val frameStatsSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false)))

  /** Decode every video frame of an AVI payload: walks `LIST movi`,
    * decodes each `..db` chunk as an uncompressed bottom-up BGR24 DIB
    * (row stride padded to 4 bytes per the DIB spec — padding excluded
    * from the sums) and each `..dc` chunk with the JDK's ImageIO JPEG
    * reader (Motion-JPEG), and emits one row per frame:
    * input ++ (frame_idx, codec, width, height, sum_b, sum_g, sum_r)
    * where sum_c is the exact per-channel pixel sum. Chunks that are
    * neither decodable DIB nor ImageIO-readable are skipped (count
    * preserved in frame_idx gaps is NOT the contract — idx is dense
    * over decoded frames). Per-partition batch decode, bounded memory:
    * one frame buffer at a time, never the whole movi list. */
  def decodeAviFrames(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ frameStatsSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else aviFrameStats(bytes).iterator.map { fr =>
          Row.fromSeq(row.toSeq ++ fr.toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Frame-stat rows for one AVI payload (see [[decodeAviFrames]]). */
  private def aviFrameStats(b: Array[Byte]): Seq[Row] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return Nil
    var codec: String = null
    var w = -1; var h = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var idx = 0
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(b, o)
        val sz = u32le(b, o + 4).toInt
        val body = o + 8
        if (body + sz > end || sz < 0) return
        id match {
          case "LIST" if sz >= 4 =>
            walk(body + 4, body + sz, inMovi || fourcc(b, body) == "movi")
          case "strh" if sz >= 36 && fourcc(b, body) == "vids" =>
            if (codec == null) codec = fourcc(b, body + 4)
          case "strf" if sz >= 12 && w < 0 =>
            w = u32le(b, body + 4).toInt
            h = u32le(b, body + 8).toInt
          case c if inMovi && c.length == 4 && c.endsWith("db") && w > 0 =>
            decodeDib(b, body, sz, w, h).foreach { r =>
              out += Row(idx, "DIB ", w, h, r._1, r._2, r._3); idx += 1
            }
          case c if inMovi && c.length == 4 && c.endsWith("dc") && sz > 0 =>
            val payload = java.util.Arrays.copyOfRange(b, body, body + sz)
            readImage(payload).foreach { case (_, img) =>
              var sb = 0L; var sg = 0L; var sr = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sb += p & 0xff; sg += (p >> 8) & 0xff; sr += (p >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              out += Row(idx, if (codec == null) "MJPG" else codec,
                img.getWidth, img.getHeight, sb, sg, sr)
              idx += 1
            }
          case _ => ()
        }
        o = body + sz + (sz & 1)
      }
    }
    walk(12, math.min(b.length, 12 + u32le(b, 4).toInt - 4), inMovi = false)
    out.toSeq
  }

  /** Exact per-channel sums of one uncompressed bottom-up BGR24 DIB
    * frame chunk; None if the chunk is smaller than stride·h. */
  private def decodeDib(b: Array[Byte], off: Int, sz: Int,
                        w: Int, h: Int): Option[(Long, Long, Long)] = {
    val stride = (w * 3 + 3) & ~3
    if (sz < stride * h) return None
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < h) {
      var x = 0
      val rowOff = off + y * stride
      while (x < w) {
        val p = rowOff + x * 3
        sb += b(p) & 0xff; sg += b(p + 1) & 0xff; sr += b(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    Some((sb, sg, sr))
  }

  /** Frame parameters of the generated frame-bearing AVI of `id` (see
    * [[generateVideoFrames]]): (w, h, n_frames). The oracle mirrors
    * these expressions, plus the solid frame colors
    * b=(7·id+13·f)%256, g=(11·id+17·f)%256, r=(5·id+19·f)%256. */
  def aviFrameParams(id: Long): (Int, Int, Int) =
    (8 + (id % 16).toInt * 2, 6 + (id % 12).toInt, 3 + (id % 5).toInt)

  /** Deterministic REAL-frame AVI fixtures: each id's AVI carries
    * `n_frames` solid-color frames in its `movi` list — uncompressed
    * BGR24 `00db` chunks by default (exact arithmetic oracle), or real
    * ImageIO-encoded JPEG `00dc` chunks with `mjpeg = true` (true
    * Motion-JPEG; JPEG quantization makes decoded pixels near-but-not-
    * exactly the input color, so the MJPEG path is spec-gated on
    * dimensions/count/approximate color rather than oracle-hashed). */
  def generateVideoFrames(df: DataFrame, idCol: String, mjpeg: Boolean = false,
                          outCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.get(idIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        Row.fromSeq(row.toSeq :+ aviFrameBytes(id, mjpeg))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  private def aviFrameBytes(id: Long, mjpeg: Boolean): Array[Byte] = {
    val (w, h, nFrames) = aviFrameParams(id)
    def chunk(id4: String, body: Array[Byte]): Array[Byte] =
      ascii(id4) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(tp: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", ascii(tp) ++ body)
    val codec = if (mjpeg) "MJPG" else "DIB "
    val avih = new Array[Byte](56)
    System.arraycopy(le32(100000L), 0, avih, 0, 4) // 10 fps
    System.arraycopy(le32(nFrames.toLong), 0, avih, 16, 4)
    System.arraycopy(le32(1L), 0, avih, 24, 4)
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)
    val strh = new Array[Byte](56)
    System.arraycopy(ascii("vids"), 0, strh, 0, 4)
    System.arraycopy(ascii(codec), 0, strh, 4, 4)
    System.arraycopy(le32(1L), 0, strh, 20, 4)
    System.arraycopy(le32(10L), 0, strh, 24, 4)
    System.arraycopy(le32(nFrames.toLong), 0, strh, 32, 4)
    val strf = new Array[Byte](40)
    System.arraycopy(le32(40L), 0, strf, 0, 4)
    System.arraycopy(le32(w.toLong), 0, strf, 4, 4)
    System.arraycopy(le32(h.toLong), 0, strf, 8, 4)
    val frames = (0 until nFrames).map { f =>
      val cb = ((7 * id + 13 * f) % 256).toInt
      val cg = ((11 * id + 17 * f) % 256).toInt
      val cr = ((5 * id + 19 * f) % 256).toInt
      if (mjpeg) chunk("00dc", jpegBytes(w, h, cr, cg, cb))
      else {
        val stride = (w * 3 + 3) & ~3
        val pix = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = y * stride + x * 3
            pix(p) = cb.toByte; pix(p + 1) = cg.toByte; pix(p + 2) = cr.toByte
            x += 1
          }
          y += 1
        }
        chunk("00db", pix)
      }
    }.reduce(_ ++ _)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames)
    val payload = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(payload.length.toLong) ++ payload
  }

  /** A real JPEG encoding of a solid-color w×h image via ImageIO. */
  private def jpegBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }
}

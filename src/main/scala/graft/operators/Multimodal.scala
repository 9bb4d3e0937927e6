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
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — behind [[BinaryDecoder]]; [[StubDecoder]] is a
  * deterministic fake that reads real bytes (length, first byte, FNV hash,
  * fake dimensions derived from the hash). The Spark-side plumbing
  * (schema, batching, partition sizing) is real and tested; swap the
  * decoder for javacv/ffmpeg in a real deployment.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Row
  }

  /** Deterministic fake decoder: real byte inspection, fabricated
    * dimensions. REPLACE with a real codec (`???` boundary) off-container. */
  object StubDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): Row = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      val w = 64 + (((h % 1024) + 1024) % 1024).toInt
      Row(bytes.length.toLong,
        if (bytes.isEmpty) -1 else bytes(0) & 0xff,
        h, w, (w * 3) / 4)
    }
  }

  /** Decode a binary column into a typed metadata struct, one partition
    * batch at a time. Output schema = input ++ `<outCol>: metaSchema`. */
  def decodeMeta(df: DataFrame, binCol: String, outCol: String = "media_meta",
                 decoder: BinaryDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, metaSchema))
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

  /** Pure-SQL byte statistics over a binary column — the parts of media
    * handling that do NOT need a codec stay declarative (and oracle-
    * checkable): payload size and first byte. */
  def byteStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("first_byte",
        when(length(col(binCol)) > 0,
          conv(substring(hex(col(binCol)), 1, 2), 16, 10).cast("int"))
          .otherwise(lit(-1)))
}

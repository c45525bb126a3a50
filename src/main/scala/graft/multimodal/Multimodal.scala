package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a partition-mapped batch transform (the Scala
  * analog of `mapInPandas` — an Iterator[Row] → Iterator[Row] function
  * per partition, so the decoder library initializes once per task,
  * not once per row).
  *
  * IMAGE decode is REAL: `decodeImages` reads width/height/format from
  * actual image bytes through `javax.imageio` (JDK built-in — PNG, BMP,
  * GIF, JPEG), header-only: the reader reports dimensions without
  * decoding the raster, so cost per image is O(header), not O(pixels) —
  * the right contract for a 100 TB scan that only needs metadata.
  *
  * AUDIO decode is REAL: `decodeAudio` parses container/rate/channels/
  * bits/frames from actual RIFF-WAVE (or AIFF/AU) bytes through
  * `javax.sound.sampled` — header-only, like the image path.
  *
  * ── STUB BOUNDARY (video only) ───────────────────────────────────
  * No video codecs exist in this container, so `decodeStub` derives
  * deterministic fake features from the raw bytes (first two bytes →
  * fake width/height, byte count → fake frame count). The Spark-side
  * contract — schema, binary transport, per-partition batching,
  * output row shape — is real and tested; swap `decodeStub` for a
  * JNI/FFI codec call in production.
  * ─────────────────────────────────────────────────────────────────
  */
object Multimodal {

  /** Wrap a text/bytes source as a multimodal table:
    * (id, payload binary, kind, n_bytes). */
  def asBinaryTable(df: DataFrame, idCol: String, payloadCol: String,
                    kind: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(kind).as("kind"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("payload_md5", StringType)))

  /** Per-partition batch "decode": Iterator→Iterator, so real codecs
    * amortize init across the partition (mapInPandas batch shape). */
  def decodeStub(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    binaryTable.select("media_id", "kind", "n_bytes", "payload")
      .mapPartitions { rows =>
        // per-task init would happen here (codec contexts, model handles)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val nBytes = r.getAs[Long]("n_bytes")
          val payload = r.getAs[Array[Byte]]("payload")
          // STUB decode: deterministic fakes from raw bytes
          val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
          val b1 = if (payload.length > 1) payload(1) & 0xff else 0
          val width = 64L + (b0 % 64)
          val height = 64L + (b1 % 64)
          val nFrames = 1L + (nBytes % 8)
          md.reset()
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          Row(id, kind, nBytes, width, height, nFrames, hex)
        }
      }(enc)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("fmt", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_bytes", LongType)))

  /** REAL image decode: width/height/format from the payload bytes via
    * javax.imageio, header-only (reader.getWidth(0) never touches the
    * raster). Per-partition init (`setUseCache(false)`, reader reuse
    * via the registry) follows the mapInPandas batch shape; rows whose
    * bytes no installed reader recognizes come back with null
    * fmt/width/height rather than failing the task. */
  def decodeImages(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    binaryTable.select("media_id", "n_bytes", "payload")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per task
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val nBytes = r.getAs[Long]("n_bytes")
          val payload = r.getAs[Array[Byte]]("payload")
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              Row(id, reader.getFormatName.toLowerCase,
                reader.getWidth(0).toLong, reader.getHeight(0).toLong, nBytes)
            } catch {
              case _: java.io.IOException => Row(id, null, null, null, nBytes)
            } finally reader.dispose()
          } else Row(id, null, null, null, nBytes)
        }
      }(enc)
  }

  /** Encode one single-color PNG/BMP/GIF per row from (id, width,
    * height) — the test-image generator for the decode round-trip (the
    * container ships no image corpus). Deterministic dimensions; the
    * pixel fill derives from the id so payloads differ. */
  def encodeTestImages(df: DataFrame, idCol: String, widthCol: String,
                       heightCol: String, format: String = "png"): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(widthCol).cast("int").as("__w"), col(heightCol).cast("int").as("__h"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val img = new java.awt.image.BufferedImage(
            r.getAs[Int]("__w"), r.getAs[Int]("__h"),
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          g.setColor(new java.awt.Color((id * 2654435761L).toInt & 0xffffff))
          g.fillRect(0, 0, img.getWidth, img.getHeight)
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, format, out)
          val bytes = out.toByteArray
          Row(id, bytes, "image", bytes.length.toLong)
        }
      }(enc)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("fmt", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("bits", LongType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** REAL audio decode: container format, sample rate, channels, bit
    * depth and frame count parsed from the payload bytes via
    * `javax.sound.sampled.AudioSystem` (JDK built-in — WAV/AIFF/AU),
    * header-only: `getAudioFileFormat` never decodes samples, so cost
    * per clip is O(header). duration_ms derives from frames/rate.
    * Unrecognized payloads yield null features, not task failures. */
  def decodeAudio(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatureSchema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
            val f = aff.getFormat
            val frames = aff.getFrameLength.toLong
            val rate = f.getSampleRate.toLong
            Row(id, aff.getType.toString.toLowerCase, rate,
              f.getChannels.toLong, f.getSampleSizeInBits.toLong, frames,
              if (rate > 0) frames * 1000L / rate else null)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException |
                 _: java.io.IOException =>
              Row(id, null, null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Encode one PCM-16 RIFF/WAVE clip per row from (id, rate,
    * channels, frames) — the test-audio generator for the decode
    * round-trip (the container ships no audio corpus). The 44-byte
    * canonical header plus deterministic id-derived samples make a
    * REAL wav file any decoder can read. */
  def encodeTestWavs(df: DataFrame, idCol: String, rateCol: String,
                     channelsCol: String, framesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(rateCol).cast("int").as("__rate"),
      col(channelsCol).cast("int").as("__ch"),
      col(framesCol).cast("int").as("__frames"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val rate = r.getAs[Int]("__rate")
          val ch = r.getAs[Int]("__ch")
          val frames = r.getAs[Int]("__frames")
          val blockAlign = ch * 2
          val dataSize = frames * blockAlign
          val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1.toShort).putShort(ch.toShort) // PCM, channels
            .putInt(rate).putInt(rate * blockAlign)
            .putShort(blockAlign.toShort).putShort(16.toShort)
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < frames * ch) {
            buf.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
            i += 1
          }
          val bytes = buf.array()
          Row(id, bytes, "audio", bytes.length.toLong)
        }
      }(enc)
  }

  /** Frame sampling plan for video-kind rows: every `stride`-th frame
    * index up to the fake frame count — demonstrates explode-style
    * fan-out of per-frame work units that downstream decode tasks
    * would consume. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
}

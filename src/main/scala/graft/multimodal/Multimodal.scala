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
  * VIDEO decode is REAL at the container-metadata level: `decodeVideo`
  * parses ISO BMFF (MP4) boxes — `mvhd` timescale/duration, `tkhd`
  * 16.16 fixed-point display size, `stsz` sample count — and Matroska/
  * WebM EBML elements (DocType, TimestampScale, Duration, PixelWidth/
  * Height) by direct byte walking, no codec involved; that is exactly
  * the metadata a training pipeline filters on (resolution, duration,
  * frame count). Pixel DECODE of video would need a real codec, which
  * this container doesn't ship — that call would slot into the same
  * mapPartitions batch shape.
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

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("fmt", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** REAL video container-metadata decode: MP4 (ISO BMFF) box walk —
    * `moov/mvhd` timescale+duration, first `trak/tkhd` display size
    * (16.16 fixed point), `stbl/stsz` sample count — and Matroska/WebM
    * EBML walk — DocType, Segment/Info TimestampScale+Duration,
    * Tracks/TrackEntry/Video PixelWidth+PixelHeight. Pure byte
    * parsing (same approach as the RIFF writer below), header-only:
    * cost per clip is O(metadata), media data is never touched.
    * Unrecognized payloads yield null features, not task failures.
    * n_frames is null for Matroska (frame count there lives in the
    * clusters, which a header-only scan does not walk). */
  def decodeVideo(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoFeatureSchema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          VideoMeta.parse(payload) match {
            case Some(m) =>
              Row(id, m.fmt, m.width, m.height, m.nFrames, m.durationMs)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Encode one minimal-but-valid MP4 per row from (id, width, height,
    * frames) — the test-video generator for the decode round-trip (the
    * container ships no video corpus). ftyp + moov(mvhd, trak(tkhd,
    * mdia(mdhd, hdlr, minf(vmhd, dinf, stbl(stsd, stts, stsz))))) +
    * empty mdat, all boxes structurally correct; 25 fps timing
    * (timescale 1000, 40 ms/frame) so duration_ms = 40 × frames. */
  def encodeTestMp4s(df: DataFrame, idCol: String, widthCol: String,
                     heightCol: String, framesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(widthCol).cast("int").as("__w"), col(heightCol).cast("int").as("__h"),
      col(framesCol).cast("int").as("__frames"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = VideoMeta.buildMp4(
            r.getAs[Int]("__w"), r.getAs[Int]("__h"), r.getAs[Int]("__frames"))
          Row(id, bytes, "video", bytes.length.toLong)
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
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
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

  /** Difference-hash (dHash) over REAL decoded rasters: full pixel
    * decode via javax.imageio, integer luma per pixel
    * ((299r + 587g + 114b) / 1000), exact area-average down to the
    * canonical 9×8 grid (integer sum / count per cell), then one bit
    * per horizontal gradient: bit (y*8 + x) = 1 iff cell(x+1, y) >
    * cell(x, y). 64 bits → one long; undecodable payloads yield a
    * null hash. The classic perceptual near-dup fingerprint —
    * resize-invariant by construction — and its banding/verify plan
    * is EXACTLY [[graft.operators.Dedup.hammingPairs64]], the same
    * 4×16-bit bands the text SimHash path uses. */
  def dhashImages(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img == null) Row(id, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // exact area-average into the 9x8 grid: cell (cx, cy)
            // covers pixel columns [cx*w/9, (cx+1)*w/9) etc., integer
            // boundaries, so constant-block test images average exactly
            val cell = Array.ofDim[Long](8, 9)
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 9) {
                val (x0, x1) = (cx * w / 9, math.max((cx + 1) * w / 9, cx * w / 9 + 1))
                val (y0, y1) = (cy * h / 8, math.max((cy + 1) * h / 8, cy * h / 8 + 1))
                var sum = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = img.getRGB(x, y)
                    sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                      114L * (rgb & 0xff)) / 1000L
                    x += 1
                  }
                  y += 1
                }
                cell(cy)(cx) = sum / ((x1 - x0).toLong * (y1 - y0))
                cx += 1
              }
              cy += 1
            }
            var hash = 0L
            var j = 0
            while (j < 64) {
              if (cell(j / 8)(j % 8 + 1) > cell(j / 8)(j % 8)) hash |= (1L << j)
              j += 1
            }
            Row(id, hash)
          }
        }
      }(enc)
  }

  /** Encode one REAL PNG per row whose dHash is a deterministic,
    * engine-replicable function of the id — the test-image generator
    * for the image near-dup pipeline (the container ships no image
    * corpus, and single-color fills would make every dHash identical).
    *
    * Construction: ids form groups of 4 (gid = id - id % 4). A group's
    * 64 base gradient bits come from md5("img_" + gid) (first/second
    * 8 hex chars = two 32-bit words, bit j = word(j/32) >> (j%32));
    * member m = id % 4 XOR-flips 0/1/2/8 bit positions derived from
    * md5("flip_gid_m_i") % 64 — members 0-2 stay within Hamming 3 of
    * each other (near-dups), member 3 almost surely escapes. The bits
    * render as a 9×8 grid of constant-luma blocks, v(0,y) = 120 and
    * v(x+1,y) = v(x,y) ± 8 by bit (range [56,184]), scaled sx×sy per
    * block so image sizes vary while the exact block averages — and
    * therefore the decoded dHash — stay pinned to the arithmetic the
    * DuckDB oracle reproduces. */
  def encodeTestPatternImages(df: DataFrame, idCol: String,
                              sxCol: String, syCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(sxCol).cast("int").as("__sx"), col(syCol).cast("int").as("__sy"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val (sx, sy) = (r.getAs[Int]("__sx"), r.getAs[Int]("__sy"))
          val gid = id - (id % 4)
          val m = (id % 4).toInt
          val hex = md5hex(s"img_$gid")
          val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
          val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
          val bits = Array.tabulate(64) { j =>
            (if (j < 32) (h1 >> j) & 1L else (h2 >> (j - 32)) & 1L) == 1L
          }
          val flips = m match { case 0 => 0; case 1 => 1; case 2 => 2; case _ => 8 }
          var i = 0
          while (i < flips) {
            val p = (java.lang.Long.parseLong(
              md5hex(s"flip_${gid}_${m}_$i").substring(0, 6), 16) % 64).toInt
            bits(p) = !bits(p)
            i += 1
          }
          val img = new java.awt.image.BufferedImage(
            9 * sx, 8 * sy, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          var cy = 0
          while (cy < 8) {
            var v = 120
            var cx = 0
            while (cx < 9) {
              g.setColor(new java.awt.Color(v, v, v))
              g.fillRect(cx * sx, cy * sy, sx, sy)
              if (cx < 8) v += (if (bits(cy * 8 + cx)) 8 else -8)
              cx += 1
            }
            cy += 1
          }
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
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
    * header-only: cost per clip is O(header). duration_ms derives
    * from frames/rate. Unrecognized payloads yield null features, not
    * task failures.
    *
    * RIFF/WAVE payloads parse through the hand-rolled chunk walk
    * ([[RiffWave]], the same approach as VideoMeta's MP4/EBML walks):
    * `AudioSystem` synchronizes on a global provider registry, so
    * per-row calls SERIALIZE across executor threads — measured
    * SLOWER with 16 threads than with one. AudioSystem remains the
    * fallback for the non-WAV formats it knows (AIFF/AU). */
  def decodeAudio(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatureSchema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          RiffWave.parse(payload) match {
            case Some(w) =>
              Row(id, "wave", w.rate.toLong, w.channels.toLong, w.bits.toLong,
                w.nFrames, if (w.rate > 0) w.nFrames * 1000L / w.rate else null)
            case None =>
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
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
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

  /** 64-bit audio fingerprint over REAL decoded PCM: the payload runs
    * through `AudioSystem.getAudioInputStream` (actual sample decode,
    * not the header-only metadata path above), the clip's frames
    * split into 65 equal blocks, each block reports its exact integer
    * mean |amplitude|, and bit j is the sign of the block-energy
    * gradient (mean(j+1) > mean(j)) — the 1-D time-domain analog of
    * the image dHash, invariant to the per-block sample count. The
    * banding/verify plan is [[graft.operators.Dedup.hammingPairs64]],
    * shared with SimHash and the image path. Undecodable payloads and
    * clips shorter than 65 frames yield a null hash. */
  def ahashAudio(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          // hand-rolled RIFF walk, NOT AudioSystem: its global
          // provider-registry lock serializes per-row calls across
          // executor threads (measured slower with 16 threads than 1)
          RiffWave.parse(payload) match {
            case Some(w) if w.bits == 16 && w.channels == 1 && w.nFrames >= 65 =>
              val n = w.nFrames.toInt
              val spb = n / 65
              val means = new Array[Long](65)
              var b = 0
              while (b < 65) {
                var sum = 0L
                var i = b * spb
                val end = i + spb
                while (i < end) {
                  val o = w.dataOff + 2 * i
                  val s = ((payload(o + 1) << 8) | (payload(o) & 0xff)).toShort.toLong
                  sum += math.abs(s)
                  i += 1
                }
                means(b) = sum / spb
                b += 1
              }
              var hash = 0L
              var j = 0
              while (j < 64) {
                if (means(j + 1) > means(j)) hash |= (1L << j)
                j += 1
              }
              Row(id, hash)
            case _ => Row(id, null)
          }
        }
      }(enc)
  }

  /** Encode one REAL mono PCM-16 WAV per row whose block-energy
    * fingerprint is a deterministic, engine-replicable function of the
    * id — the audio sibling of [[encodeTestPatternImages]], same
    * group-of-4 scheme with "aud_"/"aflip_" md5 salts: 65 blocks of a
    * ±amplitude square wave, amp(0) = 10000 and amp(j+1) = amp(j) ±
    * 120 by bit j (range [2320, 17680] ⊂ int16, never flat), `spb`
    * samples per block so clip lengths vary while exact block means —
    * and therefore the decoded fingerprint — stay pinned to the
    * arithmetic the DuckDB oracle reproduces. */
  def encodeTestPatternWavs(df: DataFrame, idCol: String,
                            spbCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(spbCol).cast("int").as("__spb"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val spb = r.getAs[Int]("__spb")
          val gid = id - (id % 4)
          val m = (id % 4).toInt
          val hex = md5hex(s"aud_$gid")
          val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
          val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
          val bits = Array.tabulate(64) { j =>
            (if (j < 32) (h1 >> j) & 1L else (h2 >> (j - 32)) & 1L) == 1L
          }
          val flips = m match { case 0 => 0; case 1 => 1; case 2 => 2; case _ => 8 }
          var i = 0
          while (i < flips) {
            val p = (java.lang.Long.parseLong(
              md5hex(s"aflip_${gid}_${m}_$i").substring(0, 6), 16) % 64).toInt
            bits(p) = !bits(p)
            i += 1
          }
          val frames = 65 * spb
          val buf = java.nio.ByteBuffer.allocate(44 + frames * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1.toShort).putShort(1.toShort)
            .putInt(8000).putInt(8000 * 2)
            .putShort(2.toShort).putShort(16.toShort)
            .put("data".getBytes("US-ASCII")).putInt(frames * 2)
          var amp = 10000
          var b = 0
          while (b < 65) {
            var s = 0
            while (s < spb) {
              buf.putShort((if (s % 2 == 0) amp else -amp).toShort)
              s += 1
            }
            if (b < 64) amp += (if (bits(b)) 120 else -120)
            b += 1
          }
          val bytes = buf.array()
          Row(id, bytes, "audio", bytes.length.toLong)
        }
      }(enc)
  }

  /** Encode one REAL video container per row whose per-sample size
    * sequence is a deterministic, engine-replicable function of the
    * id — the video sibling of [[encodeTestPatternImages]] /
    * [[encodeTestPatternWavs]], same group-of-4 scheme with
    * "vid_"/"vflip_" md5 salts: 65 sample sizes, size(0) = base and
    * size(j+1) = size(j) ± 16 by bit j (base ≥ 2000 keeps every size
    * positive), so the gradient-sign fingerprint — and nothing else —
    * is pinned. EVEN members write ISO BMFF (stsz table), ODD members
    * write Matroska (SimpleBlock frame sizes): in-group near-dup pairs
    * must therefore be found ACROSS containers, certifying the
    * fingerprint is container-invariant. */
  def encodeTestPatternVideos(df: DataFrame, idCol: String,
                              baseCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("media_id"),
      col(baseCol).cast("long").as("__base"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val base = r.getAs[Long]("__base")
          val gid = id - (id % 4)
          val m = (id % 4).toInt
          val hex = md5hex(s"vid_$gid")
          val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
          val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
          val bits = Array.tabulate(64) { j =>
            (if (j < 32) (h1 >> j) & 1L else (h2 >> (j - 32)) & 1L) == 1L
          }
          val flips = m match { case 0 => 0; case 1 => 1; case 2 => 2; case _ => 8 }
          var i = 0
          while (i < flips) {
            val p = (java.lang.Long.parseLong(
              md5hex(s"vflip_${gid}_${m}_$i").substring(0, 6), 16) % 64).toInt
            bits(p) = !bits(p)
            i += 1
          }
          val sizes = new Array[Long](65)
          sizes(0) = base
          var j = 0
          while (j < 64) {
            sizes(j + 1) = sizes(j) + (if (bits(j)) 16L else -16L)
            j += 1
          }
          val bytes =
            if (m % 2 == 0) VideoMeta.buildMp4Sized(320, 240, sizes)
            else VideoMeta.buildMkvSized(320, 240, sizes)
          Row(id, bytes, "video", bytes.length.toLong)
        }
      }(enc)
  }

  /** 64-bit video fingerprint over the REAL container's sample-size
    * sequence: [[VideoMeta.sampleSizes]] walks the actual boxes
    * (MP4 stsz) or cluster blocks (Matroska), and bit j is the sign of
    * the size gradient (size(j+1) > size(j)) — the codec-free analog
    * of the image dHash: re-muxing between containers, remuxed
    * timestamps, and renamed metadata all preserve it, while edits
    * that change frame content shift the coded sizes. Payloads that
    * parse to fewer than 65 samples yield a null hash. Banding/verify
    * is the shared [[graft.operators.Dedup.hammingPairs64]]. */
  def vhashVideo(spark: SparkSession, binaryTable: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("vhash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binaryTable.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          VideoMeta.sampleSizes(payload) match {
            case Some(sizes) if sizes.length >= 65 =>
              var hash = 0L
              var j = 0
              while (j < 64) {
                if (sizes(j + 1) > sizes(j)) hash |= (1L << j)
                j += 1
              }
              Row(id, hash)
            case _ => Row(id, null)
          }
        }
      }(enc)
  }

  /** Frame sampling plan over decoded video features: every
    * `stride`-th frame index up to the REAL frame count — the
    * explode-style fan-out of per-frame work units that downstream
    * pixel-decode tasks would consume. Rows without a frame count
    * (undecodable, or containers that don't expose it) drop out. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("n_frames").isNotNull && col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
}

/** Byte-level video container parsers/builders (no codecs): ISO BMFF
  * (MP4) box structure per the public ISO/IEC 14496-12 layout, and
  * Matroska/WebM EBML per the public RFC 8794 varint encoding. */
/** Hand-rolled RIFF/WAVE chunk walk (the audio sibling of VideoMeta's
  * MP4 box walk): "RIFF"…"WAVE" header, then word-aligned chunks —
  * "fmt " yields PCM format/channels/rate/bits, "data" the sample
  * window. Strict: non-RIFF, truncated, or non-PCM payloads → None. */
private[multimodal] object RiffWave {
  final case class Wav(rate: Int, channels: Int, bits: Int, nFrames: Long,
                       dataOff: Int, dataLen: Int)

  def parse(b: Array[Byte]): Option[Wav] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // audioFormat, ch, rate, bits
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(off + 4)
      if (size < 0 || size > Int.MaxValue || off + 8 + size > b.length) return None
      val sz = size.toInt
      id match {
        case "fmt " if sz >= 16 =>
          fmt = Some((le16(off + 8), le16(off + 10), le32(off + 12).toInt, le16(off + 22)))
        case "data" => data = Some((off + 8, sz))
        case _ => ()
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((af, ch, rate, bits)), Some((dOff, dLen)))
          if af == 1 && ch > 0 && bits > 0 && (bits % 8) == 0 =>
        val blockAlign = ch * (bits / 8)
        Some(Wav(rate, ch, bits, dLen.toLong / blockAlign, dOff, dLen))
      case _ => None
    }
  }
}

private[multimodal] object VideoMeta {

  final case class Meta(fmt: String, width: java.lang.Long,
                        height: java.lang.Long, nFrames: java.lang.Long,
                        durationMs: java.lang.Long)

  def parse(b: Array[Byte]): Option[Meta] =
    parseMp4(b).orElse(parseMkv(b))

  // ---- ISO BMFF (MP4) ---------------------------------------------

  private def be16(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 8) | (b(o + 1) & 0xffL)
  private def be32(b: Array[Byte], o: Int): Long =
    (be16(b, o) << 16) | be16(b, o + 2)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** First child box of `tpe` in [start, end): (bodyStart, bodyEnd). */
  private def findBox(b: Array[Byte], start: Int, end: Int,
                      tpe: String): Option[(Int, Int)] = {
    var o = start
    while (o + 8 <= end) {
      val size32 = be32(b, o)
      val t = new String(b, o + 4, 4, "US-ASCII")
      val (bodyStart, boxEnd) =
        if (size32 == 1L && o + 16 <= end) (o + 16L, o + be64(b, o + 8))
        else if (size32 == 0L) (o + 8L, end.toLong)
        else (o + 8L, o + size32)
      if (boxEnd < bodyStart || boxEnd > end) return None // corrupt
      if (t == tpe) return Some((bodyStart.toInt, boxEnd.toInt))
      o = boxEnd.toInt
    }
    None
  }

  private def parseMp4(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    try {
      val (moovS, moovE) = findBox(b, 0, b.length, "moov").getOrElse(return None)
      // mvhd: timescale + duration (version 0: 32-bit, version 1: 64)
      val dur: Option[Long] = findBox(b, moovS, moovE, "mvhd").flatMap { case (s, _) =>
        val v = b(s) & 0xff
        val (ts, d) =
          if (v == 1) (be32(b, s + 20), be64(b, s + 24))
          else (be32(b, s + 12), be32(b, s + 16))
        if (ts > 0) Some(d * 1000L / ts) else None
      }
      // first trak: tkhd display size (16.16 fixed), stsz sample count
      val trak = findBox(b, moovS, moovE, "trak")
      val wh: Option[(Long, Long)] = trak.flatMap { case (s, e) =>
        findBox(b, s, e, "tkhd").map { case (ts, _) =>
          val v = b(ts) & 0xff
          val base = if (v == 1) ts + 88 else ts + 76
          (be32(b, base) >> 16, be32(b, base + 4) >> 16)
        }
      }
      val frames: Option[Long] = trak.flatMap { case (s, e) =>
        for {
          (mdS, mdE) <- findBox(b, s, e, "mdia")
          (mnS, mnE) <- findBox(b, mdS, mdE, "minf")
          (sbS, sbE) <- findBox(b, mnS, mnE, "stbl")
          (szS, _) <- findBox(b, sbS, sbE, "stsz")
        } yield be32(b, szS + 8)
      }
      Some(Meta("mp4",
        wh.map(p => java.lang.Long.valueOf(p._1)).orNull,
        wh.map(p => java.lang.Long.valueOf(p._2)).orNull,
        frames.map(java.lang.Long.valueOf).orNull,
        dur.map(java.lang.Long.valueOf).orNull))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Minimal structurally-valid MP4 with the given display size and
    * sample count; timescale 1000, 40 ms per frame (25 fps). */
  def buildMp4(w: Int, h: Int, frames: Int): Array[Byte] = {
    def u32(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    def zeros(n: Int) = new Array[Byte](n)
    def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val total = 8 + parts.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(total)
      buf.putInt(total).put(ascii(tpe))
      parts.foreach(buf.put)
      buf.array()
    }
    val matrix = u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)
    val timescale = 1000L
    val duration = frames.toLong * 40L
    val ftyp = box("ftyp", ascii("isom"), u32(0x200), ascii("isom"), ascii("mp41"))
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      u32(0x00010000L), u16(0x0100), u16(0), zeros(8), matrix, zeros(24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(duration),
      zeros(8), u16(0), u16(0), u16(0), u16(0), matrix,
      u32(w.toLong << 16), u32(h.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      u16(0x55c4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), ascii("vide"), zeros(12), zeros(1))
    val stbl = box("stbl",
      box("stsd", u32(0), u32(0)),
      box("stts", u32(0), u32(0)),
      box("stsz", u32(0), u32(0), u32(frames.toLong)))
    val minf = box("minf",
      box("vmhd", u32(1), zeros(8)),
      box("dinf", box("dref", u32(0), u32(1), box("url ", u32(1)))),
      stbl)
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    ftyp ++ box("moov", mvhd, trak) ++ box("mdat")
  }

  /** Structurally-valid MP4 whose stsz box carries a REAL per-sample
    * size table (sample_size = 0 + entries) — the shape
    * [[sampleSizes]] reads back for the video fingerprint. */
  def buildMp4Sized(w: Int, h: Int, sizes: Array[Long]): Array[Byte] = {
    def u32(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    def zeros(n: Int) = new Array[Byte](n)
    def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val total = 8 + parts.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(total)
      buf.putInt(total).put(ascii(tpe))
      parts.foreach(buf.put)
      buf.array()
    }
    val matrix = u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)
    val timescale = 1000L
    val duration = sizes.length.toLong * 40L
    val ftyp = box("ftyp", ascii("isom"), u32(0x200), ascii("isom"), ascii("mp41"))
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      u32(0x00010000L), u16(0x0100), u16(0), zeros(8), matrix, zeros(24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(duration),
      zeros(8), u16(0), u16(0), u16(0), u16(0), matrix,
      u32(w.toLong << 16), u32(h.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      u16(0x55c4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), ascii("vide"), zeros(12), zeros(1))
    val stszBody = u32(0) ++ u32(0) ++ u32(sizes.length.toLong) ++
      sizes.flatMap(u32)
    val stbl = box("stbl",
      box("stsd", u32(0), u32(0)),
      box("stts", u32(0), u32(0)),
      box("stsz", stszBody))
    val minf = box("minf",
      box("vmhd", u32(1), zeros(8)),
      box("dinf", box("dref", u32(0), u32(1), box("url ", u32(1)))),
      stbl)
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    ftyp ++ box("moov", mvhd, trak) ++ box("mdat")
  }

  /** Minimal Matroska whose Segment carries one Cluster of
    * SimpleBlocks with the given frame-data sizes — the MKV carrier of
    * the same size sequence [[buildMp4Sized]] puts in stsz. Element
    * sizes use the 8-byte EBML varint form so bodies of any length
    * encode uniformly. */
  def buildMkvSized(w: Int, h: Int, sizes: Array[Long]): Array[Byte] = {
    def size8(n: Long): Array[Byte] =
      Array(0x01.toByte) ++ (0 until 7).map(i => ((n >> (8 * (6 - i))) & 0xff).toByte)
    def el(id: Array[Int], body: Array[Byte]): Array[Byte] =
      id.map(_.toByte).toArray ++ size8(body.length.toLong) ++ body
    val docType = el(Array(0x42, 0x82), "matroska".getBytes("US-ASCII"))
    val header = el(Array(0x1a, 0x45, 0xdf, 0xa3), docType)
    val scale = el(Array(0x2a, 0xd7, 0xb1), Array(0x0f, 0x42, 0x40).map(_.toByte))
    val info = el(Array(0x15, 0x49, 0xa9, 0x66), scale)
    val video = el(Array(0xe0),
      el(Array(0xb0), Array((w >> 8) & 0xff, w & 0xff).map(_.toByte)) ++
        el(Array(0xba), Array((h >> 8) & 0xff, h & 0xff).map(_.toByte)))
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b), el(Array(0xae), video))
    val blocks = sizes.flatMap { sz =>
      // SimpleBlock: track-1 vint + 16-bit timecode + flags, then
      // `sz` bytes of deterministic frame data
      val frame = Array.tabulate(sz.toInt)(i => (i * 31 & 0xff).toByte)
      el(Array(0xa3), Array[Byte](0x81.toByte, 0, 0, 0) ++ frame)
    }
    val cluster = el(Array(0x1f, 0x43, 0xb6, 0x75),
      el(Array(0xe7), Array(0x00.toByte)) ++ blocks)
    header ++ el(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ cluster)
  }

  // ---- Matroska / WebM EBML ---------------------------------------

  /** EBML varint at `o`: (value, encodedLength). keepMarker retains
    * the length-marker bit (element IDs); size fields mask it off. */
  private def vint(b: Array[Byte], o: Int, keepMarker: Boolean): (Long, Int) = {
    val fb = b(o) & 0xff
    if (fb == 0) throw new ArrayIndexOutOfBoundsException("bad vint")
    val len = Integer.numberOfLeadingZeros(fb) - 23 // 1..8
    var v = if (keepMarker) fb.toLong else (fb & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    (v, len)
  }

  private def uint(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], o: Int, n: Int): Double =
    if (n == 4) java.lang.Float.intBitsToFloat(uint(b, o, 4).toInt).toDouble
    else java.lang.Double.longBitsToDouble(uint(b, o, 8))

  /** First child element with `id` in [start, end): (bodyStart, bodyEnd). */
  private def findEl(b: Array[Byte], start: Int, end: Int,
                     id: Long): Option[(Int, Int)] = {
    var o = start
    while (o < end) {
      val (elId, idLen) = vint(b, o, keepMarker = true)
      val (size, szLen) = vint(b, o + idLen, keepMarker = false)
      val bodyStart = o + idLen + szLen
      // all-ones size = unknown extent → runs to the enclosing end
      val unknown = size == (1L << (7 * szLen)) - 1
      val bodyEnd = if (unknown) end else bodyStart + size.toInt
      if (bodyEnd > end || bodyEnd < bodyStart) return None
      if (elId == id) return Some((bodyStart, bodyEnd))
      o = bodyEnd
    }
    None
  }

  /** Every child element with `id` in [start, end), in order. */
  private def findAllEl(b: Array[Byte], start: Int, end: Int,
                        id: Long): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var o = start
    while (o < end) {
      val (elId, idLen) = vint(b, o, keepMarker = true)
      val (size, szLen) = vint(b, o + idLen, keepMarker = false)
      val bodyStart = o + idLen + szLen
      val unknown = size == (1L << (7 * szLen)) - 1
      val bodyEnd = if (unknown) end else bodyStart + size.toInt
      if (bodyEnd > end || bodyEnd < bodyStart) return out.result()
      if (elId == id) out += ((bodyStart, bodyEnd))
      o = bodyEnd
    }
    out.result()
  }

  /** The per-sample size SEQUENCE of the container's first video
    * track — the codec-free shape signal the video fingerprint hashes:
    * MP4 reads the stsz table (or expands a constant sample_size);
    * Matroska walks every Cluster's SimpleBlocks and reports their
    * frame-data lengths. None when neither container parses or the
    * table is truncated. */
  def sampleSizes(b: Array[Byte]): Option[Array[Long]] =
    sampleSizesMp4(b).orElse(sampleSizesMkv(b))

  private def sampleSizesMp4(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 12 || new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    try {
      for {
        (moovS, moovE) <- findBox(b, 0, b.length, "moov")
        (tS, tE) <- findBox(b, moovS, moovE, "trak")
        (mdS, mdE) <- findBox(b, tS, tE, "mdia")
        (mnS, mnE) <- findBox(b, mdS, mdE, "minf")
        (sbS, sbE) <- findBox(b, mnS, mnE, "stbl")
        (szS, szE) <- findBox(b, sbS, sbE, "stsz")
        sizes <- {
          val sampleSize = be32(b, szS + 4)
          val count = be32(b, szS + 8).toInt
          if (count < 0) None
          else if (sampleSize != 0L) Some(Array.fill(count)(sampleSize))
          else if (szS + 12 + 4L * count > szE) None // truncated table
          else Some(Array.tabulate(count)(i => be32(b, szS + 12 + 4 * i)))
        }
      } yield sizes
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def sampleSizesMkv(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 4 || be32(b, 0) != 0x1a45dfa3L) return None
    try {
      val (hdrS, hdrE) = findEl(b, 0, b.length, 0x1a45dfa3L).getOrElse(return None)
      val (segS, segE) = findEl(b, hdrE, b.length, 0x18538067L).getOrElse(return None)
      val sizes = for {
        (cS, cE) <- findAllEl(b, segS, segE, 0x1f43b675L)
        (bS, bE) <- findAllEl(b, cS, cE, 0xa3L)
      } yield {
        val (_, trackLen) = vint(b, bS, keepMarker = false)
        (bE - bS - trackLen - 3).toLong // minus 16-bit timecode + flags
      }
      if (sizes.isEmpty) None else Some(sizes.toArray)
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def parseMkv(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || be32(b, 0) != 0x1a45dfa3L) return None
    try {
      val (hdrS, hdrE) = findEl(b, 0, b.length, 0x1a45dfa3L).getOrElse(return None)
      val fmt = findEl(b, hdrS, hdrE, 0x4282L)
        .map { case (s, e) => new String(b, s, e - s, "US-ASCII") }
        .getOrElse("matroska")
      val (segS, segE) = findEl(b, hdrE, b.length, 0x18538067L).getOrElse(return None)
      val info = findEl(b, segS, segE, 0x1549a966L)
      val durMs: Option[Long] = info.flatMap { case (s, e) =>
        val scaleNs = findEl(b, s, e, 0x2ad7b1L)
          .map { case (vs, ve) => uint(b, vs, ve - vs) }.getOrElse(1000000L)
        findEl(b, s, e, 0x4489L).map { case (vs, ve) =>
          (ebmlFloat(b, vs, ve - vs) * scaleNs / 1e6).round
        }
      }
      val video = for {
        (tS, tE) <- findEl(b, segS, segE, 0x1654ae6bL)
        (teS, teE) <- findEl(b, tS, tE, 0xaeL)
        v <- findEl(b, teS, teE, 0xe0L)
      } yield v
      val w = video.flatMap { case (s, e) => findEl(b, s, e, 0xb0L) }
        .map { case (vs, ve) => uint(b, vs, ve - vs) }
      val h = video.flatMap { case (s, e) => findEl(b, s, e, 0xbaL) }
        .map { case (vs, ve) => uint(b, vs, ve - vs) }
      Some(Meta(fmt, w.map(java.lang.Long.valueOf).orNull,
        h.map(java.lang.Long.valueOf).orNull, null,
        durMs.map(java.lang.Long.valueOf).orNull))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}

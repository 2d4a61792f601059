package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass.
  *
  * Two container formats are decoded FOR REAL in pure JVM code — binary
  * P6 PPM images ([[decodePpm]]: header parse + per-channel pixel means)
  * and RIFF/WAVE 16-bit PCM audio ([[decodeWav]]: chunk walk + duration
  * and mean-amplitude) — so the extract path is honest end-to-end for
  * those. Payloads that are neither (no magic match) fall back to
  * `stubDecode` byte-histogram features: rich codecs (JPEG, MP3, video)
  * don't ship in this environment, and the stub keeps the batching,
  * schema, and encoder plumbing exercised for them. Swapping the stub
  * for a JNI/ONNX call changes no plumbing.
  *
  * At 100 TB: payloads dominate row size, so feature extraction should
  * run on a projection (`id`, `bytes`) with columns pruned at the scan,
  * and the feature output (small, fixed-width) is what joins onward —
  * never re-shuffle the payload bytes.
  */
object Multimodal {

  case class MediaRecord(
      id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int)

  case class MediaFeatures(
      id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  val FeatureDim = 8

  /** STUB decoder: deterministic features from the raw bytes (byte
    * histogram moments). A real implementation would decode pixels /
    * samples here; the signature and batching are the contract. */
  private[operators] def stubDecode(r: MediaRecord): MediaFeatures = {
    var checksum = 0L
    val hist = new Array[Long](FeatureDim)
    var i = 0
    while (i < r.bytes.length) {
      val b = r.bytes(i) & 0xff
      checksum = (checksum * 31 + b) % 1000000007L
      hist(b % FeatureDim) += 1
      i += 1
    }
    val n = math.max(r.bytes.length, 1).toFloat
    MediaFeatures(r.id, r.kind, r.bytes.length.toLong, checksum,
      hist.map(_ / n))
  }

  case class ImageFeatures(
      id: Long,
      width: Long,
      height: Long,
      maxval: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  case class AudioFeatures(
      id: Long,
      channels: Long,
      sample_rate: Long,
      bits: Long,
      n_samples: Long,
      duration_s: Double,
      mean_abs: Double)

  /** P6 PPM header parse: returns (width, height, maxval, body offset)
    * or None when the payload isn't a complete P6 image. `#` comments
    * allowed in the header; exactly one whitespace byte after maxval,
    * then raw RGB. */
  private def parseP6(bytes: Array[Byte]): Option[(Long, Long, Long, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var p = 2
    def skipWs(): Unit = {
      var more = true
      while (more && p < bytes.length) {
        val b = bytes(p)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') p += 1
        else if (b == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
        else more = false
      }
    }
    def int(): Long = {
      skipWs()
      var v = -1L
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = math.max(v, 0L) * 10 + (bytes(p) - '0'); p += 1
      }
      v
    }
    val w = int(); val h = int(); val mv = int()
    p += 1
    if (w <= 0 || h <= 0 || mv <= 0 || bytes.length < p + 3 * w * h) None
    else Some((w, h, mv, p))
  }

  /** REAL decoder: binary P6 PPM. Per-channel means are exact integer
    * sums divided once in double — deterministic and reproducible in
    * plain SQL byte math (the q_media_features oracle). */
  def decodePpm(id: Long, bytes: Array[Byte]): Option[ImageFeatures] =
    parseP6(bytes).map { case (w, h, mv, p) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      val n = (w * h).toInt
      while (i < n) {
        sr += bytes(p + 3 * i) & 0xff
        sg += bytes(p + 3 * i + 1) & 0xff
        sb += bytes(p + 3 * i + 2) & 0xff
        i += 1
      }
      ImageFeatures(id, w, h, mv, sr / n.toDouble, sg / n.toDouble,
        sb / n.toDouble)
    }

  case class ImageHash(id: Long, width: Long, height: Long, ahash: Long)

  /** Perceptual AVERAGE-HASH over a decoded P6 PPM (aHash, the classic
    * image near-dup key): per-pixel integer grayscale (r+g+b)/3, image
    * mean by integer division, bit (n-1-k) set iff pixel k's gray
    * exceeds the mean (MSB = first pixel). Two images with the same
    * aHash are near-duplicates at the decoded resolution — equality on
    * the hash is the BLOCKED-dedup key, so image dedup is a groupBy of
    * longs, never a pairwise pixel compare. Integer end-to-end: plain
    * SQL byte arithmetic reproduces the hash exactly (the
    * q_media_phash oracle). Requires w*h <= 63 bits; larger images
    * should be resized/downsampled first. */
  def ppmAHash(ds: Dataset[(Long, Array[Byte])]): Dataset[ImageHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) =>
      parseP6(bytes).flatMap { case (w, h, _, p) =>
        val n = (w * h).toInt
        if (n > 63) None
        else {
          val gray = new Array[Long](n)
          var sum = 0L
          var i = 0
          while (i < n) {
            gray(i) = ((bytes(p + 3 * i) & 0xff) + (bytes(p + 3 * i + 1) & 0xff) +
              (bytes(p + 3 * i + 2) & 0xff)) / 3
            sum += gray(i)
            i += 1
          }
          val mean = sum / n
          var hash = 0L
          i = 0
          while (i < n) {
            if (gray(i) > mean) hash |= 1L << (n - 1 - i)
            i += 1
          }
          Some(ImageHash(id, w, h, hash))
        }
      }
    })
  }

  /** REAL decoder: RIFF/WAVE, PCM 16-bit little-endian. Walks the chunk
    * list for `fmt ` and `data`, computes duration from the frame count
    * and mean absolute amplitude over all samples. Returns None for
    * anything that isn't complete 16-bit PCM WAV. */
  def decodeWav(id: Long, bytes: Array[Byte]): Option[AudioFeatures] = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int, t: String): Boolean =
      o + 4 <= bytes.length && (0 until 4).forall(i => bytes(o + i) == t(i))
    if (bytes.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var channels = 0; var rate = 0L; var bits = 0
    var dataOff = -1; var dataLen = 0L
    var o = 12
    while (o + 8 <= bytes.length) {
      val sz = le32(o + 4)
      if (tag(o, "fmt ") && o + 24 <= bytes.length) {
        channels = le16(o + 10); rate = le32(o + 12); bits = le16(o + 22)
      } else if (tag(o, "data")) { dataOff = o + 8; dataLen = sz }
      o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0 ||
      dataOff + dataLen > bytes.length) return None
    val nSamples = (dataLen / 2).toInt
    var sumAbs = 0L
    var i = 0
    while (i < nSamples) {
      val s = (le16(dataOff + 2 * i) << 16) >> 16 // sign-extend
      sumAbs += math.abs(s)
      i += 1
    }
    val nFrames = nSamples / channels
    Some(AudioFeatures(id, channels, rate, bits, nSamples,
      nFrames / rate.toDouble,
      if (nSamples == 0) 0.0 else sumAbs / nSamples.toDouble))
  }

  case class ImageGrays(id: Long, grays: Array[Long])

  /** Per-pixel integer grayscale vector ((r+g+b)/3 per pixel,
    * row-major) of a decoded P6 PPM — the raw material for perceptual
    * features: [[ppmAHash]] thresholds it against the image mean, and
    * mean-CENTERED float casts of it feed the embedding dedup stack
    * (cosine of centered pixel vectors = pattern correlation, the
    * normalization that lets brightness-shifted copies pair while
    * unrelated images do not — uncentered channel means cluster so
    * tightly that every ASCII-derived image looks like every other).
    * Non-PPM payloads are dropped. */
  def ppmGrays(ds: Dataset[(Long, Array[Byte])]): Dataset[ImageGrays] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) =>
      parseP6(bytes).map { case (w, h, _, p) =>
        val n = (w * h).toInt
        val gray = new Array[Long](n)
        var i = 0
        while (i < n) {
          gray(i) = ((bytes(p + 3 * i) & 0xff) + (bytes(p + 3 * i + 1) & 0xff) +
            (bytes(p + 3 * i + 2) & 0xff)) / 3
          i += 1
        }
        ImageGrays(id, gray)
      }
    })
  }

  /** Partition-batched feature extraction over a typed Dataset. Payloads
    * with a recognized container magic are decoded for real (PPM pixel
    * means / WAV sample stats packed into the fixed-width feature
    * vector); anything else takes the stub byte-histogram path. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init of a real codec/model would go here
      it.map { r =>
        decodePpm(r.id, r.bytes) match {
          case Some(f) =>
            MediaFeatures(r.id, r.kind, r.bytes.length.toLong,
              stubDecode(r).checksum,
              Array(f.width.toFloat, f.height.toFloat, f.maxval.toFloat,
                f.mean_r.toFloat, f.mean_g.toFloat, f.mean_b.toFloat, 0f, 0f))
          case None => decodeWav(r.id, r.bytes) match {
            case Some(a) =>
              MediaFeatures(r.id, r.kind, r.bytes.length.toLong,
                stubDecode(r).checksum,
                Array(a.channels.toFloat, a.sample_rate.toFloat,
                  a.bits.toFloat, a.n_samples.toFloat, a.duration_s.toFloat,
                  a.mean_abs.toFloat, 0f, 0f))
            case None => stubDecode(r)
          }
        }
      }
    }
  }

  /** PPM image features over an (id, payload) Dataset; non-PPM payloads
    * are dropped (flatMap over the Option). */
  def ppmFeatures(ds: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { case (id, b) => decodePpm(id, b) })
  }

  case class ResizedGrays(id: Long, src_w: Long, src_h: Long,
      grays: Array[Long])

  /** REAL nearest-neighbor resize of DECODED P6 pixels to (dw × dh),
    * emitted as the resized integer grayscale grid — the downsample
    * stage a vision pipeline runs before feature extraction, on actual
    * pixel math (srcX = x·srcW div dw — all-integer sampling, so the
    * oracle replays it byte-for-byte; q_media_resize). Non-PPM payloads
    * are dropped; [[resizeStub]] remains the fallback for codec-less
    * formats. A narrow per-row map inside the scan stage: payloads
    * never shuffle, only the dw·dh gray longs move onward. */
  def ppmResizeGrays(ds: Dataset[(Long, Array[Byte])], dw: Int, dh: Int)
      : Dataset[ResizedGrays] = {
    require(dw > 0 && dh > 0, s"target dims must be positive: $dw x $dh")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) =>
      parseP6(bytes).map { case (w, h, _, p) =>
        val out = new Array[Long](dw * dh)
        var y = 0
        while (y < dh) {
          val sy = y * h / dh
          var x = 0
          while (x < dw) {
            val sx = x * w / dw
            val o = p + 3 * (sy * w + sx).toInt
            out(y * dw + x) = ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
              (bytes(o + 2) & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        ResizedGrays(id, w, h, out)
      }
    })
  }

  /** STUB resize: deterministic downsample of the opaque payload to a
    * target (w, h) — picks one byte per output cell by stride (a real
    * implementation decodes, interpolates, re-encodes; the byte-level
    * determinism lets specs pin the plumbing). Output metadata reflects
    * the new geometry, payload length is exactly w*h. */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int)
      : Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val out = new Array[Byte](w * h)
        val n = r.bytes.length
        var i = 0
        while (i < out.length) {
          out(i) = if (n == 0) 0 else r.bytes((i.toLong * n / out.length).toInt)
          i += 1
        }
        MediaRecord(r.id, r.kind, out, w, h)
      }
    }
  }

  /** Build a typed media Dataset from any table with an id + text column
    * (text bytes stand in for the opaque payload). */
  def fromText(spark: SparkSession, df: Dataset[_], idCol: String,
      textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.toDF().selectExpr(
        s"$idCol AS id",
        s"CASE CAST($idCol % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        s"encode($textCol, 'UTF-8') AS bytes",
        "CAST(64 AS INT) AS width", "CAST(64 AS INT) AS height")
      .as[MediaRecord]
  }
}

package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass.
  *
  * The decode step is a STUB — this environment ships no image/audio
  * codecs — but everything Spark-side is real and tested: the schema
  * (binary payload + typed metadata), the `Dataset[T]` encoders, the
  * partition-batched extraction shape (`mapPartitions`, so a real decoder
  * would amortize per-batch model/codec init exactly here), and the
  * downstream joins. Swapping `stubDecode` for a JNI/ONNX call changes no
  * plumbing.
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

  /** Partition-batched feature extraction over a typed Dataset. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init of a real codec/model would go here
      it.map(stubDecode)
    }
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

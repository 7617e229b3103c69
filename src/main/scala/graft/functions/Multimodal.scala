package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as OPAQUE `binary` content plus a typed metadata struct —
  * the only schema that survives 100 TB (never explode pixels into rows;
  * never parse media in the shuffle). All transforms run as per-partition
  * batch functions (`mapPartitions` — the Scala analogue of PySpark's
  * `mapInPandas` batch shape): codec state is initialized once per
  * partition and amortized across its rows, the operation stays a narrow
  * map (no shuffle), and column pruning still works because content and
  * features are separate columns.
  *
  * REAL vs STUB: every piece of Spark plumbing here — schemas, encoders,
  * batch iteration, partition-level codec lifecycle — is real and tested.
  * The codec itself is NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked DETERMINISTIC FAKE (bytes → fake
  * normalized "samples"); swap it for javax.imageio / an ffmpeg binding
  * without touching anything else.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque content. */
  final case class MediaMeta(mediaType: String, width: Int, height: Int,
      frames: Int, sampleRateHz: Int)

  final case class MediaRow(id: Long, meta: MediaMeta, content: Array[Byte])

  final case class MediaFeatures(id: Long, mediaType: String, nBytes: Long,
      nFrames: Long, contentMd5: String, entropy: Double, meanValue: Double)

  /** Stub codec frame size: fixed-length frames over the raw bytes. */
  val FrameBytes: Int = 1024

  /** DETERMINISTIC FAKE decode — stands in for the real image/audio codec
    * (not present in this container). Bytes map to normalized [0,1]
    * "samples"; real deployments replace exactly this function.
    */
  def decodeStub(content: Array[Byte]): Array[Float] =
    content.map(b => (b & 0xff) / 255.0f)

  /** "Resize" a decoded buffer to exactly `n` samples by uniform striding
    * (nearest-neighbour downsample in stub terms). n > 0.
    */
  def resizeStub(samples: Array[Float], n: Int): Array[Float] = {
    require(n > 0)
    if (samples.isEmpty) new Array[Float](n)
    else Array.tabulate(n)(i => samples((i.toLong * samples.length / n).toInt))
  }

  /** Every `stride`-th fixed-size frame of the raw content (video
    * frame-sampling shape; the last frame may be short).
    */
  def sampleFrames(content: Array[Byte], stride: Int): Seq[Array[Byte]] = {
    require(stride > 0)
    (0 until (content.length + FrameBytes - 1) / FrameBytes by stride)
      .map(f => content.slice(f * FrameBytes,
        math.min((f + 1) * FrameBytes, content.length)))
  }

  /** Batch feature extraction: one narrow mapPartitions pass — digest +
    * frame count + stub-decoded sample statistics (16-bucket entropy,
    * mean). The MessageDigest is allocated once per partition, the batch
    * shape a real codec needs.
    */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val s = media.sparkSession; import s.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val nBytes = r.content.length.toLong
        val nFrames = (nBytes + FrameBytes - 1) / FrameBytes
        md.reset()
        val digest = md.digest(r.content).map("%02x".format(_)).mkString
        val px = decodeStub(r.content)
        var mean = 0.0
        val hist = new Array[Long](16)
        px.foreach { v =>
          mean += v
          hist(math.min((v * 16).toInt, 15)) += 1
        }
        val entropy =
          if (px.isEmpty) 0.0
          else hist.foldLeft(0.0) { (acc, c) =>
            if (c == 0) acc
            else { val p = c.toDouble / px.length; acc - p * math.log(p) / math.log(2.0) }
          }
        MediaFeatures(r.id, r.meta.mediaType, nBytes, nFrames, digest,
          entropy, if (px.isEmpty) 0.0 else mean / px.length)
      }
    }
  }
}

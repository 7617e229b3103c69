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

  /** DETERMINISTIC FAKE decode — the fallback for content no real codec
    * here can read (audio/video; the container has no ffmpeg binding).
    * Bytes map to normalized [0,1] "samples"; real deployments replace
    * exactly this function.
    */
  def decodeStub(content: Array[Byte]): Array[Float] =
    content.map(b => (b & 0xff) / 255.0f)

  /** A REAL decoded image: dimensions, band (channel) count, and
    * row-major band-interleaved samples normalized to [0,1] by each
    * band's declared bit depth.
    */
  final case class DecodedImage(width: Int, height: Int, bands: Int,
      samples: Array[Float])

  /** REAL image decode via the JDK's `javax.imageio` (PNG / JPEG / GIF /
    * BMP / WBMP — public JDK API, zero added dependencies). Returns None
    * when ImageIO has no reader for the bytes (audio, video, corrupt
    * content) so callers can fall back to [[decodeStub]]; [[decode]]
    * composes exactly that policy.
    */
  def decodeImage(content: Array[Byte]): Option[DecodedImage] =
    try {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache inside executors
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = raster.getWidth; val h = raster.getHeight
        val bands = raster.getNumBands
        val maxVal = Array.tabulate(bands)(b =>
          ((1L << raster.getSampleModel.getSampleSize(b)) - 1L).toFloat)
        val out = new Array[Float](w * h * bands)
        var idx = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              out(idx) = raster.getSample(x, y, b) / maxVal(b)
              idx += 1; b += 1
            }
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, bands, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode policy for mixed media: real image decode when ImageIO can
    * read the bytes, deterministic stub otherwise.
    */
  def decode(content: Array[Byte]): Array[Float] =
    decodeImage(content) match {
      case Some(d) => d.samples
      case None    => decodeStub(content)
    }

  /** Deterministic grayscale PNG encoder (JDK ImageIO) — the planted-image
    * generator for tests and the oracled decode query: every pixel holds
    * `value` (0-255), so the decoded mean is exactly value/255.
    */
  def encodeGrayPng(width: Int, height: Int, value: Int): Array[Byte] = {
    require(width > 0 && height > 0 && value >= 0 && value <= 255)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, value); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-image REAL-decode features. `decoded` distinguishes the ImageIO
    * path from the stub fallback; width/height/bands are −1 on fallback
    * (the stub has no geometry).
    */
  final case class ImageFeatures(id: Long, decoded: Boolean, width: Int,
      height: Int, bands: Int, meanValue: Double)

  /** Batch REAL image featurization: one narrow mapPartitions pass, codec
    * configured once per partition — same batch shape as [[featurize]]
    * but through [[decodeImage]] with the stub fallback.
    */
  def featurizeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val s = media.sparkSession; import s.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        decodeImage(r.content) match {
          case Some(d) =>
            var sum = 0.0; var i = 0
            while (i < d.samples.length) { sum += d.samples(i); i += 1 }
            val mean = if (d.samples.isEmpty) 0.0 else sum / d.samples.length
            ImageFeatures(r.id, decoded = true, d.width, d.height, d.bands, mean)
          case None =>
            val px = decodeStub(r.content)
            val mean = if (px.isEmpty) 0.0 else px.map(_.toDouble).sum / px.length
            ImageFeatures(r.id, decoded = false, -1, -1, -1, mean)
        }
      }
    }
  }

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

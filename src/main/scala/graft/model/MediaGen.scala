package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.codec.Image

/** Multimodal rows: opaque binary payload + typed metadata, the shape a
  * 100 TB training-data lake stores media in (one row per asset; pixels
  * never touch the driver). Metadata is denormalized next to the bytes so
  * quality filters (min resolution, aspect ratio, frame count) prune on
  * cheap columns BEFORE any decode — the multimodal analog of the
  * reference's filter-before-model rule (SURVEY.md §4,
  * lib/language_identification.py:630-662). */
final case class ImageRow(
    img_id: String,
    bytes: Array[Byte],
    width: Int,
    height: Int,
    channels: Int,
    format: String) // "png" | "jpeg" | "gimg" (raw raster) | "bin" = junk

final case class VideoRow(
    video_id: String,
    bytes: Array[Byte],
    width: Int,
    height: Int,
    channels: Int,
    n_frames: Int,
    fps: Int,
    format: String)

final case class ImageFeatureRow(
    img_id: String,
    ok: Boolean,
    width: Int,
    height: Int,
    channels: Int,
    mean_brightness: Double,
    contrast: Double,
    edge_energy: Double)

final case class FrameRow(
    video_id: String,
    frame_idx: Int,
    width: Int,
    height: Int,
    channels: Int,
    frame_bytes: Array[Byte], // re-encoded GIMG — feeds the image ops
    mean_brightness: Double)

/** Deterministic synthetic media corpus, same design as [[ClipGen]]:
  * every row is a pure function of (seed, index), synthesized
  * distributively with `spark.range(n).map(...)` — never on the driver. */
object MediaGen {

  val DefaultSeed = 42L

  private def splitmix(x0: Long): Long = graft.util.Mix.mix(x0)

  /** Pixel value: horizontal gradient + per-asset hash noise, so
    * brightness/contrast/edges are non-trivial and frame-dependent. */
  private def pixel(x: Int, y: Int, ch: Int, w: Int, frame: Int, rnd: Long): Int = {
    val grad = if (w > 1) x * 255 / (w - 1) else 128
    val noise = (splitmix(rnd ^ (y.toLong * 131071 + x * 257 + ch * 31 + frame * 7919)) & 0x3f).toInt
    math.min(255, (grad * 3 + noise * 2 + frame * 9) / 4)
  }

  private def renderFrames(w: Int, h: Int, c: Int, nFrames: Int, rnd: Long): Array[Byte] = {
    val px = new Array[Byte]((w * h * c * nFrames))
    var f = 0; var i = 0
    while (f < nFrames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var ch = 0
          while (ch < c) {
            px(i) = pixel(x, y, ch, w, f, rnd).toByte
            i += 1; ch += 1
          }
          x += 1
        }
        y += 1
      }
      f += 1
    }
    px
  }

  /** Pure (seed, index) → ImageRow. Format mix: ~42% real PNG, ~17%
    * real JPEG (both via the JDK's ImageIO writers — deterministic
    * bytes for a fixed raster), ~38% GIMG raw raster, ~3% undecodable
    * junk so the per-row error-isolation path stays exercised. */
  def imageAt(i: Long, seed: Long = DefaultSeed): ImageRow = {
    val rnd = splitmix(seed ^ (i * 0x9e3779b97f4a7c15L))
    val w = 16 + (math.abs(rnd) % 49).toInt
    val h = 16 + (math.abs(rnd >> 8) % 49).toInt
    val c = if ((rnd & 4) == 0) 1 else 3
    val pick = math.abs(rnd >> 16) % 100
    if (pick < 3) {
      val junk = new Array[Byte](64)
      var j = 0
      while (j < 64) { junk(j) = (splitmix(rnd + j) & 0xff).toByte; j += 1 }
      ImageRow(f"img-$i%08d", junk, w, h, c, "bin")
    } else {
      val px = renderFrames(w, h, c, 1, rnd)
      if (pick < 45)
        ImageRow(f"img-$i%08d", Image.encodePng(w, h, c, px), w, h, c, "png")
      else if (pick < 62)
        ImageRow(f"img-$i%08d", Image.encodeJpeg(w, h, c, px), w, h, c, "jpeg")
      else
        ImageRow(f"img-$i%08d", Image.encodeImage(w, h, c, px), w, h, c, "gimg")
    }
  }

  /** Pure (seed, index) → VideoRow; alternates between the GVID raw
    * container and MPNG (MJPEG-style length-prefixed PNG frames). */
  def videoAt(i: Long, seed: Long = DefaultSeed): VideoRow = {
    val rnd = splitmix(seed ^ ((i + 7777) * 0x9e3779b97f4a7c15L))
    val w = 16 + (math.abs(rnd) % 17).toInt
    val h = 16 + (math.abs(rnd >> 8) % 17).toInt
    val c = 3
    val nf = 4 + (math.abs(rnd >> 16) % 13).toInt
    val px = renderFrames(w, h, c, nf, rnd)
    if ((rnd & 1) == 0) {
      val frameSz = w * h * c
      val pngs = (0 until nf).map { f =>
        val fr = new Array[Byte](frameSz)
        System.arraycopy(px, f * frameSz, fr, 0, frameSz)
        Image.encodePng(w, h, c, fr)
      }
      VideoRow(f"vid-$i%08d", Image.encodeMpng(pngs), w, h, c, nf, 24, "mpng")
    } else {
      VideoRow(f"vid-$i%08d", Image.encodeVideo(w, h, c, nf, px),
        w, h, c, nf, 24, "gvid")
    }
  }

  def images(spark: SparkSession, n: Long, partitions: Int = 8,
      seed: Long = DefaultSeed): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => imageAt(i, seed))
  }

  def videos(spark: SparkSession, n: Long, partitions: Int = 8,
      seed: Long = DefaultSeed): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => videoAt(i, seed))
  }
}

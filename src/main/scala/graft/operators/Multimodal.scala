package graft.operators

import org.apache.spark.sql.Dataset
import graft.codec.Image
import graft.lid.TextStats.roundTo
import graft.model.{FrameRow, ImageFeatureRow, ImageRow, VideoRow}

/** Multimodal (image/video) operators over opaque binary columns.
  *
  * Spark-side contract (the part that must be right at 100 TB, and is
  * fully real here):
  *   - payloads stay distributed: typed `Dataset` ops (`mapPartitions` /
  *     `flatMap`), never `collect`; one decoded asset in flight per task
  *     at a time (iterator-lazy), so executor memory is bounded by
  *     max-asset-size × cores, not partition size;
  *   - all ops are NARROW — no shuffle; partitioning and ordering are
  *     preserved, so a downstream `groupBy` is the first exchange;
  *   - per-row error isolation: an undecodable payload yields an
  *     `ok=false` feature row / no frames, it never fails the task
  *     (the reference's img-passthrough analog, SURVEY.md F5);
  *   - cheap metadata predicates (min resolution etc.) belong BEFORE
  *     these ops in Column-land so Catalyst prunes ahead of the decode
  *     barrier (filter-before-model, SURVEY.md §4).
  *
  * The pixel codecs are real: PNG/JPEG/BMP/GIF decode via the JDK's
  * `javax.imageio` readers, video via MPNG (length-prefixed PNG frames)
  * — plus the GIMG/GVID raw-raster container for fixtures and cheap
  * intermediate re-encode ([[graft.codec.Image]]). Inter-frame video
  * codecs (H.264 etc.) have no JDK decoder and are out of scope.
  * (In PySpark this surface would be `mapInPandas` over record batches;
  * the JVM-native equivalent used here is typed `mapPartitions`, which
  * keeps the same batch shape without the Python serialization hop.)
  */
object Multimodal {

  /** Decode + per-image features: brightness, contrast, edge energy. */
  def imageFeatures(images: Dataset[ImageRow]): Dataset[ImageFeatureRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { row =>
        val img = Image.decodeImage(row.bytes)
        if (img == null)
          ImageFeatureRow(row.img_id, ok = false, row.width, row.height,
            row.channels, 0.0, 0.0, 0.0)
        else
          ImageFeatureRow(row.img_id, ok = true, img.width, img.height,
            img.channels,
            roundTo(Image.meanBrightness(img.pixels), 4),
            roundTo(Image.contrast(img.pixels), 4),
            roundTo(Image.edgeEnergy(img), 4))
      }
    }
  }

  /** Nearest-neighbor resize to (w2, h2); undecodable rows pass through
    * unchanged (format keeps marking them undecodable downstream).
    * Output payloads are GIMG raw raster regardless of input format —
    * the cheap intermediate container for further pixel ops (re-deflate
    * to PNG only at the lake edge). */
  def resize(images: Dataset[ImageRow], w2: Int, h2: Int): Dataset[ImageRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { row =>
        val img = Image.decodeImage(row.bytes)
        if (img == null) row
        else {
          val r = Image.resizeNearest(img, w2, h2)
          // channels comes from the DECODED container (ImageIO may
          // expand/disagree with the caller-supplied metadata) — keep
          // the row's metadata consistent with the new payload
          row.copy(bytes = Image.encodeImage(r.width, r.height, r.channels,
            r.pixels), width = r.width, height = r.height,
            channels = r.channels, format = "gimg")
        }
      }
    }
  }

  /** Sample every `everyN`-th frame of each video into standalone image
    * rows (frame 0 always included) — the video→image fan-out that feeds
    * the image ops. A 1:N `flatMap`: still narrow, but output rows per
    * input row = ceil(n_frames / everyN); size partitions accordingly
    * (or `repartition` after) when videos are long. */
  def sampleFrames(videos: Dataset[VideoRow], everyN: Int): Dataset[FrameRow] = {
    require(everyN >= 1, "everyN must be >= 1")
    import videos.sparkSession.implicits._
    videos.flatMap { row =>
      val v = Image.decodeVideo(row.bytes)
      if (v == null) Iterator.empty
      else (0 until v.nFrames by everyN).iterator.map { f =>
        val img = Image.frame(v, f)
        FrameRow(row.video_id, f, img.width, img.height, img.channels,
          Image.encodeImage(img.width, img.height, img.channels, img.pixels),
          roundTo(Image.meanBrightness(img.pixels), 4))
      }
    }
  }
}

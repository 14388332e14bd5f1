package graft.codec

/** Raster codecs for the multimodal (image/video) columns.
  *
  * The engine treats images and video as opaque `binary` columns with
  * typed metadata, exactly like the reference treats its payloads as
  * opaque lines until a stage decodes them. Two codec families:
  *
  *  1. **Real compressed formats via `javax.imageio`** (PNG, JPEG, BMP,
  *     GIF — the readers ship with the JDK's java.desktop module;
  *     headless-safe): [[decodeImage]] auto-detects and decodes them to
  *     the uniform raster, [[encodePng]]/[[encodeJpeg]] produce real
  *     container bytes. Video as **MPNG**, an MJPEG-style sequence of
  *     length-prefixed PNG frames (the standard intra-only container
  *     shape; inter-frame codecs like H.264 have no JDK decoder and
  *     stay out of scope — documented limitation, not a fake).
  *  2. **GIMG/GVID**, a trivial uncompressed raster container kept for
  *     deterministic fixtures and as the cheap re-encode target of
  *     intermediate stages (resize/frame-sample outputs that feed
  *     further pixel ops — re-deflating per hop wastes CPU).
  *
  * Everything downstream of the container parse — per-row error
  * isolation, pixel math (features, nearest-neighbor resize, frame
  * sampling) and the Spark-side batch plumbing in `operators/Multimodal`
  * — operates on the uniform [[Image.Decoded]] raster, so format mix is
  * invisible past the decode.
  *
  * GIMG/GVID layout (big-endian int32 fields):
  *   GIMG: 'G''I''M''G' ver(1B) width height channels pixels[w*h*ch]
  *   GVID: 'G''V''I''D' ver(1B) width height channels nFrames
  *         frame0[w*h*ch] frame1[...] ...
  *   MPNG: 'M''P''N''G' ver(1B) nFrames (len frameBytes[len])*
  * Pixels are unsigned bytes, row-major, channel-interleaved (RGB).
  */
object Image {

  final case class Decoded(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  final case class DecodedVideo(width: Int, height: Int, channels: Int,
      nFrames: Int, frames: Array[Byte]) // all frames, concatenated

  private val ImgMagic = Array[Byte]('G', 'I', 'M', 'G')
  private val VidMagic = Array[Byte]('G', 'V', 'I', 'D')
  private val MpngMagic = Array[Byte]('M', 'P', 'N', 'G')
  private val Version: Byte = 1

  private def hasMagic(bytes: Array[Byte], magic: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < magic.length) return false
    var i = 0
    while (i < magic.length) { if (bytes(i) != magic(i)) return false; i += 1 }
    true
  }

  /** PNG signature / JPEG SOI / BMP / GIF sniff — cheap pre-check so
    * obviously-non-image junk never reaches an ImageIO reader probe. */
  private def looksLikeImageIoFormat(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4) return false
    val png = (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    val jpeg = (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    val bmp = b(0) == 'B' && b(1) == 'M'
    val gif = b(0) == 'G' && b(1) == 'I' && b(2) == 'F'
    png || jpeg || bmp || gif
  }

  private def putInt(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte; buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte; buf(off + 3) = v.toByte
  }
  private def getInt(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xff) << 24) | ((buf(off + 1) & 0xff) << 16) |
      ((buf(off + 2) & 0xff) << 8) | (buf(off + 3) & 0xff)

  // ------------------------------------------------------------- encode
  def encodeImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * channels, "pixel count")
    val out = new Array[Byte](17 + pixels.length)
    System.arraycopy(ImgMagic, 0, out, 0, 4)
    out(4) = Version
    putInt(out, 5, width); putInt(out, 9, height); putInt(out, 13, channels)
    System.arraycopy(pixels, 0, out, 17, pixels.length)
    out
  }

  def encodeVideo(width: Int, height: Int, channels: Int, nFrames: Int,
      frames: Array[Byte]): Array[Byte] = {
    require(frames.length == width * height * channels * nFrames, "frame bytes")
    val out = new Array[Byte](21 + frames.length)
    System.arraycopy(VidMagic, 0, out, 0, 4)
    out(4) = Version
    putInt(out, 5, width); putInt(out, 9, height); putInt(out, 13, channels)
    putInt(out, 17, nFrames)
    System.arraycopy(frames, 0, out, 21, frames.length)
    out
  }

  /** MPNG: MJPEG-style intra-only video — length-prefixed PNG frames.
    * All frames must decode and agree on (w, h, channels). */
  def encodeMpng(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(MpngMagic); out.write(Version)
    val hdr = new Array[Byte](4)
    putInt(hdr, 0, frames.length); out.write(hdr)
    frames.foreach { f => putInt(hdr, 0, f.length); out.write(hdr); out.write(f) }
    out.toByteArray
  }

  /** Real PNG container bytes (lossless) via the JDK's ImageIO writer;
    * accepts the engine's uniform raster (1 = gray, 3 = RGB). */
  def encodePng(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      toBuffered(width, height, channels, pixels), "png", bos)
    bos.toByteArray
  }

  /** Real JPEG container bytes (lossy, default quality). */
  def encodeJpeg(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      toBuffered(width, height, channels, pixels), "jpg", bos)
    bos.toByteArray
  }

  private def toBuffered(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    require(channels == 1 || channels == 3,
      s"encode supports 1 (gray) or 3 (RGB) channels, got $channels")
    require(pixels.length == width * height * channels, "pixel count")
    if (channels == 1) {
      val bi = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = bi.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, pixels(y * width + x) & 0xff); x += 1
        }
        y += 1
      }
      bi
    } else {
      val bi = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val o = (y * width + x) * 3
          bi.setRGB(x, y, ((pixels(o) & 0xff) << 16) |
            ((pixels(o + 1) & 0xff) << 8) | (pixels(o + 2) & 0xff))
          x += 1
        }
        y += 1
      }
      bi
    }
  }

  /** BufferedImage → uniform raster. Grayscale images read raw raster
    * samples (getRGB would push them through sRGB color conversion);
    * everything else lands as 3-channel RGB. */
  private def fromBuffered(bi: java.awt.image.BufferedImage): Decoded = {
    val w = bi.getWidth; val h = bi.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue - 32) return null
    if (bi.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
      val px = new Array[Byte](w * h)
      val raster = bi.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1
        }
        y += 1
      }
      Decoded(w, h, 1, px)
    } else {
      val px = new Array[Byte](w * h * 3)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        bi.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val v = row(x); val o = (y * w + x) * 3
          px(o) = ((v >> 16) & 0xff).toByte
          px(o + 1) = ((v >> 8) & 0xff).toByte
          px(o + 2) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 3, px)
    }
  }

  // All payloads are already in-memory byte arrays — the JDK default
  // (useCache=true) would spill EVERY decode/encode through a
  // java.io.tmpdir file: per-row disk I/O on the hot path, and a silent
  // null-out of all images on an executor whose tmp dir is full or
  // read-only (the cache-file IOException lands in the NonFatal catch).
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded-raster ceiling for the ImageIO path (pixels). The header
    * dimensions are CORRUPTION/ATTACKER-CONTROLLED and ImageIO.read
    * allocates the full raster from them BEFORE any caller-side guard
    * could run — an OutOfMemoryError is not per-row-isolatable (it
    * kills the task, not the row), so dimensions are probed from the
    * header and bounded BEFORE the pixel decode. 2^24 px = 48 MB RGB
    * raster ceiling per in-flight image; larger assets belong behind a
    * metadata prune (filter-before-decode) and a dedicated path. */
  val MaxDecodePixels: Long = 1L << 24

  /** PNG/JPEG/BMP/GIF via the JDK's ImageIO readers. Null on anything
    * unreadable or header-declared larger than [[MaxDecodePixels]] —
    * same per-row error isolation as the GIMG path. */
  private def decodeImageIo(bytes: Array[Byte]): Decoded =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // dimension probe reads only the header — no raster allocation
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) return null
          fromBuffered(reader.read(0))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  // ------------------------------------------------------------- decode
  /** Uniform image decode: GIMG raster container OR a real compressed
    * format (PNG/JPEG/BMP/GIF via ImageIO). Null on any malformed
    * payload (bad magic / truncated / codec error) — per-row error
    * isolation, the img-passthrough analog (SURVEY.md F5). */
  def decodeImage(bytes: Array[Byte]): Decoded = {
    if (bytes == null) return null
    if (hasMagic(bytes, ImgMagic)) return decodeGimg(bytes)
    if (looksLikeImageIoFormat(bytes)) return decodeImageIo(bytes)
    null
  }

  private def decodeGimg(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 17) return null
    var i = 0
    while (i < 4) { if (bytes(i) != ImgMagic(i)) return null; i += 1 }
    if (bytes(4) != Version) return null
    val w = getInt(bytes, 5); val h = getInt(bytes, 9); val c = getInt(bytes, 13)
    if (w <= 0 || h <= 0 || c <= 0 || c > 4) return null
    // size math in Long: a crafted header like 65536x65536x1 overflows
    // Int to 0 and would pass the length check with an empty pixel array
    val nL = w.toLong * h * c
    if (nL > Int.MaxValue - 17 || bytes.length.toLong != 17 + nL) return null
    val n = nL.toInt
    val px = new Array[Byte](n)
    System.arraycopy(bytes, 17, px, 0, n)
    Decoded(w, h, c, px)
  }

  /** Uniform video decode: GVID raster container OR MPNG (length-
    * prefixed PNG frames). Null on malformed input. */
  def decodeVideo(bytes: Array[Byte]): DecodedVideo = {
    if (bytes == null) return null
    if (hasMagic(bytes, VidMagic)) return decodeGvid(bytes)
    if (hasMagic(bytes, MpngMagic)) return decodeMpng(bytes)
    null
  }

  private def decodeMpng(bytes: Array[Byte]): DecodedVideo = {
    // header: magic(4) ver(1) nFrames(4), then (len, pngBytes[len])*
    if (bytes.length < 9 || bytes(4) != Version) return null
    val nf = getInt(bytes, 5)
    if (nf <= 0 || nf > (1 << 20)) return null
    var off = 9
    var w = -1; var h = -1; var c = -1
    var frames: Array[Byte] = null
    var f = 0
    while (f < nf) {
      if (off + 4 > bytes.length) return null
      val len = getInt(bytes, off); off += 4
      // `len > bytes.length - off` (not `off + len > length`): a crafted
      // len near Int.MaxValue overflows the sum and would reach
      // copyOfRange as an uncaught throw instead of a null row
      if (len <= 0 || len > bytes.length - off) return null
      val img = decodeImageIo(
        java.util.Arrays.copyOfRange(bytes, off, off + len))
      off += len
      if (img == null) return null
      if (f == 0) {
        w = img.width; h = img.height; c = img.channels
        val tot = w.toLong * h * c * nf // Long math — header overflow note
        if (tot > Int.MaxValue - 32) return null
        frames = new Array[Byte](tot.toInt)
      } else if (img.width != w || img.height != h || img.channels != c) {
        return null // frames must agree on geometry
      }
      System.arraycopy(img.pixels, 0, frames, f * w * h * c, w * h * c)
      f += 1
    }
    if (off != bytes.length) return null
    DecodedVideo(w, h, c, nf, frames)
  }

  private def decodeGvid(bytes: Array[Byte]): DecodedVideo = {
    if (bytes == null || bytes.length < 21) return null
    var i = 0
    while (i < 4) { if (bytes(i) != VidMagic(i)) return null; i += 1 }
    if (bytes(4) != Version) return null
    val w = getInt(bytes, 5); val h = getInt(bytes, 9)
    val c = getInt(bytes, 13); val nf = getInt(bytes, 17)
    if (w <= 0 || h <= 0 || c <= 0 || c > 4 || nf <= 0) return null
    // Long size math — see decodeImage overflow note
    val nL = w.toLong * h * c * nf
    if (nL > Int.MaxValue - 21 || bytes.length.toLong != 21 + nL) return null
    val n = nL.toInt
    val px = new Array[Byte](n)
    System.arraycopy(bytes, 21, px, 0, n)
    DecodedVideo(w, h, c, nf, px)
  }

  // -------------------------------------------------------- pixel math
  /** Mean unsigned pixel value over all channels. */
  def meanBrightness(px: Array[Byte], from: Int = 0, until: Int = -1): Double = {
    val end = if (until < 0) px.length else until
    if (end <= from) return 0.0
    var s = 0L; var i = from
    while (i < end) { s += (px(i) & 0xff); i += 1 }
    s.toDouble / (end - from)
  }

  /** Population stddev of unsigned pixel values (contrast proxy). */
  def contrast(px: Array[Byte]): Double = {
    if (px.length == 0) return 0.0
    val m = meanBrightness(px)
    var s = 0.0; var i = 0
    while (i < px.length) { val d = (px(i) & 0xff) - m; s += d * d; i += 1 }
    math.sqrt(s / px.length)
  }

  /** Mean |horizontal gradient| on channel 0 (edge-energy proxy). */
  def edgeEnergy(img: Decoded): Double = {
    val Decoded(w, h, c, px) = img
    if (w < 2) return 0.0
    var s = 0L; var y = 0
    while (y < h) {
      var x = 1
      while (x < w) {
        val a = px((y * w + x) * c) & 0xff
        val b = px((y * w + x - 1) * c) & 0xff
        s += math.abs(a - b); x += 1
      }
      y += 1
    }
    s.toDouble / ((w - 1).toLong * h)
  }

  /** Nearest-neighbor resize — real resampling math on the decoded grid. */
  def resizeNearest(img: Decoded, w2: Int, h2: Int): Decoded = {
    val Decoded(w, h, c, px) = img
    val out = new Array[Byte](w2 * h2 * c)
    var y = 0
    while (y < h2) {
      val sy = math.min(h - 1, (y.toLong * h / h2).toInt)
      var x = 0
      while (x < w2) {
        val sx = math.min(w - 1, (x.toLong * w / w2).toInt)
        var ch = 0
        while (ch < c) {
          out((y * w2 + x) * c + ch) = px((sy * w + sx) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Decoded(w2, h2, c, out)
  }

  /** Frame `idx` of a decoded video as a standalone image (zero-copy
    * slice into a fresh array so rows remain independently serializable). */
  def frame(v: DecodedVideo, idx: Int): Decoded = {
    val sz = v.width * v.height * v.channels
    val px = new Array[Byte](sz)
    System.arraycopy(v.frames, idx * sz, px, 0, sz)
    Decoded(v.width, v.height, v.channels, px)
  }
}

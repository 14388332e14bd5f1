package graft.codec

/** Raster container codec for the multimodal (image/video) columns.
  *
  * The engine treats images and video as opaque `binary` columns with
  * typed metadata, exactly like the reference treats its payloads as
  * opaque lines until a stage decodes them. This container — "GIMG"
  * (single image) / "GVID" (frame sequence) — is a deterministic fake
  * standing in for JPEG/PNG/H.264: **the real-world codec is the one
  * clearly-marked stub in the engine** (no image/AV libraries exist in
  * this build environment). Everything around it — binary schema, header
  * parse, per-row error isolation, pixel math (features, nearest-neighbor
  * resize, frame sampling) and the Spark-side batch plumbing in
  * `operators/Multimodal` — is real and tested, so swapping in a true
  * codec changes only the body of [[decodeImage]]/frame extraction.
  *
  * Layout (big-endian int32 fields):
  *   GIMG: 'G''I''M''G' ver(1B) width height channels pixels[w*h*ch]
  *   GVID: 'G''V''I''D' ver(1B) width height channels nFrames
  *         frame0[w*h*ch] frame1[...] ...
  * Pixels are unsigned bytes, row-major, channel-interleaved.
  */
object Image {

  final case class Decoded(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  final case class DecodedVideo(width: Int, height: Int, channels: Int,
      nFrames: Int, frames: Array[Byte]) // all frames, concatenated

  private val ImgMagic = Array[Byte]('G', 'I', 'M', 'G')
  private val VidMagic = Array[Byte]('G', 'V', 'I', 'D')
  private val Version: Byte = 1

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

  // ------------------------------------------------------------- decode
  /** Null on any malformed payload (bad magic / truncated) — per-row
    * error isolation, the img-passthrough analog (SURVEY.md F5). */
  def decodeImage(bytes: Array[Byte]): Decoded = {
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

  def decodeVideo(bytes: Array[Byte]): DecodedVideo = {
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

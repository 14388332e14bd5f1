package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Image
import graft.model.{ImageRow, MediaGen}
import graft.operators.{Multimodal, Similarity}

class ImageCodecSpec extends AnyFunSuite {

  test("encode/decode roundtrip is byte-exact") {
    val px = Array.tabulate(4 * 3 * 3)(i => (i * 37 % 256).toByte)
    val bytes = Image.encodeImage(4, 3, 3, px)
    val d = Image.decodeImage(bytes)
    assert(d != null)
    assert(d.width == 4 && d.height == 3 && d.channels == 3)
    assert(d.pixels.sameElements(px))
  }

  test("decode rejects bad magic, truncation, absurd dims") {
    val px = Array.fill[Byte](4)(1)
    val good = Image.encodeImage(2, 2, 1, px)
    assert(Image.decodeImage(null) == null)
    assert(Image.decodeImage(Array[Byte](1, 2, 3)) == null)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Image.decodeImage(badMagic) == null)
    assert(Image.decodeImage(good.dropRight(1)) == null)
    assert(Image.decodeImage(good :+ 0.toByte) == null)
  }

  test("features on a hand-computed 2x2 gray image") {
    // pixels 0, 100, 200, 40 → mean 85, var = (85²+15²+115²+45²)/4
    val px = Array[Byte](0, 100, 200.toByte, 40)
    val img = Image.decodeImage(Image.encodeImage(2, 2, 1, px))
    assert(Image.meanBrightness(img.pixels) == 85.0)
    val expVar = (85.0 * 85 + 15 * 15 + 115 * 115 + 45 * 45) / 4
    assert(math.abs(Image.contrast(img.pixels) - math.sqrt(expVar)) < 1e-9)
    // edge energy on ch0: |100-0| and |40-200| over 2 rows → (100+160)/2
    assert(Image.edgeEnergy(img) == 130.0)
  }

  test("nearest-neighbor resize: dims, determinism, 2x upscale blocks") {
    val px = Array[Byte](10, 20, 30, 40)
    val img = Image.decodeImage(Image.encodeImage(2, 2, 1, px))
    val up = Image.resizeNearest(img, 4, 4)
    assert(up.width == 4 && up.height == 4)
    // each source pixel becomes a 2x2 block
    assert(up.pixels(0) == 10 && up.pixels(1) == 10 && up.pixels(2) == 20)
    assert(up.pixels(4) == 10 && up.pixels(15) == 40)
    assert(Image.resizeNearest(img, 4, 4).pixels.sameElements(up.pixels))
    val down = Image.resizeNearest(up, 2, 2)
    assert(down.pixels.sameElements(px)) // NN up then down is lossless
  }

  test("video frames decode independently and match the image codec") {
    val v = MediaGen.videoAt(3)
    val dv = Image.decodeVideo(v.bytes)
    assert(dv != null && dv.nFrames == v.n_frames)
    val f0 = Image.frame(dv, 0)
    val f1 = Image.frame(dv, math.min(1, dv.nFrames - 1))
    assert(f0.pixels.length == v.width * v.height * v.channels)
    // brightness drifts with frame index (generator adds +9/frame term)
    assert(Image.meanBrightness(f1.pixels) != Image.meanBrightness(f0.pixels))
  }

  test("real PNG round-trip is pixel-exact (gray and RGB)") {
    // known raster -> ImageIO PNG bytes -> decodeImage -> same pixels
    val gray = Array.tabulate(7 * 5)(i => ((i * 41 + 3) % 256).toByte)
    val pg = Image.encodePng(7, 5, 1, gray)
    // a real PNG container, not our raster dump
    assert((pg(0) & 0xff) == 0x89 && pg(1) == 'P' && pg(2) == 'N' && pg(3) == 'G')
    val dg = Image.decodeImage(pg)
    assert(dg != null && dg.width == 7 && dg.height == 5 && dg.channels == 1)
    assert(dg.pixels.sameElements(gray))
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 29 + 11) % 256).toByte)
    val pc = Image.encodePng(4, 3, 3, rgb)
    val dc = Image.decodeImage(pc)
    assert(dc != null && dc.width == 4 && dc.height == 3 && dc.channels == 3)
    assert(dc.pixels.sameElements(rgb))
  }

  test("real JPEG decodes close to the source raster (lossy)") {
    // smooth gradient (JPEG's happy case) — decoded pixels must stay
    // within a small mean absolute error of the original
    val w = 32; val h = 16
    val src = Array.tabulate(h, w)((y, x) => (x * 255 / (w - 1)).toByte)
      .flatten
    val jb = Image.encodeJpeg(w, h, 1, src)
    assert((jb(0) & 0xff) == 0xff && (jb(1) & 0xff) == 0xd8) // SOI marker
    val d = Image.decodeImage(jb)
    assert(d != null && d.width == w && d.height == h)
    val mae = src.zip(d.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble /
      src.length
    assert(mae < 4.0, s"JPEG mean abs error $mae")
  }

  test("MPNG video: frames round-trip; malformed sequences rejected") {
    val w = 6; val h = 4; val c = 3
    val fr = (0 until 3).map(f =>
      Array.tabulate(w * h * c)(i => ((i * 13 + f * 40) % 256).toByte))
    val mp = Image.encodeMpng(fr.map(p => Image.encodePng(w, h, c, p)))
    val dv = Image.decodeVideo(mp)
    assert(dv != null && dv.nFrames == 3 && dv.width == w && dv.channels == c)
    (0 until 3).foreach { f =>
      assert(Image.frame(dv, f).pixels.sameElements(fr(f)), s"frame $f")
    }
    // truncated payload / trailing garbage / mixed geometry all reject
    assert(Image.decodeVideo(mp.dropRight(1)) == null)
    assert(Image.decodeVideo(mp :+ 0.toByte) == null)
    // crafted frame length near Int.MaxValue must not overflow the
    // bounds check into copyOfRange (null, not a throw)
    val crafted = "MPNG".getBytes ++ Array[Byte](1, 0, 0, 0, 1,
      0x7f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill[Byte](8)(0)
    assert(Image.decodeVideo(crafted) == null)
    val mixed = Image.encodeMpng(Seq(
      Image.encodePng(w, h, c, fr(0)),
      Image.encodePng(w + 1, h, c,
        Array.fill[Byte]((w + 1) * h * c)(1))))
    assert(Image.decodeVideo(mixed) == null)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val N = 300L
  lazy val images = MediaGen.images(spark, N, partitions = 4).cache()
  lazy val videos = MediaGen.videos(spark, 40L, partitions = 4).cache()

  test("imageFeatures: every row passes through; bad payloads ok=false") {
    val feats = Multimodal.imageFeatures(images).collect()
    assert(feats.length == N)
    val bad = feats.filter(!_.ok)
    assert(bad.nonEmpty, "generator should plant undecodable rows")
    assert(bad.length < N / 10)
    // decoded features are in-range and non-degenerate
    val good = feats.filter(_.ok)
    assert(good.forall(f => f.mean_brightness > 0 && f.mean_brightness <= 255))
    assert(good.exists(_.contrast > 1.0))
    assert(good.forall(_.edge_energy >= 0))
  }

  test("imageFeatures matches a driver-side decode of the same row") {
    val row = MediaGen.imageAt(0)
    assume(row.format != "bin")
    val img = Image.decodeImage(row.bytes)
    val f = Multimodal.imageFeatures(images).filter($"img_id" === row.img_id)
      .head()
    assert(f.mean_brightness ==
      graft.lid.TextStats.roundTo(Image.meanBrightness(img.pixels), 4))
    assert(f.width == img.width && f.height == img.height)
  }

  test("ops are narrow: partitioning preserved, no shuffle in the plan") {
    val feats = Multimodal.imageFeatures(images)
    assert(feats.rdd.getNumPartitions == images.rdd.getNumPartitions)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize rewrites decodable payloads (incl. real PNG/JPEG) to the target grid") {
    // generator mix covers png + jpeg + gimg — all must land on 8x8
    val formats = images.collect().map(r => r.img_id -> r.format).toMap
    assert(Set("png", "jpeg", "gimg").subsetOf(formats.values.toSet))
    val resized = Multimodal.resize(images, 8, 8).collect()
    assert(resized.length == N)
    resized.filter(_.format == "gimg").foreach { r =>
      val img = Image.decodeImage(r.bytes)
      assert(img != null && img.width == 8 && img.height == 8)
      assert(r.width == 8 && r.height == 8)
      assert(formats(r.img_id) != "bin") // every decodable source format
    }
    assert(resized.count(_.format == "gimg") == resized.length -
      resized.count(_.format == "bin"))
    // undecodable rows pass through untouched
    resized.filter(_.format == "bin").foreach { r =>
      assert(Image.decodeImage(r.bytes) == null && r.bytes.length == 64)
    }
  }

  test("sampleFrames: every-N selection incl. frame 0, features per frame") {
    val frames = Multimodal.sampleFrames(videos, everyN = 3).collect()
    val metas = videos.collect().map(v => v.video_id -> v).toMap
    val byVid = frames.groupBy(_.video_id)
    assert(byVid.keySet == metas.keySet)
    byVid.foreach { case (vid, fs) =>
      val expected = (0 until metas(vid).n_frames by 3).toSet
      assert(fs.map(_.frame_idx).toSet == expected)
      fs.foreach { f =>
        val img = Image.decodeImage(f.frame_bytes)
        assert(img != null && img.width == metas(vid).width)
        assert(f.mean_brightness ==
          graft.lid.TextStats.roundTo(Image.meanBrightness(img.pixels), 4))
      }
    }
    // everyN = 1 yields all frames
    val all = Multimodal.sampleFrames(videos, everyN = 1).count()
    assert(all == metas.values.map(_.n_frames.toLong).sum)
  }

  test("sampled frames feed the image feature op (video→image pipeline)") {
    val asImages = Multimodal.sampleFrames(videos, 4).map(f =>
      ImageRow(s"${f.video_id}#${f.frame_idx}", f.frame_bytes,
        f.width, f.height, f.channels, "gimg"))
    val feats = Multimodal.imageFeatures(asImages)
    assert(feats.filter(!_.ok).isEmpty)
    assert(feats.count() > 0)
  }
}

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // same clustered corpus shape as SimilaritySpec
  lazy val vecs = (0L until 200L).map { i =>
    val c = (i % 4).toInt
    val v = Array.tabulate(16)(d =>
      (if (d == c) 10.0f else 0.0f) +
        (((i * 31 + d * 7) % 13) - 6) * 0.1f)
    (i, v)
  }.toDF("vec_id", "embedding")

  test("IVF with nProbe = nLists reproduces brute force exactly") {
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L), 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L), nLists = 8, nProbe = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == exact)
  }

  test("IVF with nProbe=1 keeps high recall on clustered data") {
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L), 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L), nLists = 4, nProbe = 1, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@5 (nProbe=1) = $recall%.2f")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF survives a CLUSTER-ORDERED corpus (spread sampling, not first-ids)") {
    // ids sorted by cluster: ids [0,50) = cluster 0, [50,100) = cluster 1,
    // etc. A first-maxSample-ids trainer would only ever see cluster 0/1
    // and silently collapse recall on later clusters — the hash-spread
    // sample must keep recall high for queries from EVERY cluster.
    val ordered = (0L until 200L).map { i =>
      val c = (i / 50).toInt
      val v = Array.tabulate(16)(d =>
        (if (d == c) 10.0f else 0.0f) +
          (((i * 31 + d * 7) % 13) - 6) * 0.1f)
      (i, v)
    }.toDF("vec_id", "embedding")
    // one query from each cluster
    val queries = Seq(0L, 50L, 100L, 150L)
    val exact = Similarity.bruteForceTopK(ordered, "vec_id", "embedding",
      queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTopK(ordered, "vec_id", "embedding",
      queries, nLists = 4, nProbe = 1, k = 5, maxSample = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@5 (cluster-ordered ids, nProbe=1, sample=64) = $recall%.2f")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("centroid training is deterministic and centroids are unit-norm") {
    val sample = (0 until 64).map { i =>
      Array.tabulate(8)(d => ((i * 13 + d * 5) % 17 - 8).toDouble)
    }.toArray
    val a = Similarity.trainCentroids(sample, 4, 6)
    val b = Similarity.trainCentroids(sample, 4, 6)
    assert(a.length == 4)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }
}

package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

case class Decoded(doc_id: Long, n_bytes: Int, leadByte: Int)

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", 11L),
    (1L, "héllo wörld", 11L)) // multibyte: byte_len > n_chars
    .toDF("doc_id", "text", "n_chars")
    .withColumn("payload", col("text").cast("binary"))

  test("binary payload roundtrips and measures bytes, not chars") {
    val m = Multimodal.fakeDecodeMeta(docs, "payload").orderBy("doc_id").collect()
    assert(m(0).getAs[Int]("byte_len") == 11)
    assert(m(1).getAs[Int]("byte_len") == 13) // two 2-byte UTF-8 chars
    assert(m(0).getAs[Int]("width") == 64 + 11 % 512)
    assert(m(0).getAs[Int]("n_frames") == 1 + 11 % 8)
  }

  test("library decodePartitions: custom codec, init once per partition") {
    val inits = spark.sparkContext.longAccumulator("codec-inits")
    val decoded = Multimodal.decodePartitions(docs.repartition(2), "doc_id", "payload") {
      () =>
        inits.add(1) // a real impl would open its codec here
        (id: Long, bytes: Array[Byte]) => Decoded(id, bytes.length, bytes.head & 0xff)
    }
    val r = decoded.collect().sortBy(_.doc_id)
    assert(r(0) == Decoded(0L, 11, 'h'.toInt))
    assert(r(1).n_bytes == 13)
    assert(inits.value == 2, "codec must init exactly once per partition")
  }

  test("library decodePartitions with the stub codec emits media-ish metadata") {
    val meta = Multimodal.decodePartitions(docs, "doc_id", "payload")(Multimodal.stubCodec)
      .collect().sortBy(_.doc_id)
    assert(meta(0) == Multimodal.DecodedMeta(0L, 11, 64 + 11 % 512, 64 + 77 % 512, 1 + 11 % 8))
    assert(meta(1).n_bytes == 13) // bytes, not chars
  }

  test("digest column matches sha-256 of the payload bytes") {
    val d = Multimodal.multimodalMeta.run(spark, sf0001)
      .select("digest").head().getString(0)
    assert(d.matches("[0-9a-f]{64}"))
  }

  test("frame sampling fans out 1:N with the configured stride") {
    // payloads of 1024 and 600 bytes → 4 and 2 stub "frames"
    val media = Seq(
      (10L, Array.fill[Byte](1024)(7)),
      (11L, Array.fill[Byte](600)(3)))
      .toDF("doc_id", "payload")
    val all = Multimodal.sampleFramesPartitions(media, "doc_id", "payload", 1)(
      Multimodal.stubFrameCodec).collect()
    assert(all.count(_.doc_id == 10L) == 4 && all.count(_.doc_id == 11L) == 2)
    assert(all.filter(_.doc_id == 10L).map(_.byte_offset).sorted.toSeq
      == Seq(0L, 256L, 512L, 768L))
    // stride 2 keeps every other frame
    val strided = Multimodal.sampleFramesPartitions(media, "doc_id", "payload", 2)(
      Multimodal.stubFrameCodec).collect()
    assert(strided.filter(_.doc_id == 10L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    // identical byte runs digest identically; different bytes don't
    val ds = all.filter(_.doc_id == 10L).map(_.frame_digest).distinct
    assert(ds.length == 1, "uniform payload frames must share a digest")
    assert(all.find(_.doc_id == 11L).get.frame_digest != ds.head)
  }

  test("payload transform emits new binary payloads sized by the target dims") {
    val media = Seq((0L, "abcdefgh"), (1L, "xy"))
      .toDF("doc_id", "text").withColumn("payload", col("text").cast("binary"))
    val resized = Multimodal.transformPayloadPartitions(media, "doc_id", "payload",
      targetW = 64, targetH = 64)(Multimodal.stubResizeCodec)
    assert(resized.columns.toSeq == Seq("doc_id", "payload", "width", "height"))
    val rows = resized.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    // 64*64/64 = 64 output bytes regardless of input size: the output,
    // not the input, determines downstream sizing
    assert(rows(0L).length == 64 && rows(1L).length == 64)
    assert(rows(0L).take(8).toSeq == "abcdefgh".getBytes.toSeq)
    assert(rows(1L).take(4).toSeq == "xyxy".getBytes.toSeq) // cycled source
    assert(resized.select(col("width"), col("height")).head.toSeq == Seq(64, 64))
  }

  test("feature extraction emits L2-normalized vectors joinable with ANN ops") {
    val media = Seq((0L, "aaaabbbb"), (1L, "zzzzzzzz"))
      .toDF("vec_id", "text").withColumn("payload", col("text").cast("binary"))
    val feats = Multimodal.extractFeaturesPartitions(media, "vec_id", "payload", 8)(
      Multimodal.stubFeatureCodec)
    assert(feats.columns.toSeq == Seq("vec_id", "embedding"))
    val rows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.values.foreach { v =>
      assert(math.abs(v.map(x => x * x.toDouble).sum - 1.0) < 1e-5, "not L2-normalized")
      assert(v.length == 8)
    }
    // deterministic: same payload → same vector
    val again = Multimodal.extractFeaturesPartitions(media, "vec_id", "payload", 8)(
      Multimodal.stubFeatureCodec).collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == rows)
  }

  // ---- real javax.imageio codecs (round 6) ----

  /** 2×2 PNG built with the JDK encoder: distinct corner colors so the
    * resize test has real pixel content. Also a well-known hardcoded 1×1
    * PNG (not produced by ImageIO) to prove decode isn't circular.
    */
  private def png2x2: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val png1x1: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

  test("imageCodec decodes real PNG dimensions; non-images fall back to the stub") {
    val vid = Array.tabulate[Byte](300)(_.toByte) // not an image
    val rows = Seq((0L, png2x2), (1L, png1x1), (2L, vid)).toDF("doc_id", "payload")
    val out = Multimodal.decodePartitions(rows, "doc_id", "payload")(
        Multimodal.imageCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(0L).width == 2 && out(0L).height == 2, out(0L).toString)
    assert(out(1L).width == 1 && out(1L).height == 1, out(1L).toString)
    // the video-ish payload took the stub path: statistics, not headers
    assert(out(2L).width == 64 + 300 % 512 && out(2L).n_frames == 1 + 300 % 8)
    assert(out.values.forall(_.n_bytes > 0))
  }

  test("imageResizeCodec produces a real PNG at the target dimensions") {
    val rows = Seq((0L, png2x2)).toDF("doc_id", "payload")
    val resized = Multimodal.transformPayloadPartitions(rows, "doc_id", "payload", 4, 3)(
      Multimodal.imageResizeCodec)
    val payload = resized.select($"payload").head().getAs[Array[Byte]](0)
    // decode the OUTPUT with an independent read — it must be a valid
    // 4×3 image, not stub bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "resize output is not a decodable image")
    assert(img.getWidth == 4 && img.getHeight == 3,
      s"got ${img.getWidth}x${img.getHeight}")
    // scaled content keeps real pixel data (top-left stays reddish)
    val rgb = img.getRGB(0, 0)
    assert(((rgb >> 16) & 0xFF) > ((rgb >> 8) & 0xFF), f"top-left not reddish: $rgb%06x")
  }

  /** In-memory 16-bit mono PCM WAV: first half silence, second half a
    * loud square wave — real container bytes via the JDK's own writer.
    */
  private def wav16(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = nSamples / 2
    while (i < nSamples) {
      val v: Short = if (i % 2 == 0) 20000 else -20000
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioCodec reads real WAV headers; non-audio rows zero out") {
    val rows = Seq((0L, wav16(16000, 16000)), (1L, wav16(8000, 2000)),
        (2L, png2x2)).toDF("doc_id", "payload")
    val out = Multimodal.decodePartitions(rows, "doc_id", "payload")(
        Multimodal.audioCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(0L).sample_rate == 16000 && out(0L).n_channels == 1)
    assert(out(0L).n_frames == 16000L && out(0L).duration_ms == 1000L, out(0L).toString)
    assert(out(1L).sample_rate == 8000 && out(1L).n_frames == 2000L)
    assert(out(1L).duration_ms == 250L, out(1L).toString)
    // the image payload is not audio: zeroed fields, byte length kept
    assert(out(2L).sample_rate == 0 && out(2L).n_frames == 0L && out(2L).n_bytes > 0)
  }

  test("audioFeatureCodec embeds real PCM energy: silent half ~0, loud half hot") {
    val dim = 8
    val rows = Seq((0L, wav16(16000, 16000))).toDF("doc_id", "payload")
    val vec = Multimodal.extractFeaturesPartitions(rows, "doc_id", "payload", dim)(
        Multimodal.audioFeatureCodec)
      .select($"embedding").head().getAs[scala.collection.Seq[Float]](0)
    assert(vec.length == dim)
    // first half of the signal is silence, second half a square wave:
    // the time-windowed RMS embedding must reflect that exactly
    assert(vec.take(dim / 2).forall(_ < 1e-6f), s"silent windows not quiet: $vec")
    assert(vec.drop(dim / 2).forall(_ > 0.1f), s"loud windows not hot: $vec")
    val norm = math.sqrt(vec.map(v => v * v.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"not L2-normalized: $norm")
    // a non-audio payload goes through the stub featurizer, same shape
    val fb = Multimodal.extractFeaturesPartitions(
        Seq((1L, png2x2)).toDF("doc_id", "payload"), "doc_id", "payload", dim)(
        Multimodal.audioFeatureCodec)
      .select($"embedding").head().getAs[scala.collection.Seq[Float]](0)
    assert(fb.length == dim)
  }

  /** Minimal MJPEG-AVI built by hand: RIFF(AVI ) → LIST(hdrl){avih} →
    * LIST(movi){00dc… JPEG frames}. Just enough grammar for a demuxer.
    */
  private def mjpegAvi(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade, shade))
      g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val bb = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ children)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(40000), 0, avih, 0, 4)   // usPerFrame
    System.arraycopy(le32(nFrames), 0, avih, 16, 4) // dwTotalFrames
    System.arraycopy(le32(w), 0, avih, 32, 4)       // dwWidth
    System.arraycopy(le32(h), 0, avih, 36, 4)       // dwHeight
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      (0 until nFrames).flatMap(i => chunk("00dc", jpeg(40 * i + 20))).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bb.write("RIFF".getBytes("US-ASCII")); bb.write(le32(body.length)); bb.write(body)
    bb.toByteArray
  }

  test("videoCodec parses real AVI headers; non-AVI rows take the stub") {
    val avi = mjpegAvi(6, 4, 5)
    val rows = Seq((0L, avi), (1L, png2x2)).toDF("doc_id", "payload")
    val out = Multimodal.decodePartitions(rows, "doc_id", "payload")(
        Multimodal.videoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(0L).width == 6 && out(0L).height == 4 && out(0L).n_frames == 5,
      out(0L).toString)
    // the PNG is not an AVI: stub statistics, not container headers
    assert(out(1L).width == 64 + png2x2.length % 512)
  }

  test("videoFrameCodec samples true AVI frame chunks that decode as JPEG") {
    val avi = mjpegAvi(6, 4, 6)
    val rows = Seq((0L, avi)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFramesPartitions(rows, "doc_id", "payload", 2)(
        Multimodal.videoFrameCodec)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4), frames.toSeq.toString)
    // the reported offsets point at REAL JPEG payloads inside the
    // container: an independent ImageIO decode of each slice succeeds
    frames.foreach { f =>
      val off = f.byte_offset.toInt
      assert(avi(off) == 0xFF.toByte && avi(off + 1) == 0xD8.toByte,
        s"frame at $off lacks a JPEG SOI marker")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        avi.drop(off)))
      assert(img != null && img.getWidth == 6 && img.getHeight == 4)
    }
    // distinct shades → distinct digests
    assert(frames.map(_.frame_digest).distinct.length == frames.length)
  }

  test("video codecs never throw on hostile bytes: truncated AVI, garbage, empty") {
    val rnd = new scala.util.Random(42)
    val avi = mjpegAvi(4, 4, 3)
    val hostile: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray,
        "RIFF".getBytes("US-ASCII"),                      // bare magic
        avi.take(20),                                     // truncated header
        avi.take(avi.length - 7),                         // truncated mid-chunk
        avi.updated(30, 0x7F.toByte),                     // corrupted size field
        Array.fill(512)(rnd.nextInt().toByte)) ++         // noise
        (1 to 20).map(n => Array.fill(n * 17)(rnd.nextInt().toByte))
    val rows = hostile.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("doc_id", "payload")
    // both codecs must fall back (or parse a still-valid prefix) — never throw
    val metas = Multimodal.decodePartitions(rows, "doc_id", "payload")(
      Multimodal.videoCodec).collect()
    assert(metas.length == hostile.length)
    val frames = Multimodal.sampleFramesPartitions(rows, "doc_id", "payload", 1)(
      Multimodal.videoFrameCodec).collect()
    assert(frames.nonEmpty) // stub fallback still yields strided runs
  }

  test("synthetic generators round-trip through the real codecs (q151 gate)") {
    // the exact arithmetic q151's oracle pins, spot-checked off-cluster
    for (id <- Seq(0L, 5L, 23L)) {
      val k = (id % 16).toInt
      val im = Multimodal.imageCodec()(id,
        Multimodal.syntheticPng(8 + k, 8 + ((id * 3) % 16).toInt))
      assert(im.width == 8 + k && im.height == 8 + ((id * 3) % 16).toInt)
      val am = Multimodal.audioCodec()(id, Multimodal.syntheticWav(8000, 800 + k * 40))
      assert(am.sample_rate == 8000 && am.n_channels == 1)
      assert(am.n_frames == 800 + k * 40 && am.duration_ms == 100 + k * 5)
      val vm = Multimodal.videoCodec()(id,
        Multimodal.syntheticAvi(16 + (id % 8).toInt, 9 + (id % 8).toInt, 1 + (id % 5).toInt))
      assert(vm.width == 16 + (id % 8).toInt && vm.height == 9 + (id % 8).toInt)
      assert(vm.n_frames == 1 + (id % 5).toInt)
    }
  }
}

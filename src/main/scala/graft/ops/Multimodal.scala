package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, per the north-star brief.
  *
  * IMAGE decode/resize are REAL (round 6): [[imageCodec]] and
  * [[imageResizeCodec]] run the JDK's `javax.imageio` PNG/JPEG/GIF/BMP
  * readers — no external dependency. AUDIO decode/featurize are REAL
  * (round 8): [[audioCodec]] and [[audioFeatureCodec]] run the JDK's
  * `javax.sound.sampled` WAV/AIFF/AU parsers over PCM frames. VIDEO
  * header decode and frame sampling are REAL for RIFF/AVI (round 8):
  * [[videoCodec]] and [[videoFrameCodec]] walk the container's chunk
  * grammar in pure JDK code, and MJPEG frame payloads decode with
  * `javax.imageio`; other containers (MP4/MKV — no JDK demuxer) fall
  * back to the deterministic stubs. `fakeDecodeMeta` keeps the
  * stub statistics for the oracle-checked q41 (payloads there are text
  * blobs, not images). Everything around the codecs — binary column
  * handling, byte-length vs char-length, content digests, batch
  * schema — is real Spark plumbing and oracle-checked.
  *
  * Scale note: payloads stay opaque bytes end to end; nothing here
  * deserializes media on the driver, and the per-row work is a narrow
  * projection, so the pattern holds when `payload` is a 10 MB frame
  * instead of a text blob. A real decoder would slot in as a
  * `mapPartitions` over the same schema (batched, per-executor codec
  * init), which is exactly how the stub variant in `MultimodalSpec` runs.
  */
object Multimodal {

  /** Deterministic fake decoder: payload+char stats → media-ish metadata. */
  def fakeDecodeMeta(df: DataFrame, payloadCol: String): DataFrame =
    df
      .withColumn("byte_len", length(col(payloadCol)))
      .withColumn("width", (lit(64) + col("n_chars") % 512).cast("int"))
      .withColumn("height", (lit(64) + (col("n_chars") * 7) % 512).cast("int"))
      .withColumn("n_frames", (lit(1) + col("n_chars") % 8).cast("int"))

  /** Media-ish features a decoder emits per payload. */
  case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    n_frames: Int)

  /** Batched media decode over `(id, payload)` — the 100 TB decode shape
    * as a library entry point (not test scaffolding): `codecFactory` runs
    * ONCE per partition (per executor task) so codec/library init is
    * amortized over the whole batch, payload bytes stream through
    * executors without ever visiting the driver, and the result is a
    * typed Dataset ready for downstream relational ops.
    *
    * The real decoder isn't available in this offline environment — a
    * production caller passes e.g. `() => jpegDecode _` built on its
    * native codec; [[stubCodec]] is the deterministic stand-in used by
    * tests and demos.
    */
  def decodePartitions[T: Encoder](df: DataFrame, idCol: String, payloadCol: String)
      (codecFactory: () => (Long, Array[Byte]) => T): Dataset[T] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codecFactory() // codec init: once per partition
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Deterministic stub codec for [[decodePartitions]]: byte statistics →
    * media-ish metadata, mirroring what a real codec reads from headers.
    */
  def stubCodec: () => (Long, Array[Byte]) => DecodedMeta =
    () => (id, bytes) => DecodedMeta(id, bytes.length,
      64 + bytes.length % 512, 64 + (bytes.length * 7) % 512,
      1 + bytes.length % 8)

  /** REAL image codec (no external dependency — the JDK ships
    * `javax.imageio` with PNG/JPEG/GIF/BMP readers): decodes the payload
    * and reports its true width/height. Payloads ImageIO cannot decode
    * (video containers, audio, arbitrary bytes) fall back to the
    * deterministic [[stubCodec]] statistics, so mixed-modality batches
    * decode in one pass. Built per partition via the
    * [[decodePartitions]] codecFactory contract, so the fallback codec
    * and any reader state are initialized once per task, not per row.
    */
  def imageCodec: () => (Long, Array[Byte]) => DecodedMeta =
    () => {
      val fallback = stubCodec()
      (id, bytes) => {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException | _: RuntimeException => null }
        if (img != null) DecodedMeta(id, bytes.length, img.getWidth, img.getHeight, 1)
        else fallback(id, bytes)
      }
    }

  /** Audio header + frame metadata a real decoder reports. */
  case class AudioMeta(doc_id: Long, n_bytes: Int, sample_rate: Int,
    n_channels: Int, n_frames: Long, duration_ms: Long)

  /** REAL audio codec (no external dependency — the JDK ships
    * `javax.sound.sampled` with WAV/AIFF/AU parsers and PCM decoders):
    * parses the container header and reports the true sample rate,
    * channel count, frame count and duration. Payloads the JDK cannot
    * parse (compressed containers, images, arbitrary bytes) yield
    * ZEROED audio fields — mixed-modality batches flow through in one
    * pass and `sample_rate > 0` selects the decoded rows. Same
    * [[decodePartitions]] per-partition factory contract as the image
    * codec.
    */
  def audioCodec: () => (Long, Array[Byte]) => AudioMeta =
    () => (id, bytes) => {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException => null
        }
      if (in == null) AudioMeta(id, bytes.length, 0, 0, 0L, 0L)
      else {
        val f = in.getFormat
        val frames = in.getFrameLength
        val ms =
          if (f.getFrameRate > 0) (frames * 1000.0 / f.getFrameRate).toLong
          else 0L
        in.close()
        AudioMeta(id, bytes.length, f.getSampleRate.toInt, f.getChannels,
          frames, ms)
      }
    }

  /** REAL audio featurizer: decode PCM samples, slice the signal into
    * `dim` equal time windows, emit the per-window RMS energy as an
    * L2-normalized vector — a genuine (if minimal) audio embedding,
    * directly joinable with the ANN family like [[stubFeatureCodec]]'s
    * output. 16-bit samples are read as little-endian shorts (the WAV
    * norm), other widths as raw bytes. Undecodable payloads fall back
    * to the deterministic byte-histogram stub so mixed batches embed
    * in one pass.
    */
  def audioFeatureCodec: () => (Array[Byte], Int) => Array[Float] =
    () => {
      val fallback = stubFeatureCodec()
      (bytes, dim) => {
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException |
                 _: java.io.IOException => null
          }
        if (in == null) fallback(bytes, dim)
        else {
          val f = in.getFormat
          val pcm = in.readAllBytes(); in.close()
          val sixteenBit = f.getSampleSizeInBits == 16
          val n = if (sixteenBit) pcm.length / 2 else pcm.length
          val acc = new Array[Float](dim)
          if (n > 0) {
            var i = 0
            while (i < n) {
              val s =
                if (sixteenBit) {
                  val lo = pcm(2 * i) & 0xFF
                  val hi = pcm(2 * i + 1).toInt
                  ((hi << 8) | lo).toShort.toDouble / 32768.0
                } else pcm(i).toDouble / 128.0
              val w = (i.toLong * dim / n).toInt
              acc(w) += (s * s).toFloat
              i += 1
            }
            var w = 0
            while (w < dim) {
              acc(w) = math.sqrt(acc(w) / math.max(1, n / dim)).toFloat
              w += 1
            }
          }
          val norm = math.sqrt(acc.map(v => v * v.toDouble).sum).toFloat
          if (norm == 0f) acc else acc.map(_ / norm)
        }
      }
    }

  /** Parsed AVI container: header dims + the (offset, length) of every
    * video frame chunk in the `movi` list. RIFF/AVI is the one video
    * container a pure-JDK parser can handle (fixed little-endian chunk
    * grammar; MJPEG frames decode via `javax.imageio`).
    */
  private case class AviInfo(width: Int, height: Int,
    frames: IndexedSeq[(Int, Int)])

  /** Minimal RIFF walk: returns None unless `bytes` is a RIFF/AVI file
    * with an `avih` header. Frames are chunks whose fourcc ends in
    * "dc"/"db" (compressed/uncompressed video) inside any LIST. Defensive
    * on truncated/garbage input — any structural violation → None.
    */
  private def parseAvi(bytes: Array[Byte]): Option[AviInfo] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 24 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var avih = -1
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    def walk(from: Int, until: Int): Boolean = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(p)
        val sz = le32(p + 4)
        if (sz < 0 || p + 8 + sz > until) return false
        if (id == "LIST") {
          if (sz < 4 || !walk(p + 12, p + 8 + sz)) return false
        } else if (id == "avih") avih = p + 8
        else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")))
          frames += ((p + 8, sz))
        p += 8 + sz + (sz & 1) // chunks pad to even length
      }
      true
    }
    if (!walk(12, math.min(bytes.length, 8 + le32(4)))) return None
    if (avih < 0 || avih + 40 > bytes.length) return None
    Some(AviInfo(le32(avih + 32), le32(avih + 36), frames.result()))
  }

  /** REAL video codec for RIFF/AVI (round 8, pure JDK): parses the
    * container and reports the true header width/height and frame
    * count. Non-AVI payloads (MP4/MKV — no JDK demuxer exists) fall
    * back to the deterministic [[stubCodec]], so mixed batches decode
    * in one pass like [[imageCodec]]'s.
    */
  def videoCodec: () => (Long, Array[Byte]) => DecodedMeta =
    () => {
      val fallback = stubCodec()
      (id, bytes) =>
        parseAvi(bytes) match {
          case Some(a) => DecodedMeta(id, bytes.length, a.width, a.height,
            a.frames.length)
          case None => fallback(id, bytes)
        }
    }

  /** One sampled frame of a (video-ish) payload. */
  case class SampledFrame(doc_id: Long, frame_idx: Int, byte_offset: Long,
    frame_digest: Long)

  /** Frame sampling over `(id, payload)` — the 1:N generator shape: each
    * payload fans out to `everyNth`-strided frames, so output cardinality
    * is a MULTIPLE of input (size your shuffle partitions for the
    * post-sample row count, not the input's). Same per-partition codec
    * amortization as [[decodePartitions]]; the iterator is lazy end to
    * end, so a 10 MB payload's frames stream out without buffering the
    * whole fan-out in memory.
    */
  def sampleFramesPartitions(df: DataFrame, idCol: String, payloadCol: String,
      everyNth: Int)(
      codecFactory: () => (Long, Array[Byte], Int) => Iterator[SampledFrame])
      : Dataset[SampledFrame] = {
    import df.sparkSession.implicits._
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val sample = codecFactory()
        it.flatMap { case (id, bytes) => sample(id, bytes, everyNth) }
      }
  }

  /** Deterministic stub frame sampler: pretends each 256-byte run is a
    * frame, keeps every `everyNth`, digests it with a rolling hash — the
    * slot where a real demuxer seeks keyframes.
    */
  def stubFrameCodec: () => (Long, Array[Byte], Int) => Iterator[SampledFrame] =
    () => (id, bytes, everyNth) => {
      val nFrames = math.max(1, bytes.length / 256)
      Iterator.range(0, nFrames, everyNth).map { i =>
        val from = i * 256
        val until = math.min(bytes.length, from + 256)
        var h = 1125899906842597L
        var j = from
        while (j < until) { h = 31 * h + bytes(j); j += 1 }
        SampledFrame(id, i, from.toLong, h)
      }
    }

  /** REAL frame sampler for RIFF/AVI (round 8): walks the container's
    * actual video chunks, keeps every `everyNth`, and reports each kept
    * frame's TRUE byte offset plus the rolling digest of its bytes —
    * the kept offsets/lengths are exactly what a downstream MJPEG
    * decode stage (`javax.imageio` on the chunk slice) consumes.
    * Non-AVI payloads fall back to [[stubFrameCodec]]'s strided runs.
    */
  def videoFrameCodec: () => (Long, Array[Byte], Int) => Iterator[SampledFrame] =
    () => {
      val fallback = stubFrameCodec()
      (id, bytes, everyNth) =>
        parseAvi(bytes) match {
          case Some(a) =>
            Iterator.range(0, a.frames.length, everyNth).map { i =>
              val (off, len) = a.frames(i)
              var h = 1125899906842597L
              var j = off
              while (j < off + len) { h = 31 * h + bytes(j); j += 1 }
              SampledFrame(id, i, off.toLong, h)
            }
          case None => fallback(id, bytes, everyNth)
        }
    }

  /** Binary-in/binary-OUT transform — the resize/transcode shape: the
    * output column is a new payload (plus its new dims), not metadata,
    * so downstream stages keep operating on opaque bytes. Same
    * per-partition codec amortization; output bytes can be smaller OR
    * larger than input, which is why the write side of a resize job
    * sizes `maxRecordsPerFile`/partitions on the OUTPUT payload size.
    */
  def transformPayloadPartitions(df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int)(
      codecFactory: () => (Array[Byte], Int, Int) => Array[Byte]): DataFrame = {
    import df.sparkSession.implicits._
    require(targetW > 0 && targetH > 0, s"bad target dims ${targetW}x$targetH")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val resize = codecFactory()
        it.map { case (id, bytes) => (id, resize(bytes, targetW, targetH), targetW, targetH) }
      }
      .toDF("doc_id", "payload", "width", "height")
  }

  /** Deterministic stub resizer: emits a payload proportional to the
    * target pixel count by cycling the source bytes — byte-count
    * behavior (shrink or grow) mirrors a real scaler; a real image
    * library replaces the lambda wholesale.
    */
  def stubResizeCodec: () => (Array[Byte], Int, Int) => Array[Byte] =
    () => (bytes, w, h) => {
      val n = math.max(1, (w * h) / 64)
      Array.tabulate[Byte](n)(i => if (bytes.isEmpty) 0 else bytes(i % bytes.length))
    }

  /** REAL image resizer on `javax.imageio` + headless AWT: decode →
    * Graphics2D bilinear scale to (w, h) → re-encode as PNG bytes.
    * Non-image payloads fall back to [[stubResizeCodec]] so video rows
    * pass through the same stage untouched by the image path.
    */
  def imageResizeCodec: () => (Array[Byte], Int, Int) => Array[Byte] =
    () => {
      val fallback = stubResizeCodec()
      (bytes, w, h) => {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException | _: RuntimeException => null }
        if (img == null) fallback(bytes, w, h)
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    }

  /** Per-payload embedding extraction — the feature-extract shape that
    * feeds the ANN family (q34/q35/q49): payload → fixed-width float
    * vector, codec init amortized per partition, output directly
    * joinable with the `embeddings` table operators.
    */
  def extractFeaturesPartitions(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int)(
      codecFactory: () => (Array[Byte], Int) => Array[Float])
      : DataFrame = {
    import df.sparkSession.implicits._
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val embed = codecFactory()
        it.map { case (id, bytes) => (id, embed(bytes, dim)) }
      }
      .toDF("vec_id", "embedding")
  }

  /** Deterministic stub featurizer: byte histogram folded into `dim`
    * L2-normalized buckets — the slot where a real vision/audio encoder
    * (ONNX runtime etc.) plugs in.
    */
  def stubFeatureCodec: () => (Array[Byte], Int) => Array[Float] =
    () => (bytes, dim) => {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc((bytes(i) & 0xFF) % dim) += 1f; i += 1 }
      val norm = math.sqrt(acc.map(v => v * v.toDouble).sum).toFloat
      if (norm == 0f) acc else acc.map(_ / norm)
    }

  /** Deterministic synthetic PNG: a real `javax.imageio`-encoded image of
    * the requested dimensions with a doc-derived pixel pattern. Library
    * entry point for codec-conformance harnesses (q151) and fixture
    * generation — the only way its output round-trips to the right
    * dimensions is for the full encode→decode path to work.
    */
  def syntheticPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV: 16-bit mono PCM square wave, written
    * through the JDK's own RIFF/WAVE encoder — real container bytes.
    */
  def syntheticWav(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v: Short = if ((i / 8) % 2 == 0) 12000 else -12000
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic RIFF/AVI: real container grammar —
    * LIST(hdrl){avih} carrying the true dims, LIST(movi) with `nFrames`
    * video chunks of doc-derived bytes. [[parseAvi]]/[[videoCodec]] and
    * any standards-conforming demuxer read the same dims/frame count.
    */
  def syntheticAvi(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ children)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(40000), 0, avih, 0, 4)    // usPerFrame
    System.arraycopy(le32(nFrames), 0, avih, 16, 4) // dwTotalFrames
    System.arraycopy(le32(w), 0, avih, 32, 4)       // dwWidth
    System.arraycopy(le32(h), 0, avih, 36, 4)       // dwHeight
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      (0 until nFrames).flatMap(i =>
        chunk("00dc", Array.tabulate[Byte](16)(j => (i * 17 + j).toByte))).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = new java.io.ByteArrayOutputStream()
    bb.write("RIFF".getBytes("US-ASCII")); bb.write(le32(body.length)); bb.write(body)
    bb.toByteArray
  }

  /** Codec-conformance gate over the REAL decoders: for a bounded,
    * deterministic doc_id slice, each executor task ENCODES genuine media
    * containers (PNG via `javax.imageio`, WAV via `javax.sound.sampled`,
    * RIFF/AVI by chunk grammar) at doc_id-derived dimensions, then DECODES
    * them back through [[imageCodec]]/[[audioCodec]]/[[videoCodec]] — the
    * production decode paths. The oracle knows only the arithmetic that
    * derived the dimensions, so the row hashes match ONLY if the real
    * encode→decode round trip is intact; a codec regression (or a silent
    * fall-through to the stub fallback, whose statistics differ) breaks
    * the gate by name. Per-partition codec init, payloads never visit the
    * driver — the exact shape a 100 TB decode job uses, at probe size.
    */
  val multimodalDecode = Q(
    "q151_multimodal_decode",
    """SELECT doc_id,
      |  CAST(8 + doc_id % 16 AS INTEGER) AS img_w,
      |  CAST(8 + (doc_id * 3) % 16 AS INTEGER) AS img_h,
      |  CAST(8000 AS INTEGER) AS sample_rate,
      |  CAST(800 + (doc_id % 16) * 40 AS BIGINT) AS audio_frames,
      |  CAST(100 + (doc_id % 16) * 5 AS BIGINT) AS duration_ms,
      |  CAST(16 + doc_id % 8 AS INTEGER) AS vid_w,
      |  CAST(9 + doc_id % 8 AS INTEGER) AS vid_h,
      |  CAST(1 + doc_id % 5 AS INTEGER) AS vid_frames
      |FROM documents WHERE doc_id < 24 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).filter(col("doc_id") < 24)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      val img = imageCodec()
      val aud = audioCodec()
      val vid = videoCodec()
      it.map { id =>
        val k = (id % 16).toInt
        val im = img(id, syntheticPng(8 + k, 8 + ((id * 3) % 16).toInt))
        val am = aud(id, syntheticWav(8000, 800 + k * 40))
        val vm = vid(id, syntheticAvi(16 + (id % 8).toInt, 9 + (id % 8).toInt,
          1 + (id % 5).toInt))
        (id, im.width, im.height, am.sample_rate, am.n_frames, am.duration_ms,
          vm.width, vm.height, vm.n_frames)
      }
    }.toDF("doc_id", "img_w", "img_h", "sample_rate", "audio_frames",
        "duration_ms", "vid_w", "vid_h", "vid_frames")
      .orderBy(col("doc_id"))
  }

  /** Binary payload ingestion + digest + stub decode metadata. */
  val multimodalMeta = Q(
    "q41_multimodal_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      |  n_chars AS char_len,
      |  sha256(text) AS digest,
      |  CAST(64 + n_chars % 512 AS INTEGER) AS width,
      |  CAST(64 + (n_chars * 7) % 512 AS INTEGER) AS height,
      |  CAST(1 + n_chars % 8 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withPayload = Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
    fakeDecodeMeta(withPayload, "payload")
      .select(col("doc_id"),
        col("byte_len"),
        col("n_chars").as("char_len"),
        sha2(col("payload"), 256).as("digest"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  val specs: Seq[Q] = Seq(multimodalMeta, multimodalDecode)
}

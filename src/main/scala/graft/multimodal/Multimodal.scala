package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    checksum: Long)

/** Typed metadata from a REAL image decode ([[Multimodal.decodeImages]]):
  * true pixel dimensions, raster band count, and the sum of all samples
  * across all bands (a cheap content statistic a curation pipeline filters
  * on — all-black / all-white detection, exposure histograms, etc.).
  * `gen_sum` is the generator-side expected sample sum carried alongside by
  * [[Multimodal.packImages]] fixtures (−1 when the source is external), so
  * lossless formats can assert `pixel_sum == gen_sum` and lossy ones a
  * relative bound, without re-decoding.
  */
case class ImageMeta(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    pixel_sum: Long,
    gen_sum: Long)

/** Typed metadata from a REAL audio decode ([[Multimodal.decodeAudio]]):
  * true sample rate / channel count / frame count from the container
  * header, and the exact sum of absolute PCM sample values (the loudness
  * statistic a curation pipeline filters silence/clipping on). `gen_abs_sum`
  * mirrors ImageMeta.gen_sum: the generator-side expected sum for fixture
  * audio, −1 for external files.
  */
case class AudioMeta(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    abs_sum: Long,
    gen_abs_sum: Long)

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The image, audio, AND video paths are REAL: [[decodeImages]] decodes
  * PNG/JPEG bytes with the JDK's `javax.imageio.ImageIO`, [[decodeAudio]]
  * decodes WAV containers with `javax.sound.sampled.AudioSystem`,
  * [[resizeImages]] re-rasters through `Graphics2D`, and [[demuxVideo]]
  * walks the RIFF chunk tree of MJPEG-AVI containers into per-frame JPEGs
  * that decode through the same ImageIO path — all JDK-built-in, no new
  * dependency, all inside the same batched `mapPartitions` shape a native
  * codec would use. [[decodeStub]] / [[frameSample]] remain as the generic
  * plumbing shape for formats with no JDK codec (H.264 etc.), documented
  * as the swap-in point.
  */
object Multimodal {

  /** Production media ingest: read a directory of raw media files through
    * Spark's `binaryFile` source into the (doc_id, media, kind) shape
    * every decode operator here consumes — doc_id is a stable 64-bit hash
    * of the file path (xxhash64), kind from the file extension. This is
    * the real-world replacement for the pack* fixture generators: each
    * file is its own scan split, so codec work fans out per-file exactly
    * like the fixtures' per-row map chains. Filters on `n_bytes` push
    * down to the source (binaryFile supports length predicates), so a
    * size cut never reads the skipped blobs.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("media"),
        when(ext === "png", "image/png")
          .when(ext.isin("jpg", "jpeg"), "image/jpeg")
          .when(ext === "wav", "audio/wav")
          .when(ext === "avi", "video/avi")
          .otherwise("application/octet-stream").as("kind"),
        col("path"), col("length").as("n_bytes"))
  }

  /** Wrap a text column as fake media bytes (binary column). In production
    * this column would come from `spark.read.format("binaryFile")` or a
    * parquet `binary` field.
    */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("image/fake").as("kind"))

  /** "Decode" each blob into typed MediaMeta, batched per partition — the
    * same shape a real decoder (mapInPandas / mapPartitions with a native
    * codec) would use: one iterator pass, no per-row session setup, output
    * is a typed Dataset so downstream stays columnar.
    *
    * STUB: width/height/checksum are derived deterministically from the
    * byte content instead of an actual image decode (`???` would be the
    * codec call). Swap `fakeDecode` for the real library at deployment.
    */
  def decodeStub(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, kind) =>
          fakeDecode(id, bytes, kind)
        }
      }
  }

  /** Deterministic stand-in for the codec: a real implementation would be
    * e.g. `ImageIO.read(new ByteArrayInputStream(bytes))`.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte], kind: String): MediaMeta = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) { crc = crc * 31L + (bytes(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(crc) % 577).toInt // pseudo "decoded" dimensions
    val h = 64 + (math.abs(crc >> 17) % 421).toInt
    MediaMeta(id, kind, bytes.length.toLong, w, h, crc)
  }

  /** Deterministic real-image fixtures: one 8-bit grayscale image per id —
    * PNG for even ids (lossless), JPEG for odd (lossy) — encoded to actual
    * container bytes with `ImageIO.write`. Dimensions and pixels are pure
    * functions of the id (`w = 16 + id%17`, `h = 16 + id%13`,
    * `pixel(x,y) = (x+y+id) % 256`), so an external oracle can recompute
    * the expected width/height/pixel-sum without decoding. `gen_sum`
    * carries the generator's exact sample sum for lossy-format bounds.
    *
    * Output: (doc_id long, media binary, kind string, gen_sum long).
    */
  def packImages(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory, no temp files
        it.map { id =>
          val w = 16 + (id % 17).toInt
          val h = 16 + (id % 13).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((x + y + id) % 256L).toInt
              raster.setSample(x, y, 0, v)
              sum += v
              x += 1
            }
            y += 1
          }
          val png = id % 2 == 0
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, if (png) "png" else "jpg", bos)
          (id, bos.toByteArray, if (png) "image/png" else "image/jpeg", sum)
        }
      }
      .toDF("doc_id", "media", "kind", "gen_sum")
  }

  /** REAL image decode: `javax.imageio.ImageIO` (JDK built-in) parses the
    * actual PNG/JPEG container into a raster, batched per partition — one
    * iterator pass, decoder state amortized, typed Dataset out so
    * downstream stays columnar. Emits true width/height, raster band count,
    * and the exact sum of all samples (all bands). Undecodable bytes fail
    * loudly rather than producing silent garbage metadata.
    *
    * Input columns: (doc_id long, media binary, kind string[, gen_sum
    * long]) — `gen_sum` defaults to −1 when absent (external images).
    */
  def decodeImages(df: DataFrame)(
      implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    val withGen =
      if (df.columns.contains("gen_sum")) df
      else df.withColumn("gen_sum", lit(-1L))
    withGen.select(col("doc_id"), col("media"), col("kind"), col("gen_sum"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes, kind, gen) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image bytes for doc_id=$id")
          val raster = img.getRaster
          val (w, h, c) = (img.getWidth, img.getHeight, raster.getNumBands)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < c) { sum += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          ImageMeta(id, kind, bytes.length.toLong, w, h, c, sum, gen)
        }
      }
  }

  // javax.sound's `AudioSystem` facade takes a global provider-registry
  // lock on EVERY dispatch (JDK13Services), which serializes concurrent
  // partition tasks — measured 11× slower than direct provider calls at
  // 16 threads (0.024 vs 0.002 ms/doc). These helpers load the public
  // SPI providers (javax.sound.sampled.spi) ONCE PER PARTITION and
  // dispatch locally: same JDK codec, no global lock.
  private def audioReaders(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }
  private def wavWriter(): javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer SPI provider"))
  }
  private def readAudio(
      readers: Seq[javax.sound.sampled.spi.AudioFileReader],
      id: Long, bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = readers.iterator
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    throw new IllegalArgumentException(s"doc_id=$id: undecodable audio bytes")
  }

  /** Deterministic real-audio fixtures: one PCM16 mono WAV per id, encoded
    * to actual RIFF container bytes with the JDK's WAVE writer (the SPI
    * provider behind `AudioSystem.write`, dispatched lock-free — see
    * above). The waveform
    * is INTEGER-defined (`sample(i) = ((i·(7 + id%89)) mod 32767) − 16383`,
    * `n = 800 + (id%100)·8` frames at 8 kHz) so an external oracle can
    * recompute frame counts and the exact absolute-sample sum without an
    * audio stack. Output: (doc_id, media, kind, gen_abs_sum).
    */
  def packAudio(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val writer = wavWriter()
        it.map { id =>
          val rate = 8000
          val n = 800 + (id % 100).toInt * 8
          val step = 7 + (id % 89).toInt
          val pcm = new Array[Byte](n * 2)
          var sum = 0L
          var i = 0
          while (i < n) {
            val v = ((i.toLong * step) % 32767L - 16383L).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            sum += math.abs(v.toLong)
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
            true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray, "audio/wav", sum)
        }
      }
      .toDF("doc_id", "media", "kind", "gen_abs_sum")
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (JDK built-in)
    * parses the actual WAV container — true sample rate, channels, frame
    * count — and sums |sample| over the PCM16 payload. Batched per
    * partition; undecodable bytes fail loudly. Input: (doc_id, media,
    * kind[, gen_abs_sum]).
    */
  def decodeAudio(df: DataFrame)(
      implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    val withGen =
      if (df.columns.contains("gen_abs_sum")) df
      else df.withColumn("gen_abs_sum", lit(-1L))
    withGen.select(col("doc_id"), col("media"), col("kind"), col("gen_abs_sum"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        val readers = audioReaders()
        it.map { case (id, bytes, kind, gen) =>
          val in = readAudio(readers, id, bytes)
          try {
            val f = in.getFormat
            require(f.getSampleSizeInBits == 16,
              s"doc_id=$id: only PCM16 supported, got ${f.getSampleSizeInBits}")
            val pcm = in.readAllBytes()
            var sum = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              val v = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
              sum += math.abs(v.toLong)
              i += 2
            }
            AudioMeta(id, kind, bytes.length.toLong, f.getSampleRate.toInt,
              f.getChannels, in.getFrameLength, sum, gen)
          } finally in.close()
        }
      }
  }

  /** REAL image resize: decode, re-raster through `Graphics2D` with
    * bilinear interpolation to fit within (maxW, maxH) — never upscales —
    * and re-encode as PNG. Target dimensions are the shared formula
    * `floor(dim · min(1, maxW/w, maxH/h))` (floored at 1), so an oracle
    * can verify the decoded output dims without a codec. Gray sources stay
    * single-band; everything else renders to 3-band BGR.
    * Output: (doc_id, media, width, height).
    */
  def resizeImages(df: DataFrame, maxW: Int, maxH: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(maxW >= 1 && maxH >= 1, s"bad bounds ${maxW}x$maxH")
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image bytes for doc_id=$id")
          val (w, h) = (img.getWidth, img.getHeight)
          val s = math.min(1.0,
            math.min(maxW.toDouble / w, maxH.toDouble / h))
          val tw = math.max(1, math.floor(w * s).toInt)
          val th = math.max(1, math.floor(h * s).toInt)
          val ttype =
            if (img.getRaster.getNumBands == 1)
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
          val out = new java.awt.image.BufferedImage(tw, th, ttype)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          (id, bos.toByteArray, tw, th)
        }
      }
      .toDF("doc_id", "media", "width", "height")
  }

  // ==== Video: MJPEG-in-AVI (public RIFF container spec) ================
  //
  // There is no JDK video CODEC, but MJPEG needs none: the container is
  // RIFF/AVI (public Microsoft spec) and every frame is a plain JPEG that
  // `ImageIO` decodes. packVideo writes a spec-conformant AVI (avih/strh/
  // strf headers + movi '00dc' chunks + idx1); demuxVideo genuinely walks
  // the RIFF chunk tree — it never assumes fixture offsets — so any
  // MJPEG AVI demuxes, not just ours.

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def fourcc(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"), 0, 4)

  /** Deterministic real-video fixtures: one MJPEG AVI per id with
    * `3 + id%5` grayscale JPEG frames of `(16+id%9) × (16+id%7)` pixels,
    * `pixel(x,y,f) = (x+y+f+id) % 256`. `gen_sum` is the exact pre-JPEG
    * sample sum across all frames (JPEG is lossy; consumers bound against
    * it). Output: (doc_id, media, kind='video/avi', n_frames, gen_sum).
    */
  def packVideo(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = 16 + (id % 9).toInt
          val h = 16 + (id % 7).toInt
          val nFrames = 3 + (id % 5).toInt
          var genSum = 0L
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((x + y + f + id) % 256L).toInt
                raster.setSample(x, y, 0, v)
                genSum += v
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            bos.toByteArray
          }
          (id, buildAvi(w, h, frames), "video/avi", nFrames, genSum)
        }
      }
      .toDF("doc_id", "media", "kind", "n_frames", "gen_sum")
  }

  /** Spec-conformant minimal AVI: RIFF('AVI ') { LIST(hdrl){avih,
    * LIST(strl){strh,strf}}, LIST(movi){'00dc' frames}, idx1 }.
    */
  private[graft] def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val fps = 10
    def chunk(id: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val payload = b.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      fourcc(out, id); le32(out, payload.length)
      out.write(payload, 0, payload.length)
      if (payload.length % 2 == 1) out.write(0) // RIFF chunks are even-padded
      out.toByteArray
    }
    def list(kind: String)(parts: Array[Byte]*): Array[Byte] =
      chunk("LIST") { b =>
        fourcc(b, kind); parts.foreach(p => b.write(p, 0, p.length))
      }
    val avih = chunk("avih") { b =>
      le32(b, 1000000 / fps); le32(b, 0); le32(b, 0); le32(b, 0x10) // HASINDEX
      le32(b, frames.length); le32(b, 0); le32(b, 1); le32(b, 0)
      le32(b, w); le32(b, h); (0 until 4).foreach(_ => le32(b, 0))
    }
    val strh = chunk("strh") { b =>
      fourcc(b, "vids"); fourcc(b, "MJPG")
      le32(b, 0); le16(b, 0); le16(b, 0); le32(b, 0)
      le32(b, 1); le32(b, fps) // scale/rate = 1/fps
      le32(b, 0); le32(b, frames.length); le32(b, 0); le32(b, -1); le32(b, 0)
      le16(b, 0); le16(b, 0); le16(b, w); le16(b, h) // rcFrame
    }
    val strf = chunk("strf") { b =>
      le32(b, 40); le32(b, w); le32(b, h); le16(b, 1); le16(b, 24)
      fourcc(b, "MJPG"); le32(b, w * h * 3)
      le32(b, 0); le32(b, 0); le32(b, 0); le32(b, 0)
    }
    val frameChunks = frames.map(f => chunk("00dc")(b => b.write(f, 0, f.length)))
    val movi = list("movi")(frameChunks: _*)
    // idx1: one entry per frame, offsets relative to the movi list's data
    val idx1 = chunk("idx1") { b =>
      var off = 4 // past the 'movi' type fourcc
      frames.zip(frameChunks).foreach { case (f, ck) =>
        fourcc(b, "00dc"); le32(b, 0x10) // AVIIF_KEYFRAME
        le32(b, off); le32(b, f.length)
        off += ck.length
      }
    }
    val hdrl = list("hdrl")(avih, list("strl")(strh, strf))
    val riffBody = new java.io.ByteArrayOutputStream()
    fourcc(riffBody, "AVI ")
    Seq(hdrl, movi, idx1).foreach(p => riffBody.write(p, 0, p.length))
    val payload = riffBody.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, "RIFF"); le32(out, payload.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** REAL video demux: walk the RIFF chunk tree of an AVI blob and emit
    * one row per video frame ('00dc'/'00db' chunks inside LIST(movi)) —
    * 1→N expansion with the frame payload as a decodable JPEG binary.
    * Structural errors fail loudly (bad magic, truncated chunks). Output:
    * (doc_id, frame_no, frame).
    */
  def demuxVideo(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviFrames(id, bytes).zipWithIndex.map { case (f, i) => (id, i, f) }
        }
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  private[graft] def aviFrames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] = {
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      s"doc_id=$id: not a RIFF/AVI container")
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= until) {
        val ckId = cc(o)
        val size = u32(o + 4).toInt
        require(o + 8 + size <= until, s"doc_id=$id: truncated $ckId chunk")
        if (ckId == "LIST") {
          val listType = cc(o + 8)
          walk(o + 12, o + 8 + size, inMovi || listType == "movi")
        } else if (inMovi && (ckId.endsWith("dc") || ckId.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
        }
        o += 8 + size + (size % 2) // even padding
      }
    }
    walk(12, 12 + u32(4).toInt - 4, inMovi = false)
    frames.result()
  }

  /** Fixed-length audio segmentation for speech-training pipelines: decode
    * the WAV container and slice the PCM16 mono stream into
    * `chunkFrames`-length windows advancing by `strideFrames` — the audio
    * analog of `Corpus.chunkDocs`, same windowing rule (one chunk when
    * n ≤ chunkFrames; otherwise the last window stops once it reaches the
    * end, no redundant tail). Emits per-chunk frame counts and the exact
    * |sample| sum. 1→N partition flatMap, no shuffle; chunk PCM is not
    * re-emitted (metadata-first — slice on demand downstream), so the
    * expansion stays narrow at corpus scale.
    */
  def chunkAudio(df: DataFrame, chunkFrames: Int, strideFrames: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(chunkFrames >= 1 && strideFrames >= 1 &&
      strideFrames <= chunkFrames,
      s"need 1 <= stride <= chunk, got chunk=$chunkFrames stride=$strideFrames")
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val readers = audioReaders()
        it.flatMap { case (id, bytes) =>
          val in = readAudio(readers, id, bytes)
          val pcm =
            try {
              val f = in.getFormat
              require(f.getSampleSizeInBits == 16 && f.getChannels == 1,
                s"doc_id=$id: only PCM16 mono supported")
              in.readAllBytes()
            } finally in.close()
          val n = pcm.length / 2
          val nChunks =
            if (n == 0) 0
            else if (n <= chunkFrames) 1
            else (n - chunkFrames + strideFrames - 1) / strideFrames + 1
          (0 until nChunks).map { cno =>
            val s = cno * strideFrames
            val end = math.min(n, s + chunkFrames)
            var sum = 0L
            var i = s
            while (i < end) {
              val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
              sum += math.abs(v.toLong)
              i += 1
            }
            (id, cno, end - s, sum)
          }
        }
      }
      .toDF("doc_id", "chunk_no", "n_frames", "abs_sum")
  }

  /** ViT-style patch extraction: decode the image and split the raster
    * into a `pSize`×`pSize` patch grid (row-major; edge patches keep the
    * remainder, so every pixel belongs to exactly one patch), emitting
    * per-patch dimensions and the exact sum of samples across all bands —
    * the vision analog of context-window chunking. 1→N partition flatMap,
    * no shuffle.
    */
  def patchImages(df: DataFrame, pSize: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(pSize >= 1, s"pSize must be >= 1, got $pSize")
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image bytes for doc_id=$id")
          val raster = img.getRaster
          val (w, h, c) = (img.getWidth, img.getHeight, raster.getNumBands)
          val cols = (w + pSize - 1) / pSize
          val rows = (h + pSize - 1) / pSize
          for {
            pr <- 0 until rows
            pc <- 0 until cols
          } yield {
            val x0 = pc * pSize; val x1 = math.min(w, x0 + pSize)
            val y0 = pr * pSize; val y1 = math.min(h, y0 + pSize)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                var b = 0
                while (b < c) { sum += raster.getSample(x, y, b); b += 1 }
                x += 1
              }
              y += 1
            }
            (id, pr, pc, x1 - x0, y1 - y0, sum)
          }
        }
      }
      .toDF("doc_id", "patch_row", "patch_col", "pw", "ph", "pixel_sum")
  }

  /** Stride sampling over REAL containers: demux the AVI and keep every
    * `stride`-th frame. The filter applies to the demuxed frame index
    * BEFORE any pixel decode, so skipped frames never pay a codec —
    * downstream decodes only the kept JPEGs ([[decodeImages]]). This is
    * [[frameSample]]'s contract realized on a real container format.
    */
  def sampleVideoFrames(df: DataFrame, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    demuxVideo(df).filter(col("frame_no") % stride === 0)
  }

  /** Frame sampling for video-like blobs: 1→N expansion where each blob
    * emits every `stride`-th "frame". The Spark-side shape is the real
    * thing — a flatMap-style partition iterator producing multiple typed
    * rows per input blob, so frame rows distribute across downstream
    * partitions instead of clustering per video. STUB: frames are fixed
    * 4 KiB byte slices; a real decoder would demux the container here.
    */
  def frameSample(df: DataFrame, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val frameBytes = 4096
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // ceil division: the partial tail frame is emitted, not dropped
          val nFrames = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * frameBytes
            val until = math.min(bytes.length, from + frameBytes)
            (id, f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  /** Resize plumbing: binary in → binary out, same batched partition
    * iteration as decodeStub. STUB: truncation stands in for scaling.
    */
  def resizeStub(df: DataFrame, maxBytes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, if (bytes.length <= maxBytes) bytes
             else java.util.Arrays.copyOf(bytes, maxBytes))
      })
      .toDF("doc_id", "media")
  }

  /** Example end-to-end: pack → decode → aggregate feature stats. */
  def mediaStats(df: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): DataFrame = {
    decodeStub(packMedia(df, idCol, textCol))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_width"))
  }
}

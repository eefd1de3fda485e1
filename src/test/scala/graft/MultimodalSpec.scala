package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withBlobMeta yields byte length and stable sha256") {
    val df = Seq((1L, "abc")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val r = BinaryOps.withBlobMeta(df, "blob").head()
    assert(r.getAs[Long]("n_bytes") == 3L)
    assert(r.getAs[String]("sha256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("decodeImageStub is deterministic and in range") {
    val df = Seq((1L, "some media bytes"), (2L, "some media bytes")).toDF("id", "s")
      .withColumn("meta", BinaryOps.decodeImageStub(BinaryOps.toBlob($"s")))
      .select($"meta.width", $"meta.height", $"meta.channels")
    val rows = df.collect()
    assert(rows(0) == rows(1)) // same bytes -> same fake dims
    val w = rows(0).getInt(0)
    assert(w >= 1 && w <= 1920)
  }

  test("sampleFrames emits one row per stride offset") {
    val df = Seq((1L, "0123456789")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val n = BinaryOps.sampleFrames(df, "id", "blob", 4).count()
    assert(n == 3) // offsets 0,4,8
  }

  test("byteHistogram buckets every byte exactly once") {
    val df = Seq((1L, "abcd")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val row = BinaryOps.byteHistogram(df, "id", "blob").head()
    val total = (1 until row.length).map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
    assert(total == 4L)
  }
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("decodeImages reads real PNG bytes; corrupt blobs yield null metadata") {
    val rows = Seq(
      (1L, pngBytes(8, 6, 0xffffff)),       // white
      (2L, pngBytes(4, 4, 0x000000)),       // black
      (3L, "not an image".getBytes("UTF-8")))
    val df = rows.toDF("id", "blob")
    val out = BinaryOps.decodeImages(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 8 && out(1L).getInt(2) == 6)
    assert(math.abs(out(1L).getDouble(4) - 255.0) < 1e-6) // white luma
    assert(out(2L).getDouble(4) == 0.0)                   // black luma
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(4))    // corrupt lane
  }

  test("resizeImages produces decodable thumbs at the target size") {
    val df = Seq((1L, pngBytes(32, 16, 0x336699))).toDF("id", "blob")
    val out = BinaryOps.resizeImages(df, "id", "blob", thumbW = 8, thumbH = 4)
      .head()
    assert(out.getInt(1) == 8 && out.getInt(2) == 4)
    val thumb = out.getAs[Array[Byte]]("thumb")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumb))
    assert(back.getWidth == 8 && back.getHeight == 4)
    // solid-color input -> solid-color thumbnail
    assert((back.getRGB(3, 2) & 0xffffff) == 0x336699)
  }

  test("resizeBatchedStub preserves rows and bounds thumbnails via batched mapPartitions") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
      .select(col("doc_id"), graft.multimodal.BinaryOps.toBlob(col("text")).as("blob"))
    val out = graft.multimodal.BinaryOps.resizeBatchedStub(docs, "doc_id", "blob",
      thumbBytes = 16, batchSize = 8)
    assert(out.count() == 100)
    assert(out.where(length(col("thumb")) > 16).count() == 0)
    assert(out.where(col("n_bytes") <= 0).count() == 0)
  }

  /** Synthesized sine clip written through the JDK's own encoder. */
  private def sineBytes(fileType: javax.sound.sampled.AudioFileFormat.Type,
                        rate: Float, channels: Int, amp: Double,
                        frames: Int, bigEndian: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, 2 * channels, rate, bigEndian)
    val pcm = new Array[Byte](frames * 2 * channels)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until frames; _ <- 0 until channels)
      bb.putShort(math.round(
        amp * 32767.0 * math.sin(2 * math.Pi * i / 100.0)).toShort)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  test("decodeAudio reads real WAV/AIFF bytes; corrupt blobs yield null metadata") {
    import javax.sound.sampled.AudioFileFormat.Type
    val rows = Seq(
      (1L, sineBytes(Type.WAVE, 44100f, 1, 0.5, 44100, bigEndian = false)),
      (2L, sineBytes(Type.AIFF, 8000f, 2, 0.25, 4000, bigEndian = true)),
      (3L, "not audio at all".getBytes("UTF-8")))
    val out = BinaryOps.decodeAudio(rows.toDF("id", "blob"), "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    // columns: id, sample_rate, channels, sample_bits, n_frames,
    //          duration_sec, mean_abs, rms
    val w = out(1L)
    assert(w.getDouble(1) == 44100.0 && w.getInt(2) == 1 && w.getInt(3) == 16)
    assert(w.getLong(4) == 44100L && math.abs(w.getDouble(5) - 1.0) < 1e-9)
    // mean |A sin| = 2A/pi; rms = A/sqrt(2) (100-sample periods divide evenly)
    assert(math.abs(w.getDouble(6) - 2 * 0.5 / math.Pi) < 1e-3)
    assert(math.abs(w.getDouble(7) - 0.5 / math.sqrt(2.0)) < 1e-3)
    val a = out(2L)
    assert(a.getDouble(1) == 8000.0 && a.getInt(2) == 2)
    assert(a.getLong(4) == 4000L && math.abs(a.getDouble(5) - 0.5) < 1e-9)
    assert(math.abs(a.getDouble(6) - 2 * 0.25 / math.Pi) < 1e-3)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(6)) // corrupt lane
  }

  test("decodeAudio converts non-PCM (u-law AU) through the JDK chain") {
    import javax.sound.sampled._
    // synthesize PCM16 then re-encode as 8-bit u-law in an AU container
    val pcmBytes = sineBytes(AudioFileFormat.Type.AU, 8000f, 1, 0.5, 8000,
      bigEndian = true)
    val pcmStream = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(pcmBytes))
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1,
      8000f, false)
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt, pcmStream)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.AU, bos)
    val out = BinaryOps.decodeAudio(
      Seq((1L, bos.toByteArray)).toDF("id", "blob"), "id", "blob").head()
    assert(out.getDouble(1) == 8000.0 && out.getInt(2) == 1 && out.getInt(3) == 8)
    // u-law is log-compressed 8-bit: loose tolerance on the sine stats
    assert(math.abs(out.getDouble(6) - 2 * 0.5 / math.Pi) < 0.01)
  }

  /** Minimal MJPEG AVI writer: RIFF('AVI ' LIST('hdrl' avih) LIST('movi'
    * 00dc-chunks)). Enough structure for any RIFF-walking reader; frames
    * are standalone JPEGs. */
  private def mjpegAvi(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ data)
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) // dwMicroSecPerFrame .. dwTotalFrames @ offset 16
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  test("decodeVideoFrames samples MJPEG AVI frames; corrupt blobs yield null") {
    // clip 1: 6 frames dark->bright; clip 2: 2 white frames; clip 3: junk
    val ramp = (0 until 6).map(i => jpegBytes(32, 24, 0x010101 * (i * 40)))
    val avi1 = mjpegAvi(ramp, fps = 25)
    val avi2 = mjpegAvi(Seq.fill(2)(jpegBytes(16, 8, 0xffffff)), fps = 10)
    val df = Seq((1L, avi1), (2L, avi2),
      (3L, "definitely not a riff".getBytes("UTF-8"))).toDF("id", "blob")
    val out = BinaryOps.decodeVideoFrames(df, "id", "blob", everyK = 2)
      .collect().map(r => (r.getLong(0), r.get(1)) -> r).toMap
    // clip 1: frames 0,2,4 sampled of 6; container meta on every row
    val c1 = (0 until 6 by 2).map(i => out((1L, i)))
    assert(c1.forall(r => r.getInt(2) == 32 && r.getInt(3) == 24))
    assert(c1.forall(r => r.getLong(5) == 6L &&
      math.abs(r.getDouble(6) - 25.0) < 1e-9))
    // luma increases along the brightness ramp
    val lumas = c1.map(_.getDouble(4))
    assert(lumas == lumas.sorted && lumas.distinct.length == lumas.length)
    // clip 2: only frame 0 sampled (everyK=2 of 2 frames), white luma
    assert(!out.contains((2L, 1)) &&
      math.abs(out((2L, 0)).getDouble(4) - 255.0) < 2.0) // jpeg lossy
    // corrupt lane: one all-null row
    val bad = out((3L, null))
    assert(bad.isNullAt(2) && bad.isNullAt(4) && bad.isNullAt(5))
  }

  private def rgbImage(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    im
  }

  /** Animated GIF via the JDK's own ImageIO sequence writer, per-frame
    * delay set through the GraphicControlExtension metadata node
    * (delayTime in centiseconds — what decodeGifFrames reads back). */
  private def animatedGif(frames: Seq[java.awt.image.BufferedImage],
                          delayCs: Int): Array[Byte] =
    animatedGifVar(frames.map(f => (f, delayCs)))

  /** Variable-delay variant: per-frame (image, delayCs) pairs. */
  private def animatedGifVar(
      framesWithDelay: Seq[(java.awt.image.BufferedImage, Int)]): Array[Byte] = {
    val frames = framesWithDelay
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    writer.prepareWriteSequence(null)
    frames.foreach { case (im, delayCs) =>
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(im), param)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val existing = root.getElementsByTagName("GraphicControlExtension")
      val gce =
        if (existing.getLength > 0)
          existing.item(0).asInstanceOf[IIOMetadataNode]
        else {
          val n = new IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n); n
        }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(im, null, meta), param)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("decodeGifFrames samples animated-GIF frames; corrupt blobs yield null") {
    // clip 1: 4 gray-ramp frames at 10 cs -> 10 fps; clip 2: one frame,
    // delay 0 -> fps null; clip 3: junk
    val gif1 = animatedGif(
      Seq(0, 60, 120, 180).map(v => rgbImage(32, 24, 0x010101 * v)), 10)
    val gif2 = animatedGif(Seq(rgbImage(16, 8, 0xffffff)), 0)
    val df = Seq((1L, gif1), (2L, gif2),
      (3L, "definitely not a gif".getBytes("UTF-8"))).toDF("id", "blob")
    val out = BinaryOps.decodeGifFrames(df, "id", "blob", everyK = 2)
      .collect().map(r => (r.getLong(0), r.get(1)) -> r).toMap
    // clip 1: frames 0 and 2 sampled of 4; container meta on every row
    val c1 = Seq(0, 2).map(i => out((1L, i)))
    assert(!out.contains((1L, 1)) && !out.contains((1L, 3)))
    assert(c1.forall(r => r.getInt(2) == 32 && r.getInt(3) == 24))
    assert(c1.forall(r => r.getLong(5) == 4L &&
      math.abs(r.getDouble(6) - 10.0) < 1e-9))
    // luma rises along the gray ramp (GIF palettizes; solid grays exact-ish)
    val lumas = c1.map(_.getDouble(4))
    assert(lumas == lumas.sorted && lumas.distinct.length == lumas.length)
    assert(math.abs(lumas.head - 0.0) < 2.0)
    // clip 2: single white frame, zero delay -> fps null
    val c2 = out((2L, 0))
    assert(c2.getInt(2) == 16 && math.abs(c2.getDouble(4) - 255.0) < 2.0)
    assert(c2.getLong(5) == 1L && c2.isNullAt(6))
    // corrupt lane: one all-null row
    val bad = out((3L, null))
    assert(bad.isNullAt(2) && bad.isNullAt(4) && bad.isNullAt(5))
  }

  test("gifTimeline records the per-frame delay list; sampleGifByTime is duration-aware") {
    // variable-delay clip: delays [5, 20, 5, 20] cs -> starts [0, 5, 25, 30]
    val gif = animatedGifVar(
      Seq(0, 60, 120, 180).map(v => rgbImage(32, 24, 0x010101 * v))
        .zip(Seq(5, 20, 5, 20)))
    val df = Seq((1L, gif),
      (2L, "junk".getBytes("UTF-8"))).toDF("id", "blob")
    val tl = BinaryOps.gifTimeline(df, "id", "blob").collect()
      .map(r => (r.getLong(0), r.get(1)) -> r).toMap
    val rows = Seq(0, 1, 2, 3).map(i => tl((1L, i)))
    assert(rows.map(_.getInt(2)) === Seq(5, 20, 5, 20), "delay list")
    assert(rows.map(_.getInt(3)) === Seq(0, 5, 25, 30), "start times")
    assert(rows.forall(r => r.getInt(4) == 32 && r.getInt(5) == 24))
    assert(tl((2L, null)).isNullAt(2)) // corrupt -> null lane
    // time-stride 25: boundaries 0, 25, 50 -> first frames at/past each
    // are idx 0 (t=0) and idx 2 (t=25); the 20 cs frames do NOT
    // over-sample the way everyK=2 would (which picks idx 0 and 2 too)
    // nor does the slow tail get skipped the way everyK=3 would
    val sampled = BinaryOps.sampleGifByTime(df.where($"id" === 1L),
        "id", "blob", strideCs = 25)
      .collect().map(_.getInt(1)).sorted
    assert(sampled === Array(0, 2), s"sampled ${sampled.toSeq}")
    // stride 5 keeps every frame (all starts are multiples of 5 apart)
    val all = BinaryOps.sampleGifByTime(df.where($"id" === 1L),
        "id", "blob", strideCs = 5)
      .collect().map(_.getInt(1)).sorted
    assert(all === Array(0, 1, 2, 3))
  }
}

package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaIn, JdkAudioCodec, JdkImageCodec}

/** Codec-registry seam: defaults reproduce the synthetic contract, real
  * JDK codecs swap in per modality without touching the decode operator,
  * unknown modalities fail loudly. */
class MultimodalSpec extends SparkFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(nFrames: Int, rate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](nFrames * 2)), fmt, nFrames),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("registered real codecs drive decode; synthetic default restored after") {
    val s = spark
    import s.implicits._
    val media = s.createDataset(Seq(
      MediaIn(1L, "image", png(40, 25)),
      MediaIn(2L, "audio", wav(4000, 8000))))
    Multimodal.use("image", JdkImageCodec)
    Multimodal.use("audio", JdkAudioCodec)
    try {
      val metas = Multimodal.decode(media).collect().sortBy(_.doc_id)
      assert(metas(0).width === 40L && metas(0).height === 25L)
      assert(metas(0).duration_ms === 0L)
      assert(metas(1).duration_ms === 500L) // 4000 frames @ 8kHz
    } finally Multimodal.resetCodecs()
    // back on defaults: the synthetic analytic contract
    val synth = Multimodal.decode(media).collect().sortBy(_.doc_id).head
    val n = png(40, 25).length.toLong
    assert(synth.width === 64L + n % 640L)
    assert(synth.height === 64L + (n * 7L) % 480L)
  }

  test("a payload the real codec cannot decode throws a record-level error") {
    val s = spark
    import s.implicits._
    Multimodal.use("image", JdkImageCodec)
    try {
      val bad = s.createDataset(Seq(MediaIn(9L, "image", "not a png".getBytes)))
      val e = intercept[org.apache.spark.SparkException] {
        Multimodal.decode(bad).collect()
      }
      assert(e.getMessage != null)
    } finally Multimodal.resetCodecs()
  }

  test("an unregistered modality fails loudly, not silently") {
    val s = spark
    import s.implicits._
    val odd = s.createDataset(Seq(MediaIn(5L, "hologram", Array[Byte](1, 2))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(odd).collect()
    }
    assert(e.getCause.getMessage.contains("no codec registered"))
  }
}

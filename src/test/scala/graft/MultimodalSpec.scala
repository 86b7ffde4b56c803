package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** m01's image leg is a REAL decode: the payload is a genuine PNG
  * file and the pipeline's statistics come from javax.imageio pixel
  * reads, verified here against the closed-form per-pixel formula.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def expectedSum(docId: Long, c: Int): Long =
    (0 until Multimodal.ImgW * Multimodal.ImgH)
      .map(i => (docId * 31 + i * 7 + c * 97) % 256).sum

  test("syntheticPng emits a real PNG file (magic bytes + decodable)") {
    val bytes = Multimodal.syntheticPng(7L)
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "missing PNG signature")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == Multimodal.ImgW)
    assert(img.getHeight == Multimodal.ImgH)
  }

  test("decoded channel sums equal the closed-form formula per doc") {
    val got = SparkEntry.queries("m01_multimodal_pipeline")(spark, sf)
      .select("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Multimodal.ImgW && r.getLong(2) == Multimodal.ImgH)
      assert(r.getLong(3) == expectedSum(id, 0), s"r_sum mismatch doc $id")
      assert(r.getLong(4) == expectedSum(id, 1), s"g_sum mismatch doc $id")
      assert(r.getLong(5) == expectedSum(id, 2), s"b_sum mismatch doc $id")
    }
  }

  private def expectedResizedSum(docId: Long, c: Int): Long = {
    val f = Multimodal.ResizeFactor
    val sums = for {
      y <- 0 until Multimodal.ImgH / f
      x <- 0 until Multimodal.ImgW / f
    } yield (docId * 31 + (y * f * Multimodal.ImgW + x * f) * 7 + c * 97) % 256
    sums.sum
  }

  private def expectedFrameSum(docId: Long, f: Int): Long =
    (0 until Multimodal.ImgW * Multimodal.ImgH)
      .map(i => (docId * 31 + f * 13 + i.toLong * i + i * 7) % 256).sum

  test("syntheticGif is a real animated GIF (magic + per-frame decodable)") {
    val bytes = Multimodal.syntheticGif(7L)
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a",
      "missing GIF signature")
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == Multimodal.frameCount(7L))
  }

  test("m02 decoded frame sums equal the closed-form formula, stride-sampled") {
    val got = SparkEntry.queries("m02_multimodal_frames")(spark, sf).collect()
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      val wantFrames =
        0 until Multimodal.frameCount(id) by Multimodal.FrameStride
      assert(rows.map(_.getLong(1)).toSeq.sorted == wantFrames.map(_.toLong),
        s"sampled frame set mismatch doc $id")
      rows.foreach { r =>
        val f = r.getLong(1).toInt
        assert(r.getLong(2) == Multimodal.ImgW && r.getLong(3) == Multimodal.ImgH)
        assert(r.getLong(4) == expectedFrameSum(id, f),
          s"gray_sum mismatch doc $id frame $f")
      }
    }
  }

  test("m03 resize samples the decoded (x*f, y*f) lattice exactly") {
    val got = SparkEntry.queries("m03_multimodal_resize")(spark, sf).collect()
    assert(got.nonEmpty)
    val f = Multimodal.ResizeFactor
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Multimodal.ImgW / f)
      assert(r.getLong(2) == Multimodal.ImgH / f)
      assert(r.getLong(3) == expectedResizedSum(id, 0), s"r_sum doc $id")
      assert(r.getLong(4) == expectedResizedSum(id, 1), s"g_sum doc $id")
      assert(r.getLong(5) == expectedResizedSum(id, 2), s"b_sum doc $id")
    }
  }
}

class AudioSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col
  import graft.operators.Multimodal

  test("syntheticWav is a real RIFF/WAVE file the JDK codec reopens") {
    val bytes = Multimodal.syntheticWav(7L)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getSampleSizeInBits == 8)
    assert(ais.getFormat.getChannels == 1)
  }

  test("m04 decoded amplitude stats equal the closed-form formula") {
    def formula(id: Long, i: Int): Long = (id * 31 + i.toLong * i + i * 7) % 256
    val out = graft.queries.TextQueries.m04(spark, sf)
      .filter(col("doc_id") < 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, sum, peak) =>
      val exp = (0 until n.toInt).map(formula(id, _))
      assert(n == 400 + id % 400)
      assert(sum == exp.sum, s"doc $id amp_sum")
      assert(peak == exp.max, s"doc $id amp_peak")
    }
  }
}

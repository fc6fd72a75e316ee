package graft

import graft.operators.{Multimodal, MultimodalCodec, MultimodalStub}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stub decoder's contract and the feature-extract plumbing. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stub decoder: fixed width, deterministic, [0,1]-bounded") {
    val f1 = MultimodalStub.decode("hello world, eight chunks".getBytes("UTF-8"))
    val f2 = MultimodalStub.decode("hello world, eight chunks".getBytes("UTF-8"))
    assert(f1.length == MultimodalStub.FEATURES)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    assert(MultimodalStub.decode(Array.empty[Byte]).toSeq ==
      Seq.fill(MultimodalStub.FEATURES)(0f))
  }

  test("featureExtract: FEATURES rows per doc, matches local decode") {
    val rows = Multimodal.featureExtract(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2)).toMap
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.size == nDocs * MultimodalStub.FEATURES)
    // spot-check doc 0 against a driver-side decode of the same payload
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    val expected = MultimodalStub.decode(text0.getBytes("UTF-8")).toSeq
    expected.zipWithIndex.foreach { case (v, i) =>
      assert(rows((0L, i)) == v, s"feature $i")
    }
  }

  test("png codec: real ImageIO round trip is the identity on samples") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val pixels = Array.fill(64)(rnd.nextInt(256))
      val png = MultimodalCodec.encodePng(pixels, 8, 8)
      // genuine PNG container: 8-byte signature
      assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      assert(MultimodalCodec.decodePng(png).toSeq === pixels.toSeq)
    }
  }

  test("pngDecode: executor-side decode equals the encoded downsample") {
    val rows = Multimodal.pngDecode(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.size == nDocs * 64)
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    MultimodalStub.resize(text0.getBytes("UTF-8"), 64).zipWithIndex.foreach {
      case (v, i) => assert(rows((0L, i)) == v, s"pixel $i")
    }
  }

  test("wav codec: real AudioSystem round trip is the identity on samples") {
    val rnd = new scala.util.Random(13)
    (0 until 20).foreach { _ =>
      val samples = Array.fill(48)(rnd.nextInt(65536) - 32768)
      val wav = MultimodalCodec.encodeWav(samples, 8000f)
      // genuine WAV container: RIFF....WAVE header
      assert(wav.take(4).map(_.toChar).mkString === "RIFF")
      assert(wav.slice(8, 12).map(_.toChar).mkString === "WAVE")
      assert(MultimodalCodec.decodeWav(wav).toSeq === samples.toSeq)
    }
    // extremes survive the signed 16-bit packing
    val edges = Array(-32768, -1, 0, 1, 32767)
    assert(MultimodalCodec.decodeWav(MultimodalCodec.encodeWav(edges, 8000f)).toSeq
      === edges.toSeq)
  }

  test("wavDecode: executor-side decode equals the encoded PCM mapping") {
    val rows = Multimodal.wavDecode(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.size == nDocs * 48)
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    MultimodalStub.resize(text0.getBytes("UTF-8"), 48).zipWithIndex.foreach {
      case (m, i) => assert(rows((0L, i)) == m * 257 - 32768, s"sample $i")
    }
  }

  test("resize: fixed 32-bucket thumbnail, floor-mean integer math") {
    val local = MultimodalStub.resize("abcdefgh".getBytes("UTF-8"), 4)
    assert(local.toSeq == Seq((97 + 98) / 2, (99 + 100) / 2, (101 + 102) / 2, (103 + 104) / 2))
    val rows = Multimodal.resize(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    MultimodalStub.resize(text0.getBytes("UTF-8"), 32).zipWithIndex.foreach {
      case (v, i) => assert(rows((0L, i)) == v, s"pixel $i")
    }
  }
}

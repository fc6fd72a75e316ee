package graft

import graft.operators.{Multimodal, ByteFeatures, MultimodalCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the byte-feature kernels, the three real container codecs
  * (PNG/WAV/y4m), and the feature-extract plumbing. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("feature kernel: fixed width, deterministic, [0,1]-bounded") {
    val f1 = ByteFeatures.normalizedFeatures("hello world, eight chunks".getBytes("UTF-8"))
    val f2 = ByteFeatures.normalizedFeatures("hello world, eight chunks".getBytes("UTF-8"))
    assert(f1.length == ByteFeatures.FEATURES)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    assert(ByteFeatures.normalizedFeatures(Array.empty[Byte]).toSeq ==
      Seq.fill(ByteFeatures.FEATURES)(0f))
  }

  test("featureExtract: FEATURES rows per doc, matches local decode") {
    val rows = Multimodal.featureExtract(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2)).toMap
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.size == nDocs * ByteFeatures.FEATURES)
    // spot-check doc 0 against a driver-side decode of the same payload
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    val expected = ByteFeatures.normalizedFeatures(text0.getBytes("UTF-8")).toSeq
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
    ByteFeatures.meanBuckets(text0.getBytes("UTF-8"), 64).zipWithIndex.foreach {
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
    ByteFeatures.meanBuckets(text0.getBytes("UTF-8"), 48).zipWithIndex.foreach {
      case (m, i) => assert(rows((0L, i)) == m * 257 - 32768, s"sample $i")
    }
  }

  test("resize: fixed 32-bucket thumbnail, floor-mean integer math") {
    val local = ByteFeatures.meanBuckets("abcdefgh".getBytes("UTF-8"), 4)
    assert(local.toSeq == Seq((97 + 98) / 2, (99 + 100) / 2, (101 + 102) / 2, (103 + 104) / 2))
    val rows = Multimodal.resize(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    ByteFeatures.meanBuckets(text0.getBytes("UTF-8"), 32).zipWithIndex.foreach {
      case (v, i) => assert(rows((0L, i)) == v, s"pixel $i")
    }
  }

  test("y4m codec: genuine YUV4MPEG2 container, round trip is the identity") {
    val rnd = new scala.util.Random(17)
    (0 until 20).foreach { _ =>
      val frames = Array.fill(3)(Array.fill(16)(rnd.nextInt(256)))
      val y4m = MultimodalCodec.encodeY4m(frames, 4, 4)
      // genuine container: plain-text stream header + FRAME markers
      val ascii = new String(y4m, java.nio.charset.StandardCharsets.US_ASCII)
      assert(ascii.startsWith("YUV4MPEG2 W4 H4 "), ascii.take(40))
      assert(ascii.contains("Cmono"))
      val (w, h, decoded) = MultimodalCodec.decodeY4m(y4m)
      assert((w, h) == (4, 4))
      assert(decoded.length == 3)
      decoded.zip(frames).foreach { case (d, f) => assert(d.toSeq === f.toSeq) }
    }
    // header/marker robustness: FRAME params are tolerated, foreign
    // colorspaces and truncated planes are rejected, not misparsed
    val one = MultimodalCodec.encodeY4m(Array(Array.tabulate(16)(identity)), 4, 4)
    val withParams = new String(one, java.nio.charset.StandardCharsets.US_ASCII)
      .replaceFirst("FRAME\n", "FRAME Ixxx\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(MultimodalCodec.decodeY4m(withParams)._3.head.toSeq == (0 until 16).toSeq)
    val c420 = new String(one, java.nio.charset.StandardCharsets.US_ASCII)
      .replaceFirst("Cmono", "C420jpeg")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    intercept[IllegalArgumentException](MultimodalCodec.decodeY4m(c420))
    intercept[IllegalArgumentException](MultimodalCodec.decodeY4m(one.dropRight(1)))
  }

  test("y4mFrames: executor-side parse equals the encoded bucket means") {
    val rows = Multimodal.y4mFrames(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.size == nDocs * 48)
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    ByteFeatures.meanBuckets(text0.getBytes("UTF-8"), 48).zipWithIndex.foreach {
      case (v, b) => assert(rows((0L, b / 16, b % 16)) == v, s"bucket $b")
    }
  }

  test("ahash pairs: match a local single-threaded reimplementation exactly") {
    // Independent oracle in Scala: recompute every signature through the
    // same real codec round trip, then brute-force the banded-blocking +
    // Hamming rule. The distributed operator must reproduce it exactly.
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val sig = docs.map { case (id, t) =>
      val px = MultimodalCodec.decodePng(
        MultimodalCodec.encodePng(ByteFeatures.meanBuckets(t.getBytes("UTF-8"), 64), 8, 8))
      val avg = px.map(_.toLong).sum / 64
      id -> px.zipWithIndex.foldLeft(0L) { case (h, (p, i)) =>
        if (p > avg) h | (1L << i) else h
      }
    }.toMap
    def bands(h: Long): Seq[Long] = (0 until 4).map(b => (h >>> (16 * b)) & 0xffffL)
    val ids = sig.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if bands(sig(a)).zip(bands(sig(b))).exists { case (x, y) => x == y }
      d = java.lang.Long.bitCount(sig(a) ^ sig(b)) if d <= 16
    } yield (a, b) -> d).toMap
    val got = Multimodal.ahashPairs(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(expected.nonEmpty, "reimplementation found no pairs — vacuous spec")
    assert(got === expected)
  }

  test("corpus invariant: documents.text is all-ASCII (oracle convention)") {
    // The payload-bucket oracles compare character-indexed SQL against
    // byte-indexed Scala; they agree only while the corpus is pure ASCII.
    // This turns that latent assumption into a loud failure on testdata
    // regeneration (see the oracle-convention note in Multimodal.oracles).
    val nonAscii = graft.Tables.documents(spark, TestSpark.sf)
      .filter("text rlike '[^\\\\x00-\\\\x7F]'").count()
    assert(nonAscii == 0L, s"$nonAscii docs contain non-ASCII text")
  }
}

package graft

import graft.operators.{Multimodal, MultimodalStub}
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

  test("featureExtract: one fixed-width vector per doc, matches local decode") {
    val rows = Multimodal.featureExtract(spark, TestSpark.sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Float](1).size == MultimodalStub.FEATURES, s"doc ${r.getLong(0)}")
    }
    // spot-check doc 0 against a driver-side decode of the same payload
    val text0 = graft.Tables.documents(spark, TestSpark.sf)
      .filter("doc_id = 0").collect().head.getAs[String]("text")
    val expected = MultimodalStub.decode(text0.getBytes("UTF-8")).toSeq
    assert(rows.find(_.getLong(0) == 0L).get.getSeq[Float](1) == expected)
  }
}

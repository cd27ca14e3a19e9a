package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary payload plumbing: schema and row preservation") {
    val df = Multimodal.payloads(spark, TestSpark.sf0001)
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.count() === 500)
  }

  test("decodeMeta is deterministic and iterator-based") {
    val meta1 = Multimodal.decodeMeta(Multimodal.payloads(spark, TestSpark.sf0001))
    val meta2 = Multimodal.decodeMeta(Multimodal.payloads(spark, TestSpark.sf0001))
    val a = meta1.collect().sortBy(_.doc_id)
    val b = meta2.collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.n_bytes > 0))
    assert(a.map(_.format).toSet.subsetOf(Set("png", "jpeg", "webp")))
  }

  test("sampleFrames emits every other chunk") {
    val frames = Multimodal.sampleFrames(Multimodal.payloads(spark, TestSpark.sf0001), 32)
    assert(frames.count() > 0)
    assert(frames.columns.toSeq === Seq("doc_id", "frame_idx", "frame_bytes"))
    import org.apache.spark.sql.functions._
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
  }
}

package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, determinism, and batch shapes of the
  * stubbed decode pipeline (the production contract around a real
  * decoder). */
class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "a tiny payload"), (2L, "another somewhat longer payload body"))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
  }

  test("withMediaMeta is deterministic and bounds dimensions") {
    val m = Multimodal.withMediaMeta(docs, "payload")
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val again = Multimodal.withMediaMeta(docs, "payload")
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(m.toSeq == again.toSeq)
    m.foreach { case (_, w, h, n) =>
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && n > 0)
    }
  }

  test("decodeToFeatures emits fixed-dim [0,1) float vectors") {
    val f = Multimodal.decodeToFeatures(docs, "payload", dim = 8)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(f.forall(_.length == 8))
    assert(f.forall(_.forall(x => x >= 0f && x < 1f)))
  }

  test("sampleFrames explodes n byte-range frames per payload") {
    val fr = Multimodal.sampleFrames(docs, "payload", n = 4)
    assert(fr.count() == 8) // 2 docs × 4 frames
    val idx = fr.groupBy("doc_id").agg(collect_set(col("frame_idx")).as("s"))
      .collect().map(_.getSeq[Int](1).toSet)
    assert(idx.forall(_ == Set(0, 1, 2, 3)))
  }

  test("resizeMedia caps payload at width*height bytes and records target dims") {
    val r = Multimodal.resizeMedia(docs, "payload", width = 2, height = 3)
      .select(col("doc_id"), length(col("resized")).as("len"),
        col("resized_meta.width"), col("resized_meta.height"))
      .collect()
    r.foreach { row =>
      assert(row.getAs[Int]("len") <= 6)
      assert(row.getAs[Int]("width") == 2 && row.getAs[Int]("height") == 3)
    }
  }
}

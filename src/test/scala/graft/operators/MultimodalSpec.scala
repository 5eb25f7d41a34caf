package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int, parts: Int) =
    spark.range(n).repartition(parts)
      .select(col("id").as("doc_id"),
        concat(lit("payload-"), col("id")).cast("binary").as("payload"))
      .as[MediaRow]

  test("metadata struct: byte length + digest + mime") {
    val df = withMetadata(
      Seq((1L, "abc".getBytes("UTF-8"))).toDF("doc_id", "payload"))
    val row = df.select("meta.n_bytes", "meta.sha256", "meta.mime_type").first()
    assert(row.getInt(0) === 3)
    assert(row.getString(1) ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row.getString(2) === "image/jpeg")
  }

  test("feature extraction: deterministic and partitioning-invariant") {
    val a = extractFeatures(media(100, 2)).collect().sortBy(_.doc_id)
    val b = extractFeatures(media(100, 16)).collect().sortBy(_.doc_id)
    assert(a.length === 100)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id === y.doc_id)
      assert(x.width === y.width && x.height === y.height)
      assert(x.mean_intensity === y.mean_intensity)
      assert(x.thumb_8x8.toSeq === y.thumb_8x8.toSeq)
    }
    // realistic shapes from the stub codec
    a.foreach { f =>
      assert(f.width >= 16 && f.width < 32)
      assert(f.height >= 16 && f.height < 32)
      assert(f.channels === 3)
      assert(f.thumb_8x8.length === 64)
      assert(f.mean_intensity > 0)
    }
  }

  test("empty payload yields a typed zero row, no crash") {
    val f = extractFeatures(Seq(MediaRow(7L, Array.emptyByteArray)).toDS())
      .collect().head
    assert(f.doc_id === 7L)
    assert(f.mean_intensity === 0d)
    assert(f.n_bytes === 0L)
  }

  test("frame sampling keeps every k-th frame") {
    val frames = spark.range(100).select(col("id").as("event_id"))
    assert(sampleFrames(frames, 10).count() === 10)
    assert(sampleFrames(frames, 1).count() === 100)
  }
}

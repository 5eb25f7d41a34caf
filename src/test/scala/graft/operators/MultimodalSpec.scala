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


  test("X124 shot segmentation: repeated payloads form one shot, " +
      "payload changes open new shots exactly at the transitions; " +
      "cameras are independent") {
    import spark.implicits._
    def p(seed: Int): Array[Byte] = Array.tabulate[Byte](64)(i =>
      ((i * 31 + seed * 97) & 0xff).toByte)
    // camera A: AAA BB C ; camera B: XX YY (interleaved arrival)
    val frames = Seq(
      ("A", 0L, p(1)), ("B", 0L, p(7)), ("A", 1L, p(1)),
      ("B", 1L, p(7)), ("A", 2L, p(1)), ("A", 3L, p(2)),
      ("B", 2L, p(8)), ("A", 4L, p(2)), ("A", 5L, p(3)),
      ("B", 3L, p(8)))
    val feats = Multimodal.extractFeatures(
      frames.zipWithIndex.map { case ((_, _, pl), i) =>
        Multimodal.MediaRow(i.toLong, pl)
      }.toDS())
      .toDF()
      .join(frames.zipWithIndex.map { case ((c, s0, _), i) =>
        (i.toLong, c, s0)
      }.toDF("doc_id", "camera_id", "seq"), "doc_id")
    val segs = Multimodal.shotSegments(feats, tau = 4).collect()
      .map(r => (r.getAs[String]("camera_id"), r.getAs[Long]("seq")) ->
        (r.getAs[Long]("shot_id"), r.getAs[Boolean]("is_boundary")))
      .toMap
    // camera A shots: seq 0-2 = shot 1, 3-4 = shot 2, 5 = shot 3
    assert(segs(("A", 0L)) === (1L, true))
    assert(segs(("A", 1L)) === (1L, false))
    assert(segs(("A", 2L)) === (1L, false))
    assert(segs(("A", 3L)) === (2L, true))
    assert(segs(("A", 4L)) === (2L, false))
    assert(segs(("A", 5L)) === (3L, true))
    // camera B: seq 0-1 = shot 1, 2-3 = shot 2 (independent numbering)
    assert(segs(("B", 0L)) === (1L, true))
    assert(segs(("B", 1L)) === (1L, false))
    assert(segs(("B", 2L)) === (2L, true))
    assert(segs(("B", 3L)) === (2L, false))
    val kf = Multimodal.keyframes(feats, tau = 4).count()
    assert(kf === 5L, "3 A-shots + 2 B-shots keyframes")
  }

  test("X124 dHash is invariant under monotone intensity transforms " +
      "and flips on a gradient reversal") {
    import spark.implicits._
    val base = (0 until 64).map(i => (i % 8).toDouble) // rising rows
    val brighter = base.map(v => v * 3.0 + 17.0)       // monotone
    val reversed = base.map(v => -v)                   // gradient flip
    val got = Seq(("base", base), ("brighter", brighter),
      ("reversed", reversed))
      .toDF("name", "thumb_8x8")
      .select(col("name"), Multimodal.dHashCol(col("thumb_8x8")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("base") === got("brighter"),
      "monotone transform must not change the hash")
    assert(got("base") !== got("reversed"))
    assert(java.lang.Long.bitCount(got("base") ^ got("reversed")) === 56,
      "a full gradient reversal flips every comparison bit")
  }

  test("X135 PCM stub + frame energies: little-endian pairs, exact " +
      "integer Σs², partial trailing frame kept with its true count") {
    // 2.5 frames of samples: 1000 samples = 2 full frames + 200 tail
    val samples = (0 until 1000).map(i => ((i % 7) - 3).toShort)
    val payload = new Array[Byte](2000)
    samples.zipWithIndex.foreach { case (s, i) =>
      payload(2 * i) = (s & 0xff).toByte
      payload(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val frames = frameEnergies(
      Seq(AudioRow(1L, payload)).toDS()).collect().sortBy(_.frame_no)
    assert(frames.length === 3)
    assert(frames.map(_.n_samples).toSeq === Seq(400, 400, 200))
    def expect(off: Int, n: Int): Long =
      (off until off + n).map(i => samples(i).toLong * samples(i)).sum
    assert(frames(0).energy === expect(0, 400))
    assert(frames(1).energy === expect(400, 400))
    assert(frames(2).energy === expect(800, 200))
    // decode round-trip: negative samples survive the LE byte packing
    val dec = StubAudioDecoder.decode(payload).samples
    assert(dec.take(10).toSeq === samples.take(10))
  }

  test("X135 VAD segmentation: silence-speech-silence pools to exactly " +
      "3 segments with exact bounds/energies; interleaved docs " +
      "segment independently") {
    val frames = Seq(
      // doc 1: 3 quiet, 4 loud, 2 quiet
      (1L, 0, 10L), (1L, 1, 12L), (1L, 2, 9L),
      (1L, 3, 900L), (1L, 4, 950L), (1L, 5, 910L), (1L, 6, 905L),
      (1L, 7, 11L), (1L, 8, 13L),
      // doc 2: all loud
      (2L, 0, 800L), (2L, 1, 820L))
      .toDF("doc_id", "frame_no", "energy")
    val segs = vadSegments(frames, threshold = 100L).collect()
    val d1 = segs.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.length === 3)
    assert(d1.map(r => (r.getAs[Boolean]("is_voiced"),
      r.getAs[Int]("start_frame"), r.getAs[Int]("end_frame"),
      r.getAs[Long]("n_frames"), r.getAs[Long]("total_energy"))).toSeq ===
      Seq((false, 0, 2, 3L, 31L), (true, 3, 6, 4L, 3665L),
        (false, 7, 8, 2L, 24L)))
    val d2 = segs.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length === 1)
    assert(d2(0).getAs[Boolean]("is_voiced"))
    assert(d2(0).getAs[Long]("total_energy") === 1620L)
  }

  test("X135 end-to-end: decode -> frames -> segments is " +
      "partitioning-invariant") {
    val audio = spark.range(40).repartition(8)
      .select(col("id").as("doc_id"),
        concat(lit("pcm-payload-"), col("id"), lit("-"),
          repeat(concat(lit("x"), col("id")), 50)).cast("binary")
          .as("payload"))
      .as[AudioRow]
    val a = vadSegments(frameEnergies(audio).toDF(), 1000000L)
      .collect().map(_.toSeq.toList).toList
    val audio2 = spark.range(40).repartition(2)
      .select(col("id").as("doc_id"),
        concat(lit("pcm-payload-"), col("id"), lit("-"),
          repeat(concat(lit("x"), col("id")), 50)).cast("binary")
          .as("payload"))
      .as[AudioRow]
    val b = vadSegments(frameEnergies(audio2).toDF(), 1000000L)
      .collect().map(_.toSeq.toList).toList
    assert(a === b)
    assert(a.nonEmpty)
  }
}

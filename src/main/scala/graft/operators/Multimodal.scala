package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star X17): media payloads as opaque binary
  * columns with typed metadata, and executor-side decode / feature
  * extraction with per-partition amortized initialization.
  *
  * The vehicle pipeline's base64-JPEG frames (S4/S17,
  * `vehicle_producer.py:23-56`) are the prototype: payload bytes travel as
  * `BinaryType`, metadata as a typed struct, and any expensive codec work
  * happens in `mapPartitions` so decoder init is paid once per partition,
  * not per row — the JVM analog of the pandas-UDF batch pattern.
  *
  * The default decode is a STUB (`StubImageDecoder`): this container has
  * no image LIBRARY, so it derives deterministic fake dimensions /
  * channel stats from the payload bytes. The Spark-side plumbing — schema,
  * batch shape, partition-level lifecycle, feature output — is real and
  * tested, and the seam itself is PROVEN real: RealCodecSpec pushes two
  * genuine pure-JVM codecs (a hand-rolled binary-PPM parser and the JDK's
  * javax.imageio PNG reader) through [[ImageDecoder]] with zero engine
  * changes. A production JPEG codec slots in the same way.
  */
object Multimodal {

  /** A decoded image surface. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Codec boundary. Implementations must be Serializable (shipped to
    * executors) and are initialized lazily per partition.
    */
  trait ImageDecoder extends Serializable {
    def decode(payload: Array[Byte]): DecodedImage
  }

  /** STUB decoder — deterministic fake in place of a real JPEG codec.
    * Dimensions and "pixels" are pure functions of the payload bytes, so
    * tests are reproducible and the full pipeline exercises realistic
    * shapes (a real codec would replace exactly this class).
    */
  object StubImageDecoder extends ImageDecoder {
    override def decode(payload: Array[Byte]): DecodedImage = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 16 + math.floorMod(h, 16) // 16..31
      val height = 16 + math.floorMod(h >> 8, 16)
      val channels = 3
      // fake pixel plane: repeating payload bytes (empty payload → zeros)
      val n = width * height * channels
      val pixels = new Array[Byte](n)
      if (payload.nonEmpty) {
        var i = 0
        while (i < n) { pixels(i) = payload(i % payload.length); i += 1 }
      }
      DecodedImage(width, height, channels, pixels)
    }
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Long, mean_intensity: Double,
      thumb_8x8: Array[Double])

  /** Ingest: attach typed metadata to a binary payload column — the
    * schema every media table carries (FIXTURES §4 frame records land
    * here after unbase64).
    */
  def withMetadata(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("meta", struct(
      octet_length(col(payloadCol)).as("n_bytes"),
      sha2(col(payloadCol), 256).as("sha256"),
      lit("image/jpeg").as("mime_type")))

  /** Decode + feature-extract, executor-side, decoder init amortized per
    * partition. Output: fixed-shape feature rows (dims, intensity, 8×8
    * grayscale thumbnail) — the batch shape a training pipeline consumes.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: ImageDecoder = StubImageDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: a real codec allocates native context here
      val codec = decoder
      rows.map { m =>
        val img = codec.decode(m.payload)
        val px = img.pixels
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i) & 0xff; i += 1 }
        val mean = if (px.length == 0) 0d else sum.toDouble / px.length
        // 8×8 average-pool thumbnail over the first channel
        val thumb = new Array[Double](64)
        if (px.length > 0) {
          val cellW = math.max(1, img.width / 8)
          val cellH = math.max(1, img.height / 8)
          var ty = 0
          while (ty < 8) {
            var tx = 0
            while (tx < 8) {
              var acc = 0L; var n = 0
              var y = ty * cellH
              while (y < math.min((ty + 1) * cellH, img.height)) {
                var x = tx * cellW
                while (x < math.min((tx + 1) * cellW, img.width)) {
                  acc += px((y * img.width + x) * img.channels) & 0xff
                  n += 1; x += 1
                }
                y += 1
              }
              thumb(ty * 8 + tx) = if (n == 0) 0d else acc.toDouble / n
              tx += 1
            }
            ty += 1
          }
        }
        MediaFeatures(m.doc_id, img.width, img.height, img.channels,
          m.payload.length.toLong, mean, thumb)
      }
    }
  }

  /** Frame sampling: keep every k-th frame per camera (deterministic,
    * executor-side) — the video analog of record sampling.
    */
  def sampleFrames(frames: DataFrame, every: Int,
      orderCol: String = "event_id"): DataFrame =
    frames.filter(pmod(col(orderCol), lit(every)) === 0)

  // ---- X124: perceptual shot segmentation / keyframe selection ----

  /** 56-bit difference hash (dHash) of an 8×8 thumbnail column: bit
    * (r·7+c) = thumb[r][c+1] > thumb[r][c] — the classic perceptual
    * hash, invariant under any MONOTONE intensity transform
    * (brightness/contrast shifts change pixel values, not gradient
    * signs). 56 codegen'd comparisons ORed into one long — a Column
    * fold, not a UDF, so whole-stage codegen covers it.
    */
  def dHashCol(thumb: Column): Column =
    (for { r <- 0 until 8; c <- 0 until 7 } yield {
      val i = r * 7 + c
      when(element_at(thumb, r * 8 + c + 2) >
        element_at(thumb, r * 8 + c + 1), lit(1L << i)).otherwise(0L)
    }).reduce(_ bitwiseOR _)

  /** Shot segmentation over per-camera frame sequences: a frame opens
    * a new shot when the Hamming distance between its dHash and its
    * PREDECESSOR's exceeds `tau` (the frame-to-frame delta
    * shot-boundary detector; near-identical consecutive frames — the
    * bulk of any video stream — land in the same shot). Input needs
    * (camera_id, seq, thumb_8x8); output adds phash, hamming_prev,
    * is_boundary, shot_id (per-camera 1-based).
    *
    * Scale shape: ONE camera-partitioned window (lag + running sum —
    * per-camera frames are the partition, cameras are the
    * parallelism); the hash is map-side. The keyframe set
    * ([[keyframes]]) is what a training pipeline stores — shot-level
    * dedup cuts a 30 fps stream to a few frames per scene before any
    * corpus-level near-dup pass (X15/X53) runs.
    */
  def shotSegments(features: DataFrame, tau: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("camera_id"))
      .orderBy(col("seq"))
    features
      .withColumn("phash", dHashCol(col("thumb_8x8")))
      .withColumn("hamming_prev",
        bit_count(col("phash").bitwiseXOR(lag(col("phash"), 1).over(w))))
      .withColumn("is_boundary",
        col("hamming_prev").isNull || col("hamming_prev") > tau)
      .withColumn("shot_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** The kept frames: the first frame of every shot. */
  def keyframes(features: DataFrame, tau: Int): DataFrame =
    shotSegments(features, tau).filter(col("is_boundary"))

  // ---- X135: audio decode + energy VAD segmentation ----

  /** A decoded PCM buffer. */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Short])

  /** Codec boundary for audio — same contract as [[ImageDecoder]]:
    * Serializable, init amortized per partition, a real codec (libopus/
    * libsndfile via JNI) replaces exactly this class.
    */
  trait AudioDecoder extends Serializable {
    def decode(payload: Array[Byte]): DecodedAudio
  }

  /** STUB PCM decoder — deterministic fake: consecutive payload byte
    * pairs become little-endian 16-bit samples (odd tail byte dropped),
    * 16 kHz. Pure function of the payload, so the full framing/energy/
    * segmentation pipeline runs with realistic shapes.
    */
  object StubAudioDecoder extends AudioDecoder {
    override def decode(payload: Array[Byte]): DecodedAudio = {
      val n = payload.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = (((payload(2 * i + 1) & 0xff) << 8) |
          (payload(2 * i) & 0xff)).toShort
        i += 1
      }
      DecodedAudio(16000, samples)
    }
  }

  final case class AudioRow(doc_id: Long, payload: Array[Byte])

  final case class AudioFrame(doc_id: Long, frame_no: Int,
      n_samples: Int, energy: Long)

  /** Samples per analysis frame (25 ms at 16 kHz — the standard VAD
    * frame).
    */
  val AudioFrameSamples = 400

  /** Decode + frame + energy, executor-side: one row per 25 ms frame
    * with its EXACT integer energy Σ s² (a 400-sample frame of ±32767
    * peaks sums to < 2^39 — no overflow, no floats, so segmentation
    * downstream is bit-deterministic). The partial trailing frame is
    * kept with its true sample count.
    */
  def frameEnergies(audio: Dataset[AudioRow],
      decoder: AudioDecoder = StubAudioDecoder): Dataset[AudioFrame] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      val codec = decoder // per-partition init seam
      rows.flatMap { a =>
        val pcm = codec.decode(a.payload).samples
        (0 until pcm.length by AudioFrameSamples).iterator.map { off =>
          val end = math.min(off + AudioFrameSamples, pcm.length)
          var e = 0L
          var i = off
          while (i < end) {
            e += pcm(i).toLong * pcm(i).toLong
            i += 1
          }
          AudioFrame(a.doc_id, off / AudioFrameSamples, end - off, e)
        }
      }
    }
  }

  /** VAD-style speech/silence segmentation over per-doc frame
    * sequences: a frame is VOICED when its energy clears `threshold`;
    * consecutive same-state frames pool into one segment
    * (gaps-and-islands over ONE doc-partitioned window — the X124
    * plan shape, integer state only). Output: one row per segment
    * with bounds, frame count, and exact total energy — the unit a
    * curation pipeline keeps (voiced spans) or drops (silence,
    * typically most of the tape).
    */
  def vadSegments(frames: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    frames
      .withColumn("is_voiced", col("energy") > threshold)
      .withColumn("flip",
        when(lag(col("is_voiced"), 1).over(w).isNull ||
          lag(col("is_voiced"), 1).over(w) =!= col("is_voiced"), 1L)
          .otherwise(0L))
      .withColumn("seg_id",
        sum(col("flip")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("seg_id"), col("is_voiced"))
      .agg(min(col("frame_no")).as("start_frame"),
        max(col("frame_no")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("total_energy"))
      .orderBy(col("doc_id"), col("seg_id"))
  }
}

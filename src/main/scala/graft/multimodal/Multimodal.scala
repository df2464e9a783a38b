package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: media as opaque `binary` columns with typed
  * metadata, decoded per-partition in batches.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[StubCodec.decode]] derives a deterministic fake frame
  * from the raw bytes (dimensions and first byte — see the marked stub).
  * Everything around it — schema, binary column handling, typed
  * mapPartitions batching, partition sizing — is the real Spark-side
  * pipeline a codec would drop into.
  */
object Multimodal {

  /** A decoded media frame (fake contents, real shape). */
  final case class Frame(id: Long, width: Long, height: Long,
                         channels: Long, first_byte: Long)

  object StubCodec {
    /** STUB: a real implementation would decode the container format
      * (JPEG/PNG/WAV...) here. The fake is a pure function of the bytes so
      * tests and oracles stay deterministic. */
    def decode(id: Long, bytes: Array[Byte]): Frame = {
      val len = bytes.length.toLong
      val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xff).toLong
      Frame(id, 16 + len % 48, 16 + (first + len) % 48, 3, first)
    }
  }

  /** Decode a binary column per-partition (the Scala analog of
    * `mapInPandas` batch decode): input (id: long, media: binary) →
    * Dataset[Frame]. Iterator-to-iterator, so the codec amortizes any
    * per-batch setup and spills never buffer a whole partition. */
  def decodeFrames(spark: SparkSession, df: DataFrame,
                   idCol: String, binCol: String): Dataset[Frame] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (real codecs are costly
        // to construct; one instance per partition, reused per row)
        it.map { case (id, bytes) => StubCodec.decode(id, bytes) }
      }
  }

  /** documents(text) → (doc_id, media binary) — turns any string column
    * into the opaque-binary shape real image/audio tables have. */
  def asBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), encode(col(textCol), "UTF-8").as("media"))

  /** Resize decoded frames to a bounding box, preserving aspect ratio —
    * the standard image-preprocessing stage. Pure column arithmetic over
    * the decoded metadata (a real implementation would also rescale the
    * pixel buffer; the geometry below is exactly what it would compute).
    * Adds (out_width, out_height, scale) to the frame columns. */
  def resizeFrames(frames: Dataset[Frame], maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val s = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    frames.toDF()
      .withColumn("scale", round(s, 6))
      .withColumn("out_width", greatest(floor(col("width") * s), lit(1L)))
      .withColumn("out_height", greatest(floor(col("height") * s), lit(1L)))
  }

  /** Per-media feature vector (the embedding stage's shape). */
  final case class Features(id: Long, features: Seq[Double])

  /** Per-partition feature extraction over binary media — the
    * feature/embedding stage of a multimodal pipeline (a real model would
    * run batched inference here; same iterator-to-iterator shape). The
    * STUB features are k chunk-mean byte intensities in [0, 1]: split the
    * payload into k equal chunks (last may be short/empty → 0.0) and
    * average each — a pure byte function, so the oracle can replay it. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String, binCol: String,
                      k: Int = 8): Dataset[Features] = {
    import spark.implicits._
    require(k > 0)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model/session init would go here
        it.map { case (id, bytes) =>
          val n = bytes.length
          val chunk = math.max(1L, math.ceil(n / k.toDouble).toLong)
          val f = (0 until k).map { j =>
            val lo = math.min(n.toLong, j * chunk).toInt
            val hi = math.min(n.toLong, (j + 1) * chunk).toInt
            if (lo >= hi) 0.0
            else {
              var s = 0L
              var i = lo
              while (i < hi) { s += bytes(i) & 0xff; i += 1 }
              (s.toDouble / (hi - lo)) / 255.0
            }
          }
          Features(id, f)
        }
      }
  }

  /** One sampled frame of a media payload (video frame-sampling shape:
    * real offsets/lengths, stub contents). */
  final case class FrameSample(id: Long, frame_idx: Long, offset: Long,
                               frame_len: Long, first_byte: Long)

  /** Frame sampling: treat the binary payload as consecutive fixed-size
    * frames and keep every `stride`-th one — the video/audio sampling
    * stage of a training pipeline. The STUB "frame" is a byte range of
    * the container (a real demuxer would seek keyframes); the plumbing —
    * per-partition iterator batching, one output row per sampled frame,
    * deterministic offsets — is the real shape, and the stub is a pure
    * byte function so it stays DuckDB-oracle-able. */
  def sampleFrames(spark: SparkSession, df: DataFrame,
                   idCol: String, binCol: String,
                   frameSize: Int = 32,
                   stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    require(frameSize > 0 && stride > 0)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length + frameSize - 1) / frameSize
          (0 until nFrames by stride).iterator.map { i =>
            val off = i * frameSize
            FrameSample(id, i.toLong, off.toLong,
              math.min(frameSize, bytes.length - off).toLong,
              (bytes(off) & 0xff).toLong)
          }
        }
      }
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a decode/feature-extract
  * stage shaped the way a real pipeline would run it (partition-parallel
  * batch UDF over binary payloads).
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly marked deterministic STUB (see [[FakeDecoder]]) — the
  * Spark-side plumbing (schema, binary payloads, typed mapPartitions batch
  * shape, partitioning) is real and tested. Swapping in a real decoder
  * means replacing ONE pure function.
  *
  * Scale posture: decode is `mapPartitions` — per-partition batch work,
  * no shuffle, no driver involvement; metadata extraction is pure column
  * expressions. Payload size governs `spark.sql.files.maxPartitionBytes`
  * tuning, nothing else.
  */
object Multimodal {

  /** A typed media row: opaque payload + declared modality. */
  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  /** Decoded-media metadata (what a real image/audio decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, modality: String, n_bytes: Long, sha256: String,
      width: Int, height: Int, channels: Int)

  /** Wrap a string column as a binary payload column with a modality tag —
    * stands in for reading real image/audio bytes. */
  def asBinary(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"))

  /** Pure-column metadata over the opaque payload (no decode needed). */
  def extractMeta(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"), col("modality"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"))

  /** ─ STUB ─ deterministic fake decoder. A real implementation would
    * parse the codec headers / decode frames here; this derives plausible
    * dimensions arithmetically from the byte length so the full pipeline
    * (including the oracle) stays reproducible. Replace the body — nothing
    * else — to integrate a real codec. */
  object FakeDecoder {
    def decode(r: MediaRow, sha: String): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        modality = r.modality,
        n_bytes = n,
        sha256 = sha,
        width = (64 + n % 577).toInt,
        height = (64 + (n * 31) % 353).toInt,
        channels = 3)
    }
  }

  /** The decode stage: typed, partition-parallel batch processing over the
    * binary payloads — the exact shape a real decode/feature-extract pass
    * takes (batch in, batch out, per-executor native resources amortized
    * across a partition). */
  def decode(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val withSha = df.withColumn("sha", sha2(col("payload"), 256))
    withSha.select("doc_id", "modality", "payload", "sha")
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition: a real decoder would init native codecs ONCE here
        it.map { case (id, mod, bytes, sha) =>
          FakeDecoder.decode(MediaRow(id, mod, bytes), sha)
        }
      }
  }

  /** A resized media payload: target dims + the (stub-)resampled bytes'
    * fingerprint. */
  final case class ResizedMedia(
      doc_id: Long, modality: String, width: Int, height: Int,
      channels: Int, n_bytes: Long, sha256: String)

  /** The resize stage (same typed partition-batch shape as [[decode]]).
    * ─ STUB ─ a real implementation would decode, resample to
    * `targetW`×`targetH` and re-encode; here the "resampled" payload is a
    * deterministic byte-budget truncation (min(n, w·h·3) bytes), so the
    * output schema, sizes and fingerprints are all real and
    * oracle-reproducible while the pixel math is faked. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    // Long arithmetic: 40960×40960×3 would overflow Int to a negative
    // budget and silently truncate every payload to zero bytes
    val budget = targetW.toLong * targetH * 3
    df.select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one digest instance per partition (the native-resource pattern)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, mod, bytes) =>
          val out =
            if (bytes.length > budget) bytes.take(budget.toInt) else bytes
          md.reset()
          val sha = md.digest(out).map("%02x".format(_)).mkString
          ResizedMedia(id, mod, targetW, targetH, 3, out.length.toLong, sha)
        }
      }
  }

  /** One sampled frame of a (pretend-)video payload. */
  final case class Frame(
      doc_id: Long, frame_idx: Int, offset: Long, frame_sha: String)

  /** The frame-sampling stage: `nFrames` evenly spaced `frameBytes`-sized
    * slices per payload (docs shorter than one frame yield none) — the
    * 1-row-in/N-rows-out generator shape of real video sampling, as a
    * typed flatMap (partition-local, no shuffle). Offsets are integer
    * arithmetic (`i·(n-F) / (nFrames-1)`), so the DuckDB oracle reproduces
    * them exactly. ─ STUB ─ a real sampler would seek codec keyframes;
    * the slicing and fingerprints are real. */
  def frameSample(
      df: DataFrame, nFrames: Int = 4, frameBytes: Int = 16): Dataset[Frame] = {
    require(nFrames > 1, "nFrames must be > 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { case (id, bytes) =>
          val n = bytes.length.toLong
          if (n < frameBytes) Iterator.empty
          else (0 until nFrames).iterator.map { i =>
            val off = i * (n - frameBytes) / (nFrames - 1)
            md.reset()
            val sha = md.digest(
              bytes.slice(off.toInt, off.toInt + frameBytes))
              .map("%02x".format(_)).mkString
            Frame(id, i, off, sha)
          }
        }
      }
  }
}

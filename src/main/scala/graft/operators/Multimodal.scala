package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) is carried as an
  * opaque `binary` payload column plus typed metadata, and per-batch
  * feature extraction runs in `mapPartitions` over the raw bytes — the
  * same shape a real decoder (JNI/FFI image lib) would use, with the
  * decode step STUBBED as a deterministic digest (media codecs are not
  * available in this environment; the Spark-side plumbing — schema,
  * partitioning, batch iteration, binary handling — is real and tested).
  */
object Multimodal {

  case class MediaFeatures(doc_id: Long, byte_len: Long, sha256: String)

  /** Attach an opaque binary payload column (here: UTF-8 bytes of `text`;
    * in a real pipeline this is the image/audio blob read from storage). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Frame sampling: split the payload into fixed-size frames (the
    * video-frame / audio-window analog) and fingerprint each — the
    * per-frame feature-extraction shape with the decode stubbed as md5.
    * Character-based frames so the operator is reproducible in plain SQL.
    * Output: (doc_id, frame_idx 1-based, frame_md5). */
  def sampleFrames(docs: DataFrame, frameChars: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Column
    val nFrames = ceil(length(col(textCol)) / lit(frameChars.toDouble)).cast("int")
    val frames: Column = transform(
      sequence(lit(1), greatest(nFrames, lit(1))),
      i => md5(col(textCol).substr((i - 1) * frameChars + 1, lit(frameChars))))
    docs
      .select(col(idCol).as("doc_id"), posexplode(frames).as(Seq("pos", "frame_md5")))
      .select(col("doc_id"), (col("pos") + 1).as("frame_idx"), col("frame_md5"))
  }

  /** Resize/downsample stub: stride decimation over the payload characters
    * (the 1-D analog of image downscaling — keep every `stride`-th sample),
    * with the re-encode fingerprinted. Character-based so the operator is
    * exactly reproducible in plain SQL; a real pipeline swaps the stride
    * loop for the codec's scaler inside the same projection shape.
    * Output: (doc_id, orig_chars, resized_chars, resized_md5). */
  def resizeStub(docs: DataFrame, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val n = greatest(ceil(length(col(textCol)) / lit(stride.toDouble)).cast("int"), lit(1))
    val resized = array_join(
      transform(sequence(lit(1), n),
        i => col(textCol).substr((i - 1) * stride + 1, lit(1))), "")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("orig_chars"),
      length(resized).as("resized_chars"),
      md5(resized).as("resized_md5"))
  }

  /** Batched "decode + feature extract" over the binary payload. The stub
    * features (byte length + sha256 hex digest) are computed from the raw
    * bytes inside the task — exactly where a real decoder would run. */
  def extractFeatures(docsWithPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // one digest instance per task, reused across the batch — the
        // "model/decoder loaded once per partition" pattern
        val digest = MessageDigest.getInstance("SHA-256")
        batch.map { case (id, bytes) =>
          digest.reset()
          val sha = digest.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length.toLong, sha)
        }
      }
      .toDF()
  }
}

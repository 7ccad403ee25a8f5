package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as partition-batched executor code.
  *
  * The decoders here are deterministic STUBS (this environment ships
  * no image/audio codecs): metadata is derived arithmetically from the
  * bytes. What is real — and what the tests pin down — is the Spark
  * plumbing: binary schema, `mapPartitions` batch shape (one decoder
  * instance per partition, streamed rows), and the metadata contract.
  * Swapping `decodeBytes` for a JNI/codec call changes nothing
  * structurally.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Stub decode: metadata derived from byte 0 and length — stands in
    * for a real header parse. Deterministic and engine-portable (byte
    * 0 of UTF-8 text == ascii of its first char).
    */
  def decodeBytes(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val width = 320 + (b0 % 16) * 80
    val height = width * 9 / 16
    val frames = 1 + (bytes.length % 8)
    (bytes.length.toLong, width, height, frames)
  }

  /** Attach a binary media column (here: the UTF-8 text bytes standing
    * in for media payloads) and decode it per partition. This is the
    * real batch-decode shape: the iterator streams, one "decoder" per
    * partition, no per-row object churn beyond the output rows.
    */
  def decodeMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ metaSchema.fields)
    df.mapPartitions { rows =>
      // a real implementation would initialize the codec once here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (len, w, h, f) = decodeBytes(bytes)
        Row(r.get(idIdx), len, w, h, f)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling stub: the first `nFrames` `frameBytes`-sized
    * slices, fingerprinted.
    *
    * Unlike [[decodeMeta]] (which keeps the `mapPartitions` shape
    * because a real codec is per-partition stateful), the frame-slice
    * stub is pure byte arithmetic — so it runs as native columns:
    * explode over the in-range frame indices, `substr` on the binary,
    * codegen'd `md5`. No Row/Encoder churn, stays inside whole-stage
    * codegen, and a real frame extractor would replace only the
    * `frame_md5` expression with a decode call.
    */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String,
                   nFrames: Int, frameBytes: Int = 16): DataFrame = {
    val bin = col(binCol)
    df
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), lit(nFrames - 1)),
          i => (i * frameBytes) < length(bin))))
      .withColumn("frame_md5",
        md5(bin.substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))))
      .select(col(idCol), col("frame_idx").cast("int").as("frame_idx"), col("frame_md5"))
  }
}

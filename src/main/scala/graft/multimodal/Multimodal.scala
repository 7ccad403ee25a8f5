package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as partition-batched executor code.
  *
  * Header metadata decode is REAL: [[decodeBytes]] parses PNG IHDR,
  * JPEG SOF0-SOF15 (walking the marker-segment stream), and GIF
  * logical-screen-descriptor bytes — pure public format knowledge
  * (the PNG/JPEG/GIF specs), no codec dependencies. What stays out of
  * scope in this environment is PIXEL decode (no image libs ship
  * here); [[sampleFrames]] fingerprints byte slices where a real
  * extractor would decode frames. The Spark shape — binary schema,
  * `mapPartitions` batching, metadata contract — is exactly what a
  * full codec build would use.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse image container headers for (length, format, width, height,
    * channels). Formats and the exact byte layouts parsed:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (always first):
    *    width/height as big-endian u32 at offsets 16/20, color type at
    *    25 → channels (0 gray=1, 2 RGB=3, 3 palette=1, 4 gray+A=2,
    *    6 RGBA=4). Chunk CRCs are not validated (metadata read, not
    *    integrity check).
    *  - JPEG: SOI then a walk over FF-marker segments (each carries a
    *    big-endian u16 length INCLUDING itself) until a start-of-frame
    *    marker — SOF0-SOF15 except the non-frame C4/C8/CC (DHT/JPG/
    *    DAC) — whose payload is precision u8, height u16, width u16,
    *    component count u8. Standalone markers (TEM, RSTn, EOI) have
    *    no length field and are skipped as bare pairs.
    *  - GIF: "GIF87a"/"GIF89a" signature then the logical screen
    *    descriptor: width/height as LITTLE-endian u16 at offsets 6/8
    *    (GIF is the lone little-endian container here); palette
    *    pixels, so 3 channels. Frame count is a REAL block walk: skip
    *    the global color table if the LSD flags one (3 × 2^(size+1)
    *    bytes), then each 0x21 extension skips its label +
    *    length-prefixed sub-blocks, each 0x2C image descriptor counts
    *    a frame and skips its 9-byte header, optional local color
    *    table, LZW min-code byte and data sub-blocks, and 0x3B is the
    *    trailer. Truncated streams count the frames present.
    *
    * `n_frames` is 1 for still formats (PNG/JPEG), the image-
    * descriptor count for GIF, 0 for raw bytes.
    *
    * Anything else falls through to ("raw", 0, 0, 0, 0) — opaque
    * bytes stay opaque rather than failing the batch.
    */
  def decodeBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val len = bytes.length.toLong

    val isPng = bytes.length >= 26 &&
      bytes.take(8).sameElements(PngSig) &&
      new String(bytes, 12, 4, "US-ASCII") == "IHDR"
    val isJpeg = bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8
    val isGif = bytes.length >= 13 && {
      val sig = new String(bytes, 0, 6, "US-ASCII")
      sig == "GIF87a" || sig == "GIF89a"
    }

    if (isPng) {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      (len, "png", be32(16), be32(20), channels, 1)
    } else if (isJpeg) {
      var i = 2
      var out = (len, "jpeg", 0, 0, 0, 1)
      var done = false
      while (!done && i + 3 < bytes.length) {
        if (u8(i) != 0xff) i += 1 // stray byte: resync to next marker
        else {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1 // fill byte before a marker
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
            i += 2 // TEM / RSTn / EOI: standalone, no length
          } else if (marker >= 0xc0 && marker <= 0xcf &&
                     marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // SOFn payload: len(2) precision(1) height(2) width(2) ncomp(1).
            // A stream truncated inside the SOF header falls through to the
            // partial-parse result (dims 0) like the WAV/MP4 walkers do.
            if (i + 9 < bytes.length)
              out = (len, "jpeg", be16(i + 7), be16(i + 5), u8(i + 9), 1)
            done = true
          } else i += 2 + be16(i + 2) // skip segment by its own length
        }
      }
      out
    } else if (isGif) {
      // frame walk: skip the GCT, then count image descriptors
      var i = 13
      if ((u8(10) & 0x80) != 0) i += 3 * (1 << ((u8(10) & 0x07) + 1))
      var frames = 0
      var stop = false
      def skipSubBlocks(): Unit = {
        while (!stop && i < bytes.length && u8(i) != 0) {
          i += 1 + u8(i)
          if (i > bytes.length) stop = true
        }
        i += 1 // the 0x00 block terminator
      }
      while (!stop && i < bytes.length) {
        u8(i) match {
          case 0x21 => i += 2; skipSubBlocks() // extension: label + sub-blocks
          case 0x2c => // image descriptor
            frames += 1
            if (i + 9 < bytes.length && (u8(i + 9) & 0x80) != 0)
              i += 3 * (1 << ((u8(i + 9) & 0x07) + 1)) // local color table
            i += 10 // descriptor header
            i += 1  // LZW minimum code size
            skipSubBlocks()
          case 0x3b => stop = true // trailer
          case _    => stop = true // unknown block: stop counting
        }
      }
      (len, "gif", le16(6), le16(8), 3, frames)
    } else (len, "raw", 0, 0, 0, 0)
  }

  /** Deterministic spec-compliant image fixture: real PNG / JPEG / GIF
    * header bytes (format by `docId % 3`, dimensions and channel
    * layout by `docId` arithmetic) followed by an opaque payload. The
    * headers are assembled byte-for-byte to the container specs — the
    * JPEG even carries APP0(JFIF) and COM segments before the SOF so a
    * decoder must genuinely walk the segment stream — which makes
    * decode(synth(id)) a real round-trip test of [[decodeBytes]]
    * against independently computable expectations (the oracle derives
    * the same numbers arithmetically from `doc_id`).
    */
  def synthHeaderBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = (16 + docId % 317).toInt
    val h = (16 + (docId * 7) % 211).toInt
    (docId % 3) match {
      case 0 => // PNG: signature + IHDR(13) chunk
        val colorType = if (docId % 2 == 0) 2 else 6 // RGB / RGBA
        val bb = java.nio.ByteBuffer.allocate(33 + payload.length)
        bb.put(PngSig)
        bb.putInt(13)
        bb.put("IHDR".getBytes("US-ASCII"))
        bb.putInt(w); bb.putInt(h)
        bb.put(8.toByte)               // bit depth
        bb.put(colorType.toByte)
        bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte) // comp/filter/interlace
        bb.putInt(0)                   // CRC (not validated on read)
        bb.put(payload)
        bb.array()
      case 1 => // JPEG: SOI, APP0(JFIF), COM, SOF0|SOF2
        val ncomp = if (docId % 2 == 0) 3 else 1
        val sofMarker = if (docId % 2 == 0) 0xc0 else 0xc2
        val sofLen = 8 + 3 * ncomp
        val bb = java.nio.ByteBuffer.allocate(34 + sofLen + payload.length)
        bb.put(0xff.toByte); bb.put(0xd8.toByte)            // SOI
        bb.put(0xff.toByte); bb.put(0xe0.toByte)            // APP0
        bb.putShort(16)                                      // len incl. itself
        bb.put("JFIF".getBytes("US-ASCII")); bb.put(0.toByte)
        bb.put(1.toByte); bb.put(2.toByte)                   // version 1.2
        bb.put(0.toByte)                                     // density units
        bb.putShort(1); bb.putShort(1)                       // x/y density
        bb.put(0.toByte); bb.put(0.toByte)                   // thumbnail w/h
        bb.put(0xff.toByte); bb.put(0xfe.toByte)            // COM
        bb.putShort(10)
        bb.put("graftsyn".getBytes("US-ASCII"))
        bb.put(0xff.toByte); bb.put(sofMarker.toByte)       // SOF0 / SOF2
        bb.putShort(sofLen.toShort)
        bb.put(8.toByte)                                     // precision
        bb.putShort(h.toShort); bb.putShort(w.toShort)
        bb.put(ncomp.toByte)
        (0 until ncomp).foreach { c =>
          bb.put((c + 1).toByte); bb.put(0x11.toByte); bb.put(0.toByte)
        }
        bb.put(payload)
        bb.array()
      case _ => // GIF: LSD + 256-entry GCT + n animation frames + trailer
        val frames = 1 + (docId % 4).toInt
        // per frame: GCE(8) + image descriptor(10) + LZW min byte(1)
        //          + one 4-byte data sub-block(5) + terminator(1) = 25
        val bb = java.nio.ByteBuffer.allocate(13 + 768 + frames * 25 + 1 + payload.length)
        bb.put("GIF89a".getBytes("US-ASCII"))
        bb.put((w & 0xff).toByte); bb.put(((w >> 8) & 0xff).toByte)
        bb.put((h & 0xff).toByte); bb.put(((h >> 8) & 0xff).toByte)
        bb.put(0xf7.toByte)           // GCT present, 256 entries (3*256 = 768 B)
        bb.put(0.toByte); bb.put(0.toByte) // bg index, aspect
        bb.put(new Array[Byte](768))  // the global color table itself
        (0 until frames).foreach { f =>
          bb.put(0x21.toByte); bb.put(0xf9.toByte) // graphic control ext
          bb.put(4.toByte)                          // block size
          bb.put(0.toByte)                          // flags
          bb.put((10 * (f + 1)).toByte); bb.put(0.toByte) // delay (LE cs)
          bb.put(0.toByte)                          // transparent index
          bb.put(0.toByte)                          // terminator
          bb.put(0x2c.toByte)                       // image descriptor
          bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte) // left, top
          bb.put((w & 0xff).toByte); bb.put(((w >> 8) & 0xff).toByte)
          bb.put((h & 0xff).toByte); bb.put(((h >> 8) & 0xff).toByte)
          bb.put(0.toByte)                          // no local color table
          bb.put(8.toByte)                          // LZW minimum code size
          bb.put(4.toByte)                          // one 4-byte sub-block
          bb.put(Array[Byte](f.toByte, 1, 2, 3))
          bb.put(0.toByte)                          // sub-block terminator
        }
        bb.put(0x3b.toByte)           // trailer
        bb.put(payload)               // opaque payload rides after the container
        bb.array()
    }
  }

  /** Attach a synthetic media binary per row (format fixture bytes +
    * the row's text bytes as payload) — the ingest face a real store
    * would replace with its object reads. `mapPartitions` row work:
    * binary assembly is imperative byte packing, not expressible as
    * codegen'd columns.
    */
  def attachSynthMedia(df: DataFrame, idCol: String, textCol: String,
                       binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthHeaderBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a binary media column per partition. This is the real
    * batch-decode shape: the iterator streams, one decoder per
    * partition, no per-row object churn beyond the output rows.
    */
  def decodeMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ metaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, w, h, ch, nf) = decodeBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, w, h, ch, nf)
      }
    }(Encoders.row(outSchema))
  }

  // ---- audio: WAV/RIFF container metadata ----

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Parse WAV (RIFF) metadata: verify the RIFF/WAVE signature, then a
    * REAL chunk walk — each chunk is id(4) + LITTLE-endian u32 size +
    * data, word-aligned — collecting the `fmt ` body (PCM format,
    * channels, sample rate, bits) and the `data` chunk's byte length.
    * `duration_ms` is the integer milliseconds data/byte-rate division
    * (exactly mirrorable in oracle SQL). A decoder that assumes the
    * canonical 44-byte layout instead of walking chunks breaks on the
    * LIST-bearing fixtures. Non-WAV bytes → ("raw", 0s).
    */
  def decodeWavBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Long) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    val len = bytes.length.toLong
    val isWav = bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE"
    if (!isWav) return (len, "raw", 0, 0, 0, 0L)
    // LONG cursor: a malformed u32 chunk size (≥ 2^31) truncated to Int
    // would go negative and stall or rewind the walk — an executor
    // thread spinning forever on one corrupt binary. Long arithmetic
    // plus the strictly-forward guard make any malformed size land on
    // the graceful raw fallback instead.
    var i = 12L
    var ch = 0; var rate = 0; var bits = 0; var dataLen = -1L
    while (i + 8 <= bytes.length && (ch == 0 || dataLen < 0)) {
      val ii = i.toInt
      val id = tag(ii); val sz = le32(ii + 4)
      if (id == "fmt " && i + 8 + 16 <= bytes.length) {
        ch = le16(ii + 10); rate = le32(ii + 12).toInt; bits = le16(ii + 22)
      } else if (id == "data") dataLen = sz
      i += 8L + sz + (sz & 1L) // chunks are word-aligned
    }
    if (ch == 0 || rate == 0 || bits == 0 || dataLen < 0) (len, "raw", 0, 0, 0, 0L)
    else {
      val byteRate = rate.toLong * ch * bits / 8
      (len, "wav", ch, rate, bits, dataLen * 1000L / byteRate)
    }
  }

  /** Deterministic spec-compliant WAV fixture: channels/sample-rate by
    * `docId` arithmetic, 16-bit PCM, the row's payload as the data
    * chunk — and every third fixture carries a LIST(INFO) chunk BEFORE
    * `fmt ` so the decoder must genuinely walk chunks. The oracle
    * recomputes every field (including the integer-division
    * duration_ms) arithmetically from doc_id and the payload length.
    */
  def synthWavBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val ch = 1 + (docId % 2).toInt
    val rate = 8000 * (1 + (docId % 5).toInt)
    val bits = 16
    val listBytes = if (docId % 3 == 0) 20 else 0 // "LIST" + size + 12-byte body
    val riffSize = 4 + listBytes + 24 + 8 + payload.length
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    if (listBytes > 0) {
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(12)
      bb.put("INFO".getBytes("US-ASCII")); bb.put(new Array[Byte](8))
    }
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1.toShort)                       // PCM
    bb.putShort(ch.toShort)
    bb.putInt(rate)
    bb.putInt(rate * ch * bits / 8)              // byte rate
    bb.putShort((ch * bits / 8).toShort)         // block align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(payload.length)
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic WAV binary per row (see [[attachSynthMedia]]). */
  def attachSynthAudio(df: DataFrame, idCol: String, textCol: String,
                       binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthWavBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a WAV binary column per partition (the [[decodeMeta]]
    * shape for audio).
    */
  def decodeAudioMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ audioMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, ch, rate, bits, durMs) = decodeWavBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, ch, rate, bits, durMs)
      }
    }(Encoders.row(outSchema))
  }

  // ---- video: MP4 (ISO-BMFF) container metadata ----

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_boxes", IntegerType, nullable = false)))

  /** Parse MP4 (ISO-BMFF) metadata: a REAL box walk — each box is a
    * big-endian u32 size + 4cc type — over the top level (counting
    * boxes), descending into `moov` for the `mvhd` movie header.
    * Both header versions are read (real corpora mix them): v0 packs
    * timescale u32 at payload+12 and duration u32 at +16; v1 carries
    * 64-bit creation/modification/duration, so timescale sits at
    * payload+20 and duration u64 at +24. Long cursors throughout, so
    * a malformed size lands on the raw fallback instead of stalling
    * (the WAV lesson). `duration_ms` is integer ticks·1000/timescale —
    * mirrorable in oracle SQL. Requires a leading `ftyp`; anything
    * else → raw.
    */
  def decodeMp4Bytes(bytes: Array[Byte]): (Long, String, Int, Long, Long, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0L, 0L, 0)
    if (bytes.length < 16 || tag(4) != "ftyp") return raw
    var i = 0L
    var nBoxes = 0
    var timescale = 0; var ticks = -1L
    while (i + 8 <= len) {
      val ii = i.toInt
      val sz = be32(ii); val tp = tag(ii + 4)
      if (sz < 8) return raw // malformed: would stall or rewind
      nBoxes += 1
      if (tp == "moov") {
        // child walk inside moov's payload
        var j = i + 8
        val end = math.min(i + sz, len)
        while (j + 8 <= end) {
          val jj = j.toInt
          val csz = be32(jj); val ctp = tag(jj + 4)
          if (csz < 8) return raw
          if (ctp == "mvhd" && j + 8 + 20 <= end && u8(jj + 8) == 0) {
            timescale = be32(jj + 8 + 12).toInt
            ticks = be32(jj + 8 + 16)
          } else if (ctp == "mvhd" && j + 8 + 32 <= end && u8(jj + 8) == 1) {
            timescale = be32(jj + 8 + 20).toInt
            ticks = be64(jj + 8 + 24)
          }
          j += csz
        }
      }
      i += sz
    }
    if (timescale <= 0 || ticks < 0) raw
    else (len, "mp4", timescale, ticks, ticks * 1000L / timescale, nBoxes)
  }

  /** Deterministic spec-compliant MP4 fixture: ftyp + (every third: a
    * `free` box, so the parser must genuinely walk) + moov(mvhd with
    * docId-derived timescale/duration) + mdat carrying the payload.
    * Odd doc ids emit a VERSION-1 mvhd (64-bit times, 120-byte box)
    * with a duration past u32 — real corpora mix both header
    * versions, and a u32-only reader would truncate. The oracle
    * recomputes every field — box count, byte length, version-split
    * ticks, integer-division duration — arithmetically from doc_id.
    */
  def synthMp4Bytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val timescale = 1000 * (1 + (docId % 3).toInt)
    val v1 = docId % 2 == 1
    val ticks = (if (v1) 0x100000000L else 0L) + (docId % 9999L) * 7 + 1000
    val withFree = docId % 3 == 0
    val freeBytes = if (withFree) 16 else 0
    val mvhdSize = if (v1) 120 else 108 // standard v1/v0 mvhd boxes
    val moovSize = 8 + mvhdSize
    val bb = java.nio.ByteBuffer.allocate(16 + freeBytes + moovSize + 8 + payload.length)
    def box(size: Int, tp: String): Unit = {
      bb.putInt(size); bb.put(tp.getBytes("US-ASCII"))
    }
    box(16, "ftyp")
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)        // brand + minor
    if (withFree) { box(16, "free"); bb.put(new Array[Byte](8)) }
    box(moovSize, "moov")
    box(mvhdSize, "mvhd")
    if (v1) {
      bb.put(1.toByte); bb.put(new Array[Byte](3))           // version 1 + flags
      bb.putLong(0L); bb.putLong(0L)                         // creation, modification u64
      bb.putInt(timescale)
      bb.putLong(ticks)
      bb.put(new Array[Byte](mvhdSize - 8 - 4 - 16 - 4 - 8)) // rate..next_track_ID
    } else {
      bb.put(0.toByte); bb.put(new Array[Byte](3))           // version 0 + flags
      bb.putInt(0); bb.putInt(0)                             // creation, modification
      bb.putInt(timescale)
      bb.putInt(ticks.toInt)
      bb.put(new Array[Byte](mvhdSize - 8 - 4 - 16))         // rate..next_track_ID
    }
    box(8 + payload.length, "mdat")
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic MP4 binary per row (see [[attachSynthMedia]]). */
  def attachSynthVideo(df: DataFrame, idCol: String, textCol: String,
                       binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthMp4Bytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode an MP4 binary column per partition (the [[decodeMeta]]
    * shape for video).
    */
  def decodeVideoMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ videoMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, ts, tk, ms, nb) = decodeMp4Bytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, ts, tk, ms, nb)
      }
    }(Encoders.row(outSchema))
  }

  // ---- compressed audio: MP3 (MPEG audio) frame header + ID3v2 ----

  val mp3MetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("layer", IntegerType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** MPEG-1 Layer III bitrate table, kbps by header index 1..14
    * (index 0 = free-format, 15 = forbidden — both fall to raw).
    */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by header index 0..2 (3 = reserved → raw). */
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Parse MP3 metadata: a REAL ID3v2 skip (the 4-byte SYNCSAFE size —
    * 7 bits per byte, any high bit set is malformed → raw) followed by
    * the first MPEG audio frame header (11-bit sync, version/layer
    * bits, bitrate + sample-rate table indices, channel mode). The
    * decode envelope is MPEG-1 Layer III (the ubiquitous corpus
    * shape); other version/layer combos, free-format/forbidden
    * bitrates, and reserved sample rates all land on the raw
    * fallback — never an exception (the WAV/MP4 malformed-input
    * lesson). `duration_ms` is the CBR estimate: audio bytes × 8 over
    * kbps (= bits per millisecond), in integer division — mirrorable
    * in oracle SQL.
    */
  def decodeMp3Bytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Int, Long) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, 0, 0, 0L)
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
    var off = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val ss = Seq(u8(6), u8(7), u8(8), u8(9))
      if (ss.exists(_ >= 0x80)) return raw // not syncsafe: malformed
      off = 10L + ((ss(0) << 21) | (ss(1) << 14) | (ss(2) << 7) | ss(3))
    }
    if (off + 4 > len) return raw
    val o = off.toInt
    val (b1, b2, b3) = (u8(o + 1), u8(o + 2), u8(o + 3))
    if (u8(o) != 0xff || (b1 & 0xe0) != 0xe0) return raw // 11-bit sync
    val verBits = (b1 >> 3) & 3
    val layerBits = (b1 >> 1) & 3
    if (verBits != 3 || layerBits != 1) return raw // envelope: MPEG-1 Layer III
    val layer = 4 - layerBits                      // bits 01 = Layer III
    val biIdx = (b2 >> 4) & 0xf
    val srIdx = (b2 >> 2) & 3
    if (biIdx == 0 || biIdx == 15 || srIdx == 3) return raw
    val kbps = Mp3Bitrates(biIdx)
    val mode = (b3 >> 6) & 3
    val channels = if (mode == 3) 1 else 2
    // VBR: real corpora are VBR-heavy, and a VBR file's CBR estimate
    // (first frame's bitrate) is wrong — the Xing ("Xing" = VBR,
    // "Info" = LAME CBR) block sits at the fixed layout offset past
    // the first frame's side info (MPEG-1: 17 bytes mono, 32 stereo),
    // carrying u32be flags; FRAMES flag bit 0 → u32be total frame
    // count, duration = frames × 1152 samples / rate (integer ms,
    // mirrorable). Bounds-guarded; absent/flagless falls to CBR.
    val side = if (channels == 1) 17 else 32
    val xo = o + 4 + side
    val vbrMs: Option[Long] =
      if (xo + 12L <= len &&
          ((bytes(xo) == 'X' && bytes(xo + 1) == 'i' &&
            bytes(xo + 2) == 'n' && bytes(xo + 3) == 'g') ||
           (bytes(xo) == 'I' && bytes(xo + 1) == 'n' &&
            bytes(xo + 2) == 'f' && bytes(xo + 3) == 'o'))) {
        val flags = (u8(xo + 4) << 24) | (u8(xo + 5) << 16) |
          (u8(xo + 6) << 8) | u8(xo + 7)
        if ((flags & 1) != 0) {
          val frames = (u8(xo + 8).toLong << 24) | (u8(xo + 9) << 16) |
            (u8(xo + 10) << 8) | u8(xo + 11)
          Some(frames * 1152L * 1000L / Mp3Rates(srIdx))
        } else None
      } else None
    val audioLen = len - off
    val ms = vbrMs.getOrElse(audioLen * 8L / kbps)
    (len, "mp3", layer, kbps, Mp3Rates(srIdx), channels, ms)
  }

  /** Deterministic spec-compliant MP3 fixture: every third doc carries
    * an ID3v2 tag whose size (130 + docId % 700) needs genuine
    * syncsafe decoding (≥ 128, so the two low groups both matter),
    * then one MPEG-1 Layer III frame header with docId-derived
    * bitrate/rate/mode indices and the payload as the audio body. The
    * oracle recomputes every field arithmetically from doc_id.
    */
  def synthMp3Bytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val id3Size = if (docId % 3 == 0) 130 + (docId % 700).toInt else -1
    val id3Total = if (id3Size >= 0) 10 + id3Size else 0
    val biIdx = 1 + (docId % 14).toInt
    val srIdx = (docId % 3).toInt
    val mode = if (docId % 2 == 1) 3 else 0 // mono / stereo
    // every fifth-ish doc is VBR: zeroed side info (17 mono / 32
    // stereo) + "Xing" + FRAMES flag + u32be frame count, so the
    // fixture mixes CBR and VBR files like a real corpus
    val xing = docId % 5 == 2
    val side = if (mode == 3) 17 else 32
    val xingExtra = if (xing) side + 12 else 0
    val bb = java.nio.ByteBuffer.allocate(id3Total + 4 + xingExtra + payload.length)
    if (id3Size >= 0) {
      bb.put("ID3".getBytes("US-ASCII"))
      bb.put(4.toByte); bb.put(0.toByte); bb.put(0.toByte) // v2.4, no flags
      bb.put(((id3Size >> 21) & 0x7f).toByte); bb.put(((id3Size >> 14) & 0x7f).toByte)
      bb.put(((id3Size >> 7) & 0x7f).toByte); bb.put((id3Size & 0x7f).toByte)
      bb.put(new Array[Byte](id3Size))
    }
    bb.put(0xff.toByte); bb.put(0xfb.toByte) // sync + MPEG-1 + Layer III + no CRC
    bb.put(((biIdx << 4) | (srIdx << 2)).toByte)
    bb.put((mode << 6).toByte)
    if (xing) {
      bb.put(new Array[Byte](side))
      bb.put("Xing".getBytes("US-ASCII"))
      bb.putInt(1) // u32be flags: FRAMES present
      bb.putInt((100 + (docId % 977)).toInt) // u32be frame count
    }
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic MP3 binary per row (see [[attachSynthMedia]]). */
  def attachSynthMp3(df: DataFrame, idCol: String, textCol: String,
                     binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthMp3Bytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode an MP3 binary column per partition (the [[decodeMeta]]
    * shape for compressed audio).
    */
  def decodeMp3Meta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ mp3MetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, layer, kbps, rate, ch, ms) =
          decodeMp3Bytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, layer, kbps, rate, ch, ms)
      }
    }(Encoders.row(outSchema))
  }

  // ---- WebP (RIFF) image metadata ----

  val webpMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("has_alpha", BooleanType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false)))

  /** Parse WebP metadata: RIFF/WEBP signature, then the real chunk
    * walk (fourcc + LITTLE-endian u32 size + data, word-aligned like
    * WAV), reading dimensions from whichever image chunk leads:
    *   - `VP8 ` (lossy): 3-byte frame tag, the 9D 01 2A sync code,
    *     then 14-bit width/height in u16le fields;
    *   - `VP8L` (lossless): the 0x2F signature byte, then width-1 /
    *     height-1 as two 14-bit fields of a u32le bitstream, with the
    *     alpha-hint bit at bit 28;
    *   - `VP8X` (extended): a flags byte (ALPHA at bit 4), 3 reserved
    *     bytes, canvas width-1 / height-1 as 24-bit LE fields.
    * Malformed or truncated input falls through to ("raw", 0, 0) —
    * every read is bounds-guarded (the JPEG-SOF lesson).
    */
  def decodeWebpBytes(bytes: Array[Byte]): (Long, String, Int, Int, Boolean, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u24le(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def u32le(i: Int): Long = u24le(i).toLong | (u8(i + 3).toLong << 24)
    def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, false, 0)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return raw
    var off = 12
    var n = 0
    var out: Option[(String, Int, Int, Boolean)] = None
    while (off + 8 <= bytes.length) {
      val id = fourcc(off)
      val size = u32le(off + 4)
      if (size > bytes.length - off - 8) return raw // truncated chunk
      val p = off + 8
      n += 1
      if (out.isEmpty) id match {
        case "VP8 " =>
          if (size >= 10 && u8(p + 3) == 0x9d && u8(p + 4) == 0x01 && u8(p + 5) == 0x2a)
            out = Some(("webp-lossy", u16le(p + 6) & 0x3fff, u16le(p + 8) & 0x3fff, false))
          else return raw
        case "VP8L" =>
          if (size >= 5 && u8(p) == 0x2f) {
            val b = u32le(p + 1)
            out = Some(("webp-lossless", (b & 0x3fff).toInt + 1,
              ((b >> 14) & 0x3fff).toInt + 1, ((b >> 28) & 1) == 1))
          } else return raw
        case "VP8X" =>
          if (size >= 10)
            out = Some(("webp-extended", u24le(p + 4) + 1, u24le(p + 7) + 1,
              ((u8(p) >> 4) & 1) == 1))
          else return raw
        case _ => ()
      }
      off = p + size.toInt + (size.toInt & 1) // word-aligned
    }
    out match {
      case Some((fmt, w, h, a)) => (len, fmt, w, h, a, n)
      case None                 => raw
    }
  }

  /** Deterministic spec-compliant WebP fixture, variant by doc_id % 3:
    * 0 → lossy (`VP8 ` frame tag + sync + 14-bit dims), 1 → lossless
    * (`VP8L` with the packed 14-bit dims-minus-one bitstream and the
    * alpha bit — a 5-byte ODD payload, so the walker must honor the
    * RIFF pad byte), 2 → extended (`VP8X` canvas dims + alpha flag,
    * followed by a `VP8 ` image chunk — two chunks, as the spec
    * requires). Dims and alpha derive from doc_id so the oracle
    * recomputes every field arithmetically.
    */
  def synthWebpBytes(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 1000).toInt
    val h = 16 + ((docId * 3) % 800).toInt
    val alpha = docId % 2 == 1
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")); bb.putInt(payload.length); bb.put(payload)
      bb.array()
    }
    def vp8Lossy: Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.put(new Array[Byte](3)) // frame tag
      p.put(0x9d.toByte); p.put(0x01.toByte); p.put(0x2a.toByte)
      p.putShort(w.toShort); p.putShort(h.toShort)
      chunk("VP8 ", p.array())
    }
    val body: Array[Byte] = (docId % 3) match {
      case 0 => vp8Lossy
      case 1 =>
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          ((if (alpha) 1L else 0L) << 28)
        val p = java.nio.ByteBuffer.allocate(5).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        p.put(0x2f.toByte); p.putInt(bits.toInt)
        chunk("VP8L", p.array())
      case _ =>
        val p = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        p.put((if (alpha) 0x10 else 0x00).toByte) // ALPHA at bit 4
        p.put(new Array[Byte](3))
        p.put((w - 1).toByte); p.put(((w - 1) >> 8).toByte); p.put(((w - 1) >> 16).toByte)
        p.put((h - 1).toByte); p.put(((h - 1) >> 8).toByte); p.put(((h - 1) >> 16).toByte)
        chunk("VP8X", p.array()) ++ vp8Lossy
    }
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(4 + body.length)
    bb.put("WEBP".getBytes("US-ASCII")); bb.put(body)
    bb.array()
  }

  /** Attach a synthetic WebP binary per row (see [[attachSynthMedia]]). */
  def attachSynthWebp(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ synthWebpBytes(r.getLong(idIdx))))
    }(Encoders.row(outSchema))
  }

  /** Decode a WebP binary column per partition (the [[decodeMeta]]
    * shape).
    */
  def decodeWebpMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ webpMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, w, h, a, nc) = decodeWebpBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, w, h, a, nc)
      }
    }(Encoders.row(outSchema))
  }

  // ---- FLAC audio metadata ----

  val flacMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false)))

  private[multimodal] val FlacRates =
    Array(8000, 16000, 22050, 24000, 32000, 44100, 48000)

  /** Parse FLAC metadata: the `fLaC` marker, then the metadata-block
    * walk — each block is a header byte (bit 7 = last-block flag, bits
    * 6..0 = type) + big-endian u24 length + payload. STREAMINFO (type
    * 0, ≥34 bytes) carries the stream parameters in a PACKED 64-bit
    * big-endian field at payload offset 10 whose sub-fields straddle
    * byte boundaries (the genuinely-bit-packed case the byte-aligned
    * walkers never exercise):
    *   bits 63..44  sample rate (20 bits),
    *   bits 43..41  channels − 1 (3 bits),
    *   bits 40..36  bits-per-sample − 1 (5 bits),
    *   bits 35..0   total samples (36 bits).
    * Duration = total·1000 / rate in integer ms. Malformed or
    * truncated input (bad marker, block running past the buffer, short
    * STREAMINFO, rate 0 — invalid per spec) falls through to raw; every
    * read is bounds-guarded.
    */
  def decodeFlacBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Long, Long, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u24be(i: Int): Int = (u8(i) << 16) | (u8(i + 1) << 8) | u8(i + 2)
    def u64be(i: Int): Long = {
      var v = 0L; var j = 0
      while (j < 8) { v = (v << 8) | u8(i + j); j += 1 }
      v
    }
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, 0, 0L, 0L, 0)
    if (bytes.length < 4 || new String(bytes, 0, 4, "US-ASCII") != "fLaC") return raw
    var off = 4
    var n = 0
    var info: Option[(Int, Int, Int, Long)] = None
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) return raw
      val hdr = u8(off)
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7f
      val blen = u24be(off + 1)
      if (off + 4 + blen > bytes.length) return raw // block past the buffer
      if (tpe == 0 && info.isEmpty) {
        if (blen < 34) return raw
        val v = u64be(off + 4 + 10)
        val rate = (v >>> 44).toInt
        if (rate == 0) return raw
        info = Some((rate, ((v >>> 41) & 0x7).toInt + 1,
          ((v >>> 36) & 0x1f).toInt + 1, v & 0xfffffffffL))
      }
      n += 1
      off += 4 + blen
    }
    info match {
      case Some((rate, ch, bps, total)) =>
        (len, "flac", rate, ch, bps, total, total * 1000L / rate, n)
      case None => raw
    }
  }

  /** Deterministic spec-compliant FLAC fixture: `fLaC` + STREAMINFO
    * (docId-derived rate/channels/total-samples bit-packed exactly as
    * the spec lays them out) + an every-third-doc VORBIS_COMMENT block
    * (so the walker's last-block flag and block counting both carry
    * signal) + the payload as the frame section. The oracle recomputes
    * every field arithmetically from doc_id.
    */
  def synthFlacBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val rate = FlacRates((docId % 7).toInt)
    val ch = 1 + (docId % 2).toInt
    val bps = 16
    val total = (docId % 100000L) * 441L + 1000L
    val vcLen = if (docId % 3 == 0) 16 + (docId % 40).toInt else -1
    val bb = java.nio.ByteBuffer
      .allocate(4 + 4 + 34 + (if (vcLen >= 0) 4 + vcLen else 0) + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("fLaC".getBytes("US-ASCII"))
    // STREAMINFO header: last iff no vorbis comment follows
    bb.put((if (vcLen >= 0) 0x00 else 0x80).toByte)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(34.toByte)
    bb.putShort(4096.toShort); bb.putShort(4096.toShort) // min/max blocksize
    bb.put(new Array[Byte](6))                           // min/max framesize u24
    bb.putLong((rate.toLong << 44) | ((ch - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total)
    bb.put(new Array[Byte](16)) // md5
    if (vcLen >= 0) {
      bb.put(0x84.toByte) // last | VORBIS_COMMENT
      bb.put(((vcLen >> 16) & 0xff).toByte); bb.put(((vcLen >> 8) & 0xff).toByte)
      bb.put((vcLen & 0xff).toByte)
      bb.put(new Array[Byte](vcLen))
    }
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic FLAC binary per row (see [[attachSynthMedia]]). */
  def attachSynthFlac(df: DataFrame, idCol: String, textCol: String,
                      binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthFlacBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a FLAC binary column per partition (the [[decodeMeta]]
    * shape for lossless audio).
    */
  def decodeFlacMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ flacMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, rate, ch, bps, total, ms, nb) =
          decodeFlacBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, rate, ch, bps, total, ms, nb)
      }
    }(Encoders.row(outSchema))
  }

  // ---- Ogg/Opus container metadata ----

  val oggMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pre_skip", IntegerType, nullable = false),
    StructField("input_rate", IntegerType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private[multimodal] val OpusRates = Array(8000, 12000, 16000, 24000, 48000)

  /** Parse Ogg/Opus metadata: the real Ogg page walk — each page is
    * `OggS` + version(0) + header-type flags + u64le granule position
    * + u32le serial/sequence/crc + a segment count and its lacing
    * table (payload length = Σ lacing values; the continuation
    * mechanism Ogg actually uses, LITTLE-endian throughout, unlike the
    * big-endian FLAC/MP4 walks) — with the `OpusHead` identification
    * header in the FIRST (BOS) page's payload: version, channel
    * count, u16le pre-skip, u32le input sample rate. Granule
    * positions count 48 kHz output samples regardless of input rate
    * (the Opus-in-Ogg mapping, RFC 7845), so duration =
    * (last granule − pre-skip)·1000 / 48000 in integer ms. Malformed
    * or truncated input (bad capture pattern, nonzero version, page
    * past the buffer, short/missing OpusHead) falls to raw;
    * bounds-guarded like every walker here.
    */
  def decodeOggBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Int, Long) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def u64le(i: Int): Long = u32le(i) | (u32le(i + 4) << 32)
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, 0, 0, 0L)
    var off = 0
    var nPages = 0
    var lastGranule = 0L
    var head: Option[(Int, Int, Int)] = None // channels, preSkip, rate
    while (off + 27 <= bytes.length &&
           bytes(off) == 'O' && bytes(off + 1) == 'g' &&
           bytes(off + 2) == 'g' && bytes(off + 3) == 'S') {
      if (u8(off + 4) != 0) return raw // stream_structure_version
      val granule = u64le(off + 6)
      val nSegs = u8(off + 26)
      if (off + 27 + nSegs > bytes.length) return raw
      var payloadLen = 0
      var i = 0
      while (i < nSegs) { payloadLen += u8(off + 27 + i); i += 1 }
      val payloadOff = off + 27 + nSegs
      if (payloadOff + payloadLen > bytes.length) return raw
      if (nPages == 0) {
        // BOS page must carry the OpusHead identification header
        if ((u8(off + 5) & 0x02) == 0 || payloadLen < 19 ||
            new String(bytes, payloadOff, 8, "US-ASCII") != "OpusHead")
          return raw
        head = Some((u8(payloadOff + 9), u16le(payloadOff + 10),
          u32le(payloadOff + 12).toInt))
      }
      // granule moves the duration clock only when it is a real
      // position: -1 (all-ones u64) is the RFC 3533 "no packet
      // completes on this page" sentinel for continued packets —
      // u64le folds it to -1L so the `> 0` guard skips it (spec-pinned
      // with a continued-packet page) — and granule-0 header pages
      // (OpusTags) carry no audio time either.
      if (granule > 0) lastGranule = granule
      nPages += 1
      off = payloadOff + payloadLen
    }
    head match {
      case Some((ch, preSkip, rate)) if nPages >= 1 =>
        val ms = math.max(0L, lastGranule - preSkip) * 1000L / 48000L
        (len, "opus", ch, preSkip, rate, nPages, ms)
      case _ => raw
    }
  }

  /** Deterministic spec-compliant Ogg/Opus fixture: a BOS page with a
    * real OpusHead (docId-derived channels / pre-skip / input rate),
    * an every-third-doc OpusTags comment page (so page counting and
    * non-audio granule-0 pages both carry signal), and one EOS data
    * page whose payload is the doc text, laced through the genuine
    * 255-run segment table, with the final granule at
    * pre-skip + (docId % 100000)·48 + 960. The oracle recomputes every
    * field — including the lacing overhead ⌊len/255⌋+1 — from doc_id
    * and octet_length(text).
    */
  def synthOggBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val ch = 1 + (docId % 2).toInt
    val preSkip = (docId % 312).toInt
    val rate = OpusRates((docId % 5).toInt)
    val granule = preSkip + (docId % 100000L) * 48L + 960L
    val tags = docId % 3 == 0
    val nSegs = payload.length / 255 + 1
    val tagsLen = if (tags) 27 + 1 + 16 else 0
    val bb = java.nio.ByteBuffer
      .allocate(47 + tagsLen + 27 + nSegs + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def page(flags: Int, gran: Long, seq: Int, lacing: Array[Byte]): Unit = {
      bb.put("OggS".getBytes("US-ASCII"))
      bb.put(0.toByte); bb.put(flags.toByte)
      bb.putLong(gran)
      bb.putInt((docId % 1000000L).toInt) // serial
      bb.putInt(seq)
      bb.putInt(0) // crc (not validated by the metadata walk)
      bb.put(lacing.length.toByte)
      bb.put(lacing)
    }
    page(0x02, 0L, 0, Array(19.toByte)) // BOS
    bb.put("OpusHead".getBytes("US-ASCII"))
    bb.put(1.toByte); bb.put(ch.toByte)
    bb.putShort(preSkip.toShort)
    bb.putInt(rate)
    bb.putShort(0.toShort) // output gain
    bb.put(0.toByte)       // mapping family
    if (tags) {
      page(0x00, 0L, 1, Array(16.toByte))
      bb.put("OpusTags".getBytes("US-ASCII"))
      bb.putInt(0); bb.putInt(0) // vendor len, comment count
    }
    val lacing = new Array[Byte](nSegs)
    var rem = payload.length
    var i = 0
    while (i < nSegs) {
      lacing(i) = math.min(rem, 255).toByte
      rem -= math.min(rem, 255)
      i += 1
    }
    page(0x04, granule, if (tags) 2 else 1, lacing) // EOS data page
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic Ogg/Opus binary per row. */
  def attachSynthOgg(df: DataFrame, idCol: String, textCol: String,
                     binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthOggBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode an Ogg/Opus binary column per partition. */
  def decodeOggMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ oggMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, ch, ps, rate, np, ms) =
          decodeOggBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, ch, ps, rate, np, ms)
      }
    }(Encoders.row(outSchema))
  }

  // ---- TIFF image metadata ----

  val tiffMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false)))

  /** Parse TIFF metadata: the byte-order header (`II*\0` little-endian
    * or `MM\0*` big-endian — the ONE container whose endianness is
    * per-file, so every multi-byte read below goes through the
    * order-dispatched accessors), then the IFD chain walk: u32 offset
    * → u16 entry count → 12-byte entries (tag u16, type u16, count
    * u32, value field) → u32 next-IFD offset. Dimensions come from the
    * FIRST IFD's tags 256 (ImageWidth) / 257 (ImageLength) / 258
    * (BitsPerSample), read inline from the value field left-justified
    * per spec (SHORT = first 2 bytes in file order, LONG = all 4);
    * `n_pages` counts the chain. Malformed input (bad magic, IFD past
    * the buffer, zero dims, offset cycle) falls through to raw.
    */
  def decodeTiffBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, 0, 0)
    if (bytes.length < 8) return raw
    val little =
      if (bytes(0) == 'I' && bytes(1) == 'I' && u8(2) == 42 && u8(3) == 0) true
      else if (bytes(0) == 'M' && bytes(1) == 'M' && u8(2) == 0 && u8(3) == 42) false
      else return raw
    def u16(i: Int): Int =
      if (little) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (little) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    var ifd = u32(4)
    var pages = 0
    var w = 0; var h = 0; var bits = 0
    val seen = scala.collection.mutable.Set.empty[Long]
    while (ifd != 0) {
      if (ifd + 2 > len || !seen.add(ifd)) return raw // truncated or cyclic
      val o = ifd.toInt
      val n = u16(o)
      if (o + 2 + 12 * n + 4 > len) return raw
      if (pages == 0) {
        var e = 0
        while (e < n) {
          val p = o + 2 + 12 * e
          val tag = u16(p)
          val tpe = u16(p + 2)
          // inline value: LONG(4) = u32, SHORT(3) = first 2 bytes
          val v = if (tpe == 4) u32(p + 8) else u16(p + 8).toLong
          tag match {
            case 256 => w = v.toInt
            case 257 => h = v.toInt
            case 258 => bits = v.toInt
            case _   => ()
          }
          e += 1
        }
      }
      pages += 1
      ifd = u32(o + 2 + 12 * n)
    }
    if (pages == 0 || w <= 0 || h <= 0) raw
    else (len, "tiff", w, h, bits, pages)
  }

  /** Deterministic spec-compliant TIFF fixture: endianness alternates
    * by doc_id (`II` even / `MM` odd — both accessor paths exercised
    * on every run), each IFD carries ImageWidth (LONG), ImageLength
    * (LONG) and BitsPerSample (SHORT, inline left-justified), and
    * every fourth doc chains a second page IFD before the payload.
    * The oracle recomputes dims/layout arithmetically from doc_id.
    */
  def synthTiffBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val little = docId % 2 == 0
    val w = 1 + (docId % 4096).toInt
    val h = 1 + ((docId * 5) % 2048).toInt
    val bits = 8 * (1 + (docId % 2).toInt)
    val pages = if (docId % 4 == 0) 2 else 1
    val IfdLen = 2 + 3 * 12 + 4
    val bb = java.nio.ByteBuffer.allocate(8 + pages * IfdLen + payload.length)
      .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    bb.put((if (little) "II" else "MM").getBytes("US-ASCII"))
    bb.putShort(42.toShort)
    bb.putInt(8) // first IFD right after the header
    var pg = 0
    while (pg < pages) {
      bb.putShort(3.toShort)
      def entry(tag: Int, tpe: Int, value: Int): Unit = {
        bb.putShort(tag.toShort); bb.putShort(tpe.toShort); bb.putInt(1)
        if (tpe == 3) { bb.putShort(value.toShort); bb.putShort(0.toShort) }
        else bb.putInt(value)
      }
      entry(256, 4, w)
      entry(257, 4, h)
      entry(258, 3, bits)
      val next = if (pg + 1 < pages) 8 + (pg + 1) * IfdLen else 0
      bb.putInt(next)
      pg += 1
    }
    bb.put(payload)
    bb.array()
  }

  /** Attach a synthetic TIFF binary per row (see [[attachSynthMedia]]). */
  def attachSynthTiff(df: DataFrame, idCol: String, textCol: String,
                      binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthTiffBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a TIFF binary column per partition (the [[decodeMeta]]
    * shape).
    */
  def decodeTiffMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ tiffMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, w, h, bits, pg) =
          decodeTiffBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, w, h, bits, pg)
      }
    }(Encoders.row(outSchema))
  }

  // ---- Matroska / WebM (EBML) container metadata ----

  val mkvMetaSchema: StructType = StructType(Seq(
    StructField("bin_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_clusters", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private[multimodal] val MkvRates = Array(8000, 16000, 44100, 48000)

  /** Parse Matroska/WebM metadata: a real EBML walk (RFC 8794 +
    * the public Matroska element registry). Element IDs are VINTs
    * with the length-marker bits KEPT (0x1A45DFA3 EBML, 0x18538067
    * Segment, …); sizes are VINTs with the marker stripped, where the
    * all-ones value means UNKNOWN SIZE — the streaming-file case —
    * which this walker resolves as "to the end of the enclosing
    * container" (how live-muxed .webm actually ships). The walk
    * descends only into the known containers (EBML header, Segment,
    * Info, Tracks, TrackEntry, Video, Audio), captures the known
    * leaves (DocType, TimestampScale, Duration float32/64-BE,
    * PixelWidth/Height, Channels, SamplingFrequency), counts Cluster
    * elements WITHOUT parsing their blocks (media data stays opaque,
    * per the multimodal mandate), and skips everything unknown by
    * size — the property that makes EBML forward-compatible.
    * duration_ms = Duration ticks × TimestampScale (ns) / 1e6.
    * Malformed input (bad magic, VINT past the buffer, alien doctype,
    * over-deep nesting) falls to raw.
    */
  def decodeMkvBytes(bytes: Array[Byte]): (Long, String, Int, Int, Int, Int, Int, Long) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    val len = bytes.length.toLong
    val raw = (len, "raw", 0, 0, 0, 0, 0, 0L)
    def vintWidth(b: Int): Int = {
      if ((b & 0x80) != 0) 1 else if ((b & 0x40) != 0) 2
      else if ((b & 0x20) != 0) 3 else if ((b & 0x10) != 0) 4
      else if ((b & 0x08) != 0) 5 else if ((b & 0x04) != 0) 6
      else if ((b & 0x02) != 0) 7 else if ((b & 0x01) != 0) 8 else 0
    }
    def uintAt(off: Int, sz: Int): Long = {
      var v = 0L; var i = 0
      while (i < sz) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }
    def floatAt(off: Int, sz: Int): Double =
      if (sz == 4) java.lang.Float.intBitsToFloat(uintAt(off, 4).toInt).toDouble
      else if (sz == 8) java.lang.Double.longBitsToDouble(uintAt(off, 8))
      else 0.0
    var docType = ""
    var tsScale = 1000000L // EBML default: 1 ms ticks
    var durTicks = 0.0
    var width = 0; var height = 0
    var channels = 0; var rate = 0
    var clusters = 0
    // returns false on any structural violation -> raw
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      if (depth > 8) return false
      var off = start
      while (off < end) {
        if (off >= bytes.length) return false
        val iw = vintWidth(u8(off))
        if (iw == 0 || iw > 4 || off + iw > end) return false
        val id = uintAt(off, iw)
        val so = off + iw
        if (so >= end) return false
        val sw = vintWidth(u8(so))
        if (sw == 0 || so + sw > end) return false
        var sv = (u8(so) & (0xFF >>> sw)).toLong
        var i = 1
        while (i < sw) { sv = (sv << 8) | u8(so + i); i += 1 }
        val unknown = sv == (1L << (7 * sw)) - 1
        val body = so + sw
        val sz = if (unknown) (end - body).toLong else sv
        if (body + sz > end) return false
        val bodyEnd = (body + sz).toInt
        id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL |
               0xAEL | 0xE0L | 0xE1L =>
            if (!walk(body, bodyEnd, depth + 1)) return false
          case 0x4282L   => docType = new String(bytes, body, sz.toInt, "US-ASCII")
          case 0x2AD7B1L => tsScale = uintAt(body, sz.toInt)
          case 0x4489L   => durTicks = floatAt(body, sz.toInt)
          case 0xB0L     => width = uintAt(body, sz.toInt).toInt
          case 0xBAL     => height = uintAt(body, sz.toInt).toInt
          case 0x9FL     => channels = uintAt(body, sz.toInt).toInt
          case 0xB5L     => rate = math.round(floatAt(body, sz.toInt)).toInt
          case 0x1F43B675L => clusters += 1 // blocks stay opaque
          case _ => () // unknown element: skip by size
        }
        off = bodyEnd
      }
      true
    }
    if (bytes.length < 4 || uintAt(0, 4) != 0x1A45DFA3L) return raw
    if (!walk(0, bytes.length, 0)) return raw
    if (docType != "webm" && docType != "matroska") return raw
    val ms = math.round(durTicks * tsScale / 1e6)
    (len, docType, width, height, channels, rate, clusters, ms)
  }

  /** Deterministic spec-compliant Matroska/WebM fixture: EBML header
    * with an alternating doctype (every fifth doc "matroska", else
    * "webm"), Segment → Info (explicit 1 ms TimestampScale + float64
    * Duration), Tracks (one video TrackEntry; an audio TrackEntry on
    * even docs), and the doc text as SimpleBlock payload in one
    * Cluster — split across TWO clusters every fourth doc. Every
    * field — including the fixed per-element framing overhead — is
    * docId/length arithmetic the oracle recomputes.
    */
  def synthMkvBytes(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val dt = if (docId % 5 == 0) "matroska" else "webm"
    val width = 160 + (docId % 640).toInt
    val height = 120 + (docId % 480).toInt
    val hasAudio = docId % 2 == 0
    val rate = MkvRates((docId % 4).toInt)
    val durTicks = (docId % 3600000L) + 500L
    val parts: Seq[Array[Byte]] =
      if (docId % 4 == 0) {
        val h = payload.length / 2
        Seq(payload.take(h), payload.drop(h))
      } else Seq(payload)
    val tracksContent = 15 + (if (hasAudio) 20 else 0)
    val segContent = 24 + 5 + tracksContent +
      parts.map(20 + _.length).sum
    val total = 8 + dt.length + 8 + segContent
    val bb = java.nio.ByteBuffer.allocate(total) // BE, EBML's order
    def size1(v: Int): Unit = bb.put((0x80 | v).toByte)
    def size4(v: Int): Unit = {
      bb.put((0x10 | (v >>> 24)).toByte); bb.put((v >>> 16).toByte)
      bb.put((v >>> 8).toByte); bb.put(v.toByte)
    }
    // EBML header: DocType only (defaults cover the rest)
    bb.putInt(0x1A45DFA3); size1(3 + dt.length)
    bb.putShort(0x4282.toShort); size1(dt.length)
    bb.put(dt.getBytes("US-ASCII"))
    // Segment
    bb.putInt(0x18538067); size4(segContent)
    //   Info: TimestampScale(u32) + Duration(float64)
    bb.putInt(0x1549A966); size1(19)
    bb.put(0x2A.toByte); bb.put(0xD7.toByte); bb.put(0xB1.toByte)
    size1(4); bb.putInt(1000000)
    bb.putShort(0x4489.toShort); size1(8); bb.putDouble(durTicks.toDouble)
    //   Tracks
    bb.putInt(0x1654AE6B); size1(tracksContent)
    bb.put(0xAE.toByte); size1(13) // video TrackEntry
    bb.put(0x83.toByte); size1(1); bb.put(1.toByte)
    bb.put(0xE0.toByte); size1(8)
    bb.put(0xB0.toByte); size1(2); bb.putShort(width.toShort)
    bb.put(0xBA.toByte); size1(2); bb.putShort(height.toShort)
    if (hasAudio) {
      bb.put(0xAE.toByte); size1(18) // audio TrackEntry
      bb.put(0x83.toByte); size1(1); bb.put(2.toByte)
      bb.put(0xE1.toByte); size1(13)
      bb.put(0x9F.toByte); size1(1); bb.put(2.toByte)
      bb.put(0xB5.toByte); size1(8); bb.putDouble(rate.toDouble)
    }
    //   Cluster(s): Timestamp + one SimpleBlock carrying the part
    parts.foreach { part =>
      bb.putInt(0x1F43B675); size4(12 + part.length)
      bb.put(0xE7.toByte); size1(1); bb.put(0.toByte)
      bb.put(0xA3.toByte); size4(4 + part.length)
      bb.put(0x81.toByte)          // track number VINT
      bb.putShort(0.toShort)       // relative timecode
      bb.put(0x80.toByte)          // keyframe flag
      bb.put(part)
    }
    bb.array()
  }

  /** Attach a synthetic Matroska/WebM binary per row. */
  def attachSynthMkv(df: DataFrame, idCol: String, textCol: String,
                     binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getString(txtIdx).getBytes("UTF-8")
        Row.fromSeq(r.toSeq :+ synthMkvBytes(r.getLong(idIdx), payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a Matroska/WebM binary column per partition. */
  def decodeMkvMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(
      Seq(df.schema.fields(idIdx)) ++ mkvMetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, fmt, w, h, ch, rate, cl, ms) =
          decodeMkvBytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), len, fmt, w, h, ch, rate, cl, ms)
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

  // ---- perceptual-hash image dedup (content-level, not metadata) ----

  /** BMP fixture geometry for [[synthBmpBytes]]/[[bmpDHash]]: a 36×32
    * 24-bit BMP downsamples by exact 4×4 integer block means to the
    * classic 9×8 dHash grid — no fractional resampling, so the oracle
    * recomputes every block mean arithmetically from `doc_id`.
    * Documents come in groups of [[BmpGroupSize]]: variant 0 is the
    * base image, 1 the SAME image shifted one pixel right (the classic
    * near-duplicate dHash is built to catch), 2 a +5 brightness lift
    * (dHash-INVARIANT — gradient signs don't move under constant
    * offset), 3 an unrelated image.
    */
  val BmpW = 36
  val BmpH = 32
  val BmpGroupSize = 4

  /** Control value of pseudo-image `g` at grid point (i, j): md5 of
    * the coordinate string (the repo's portable-hash convention — any
    * engine computes the identical value), reduced to [0, 200] so a
    * +5 brightness lift never clips a pixel.
    */
  def bmpCtrl(g: Long, i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$g:$i:$j".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % 201
  }

  /** The 6×6 control grid of pseudo-image `g` (one spare row/col so
    * the 1-px-shift variant interpolates in range).
    */
  def bmpCtrlGrid(g: Long): Array[Array[Long]] =
    Array.tabulate(6, 6)((i, j) => bmpCtrl(g, i, j))

  /** Grayscale pixel at TOP-DOWN (x, y): exact integer bilinear
    * interpolation of the control grid (cells 9×8, weights /72) — a
    * genuinely RANDOM low-frequency image, the structure that makes
    * dHash work on photographs: smooth locally (a 1-px shift flips
    * few downsampled gradient signs — measured avg 3.3 bits over the
    * first 1250 images), random globally (unrelated images measure
    * ~32 bits apart).
    */
  def bmpGray(grid: Array[Array[Long]], x: Int, y: Int): Int = {
    val cx = x / 9; val fx = x % 9
    val cy = y / 8; val fy = y % 8
    ((grid(cx)(cy) * (9 - fx) * (8 - fy) + grid(cx + 1)(cy) * fx * (8 - fy)
      + grid(cx)(cy + 1) * (9 - fx) * fy + grid(cx + 1)(cy + 1) * fx * fy) / 72).toInt
  }

  /** The effective (pseudo-image id, x-shift, brightness) of a doc. */
  def bmpVariant(docId: Long): (Long, Int, Int) = {
    val g = docId / BmpGroupSize
    (docId % BmpGroupSize) match {
      case 0 => (g, 0, 0)
      case 1 => (g, 1, 0)                  // shifted near-duplicate
      case 2 => (g, 0, 5)                  // brightness lift
      case _ => (g * 1009 + 997, 0, 0)     // unrelated image
    }
  }

  /** Deterministic spec-compliant 24-bit BMP: BITMAPFILEHEADER (14) +
    * BITMAPINFOHEADER (40) + bottom-up BGR rows (stride 36·3 = 108,
    * already 4-aligned). Gray value in all three channels.
    */
  def synthBmpBytes(docId: Long): Array[Byte] = {
    val (g, dx, bright) = bmpVariant(docId)
    val grid = bmpCtrlGrid(g)
    val stride = BmpW * 3
    val size = 54 + stride * BmpH
    val bb = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(size); bb.putShort(0); bb.putShort(0)
    bb.putInt(54)                 // pixel-data offset
    bb.putInt(40)                 // info header size
    bb.putInt(BmpW); bb.putInt(BmpH) // positive height = bottom-up rows
    bb.putShort(1); bb.putShort(24)  // planes, bpp
    bb.putInt(0)                  // BI_RGB (uncompressed)
    bb.putInt(stride * BmpH)
    bb.putInt(2835); bb.putInt(2835) // 72 dpi
    bb.putInt(0); bb.putInt(0)
    var row = BmpH - 1            // bottom-up: last image row first
    while (row >= 0) {
      var x = 0
      while (x < BmpW) {
        val v = (bmpGray(grid, x + dx, row) + bright).toByte
        bb.put(v); bb.put(v); bb.put(v) // B, G, R
        x += 1
      }
      row -= 1
    }
    bb.array()
  }

  /** Attach a synthetic BMP binary per row (see [[attachSynthMedia]]). */
  def attachSynthBmp(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField(binCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ synthBmpBytes(r.getLong(idIdx))))
    }(Encoders.row(outSchema))
  }

  /** 64-bit dHash of a 24-bit uncompressed BMP, by a REAL header walk
    * (magic, pixel offset at 10, dimensions at 18/22, bpp at 28,
    * bottom-up row order, 4-aligned stride) and pixel access — no
    * codec libs, which is the point of the BMP/PPM tier: content-level
    * image work that runs anywhere. Downsample = exact integer block
    * means onto a 9×8 grid; bit (by·8 + bx) is set iff
    * mean(bx+1, by) > mean(bx, by). Width/height must be multiples of
    * 9/8 (the fixture is; a production resampler would interpolate).
    */
  /** The 9×8 block means of a 24-bit BMP via the real header walk —
    * the shared downsample under both hash tiers.
    */
  def bmpBlockMeans(bytes: Array[Byte]): Array[Array[Long]] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP")
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    require(h > 0, "top-down BMPs not in the fixture contract")
    require(le16(28) == 24, s"bmpDHash expects 24-bit pixels, got ${le16(28)}")
    require(w % 9 == 0 && h % 8 == 0, s"dHash grid needs w%9==0, h%8==0; got ${w}x$h")
    val stride = ((w * 3 + 3) / 4) * 4
    val cw = w / 9
    val ch = h / 8
    // block means over the BLUE channel (fixture writes gray to all 3)
    val m = Array.ofDim[Long](9, 8)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 9) {
        var sum = 0L
        var dy = 0
        while (dy < ch) {
          val yTop = by * ch + dy
          val rowStart = off + (h - 1 - yTop) * stride // bottom-up storage
          var dx2 = 0
          while (dx2 < cw) {
            sum += u8(rowStart + (bx * cw + dx2) * 3)
            dx2 += 1
          }
          dy += 1
        }
        m(bx)(by) = sum / (cw.toLong * ch)
        bx += 1
      }
      by += 1
    }
    m
  }

  def bmpDHashBytes(bytes: Array[Byte]): Long = {
    val m = bmpBlockMeans(bytes)
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (m(bx + 1)(by) > m(bx)(by)) hash |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** 128-bit code: (dHash, aHash). The aHash word sets bit (by·8+bx)
    * iff block mean (bx, by) exceeds the GLOBAL mean of all 72 blocks
    * (integer div — both engines agree) — a complementary absolute-
    * level signal, still brightness-invariant because a constant lift
    * moves every block AND the global mean by the same amount. The
    * wide tier exists for corpus scale: 16-bit LSH bands over 128
    * bits cut candidate volume 256× vs the 8-bit bands the 64-bit
    * tier needs for recall.
    */
  def bmpDHash128Bytes(bytes: Array[Byte]): (Long, Long) = {
    val m = bmpBlockMeans(bytes)
    var total = 0L
    var bx = 0
    while (bx < 9) {
      var by = 0
      while (by < 8) { total += m(bx)(by); by += 1 }
      bx += 1
    }
    val mean = total / 72
    var d = 0L
    var a = 0L
    var by = 0
    while (by < 8) {
      var x = 0
      while (x < 8) {
        if (m(x + 1)(by) > m(x)(by)) d |= 1L << (by * 8 + x)
        if (m(x)(by) > mean) a |= 1L << (by * 8 + x)
        x += 1
      }
      by += 1
    }
    (d, a)
  }

  /** (id, ph1, ph2) per row — the 128-bit code tier. */
  def bmpDHash128(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      df.schema.fields(idIdx),
      StructField("ph1", LongType, nullable = false),
      StructField("ph2", LongType, nullable = false)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val (d, a) = bmpDHash128Bytes(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), d, a)
      }
    }(Encoders.row(outSchema))
  }

  /** (id, phash) per row from a BMP binary column. */
  def bmpDHash(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      df.schema.fields(idIdx),
      StructField("phash", LongType, nullable = false)))
    df.mapPartitions { rows =>
      rows.map(r => Row(r.get(idIdx), bmpDHashBytes(r.getAs[Array[Byte]](binIdx))))
    }(Encoders.row(outSchema))
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Header parsers checked against HAND-ASSEMBLED bytes (not the
  * repo's own generator) so a shared wrong convention — flipped
  * endianness, off-by-one offsets, length-includes-itself confusion —
  * can't cancel out between synth and decode.
  */
class MultimodalSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("GIF: the canonical 1x1 pixel file parses fully (LE dims, GCT skip, frame walk)") {
    // the widely-published 43-byte transparent 1x1 GIF, byte for byte
    val gif = "GIF89a".getBytes("US-ASCII") ++
      b(0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00) ++ // LSD: GCT of 2 entries
      b(0x00, 0x00, 0x00, 0xff, 0xff, 0xff) ++        // the GCT
      b(0x21, 0xf9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00) ++ // GCE
      b(0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00) ++ // image desc
      b(0x02, 0x02, 0x44, 0x01, 0x00) ++              // LZW min + 1 sub-block + term
      b(0x3b)                                          // trailer
    assert(gif.length == 43)
    assert(Multimodal.decodeBytes(gif) == ((43L, "gif", 1, 1, 3, 1)))
    // 300x2: low byte first — a big-endian misread would give 0x012C -> 11265
    val gif2 = "GIF87a".getBytes("US-ASCII") ++
      b(0x2c, 0x01, 0x02, 0x00, 0x80, 0x00, 0x00)
    assert(Multimodal.decodeBytes(gif2)._3 == 300)
    assert(Multimodal.decodeBytes(gif2)._4 == 2)
    // two image descriptors (no GCT, no extensions) => 2 frames
    val anim = "GIF89a".getBytes("US-ASCII") ++
      b(0x02, 0x00, 0x02, 0x00, 0x00, 0x00, 0x00) ++
      b(0x2c, 0, 0, 0, 0, 0x02, 0x00, 0x02, 0x00, 0x00, 0x02, 0x01, 0x00, 0x00) ++
      b(0x2c, 0, 0, 0, 0, 0x02, 0x00, 0x02, 0x00, 0x00, 0x02, 0x01, 0x00, 0x00) ++
      b(0x3b)
    assert(Multimodal.decodeBytes(anim)._6 == 2)
  }

  test("PNG: IHDR big-endian dims and color-type channel map") {
    val sig = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    def png(w: Int, h: Int, colorType: Int) = sig ++
      b(0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      b(w >> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff) ++
      b(h >> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff) ++
      b(8, colorType, 0, 0, 0) ++ b(0, 0, 0, 0)
    assert(Multimodal.decodeBytes(png(2, 3, 6)) == ((33L, "png", 2, 3, 4, 1)))
    assert(Multimodal.decodeBytes(png(640, 480, 2))._3 == 640)
    assert(Multimodal.decodeBytes(png(640, 480, 2))._5 == 3)
    assert(Multimodal.decodeBytes(png(1, 1, 0))._5 == 1)   // grayscale
    assert(Multimodal.decodeBytes(png(1, 1, 3))._5 == 1)   // palette
    assert(Multimodal.decodeBytes(png(1, 1, 4))._5 == 2)   // gray+alpha
  }

  test("JPEG: marker walk skips DQT/DRI and standalone RSTn to reach SOF0") {
    // deliberately NOT the generator's segment order: SOI, DQT(69),
    // DRI(4), a standalone RST0, then SOF0 5x7 3-comp
    val jpeg = b(0xff, 0xd8) ++
      (b(0xff, 0xdb, 0x00, 0x43) ++ Array.fill[Byte](0x43 - 2)(1)) ++
      b(0xff, 0xdd, 0x00, 0x04, 0x00, 0x10) ++
      b(0xff, 0xd0) ++ // standalone: no length field
      b(0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0x07, 0x00, 0x05, 3,
        1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)
    val (_, fmt, w, h, ch, _) = Multimodal.decodeBytes(jpeg)
    assert((fmt, w, h, ch) == (("jpeg", 5, 7, 3)))
    // progressive (SOF2) and dims > 255 exercise the u16 reads
    val sof2 = b(0xff, 0xd8) ++
      b(0xff, 0xc2, 0x00, 0x0b, 8, 0x01, 0x2c, 0x02, 0x58, 1, 1, 0x11, 0)
    assert(Multimodal.decodeBytes(sof2) == ((15L, "jpeg", 600, 300, 1, 1)))
  }

  test("unknown bytes fall through to raw, not an exception") {
    assert(Multimodal.decodeBytes("plain text".getBytes("UTF-8")) ==
      ((10L, "raw", 0, 0, 0, 0)))
    assert(Multimodal.decodeBytes(Array.emptyByteArray) == ((0L, "raw", 0, 0, 0, 0)))
  }

  test("synth fixtures round-trip through the parsers with the doc_id formulas") {
    val payload = "payload-bytes".getBytes("UTF-8")
    (0L until 12L).foreach { id =>
      val (len, fmt, w, h, ch, nf) = Multimodal.decodeBytes(
        Multimodal.synthHeaderBytes(id, payload))
      val expFmt = (id % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "gif" }
      assert(fmt == expFmt, s"id=$id")
      assert(w == 16 + (id % 317).toInt, s"id=$id width")
      assert(h == 16 + ((id * 7) % 211).toInt, s"id=$id height")
      val expCh = (id % 3, id % 2) match {
        case (0, 0) => 3; case (0, _) => 4 // PNG RGB / RGBA
        case (1, 0) => 3; case (1, _) => 1 // JPEG 3-comp / gray
        case _      => 3                   // GIF palette
      }
      assert(ch == expCh, s"id=$id channels")
      val expFrames = if (id % 3 == 2) 1 + (id % 4).toInt else 1
      assert(nf == expFrames, s"id=$id n_frames")
      val headerLen = (id % 3) match {
        case 0 => 33
        case 1 => 42 + 3 * (if (id % 2 == 0) 3 else 1)
        case _ => 782 + 25 * expFrames
      }
      assert(len == headerLen + payload.length, s"id=$id bin_len")
    }
  }

  test("WAV decode: canonical fixture, LIST-chunk walk, and garbage fallback") {
    // hand-assembled canonical 44-byte mono 8 kHz 16-bit WAV with 4
    // data bytes — every field position checked against the RIFF spec
    val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(40)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(4)
    bb.put(Array[Byte](1, 2, 3, 4))
    val (len, fmt, ch, rate, bits, dur) = Multimodal.decodeWavBytes(bb.array())
    assert((len, fmt, ch, rate, bits) == (48L, "wav", 1, 8000, 16))
    assert(dur == 4L * 1000 / 16000) // 0 ms — integer division, like the oracle

    // synth round-trip across the parameter grid, incl. LIST-bearing
    // fixtures (docId % 3 == 0) where fmt is NOT at offset 12
    for (id <- 0L until 30L) {
      val payload = ("p" * (10 + id.toInt)).getBytes("UTF-8")
      val bytes = Multimodal.synthWavBytes(id, payload)
      val (l, f, c, r, b, d) = Multimodal.decodeWavBytes(bytes)
      val expCh = 1 + (id % 2).toInt
      val expRate = 8000 * (1 + (id % 5).toInt)
      assert(f == "wav" && c == expCh && r == expRate && b == 16, s"id=$id meta")
      assert(l == 44 + (if (id % 3 == 0) 20 else 0) + payload.length, s"id=$id len")
      assert(d == payload.length.toLong * 1000 / (expRate.toLong * expCh * 2), s"id=$id dur")
    }

    // non-WAV bytes stay opaque
    assert(Multimodal.decodeWavBytes("not a wav at all, just text bytes padded out to length"
      .getBytes("US-ASCII"))._2 == "raw")
    // truncated RIFF (no data chunk) falls back to raw, not a crash
    assert(Multimodal.decodeWavBytes(bb.array().take(20) ++ new Array[Byte](24))._2 == "raw")
    // malformed chunk size >= 2^31 must fall back to raw, not spin
    val evil = bb.array().clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xf8.toByte // "fmt " size = 0xf8ffffff LE
    assert(Multimodal.decodeWavBytes(evil)._2 == "raw")
  }

  test("MP4 decode: box walk across the parameter grid, and fallbacks") {
    for (id <- 0L until 30L) {
      val payload = ("v" * (5 + id.toInt)).getBytes("UTF-8")
      val bytes = Multimodal.synthMp4Bytes(id, payload)
      val (l, f, ts, tk, ms, nb) = Multimodal.decodeMp4Bytes(bytes)
      // odd ids: v1 mvhd, 120-byte box, duration past u32
      val expTs = 1000 * (1 + (id % 3).toInt)
      val expTk = (if (id % 2 == 1) 0x100000000L else 0L) + (id % 9999L) * 7 + 1000
      assert(f == "mp4" && ts == expTs && tk == expTk, s"id=$id meta ($f $ts $tk)")
      assert(ms == expTk * 1000 / expTs, s"id=$id duration")
      assert(nb == (if (id % 3 == 0) 4 else 3), s"id=$id n_boxes")
      val moov = if (id % 2 == 1) 128 else 116
      assert(l == 16 + (if (id % 3 == 0) 16 else 0) + moov + 8 + payload.length, s"id=$id len")
      if (id % 2 == 1) assert(tk > 0xFFFFFFFFL, s"id=$id v1 duration must exceed u32")
    }
    // garbage, truncation, and a malformed (sz < 8) box all fall to raw
    assert(Multimodal.decodeMp4Bytes("definitely not an iso-bmff container at all"
      .getBytes("US-ASCII"))._2 == "raw")
    val good = Multimodal.synthMp4Bytes(1L, "x".getBytes)
    assert(Multimodal.decodeMp4Bytes(good.take(12))._2 == "raw")
    val evil = good.clone()
    evil(16) = 0; evil(17) = 0; evil(18) = 0; evil(19) = 3 // second box size = 3 < 8
    assert(Multimodal.decodeMp4Bytes(evil)._2 == "raw")
  }

  test("Ogg/Opus decode: page walk, lacing sums, granule duration, and fallbacks") {
    // synth round-trip across the parameter grid (incl. a payload past
    // 255 bytes so the lacing table carries a genuine 255 run)
    for (id <- 0L until 30L) {
      val payload = ("q" * (200 + id.toInt * 20)).getBytes("UTF-8")
      val (l, f, ch, ps, rate, np, ms) = Multimodal.decodeOggBytes(
        Multimodal.synthOggBytes(id, payload))
      val nSegs = payload.length / 255 + 1
      assert(f == "opus", s"id=$id")
      assert(ch == 1 + (id % 2).toInt && ps == (id % 312).toInt, s"id=$id head")
      assert(rate == Seq(8000, 12000, 16000, 24000, 48000)((id % 5).toInt), s"id=$id rate")
      assert(np == (if (id % 3 == 0) 3 else 2), s"id=$id pages")
      assert(l == 47 + (if (id % 3 == 0) 44 else 0) + 27 + nSegs + payload.length,
        s"id=$id len")
      assert(ms == ((id % 100000L) * 48 + 960) * 1000 / 48000, s"id=$id dur")
    }
    // a payload of an exact 255 multiple needs the trailing 0 lacing
    val exact = Multimodal.synthOggBytes(1L, ("x" * 510).getBytes("US-ASCII"))
    assert(Multimodal.decodeOggBytes(exact)._2 == "opus")
    // fallbacks: bad capture pattern, nonzero version, missing
    // OpusHead, page running past the buffer — raw, never a throw
    assert(Multimodal.decodeOggBytes("not an ogg stream at all".getBytes)._2 == "raw")
    val badVer = Multimodal.synthOggBytes(2L, "p".getBytes); badVer(4) = 1
    assert(Multimodal.decodeOggBytes(badVer)._2 == "raw")
    val noHead = Multimodal.synthOggBytes(2L, "p".getBytes)
    noHead(28) = 'X'.toByte // corrupt "OpusHead"
    assert(Multimodal.decodeOggBytes(noHead)._2 == "raw")
    val trunc = Multimodal.synthOggBytes(2L, ("y" * 300).getBytes)
    assert(Multimodal.decodeOggBytes(trunc.take(80))._2 == "raw")
  }

  test("Ogg granule sentinel: a continued-packet page (granule -1) never moves the duration clock") {
    // real-world Opus files split large packets across pages; the page
    // that completes no packet carries granule 0xFFFF_FFFF_FFFF_FFFF
    // (RFC 3533). If the walk treated that as a position, duration
    // would explode; the fixtures never emit it, so pin it by hand.
    val base = Multimodal.synthOggBytes(7L, ("z" * 100).getBytes("US-ASCII"))
    val (_, f0, _, _, _, np0, ms0) = Multimodal.decodeOggBytes(base)
    assert(f0 == "opus" && ms0 > 0)
    val payload = ("c" * 40).getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(28 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("OggS".getBytes("US-ASCII"))
    bb.put(0.toByte); bb.put(0x01.toByte)     // version 0, continuation flag
    bb.putLong(-1L)                           // the sentinel
    bb.putInt(7); bb.putInt(3); bb.putInt(0)  // serial / seq / crc
    bb.put(1.toByte); bb.put(payload.length.toByte)
    bb.put(payload)
    val (_, f1, _, _, _, np1, ms1) = Multimodal.decodeOggBytes(base ++ bb.array())
    assert(f1 == "opus")
    assert(np1 == np0 + 1, "sentinel page still counts as a page")
    assert(ms1 == ms0, s"sentinel moved the clock: $ms0 -> $ms1")
  }

  test("MP3 decode: hand-assembled header, ID3v2 syncsafe skip, and fallbacks") {
    // canonical bare frame: FF FB = sync + MPEG-1 + Layer III + no CRC;
    // 0x92 = bitrate idx 9 (128 kbps) + sample-rate idx 0 (44100) +
    // no padding; 0xC0 = mode 3 (mono). 128 kbps = 128 bits per ms.
    val bare = b(0xff, 0xfb, 0x92, 0xc0) ++ new Array[Byte](1600)
    assert(Multimodal.decodeMp3Bytes(bare) ==
      (1604L, "mp3", 3, 128, 44100, 1, 1604L * 8 / 128))

    // ID3v2 with a syncsafe size spanning two 7-bit groups: size 200 =
    // 0b1_1001000 → bytes (0, 0, 0x01, 0x48); the header follows the tag
    val id3 = b('I', 'D', '3', 4, 0, 0, 0, 0, 0x01, 0x48) ++
      new Array[Byte](200) ++ b(0xff, 0xfb, 0x12, 0x00) ++ new Array[Byte](60)
    val (l2, f2, _, k2, r2, c2, d2) = Multimodal.decodeMp3Bytes(id3)
    assert((l2, f2, k2, r2, c2) == (274L, "mp3", 32, 44100, 2))
    assert(d2 == 64L * 8 / 32) // audio len excludes the tag

    // synth round-trip across the parameter grid (CBR and VBR mixed:
    // id%5==2 docs carry a Xing block whose frame count wins)
    for (id <- 0L until 30L) {
      val payload = ("p" * (10 + id.toInt)).getBytes("UTF-8")
      val (l, f, lay, k, r, c, d) = Multimodal.decodeMp3Bytes(
        Multimodal.synthMp3Bytes(id, payload))
      val kbps = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(
        (id % 14).toInt)
      val rate = Seq(44100, 48000, 32000)((id % 3).toInt)
      val id3Total = if (id % 3 == 0) 10 + 130 + (id % 700).toInt else 0
      val xingExtra =
        if (id % 5 == 2) (if (id % 2 == 1) 17 else 32) + 12 else 0
      assert(f == "mp3" && lay == 3 && k == kbps, s"id=$id meta")
      assert(r == rate, s"id=$id rate")
      assert(c == (if (id % 2 == 1) 1 else 2), s"id=$id channels")
      assert(l == id3Total + 4 + xingExtra + payload.length, s"id=$id len")
      val expectD =
        if (id % 5 == 2) (100 + id % 977) * 1152L * 1000 / rate
        else (4L + xingExtra + payload.length) * 8 / kbps
      assert(d == expectD, s"id=$id dur")
    }

    // hand-assembled VBR: stereo frame (side info 32), "Xing", FRAMES
    // flag, 4000 frames at 44100 Hz → 4000·1152·1000/44100 ms
    val xing = b(0xff, 0xfb, 0x92, 0x00) ++ new Array[Byte](32) ++
      b('X', 'i', 'n', 'g', 0, 0, 0, 1, 0, 0, 0x0f, 0xa0) ++ new Array[Byte](500)
    assert(Multimodal.decodeMp3Bytes(xing)._7 == 4000L * 1152 * 1000 / 44100)
    // "Info" (LAME CBR) parses through the same path
    val info = b(0xff, 0xfb, 0x92, 0x00) ++ new Array[Byte](32) ++
      b('I', 'n', 'f', 'o', 0, 0, 0, 1, 0, 0, 0x0f, 0xa0) ++ new Array[Byte](500)
    assert(Multimodal.decodeMp3Bytes(info)._7 == 4000L * 1152 * 1000 / 44100)
    // a Xing tag WITHOUT the FRAMES flag falls back to the CBR estimate
    val noframes = b(0xff, 0xfb, 0x92, 0x00) ++ new Array[Byte](32) ++
      b('X', 'i', 'n', 'g', 0, 0, 0, 0, 0, 0, 0x0f, 0xa0) ++ new Array[Byte](500)
    assert(Multimodal.decodeMp3Bytes(noframes)._7 == noframes.length * 8L / 128)
    // a truncated would-be Xing offset stays bounds-safe → CBR
    val trunc = b(0xff, 0xfb, 0x92, 0x00) ++ new Array[Byte](20)
    assert(Multimodal.decodeMp3Bytes(trunc)._7 == trunc.length * 8L / 128)

    // non-MP3 bytes stay opaque
    assert(Multimodal.decodeMp3Bytes("plain text, no sync word anywhere here"
      .getBytes("US-ASCII"))._2 == "raw")
    // a non-syncsafe ID3 size byte (high bit set) is malformed → raw
    assert(Multimodal.decodeMp3Bytes(
      b('I', 'D', '3', 4, 0, 0, 0x80, 0, 0, 0) ++ b(0xff, 0xfb, 0x92, 0xc0))._2 == "raw")
    // an ID3 size pointing past the end falls back, not an exception
    assert(Multimodal.decodeMp3Bytes(
      b('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++ b(0xff, 0xfb))._2 == "raw")
    // free-format (idx 0) and forbidden (idx 15) bitrates → raw
    assert(Multimodal.decodeMp3Bytes(b(0xff, 0xfb, 0x00, 0x00) ++ new Array[Byte](8))._2 == "raw")
    assert(Multimodal.decodeMp3Bytes(b(0xff, 0xfb, 0xf0, 0x00) ++ new Array[Byte](8))._2 == "raw")
    // MPEG-2 / other layers are outside the decode envelope → raw
    assert(Multimodal.decodeMp3Bytes(b(0xff, 0xf3, 0x92, 0x00) ++ new Array[Byte](8))._2 == "raw")
    assert(Multimodal.decodeMp3Bytes(b(0xff, 0xfd, 0x92, 0x00) ++ new Array[Byte](8))._2 == "raw")
  }

  test("WebP decode: all three variants round-trip, pad byte honored, truncation falls to raw") {
    // synth round-trip across the parameter grid (covers VP8 /VP8L/VP8X)
    for (id <- 0L until 30L) {
      val (l, f, w, h, a, n) = Multimodal.decodeWebpBytes(Multimodal.synthWebpBytes(id))
      val fmt = Seq("webp-lossy", "webp-lossless", "webp-extended")((id % 3).toInt)
      assert(f == fmt, s"id=$id format")
      assert(w == 16 + (id % 1000).toInt && h == 16 + ((id * 3) % 800).toInt, s"id=$id dims")
      assert(a == (id % 3 != 0 && id % 2 == 1), s"id=$id alpha")
      assert(n == (if (id % 3 == 2) 2 else 1), s"id=$id chunks")
      assert(l == Seq(30L, 26L, 48L)((id % 3).toInt), s"id=$id len")
    }
    // the lossless payload is 5 bytes (odd): the extended variant walks
    // PAST a padded VP8L if one leads — hand-build VP8L-then-VP8 and
    // check the second chunk is reached only via the pad-aligned offset
    val vp8l = Multimodal.synthWebpBytes(1) // lossless, 26 bytes total
    assert(vp8l.length == 26 && Multimodal.decodeWebpBytes(vp8l)._6 == 1)
    // garbage and truncations fall through, never throw
    assert(Multimodal.decodeWebpBytes("not riff at all, definitely".getBytes)._2 == "raw")
    assert(Multimodal.decodeWebpBytes(Multimodal.synthWebpBytes(7).take(15))._2 == "raw")
    assert(Multimodal.decodeWebpBytes(Multimodal.synthWebpBytes(0).take(25))._2 == "raw")
    // a chunk size pointing past the end is malformed → raw
    val bad = Multimodal.synthWebpBytes(0)
    bad(16) = 0x7f // inflate the VP8 chunk's u32le size
    assert(Multimodal.decodeWebpBytes(bad)._2 == "raw")
    // RIFF but not WEBP (a WAV) → raw through THIS decoder
    assert(Multimodal.decodeWebpBytes(
      Multimodal.synthWavBytes(2, new Array[Byte](16)))._2 == "raw")
  }

  test("FLAC decode: bit-packed STREAMINFO round-trip, block walk, and fallbacks") {
    val payload = "frame section stand-in".getBytes("UTF-8")
    for (id <- 0L until 30L) {
      val (l, f, rate, ch, bps, total, ms, nb) =
        Multimodal.decodeFlacBytes(Multimodal.synthFlacBytes(id, payload))
      assert(f == "flac", s"id=$id format")
      assert(rate == Multimodal.FlacRates((id % 7).toInt), s"id=$id rate")
      assert(ch == 1 + (id % 2).toInt && bps == 16, s"id=$id ch/bps")
      assert(total == (id % 100000L) * 441L + 1000L, s"id=$id total")
      assert(ms == total * 1000L / rate, s"id=$id duration")
      assert(nb == (if (id % 3 == 0) 2 else 1), s"id=$id blocks")
      val vc = if (id % 3 == 0) 4 + 16 + (id % 40) else 0
      assert(l == 4 + 38 + vc + payload.length, s"id=$id len")
    }
    // hand-assembled: a 36-bit total-samples value with the high bits
    // set proves the straddling fields decode independently
    val big = Multimodal.synthFlacBytes(0, Array.emptyByteArray).clone()
    // STREAMINFO packed field starts at 4 (marker) + 4 (hdr) + 10
    val p = 18
    val v = (48000L << 44) | (7L << 41) | (23L << 36) | 0xedcba9876L
    for (j <- 0 until 8) big(p + j) = ((v >>> (8 * (7 - j))) & 0xff).toByte
    val got = Multimodal.decodeFlacBytes(big)
    assert(got._3 == 48000 && got._4 == 8 && got._5 == 24 && got._6 == 0xedcba9876L)
    // malformed inputs fall through, never throw
    assert(Multimodal.decodeFlacBytes("not flac".getBytes)._2 == "raw")
    assert(Multimodal.decodeFlacBytes(
      Multimodal.synthFlacBytes(1, payload).take(20))._2 == "raw")
    // rate 0 is spec-invalid → raw
    val z = Multimodal.synthFlacBytes(0, Array.emptyByteArray).clone()
    for (j <- 0 until 3) z(p + j) = 0 // zero the 20-bit rate (and a bit more)
    z(p + 2) = (z(p + 2) & 0x0f).toByte
    assert(Multimodal.decodeFlacBytes(z)._2 == "raw")
  }

  test("TIFF decode: both endiannesses, inline SHORT/LONG entries, page chain, fallbacks") {
    val payload = "strip data stand-in".getBytes("UTF-8")
    for (id <- 0L until 30L) {
      val (l, f, w, h, bits, pg) =
        Multimodal.decodeTiffBytes(Multimodal.synthTiffBytes(id, payload))
      assert(f == "tiff", s"id=$id format")
      assert(w == 1 + (id % 4096).toInt && h == 1 + ((id * 5) % 2048).toInt, s"id=$id dims")
      assert(bits == 8 * (1 + (id % 2).toInt), s"id=$id bits")
      assert(pg == (if (id % 4 == 0) 2 else 1), s"id=$id pages")
      assert(l == 8 + 42 * pg + payload.length, s"id=$id len")
    }
    // malformed inputs fall through, never throw
    assert(Multimodal.decodeTiffBytes("II not a tiff".getBytes)._2 == "raw")
    assert(Multimodal.decodeTiffBytes(
      Multimodal.synthTiffBytes(2, payload).take(12))._2 == "raw")
    // a next-IFD pointer cycling back to itself must terminate → raw
    val cyc = Multimodal.synthTiffBytes(1, Array.emptyByteArray).clone() // MM, 1 page
    val nextOff = 8 + 2 + 3 * 12 // big-endian u32 next pointer
    cyc(nextOff) = 0; cyc(nextOff + 1) = 0; cyc(nextOff + 2) = 0; cyc(nextOff + 3) = 8
    assert(Multimodal.decodeTiffBytes(cyc)._2 == "raw")
    // an IFD offset past the buffer → raw
    val far = Multimodal.synthTiffBytes(1, Array.emptyByteArray).clone()
    far(4) = 0x7f.toByte // MM: high byte of the first-IFD offset
    assert(Multimodal.decodeTiffBytes(far)._2 == "raw")
  }

  test("Matroska/WebM decode: EBML walk across the grid, doctype split, cluster count, fallbacks") {
    val payload = "block data stand-in for a coded frame".getBytes("UTF-8")
    for (id <- 0L until 30L) {
      val (l, f, w, h, ch, rate, cl, ms) =
        Multimodal.decodeMkvBytes(Multimodal.synthMkvBytes(id, payload))
      assert(f == (if (id % 5 == 0) "matroska" else "webm"), s"id=$id format $f")
      assert(w == 160 + (id % 640).toInt && h == 120 + (id % 480).toInt, s"id=$id dims")
      if (id % 2 == 0) {
        assert(ch == 2 && rate == Seq(8000, 16000, 44100, 48000)((id % 4).toInt), s"id=$id audio")
      } else assert(ch == 0 && rate == 0, s"id=$id no-audio")
      assert(cl == (if (id % 4 == 0) 2 else 1), s"id=$id clusters")
      assert(ms == (id % 3600000L) + 500L, s"id=$id duration")
      val dtLen = if (id % 5 == 0) 8 else 4
      assert(l == 8 + dtLen + 8 + 24 + 5 + 15 +
        (if (id % 2 == 0) 20 else 0) + cl * 20 + payload.length, s"id=$id len")
    }
    // malformed inputs fall through, never throw
    assert(Multimodal.decodeMkvBytes("not ebml at all".getBytes)._2 == "raw")
    assert(Multimodal.decodeMkvBytes(
      Multimodal.synthMkvBytes(3, payload).take(40))._2 == "raw")
    // alien doctype → raw (we only claim webm/matroska)
    val alien = Multimodal.synthMkvBytes(1, payload).clone()
    alien(8) = 'a'.toByte // first doctype byte ("webm" -> "aebm")
    assert(Multimodal.decodeMkvBytes(alien)._2 == "raw")
    // UNKNOWN-SIZE segment (live-muxed webm): all-ones size VINT
    // resolves to "rest of the buffer" and the walk still lands
    val base = Multimodal.synthMkvBytes(2, payload).clone()
    val segSizeOff = 8 + 4 + 4 // EBML header (8+4) + segment id (4)
    base(segSizeOff) = 0x1F.toByte; base(segSizeOff + 1) = 0xFF.toByte
    base(segSizeOff + 2) = 0xFF.toByte; base(segSizeOff + 3) = 0xFF.toByte
    val (_, f2, w2, _, _, _, cl2, ms2) = Multimodal.decodeMkvBytes(base)
    assert(f2 == "webm" && w2 == 162 && cl2 == 1 && ms2 == 502L,
      s"unknown-size segment: $f2 $w2 $cl2 $ms2")
    // a 4-byte float Duration reads through the same element
    // (float32 carries small integers exactly)
    val bb = java.nio.ByteBuffer.allocate(32) // 12 header + 5 segment + 15 content
    bb.putInt(0x1A45DFA3); bb.put(0x87.toByte) // header, content 7
    bb.putShort(0x4282.toShort); bb.put(0x84.toByte); bb.put("webm".getBytes)
    bb.putInt(0x18538067); bb.put(0x8F.toByte) // segment, content 15 = info(4+1+10)
    bb.putInt(0x1549A966); bb.put(0x8A.toByte) // info, content 10
    bb.putShort(0x4489.toShort); bb.put(0x84.toByte)
    bb.putFloat(1234.0f)
    bb.put(0xEC.toByte); bb.put(0x81.toByte); bb.put(0.toByte) // Void: unknown, skipped
    val (_, f3, _, _, _, _, _, ms3) = Multimodal.decodeMkvBytes(bb.array())
    assert(f3 == "webm" && ms3 == 1234L, s"float32 duration: $f3 $ms3")
  }

  test("perceptual-hash fixture contract: every shifted image is a near-dup sharing a band, brightness lifts are dHash-invariant, unrelated images sit far outside the threshold") {
    import graft.multimodal.Multimodal._
    import graft.operators.AnnQueries
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val bandMask = (1L << AnnQueries.MmPhashBandBits) - 1
    for (g <- 0L until 125L) { // every sf0.01 group, not a lucky sample
      val hs = (0 until BmpGroupSize).map(v => bmpDHashBytes(synthBmpBytes(g * BmpGroupSize + v)))
      assert(ham(hs(0), hs(2)) == 0, s"g=$g: brightness lift moved dHash bits")
      assert(ham(hs(0), hs(1)) <= AnnQueries.MmPhashHammingT,
        s"g=$g: 1-px shift drifted ${ham(hs(0), hs(1))} bits")
      val shared = (0 until AnnQueries.MmPhashBands).count(b =>
        ((hs(0) >>> (AnnQueries.MmPhashBandBits * b)) & bandMask) ==
          ((hs(1) >>> (AnnQueries.MmPhashBandBits * b)) & bandMask))
      assert(shared >= 1, s"g=$g: shifted near-duplicate missed every LSH band")
      assert(ham(hs(0), hs(3)) > AnnQueries.MmPhashHammingT,
        s"g=$g: unrelated image inside the near-dup threshold (${ham(hs(0), hs(3))})")
    }
    // the WIDE tier (128-bit dHash ‖ aHash, 16-bit bands, T=16): same
    // contract at the corpus-scale band width, with the recall
    // tradeoff pinned honestly — at most 3 of 125 planted shifts may
    // miss every band (the measured cost of 256× fewer candidates)
    var wideMissed = 0
    for (g <- 0L until 125L) {
      val ws = (0 until BmpGroupSize).map(v => bmpDHash128Bytes(synthBmpBytes(g * BmpGroupSize + v)))
      def ham2(a: (Long, Long), b: (Long, Long)) =
        java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      assert(ham2(ws(0), ws(2)) == 0, s"g=$g: brightness moved the 128-bit code")
      assert(ham2(ws(0), ws(1)) <= AnnQueries.MmPhashWideHammingT,
        s"g=$g: wide shift drifted ${ham2(ws(0), ws(1))} bits")
      assert(ham2(ws(0), ws(3)) > AnnQueries.MmPhashWideHammingT,
        s"g=$g: unrelated inside the wide threshold (${ham2(ws(0), ws(3))})")
      def band(p: (Long, Long), k: Int): Long =
        if (k < 4) (p._1 >>> (16 * k)) & 0xFFFF else (p._2 >>> (16 * (k - 4))) & 0xFFFF
      if (!(0 until 8).exists(k => band(ws(0), k) == band(ws(1), k))) wideMissed += 1
    }
    assert(wideMissed <= 3, s"wide-band recall regressed: $wideMissed/125 shifts missed")

    // the decoder is a REAL header walk: moving the pixel offset and
    // rewriting the stored dimensions must change what it reads
    val b = synthBmpBytes(0)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    val wrongBpp = b.clone; wrongBpp(28) = 32.toByte
    intercept[IllegalArgumentException] { bmpDHashBytes(wrongBpp) }
    val notBmp = b.clone; notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException] { bmpDHashBytes(notBmp) }
  }

  test("auto-banded phash tier: the bits dial scales with n and clamps to [8,16]; slices reproduce the wide banding at 16 bits and straddle the long boundary correctly; at sf0.001 the auto pairs re-find the wide pairs within the threshold") {
    import graft.operators.AnnQueries
    // the policy: ceil(log2 n), clamped — linear expected candidates,
    // converging to the wide tier's 16 bits from ~33k images up
    assert(AnnQueries.phashAutoBits(10) == 8 && AnnQueries.phashAutoBits(250) == 8)
    assert(AnnQueries.phashAutoBits(500) == 9)
    assert(AnnQueries.phashAutoBits(5500) == 13)
    assert(AnnQueries.phashAutoBits(50000) == 16)
    assert(AnnQueries.phashAutoBits(1L << 40) == 16, "must clamp at the wide tier")

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    import org.apache.spark.sql.functions._

    // slice extraction vs reference arithmetic, incl. a straddling slice
    val ph1 = 0x123456789ABCDEF0L
    val ph2 = 0x0FEDCBA987654321L
    val df = spark.range(1).select(lit(ph1).as("p1"), lit(ph2).as("p2"))
    def sliceVal(o: Int, w: Int): Long =
      df.select(AnnQueries.phashSlice128(col("p1"), col("p2"), o, w)).head().getLong(0)
    for (k <- 0 until 8) { // bits=16 reproduces the wide tier's banding
      val want = if (k < 4) (ph1 >>> (16 * k)) & 0xFFFF else (ph2 >>> (16 * (k - 4))) & 0xFFFF
      assert(sliceVal(16 * k, 16) == want, s"band $k")
    }
    assert(sliceVal(60, 8) == (((ph1 >>> 60) | (ph2 << 4)) & 0xFF),
      "straddling slice misassembled")
    assert(sliceVal(120, 8) == ((ph2 >>> 56) & 0xFF))

    // at sf0.001 (500 docs) the dial sits at 9 bits / 14 bands: the
    // banding differs from the wide tier's, but the oracle-checked
    // wide pair set must re-surface (the Verify invariant's recall at
    // its floor 0.9 — measured ~1.0 here) and every auto pair
    // verifies within the shared threshold
    val d = "/root/testdata/sf0.001"
    val auto = graft.SparkEntry.queries("mm_phash_dedup_auto")(spark, d).collect()
    val wide = graft.SparkEntry.queries("mm_phash_dedup_wide")(spark, d).collect()
    val autoPairs = auto.map(r => (r.getLong(0), r.getLong(1))).toSet
    val widePairs = wide.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = widePairs.count(autoPairs).toDouble / math.max(widePairs.size, 1)
    assert(recall >= 0.9,
      s"auto tier re-found only ${(recall * 100).round}% of the wide pairs")
    assert(auto.forall(_.getLong(2) <= AnnQueries.MmPhashWideHammingT))
    assert(autoPairs.nonEmpty)
  }

  test("incremental phash admission probes a PERSISTED code index identically to the in-query corpus codes") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("mm_phash_incremental")(spark, d)
      .collect().map(_.toString).toSeq
    // production shape: the admitted corpus's (doc_id, phash) codes
    // live in parquet, written once at admission — recompute nothing
    val ids = spark.read.parquet(s"$d/documents.parquet").select("doc_id")
    val hashed = graft.multimodal.Multimodal.bmpDHash(
      graft.multimodal.Multimodal.attachSynthBmp(ids, "doc_id", "bin"), "bin", "doc_id")
    val idxDir = java.nio.file.Files.createTempDirectory("phash-idx").toString
    hashed.filter(col("doc_id") % 10 >= 3).write.mode("overwrite").parquet(idxDir)
    val viaIndex = graft.operators.AnnQueries.phashProbeIndex(
        spark.read.parquet(idxDir),
        hashed.filter(col("doc_id") % 10 < 3))
      .collect().map(_.toString).toSeq
    assert(viaIndex == expected,
      "persisted-index probe diverged from the in-query corpus codes")
  }
}

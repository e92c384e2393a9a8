package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** JPEG APP1/EXIF metadata (VERDICT r14 #6) — the curation signal the
  * pixel decoder skips: cameras and editors record orientation and the
  * declared pixel dimensions inside an APP1 segment holding a little TIFF
  * file (EXIF 2.3 §4.5.2: `Exif\0\0` + byte-order header + IFD chain).
  * A corpus pass wants three things from it WITHOUT paying for a pixel
  * decode: does the image carry EXIF at all, how must it be rotated for
  * display (orientation 1–8), and do the DECLARED dimensions agree with
  * the actual SOF frame header (a mismatch is a classic re-encode /
  * thumbnail-swap tell — the bytes were processed after capture).
  *
  * Everything is a bounds-checked byte walk (the [[Jpeg]] segment-walk
  * stance — ADVICE r13: every fixed-size read bounded by the declared
  * segment end, malformation rejects loudly): the JPEG marker walk stops
  * at SOS (SOF always precedes it, T.81 §B.2.1 — no entropy data is ever
  * scanned), and the TIFF walk reads both byte orders (`II` and `MM`),
  * inline SHORT/LONG values, and the 0x8769 Exif sub-IFD pointer where
  * PixelXDimension/PixelYDimension live.
  */
object Exif {

  /** Parsed per-image EXIF + frame-header facts. `orientation` and the
    * declared dimensions are 0 when the image carries no EXIF (or the
    * IFDs omit the tag); `width`/`height` are the SOF frame dimensions
    * (always present in a decodable JPEG).
    */
  final case class ExifInfo(hasExif: Boolean, orientation: Int,
                            exifWidth: Long, exifHeight: Long,
                            width: Int, height: Int) {
    /** EXIF present AND its declared dimensions disagree with the frame. */
    def dimsMismatch: Boolean =
      hasExif && (exifWidth != width.toLong || exifHeight != height.toLong)
  }

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** Walk the JPEG marker stream: first `Exif\0\0` APP1 parsed as TIFF,
    * SOF0/1/2 frame dimensions captured, stop at SOS. Malformed framing
    * throws IllegalArgumentException, like [[Jpeg.decode]].
    */
  def parse(bytes: Array[Byte]): ExifInfo = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "missing SOI")
    def u16be(off: Int): Int = {
      require(off + 2 <= bytes.length, s"truncated segment at $off")
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    }
    var pos = 2
    var exif: Option[(Int, Long, Long)] = None
    var sof: Option[(Int, Int)] = None
    var done = false
    while (!done) {
      require(pos + 2 <= bytes.length, "truncated JPEG: no SOS/EOI")
      require((bytes(pos) & 0xFF) == 0xFF,
        f"expected marker at $pos, got 0x${bytes(pos) & 0xFF}%02X")
      // T.81 §B.1.1.2: a marker may be preceded by any number of 0xFF
      // fill bytes — real encoders pad with them, so the walk skips to
      // the LAST 0xFF before the marker code (ADVICE r15: rejecting
      // legal fill bytes aborted whole-corpus passes)
      while (pos + 2 < bytes.length && (bytes(pos + 1) & 0xFF) == 0xFF) pos += 1
      val marker = bytes(pos + 1) & 0xFF
      pos += 2
      marker match {
        case 0xD9 => done = true // EOI (image with no scan: still answer)
        case m if m == 0x01 || (m >= 0xD0 && m <= 0xD7) =>
          throw new IllegalArgumentException(f"stray marker 0x$m%02X")
        case _ =>
          val len = u16be(pos)
          require(len >= 2 && pos + len <= bytes.length,
            s"truncated segment 0x${marker.toHexString} at $pos")
          marker match {
            case 0xE1 if exif.isEmpty && len >= 2 + ExifHeader.length &&
              ExifHeader.indices.forall(j =>
                bytes(pos + 2 + j) == ExifHeader(j)) =>
              val tiff = java.util.Arrays.copyOfRange(
                bytes, pos + 2 + ExifHeader.length, pos + len)
              exif = Some(parseTiff(tiff))
            case 0xC0 | 0xC1 | 0xC2 =>
              require(len >= 7, "truncated SOF header")
              sof = Some((u16be(pos + 5), u16be(pos + 3))) // (width, height)
            case 0xDA => done = true // entropy data starts; dims are known
            case _ => // other APPn / COM / tables: skip
          }
          if (!done) pos += len
      }
    }
    val (w, h) = sof.getOrElse(
      throw new IllegalArgumentException("no SOF frame header before SOS/EOI"))
    exif match {
      case Some((o, ew, eh)) => ExifInfo(hasExif = true, o, ew, eh, w, h)
      case None => ExifInfo(hasExif = false, 0, 0L, 0L, w, h)
    }
  }

  /** TIFF IFD walk: (orientation, pixelXDimension, pixelYDimension) —
    * each 0 when its tag is absent. Handles both byte orders and SHORT
    * or LONG dimension values (EXIF allows either).
    */
  private def parseTiff(t: Array[Byte]): (Int, Long, Long) = {
    require(t.length >= 8, "truncated TIFF header")
    val le = (t(0), t(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException("bad TIFF byte order")
    }
    def u16(off: Int): Int = {
      require(off >= 0 && off + 2 <= t.length, s"truncated TIFF at $off")
      if (le) (t(off) & 0xFF) | ((t(off + 1) & 0xFF) << 8)
      else ((t(off) & 0xFF) << 8) | (t(off + 1) & 0xFF)
    }
    def u32(off: Int): Long = {
      require(off >= 0 && off + 4 <= t.length, s"truncated TIFF at $off")
      if (le) (t(off) & 0xFFL) | ((t(off + 1) & 0xFFL) << 8) |
        ((t(off + 2) & 0xFFL) << 16) | ((t(off + 3) & 0xFFL) << 24)
      else ((t(off) & 0xFFL) << 24) | ((t(off + 1) & 0xFFL) << 16) |
        ((t(off + 2) & 0xFFL) << 8) | (t(off + 3) & 0xFFL)
    }
    require(u16(2) == 42, s"bad TIFF magic ${u16(2)}")
    // SHORT (type 3) value sits in the first two bytes of the value
    // field; LONG (type 4) uses all four — both inline (size ≤ 4)
    def inlineValue(entryOff: Int): Long = {
      val typ = u16(entryOff + 2)
      require(u32(entryOff + 4) == 1L,
        s"unexpected count ${u32(entryOff + 4)} for scalar tag")
      typ match {
        case 3 => u16(entryOff + 8).toLong
        case 4 => u32(entryOff + 8)
        case other =>
          throw new IllegalArgumentException(s"unexpected TIFF type $other")
      }
    }
    var orientation = 0
    var px = 0L
    var py = 0L
    var subIfd = -1L
    def walk(ifdOff: Long): Unit = {
      val base = ifdOff.toInt
      val n = u16(base)
      var e = 0
      while (e < n) {
        val off = base + 2 + 12 * e
        u16(off) match {
          case 0x0112 => orientation = inlineValue(off).toInt
          case 0x8769 => subIfd = u32(off + 8)
          case 0xA002 => px = inlineValue(off)
          case 0xA003 => py = inlineValue(off)
          case _ => // other tags: skip (walk never follows value offsets)
        }
        e += 1
      }
    }
    walk(u32(4))
    if (subIfd >= 0) walk(subIfd)
    (orientation, px, py)
  }

  /** Build an `Exif\0\0` + TIFF APP1 payload declaring orientation and
    * pixel dimensions — IFD0 (Orientation, Exif-IFD pointer) + Exif IFD
    * (PixelXDimension, PixelYDimension), in either byte order. The
    * fixture side of the codec-suite stance: planted wire bytes, not a
    * round-trip of the parser's own assumptions (the parser is
    * additionally pinned by a hand-assembled big-endian layout in
    * JpegSpec and an ImageIO interop case).
    */
  def encodeApp1(littleEndian: Boolean, orientation: Int,
                 pixelX: Long, pixelY: Long): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    val out = new java.io.ByteArrayOutputStream(80)
    out.write(ExifHeader)
    def u16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def u32(v: Long): Unit =
      if (littleEndian) {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      } else {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      }
    def entryShort(tag: Int, v: Int): Unit = {
      u16(tag); u16(3); u32(1L)
      u16(v); u16(0) // SHORT rides the first two value bytes, then pad
    }
    def entryLong(tag: Int, v: Long): Unit = { u16(tag); u16(4); u32(1L); u32(v) }
    // TIFF header: byte order, 42, IFD0 at offset 8
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    u16(42); u32(8L)
    // IFD0: 2 entries (tags ascending per spec), Exif IFD at offset 38
    // (= 8 header-to-IFD0 + 2 count + 2*12 entries + 4 next-IFD)
    u16(2)
    entryShort(0x0112, orientation)
    entryLong(0x8769, 38L)
    u32(0L) // no IFD1
    // Exif IFD: the declared pixel dimensions
    u16(2)
    entryLong(0xA002, pixelX)
    entryLong(0xA003, pixelY)
    u32(0L)
    out.toByteArray
  }

  /** Splice an APP1 payload into a JPEG immediately after SOI — where
    * the EXIF spec requires it to sit.
    */
  def spliceApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "missing SOI")
    require(app1.length + 2 <= 0xFFFF, "APP1 payload too large")
    val out = new java.io.ByteArrayOutputStream(jpeg.length + app1.length + 4)
    out.write(jpeg, 0, 2)
    out.write(0xFF); out.write(0xE1)
    val len = app1.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(app1)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** The per-image metadata pass over a media dataset: one bounded byte
    * walk per record — no pixel decode, no shuffle (a pure map; the
    * cheap front-door read a 100 TB image curation pass runs before
    * deciding what to decode).
    */
  def exifMeta(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val info = parse(rec.content)
      (rec.media_id, info.hasExif, info.orientation.toLong,
        info.exifWidth, info.exifHeight,
        info.width.toLong, info.height.toLong, info.dimsMismatch)
    }).toDF("media_id", "has_exif", "orientation", "exif_width",
      "exif_height", "width", "height", "dims_mismatch")
  }

  /** [[exifMeta]] for real-world crawls (ADVICE r15): a single malformed
    * record — truncation, a stray RSTn, a nonstandard tag layout — must
    * not abort a 100 TB metadata pass, so each record's parse failure
    * becomes `malformed = true` with zeroed fields instead of a task
    * failure. The strict thrower above stays the oracle-fixture surface
    * (and is what the mm_exif oracle replays); this is the front-door
    * production variant, same pure-map no-shuffle shape plus the flag
    * column.
    */
  def exifMetaTolerant(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      try {
        val info = parse(rec.content)
        (rec.media_id, info.hasExif, info.orientation.toLong,
          info.exifWidth, info.exifHeight,
          info.width.toLong, info.height.toLong, info.dimsMismatch, false)
      } catch {
        case scala.util.control.NonFatal(_) =>
          (rec.media_id, false, 0L, 0L, 0L, 0L, 0L, false, true)
      }
    }).toDF("media_id", "has_exif", "orientation", "exif_width",
      "exif_height", "width", "height", "dims_mismatch", "malformed")
  }
}

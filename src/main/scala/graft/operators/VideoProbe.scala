package graft.operators

/** Pure-JVM video CONTAINER header parsing — the metadata half of video
  * decode, which needs no codec (cited shapes: reference treats media
  * as opaque payloads + typed metadata; see SURVEY §2.1 multimodal).
  *
  * Supported:
  *  - MP4 / ISO-BMFF (also .mov, .m4a): box walk `ftyp` → `moov` →
  *    (`mvhd` timescale+duration, first `trak`/`tkhd` with nonzero
  *    16.16-fixed width/height).
  *  - Matroska / WebM: EBML walk `Segment` → (`Info` TimestampScale +
  *    float Duration, `Tracks` → `TrackEntry` → `Video` PixelWidth /
  *    PixelHeight).
  *
  * Every read is bounds-checked; any structural violation returns None
  * (the caller maps that to the poison-record row). No allocation
  * proportional to payload size — the walk skips over media boxes by
  * their declared lengths, so probing a 10 GB asset reads only its
  * header bytes.
  */
object VideoProbe {

  /** @return (container, width, height, duration_ns) or None. */
  def probe(bytes: Array[Byte]): Option[(String, Int, Int, Long)] =
    if (bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') probeMp4(bytes)
    else if (bytes.length >= 4 && u8(bytes, 0) == 0x1A &&
        u8(bytes, 1) == 0x45 && u8(bytes, 2) == 0xDF && u8(bytes, 3) == 0xA3)
      probeMkv(bytes)
    else None

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def u32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  // ------------------------------------------------------ MP4 / BMFF

  /** Walk the top-level boxes; recurse into moov. */
  private def probeMp4(b: Array[Byte]): Option[(String, Int, Int, Long)] = try {
    var brand = "mp4"
    var timescale = 0L
    var durationTicks = -1L
    var w = -1
    var h = -1
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        var size = u32(b, p.toInt)
        val typ = new String(b, p.toInt + 4, 4, "ISO-8859-1")
        var header = 8L
        if (size == 1 && p + 16 <= to) { size = u64(b, p.toInt + 8); header = 16L }
        else if (size == 0) size = to - p // box runs to end of enclosing
        if (size < header || p + size > to) return // structural violation
        val body = p + header
        typ match {
          case "ftyp" if size >= header + 4 =>
            brand = new String(b, body.toInt, 4, "ISO-8859-1").trim.toLowerCase
          case "moov" | "trak" | "mdia" if depth < 8 =>
            walk(body, p + size, depth + 1)
          case "mvhd" if size >= header + 4 =>
            val v = u8(b, body.toInt)
            if (v == 1 && size >= header + 28) {
              timescale = u32(b, body.toInt + 20)
              durationTicks = u64(b, body.toInt + 24)
            } else if (v == 0 && size >= header + 20) {
              timescale = u32(b, body.toInt + 12)
              durationTicks = u32(b, body.toInt + 16)
            }
          case "tkhd" =>
            val v = u8(b, body.toInt)
            // width/height are the LAST 8 bytes of the box, 16.16 fixed
            val tail = p + size - 8
            val ok = if (v == 1) size >= header + 92 else size >= header + 80
            if (ok && w <= 0) {
              val ww = (u32(b, tail.toInt) >> 16).toInt
              val hh = (u32(b, tail.toInt + 4) >> 16).toInt
              if (ww > 0 && hh > 0) { w = ww; h = hh }
            }
          case _ => () // skip media/unknown boxes by declared length
        }
        p += size
      }
    }
    walk(0L, b.length.toLong, 0)
    // ticks/timescale seconds → ns (the audio decoder's convention)
    val durNs =
      if (timescale > 0 && durationTicks >= 0)
        math.round(durationTicks * (1000000000.0 / timescale))
      else -1L
    if (w > 0 || durNs >= 0) Some((brand, w, h, durNs)) else None
  } catch { case _: Exception => None }

  // --------------------------------------------------- Matroska/EBML

  private final val IdSegment = 0x18538067L
  private final val IdInfo = 0x1549A966L
  private final val IdTimestampScale = 0x2AD7B1L
  private final val IdDuration = 0x4489L
  private final val IdTracks = 0x1654AE6BL
  private final val IdTrackEntry = 0xAEL
  private final val IdVideo = 0xE0L
  private final val IdPixelWidth = 0xB0L
  private final val IdPixelHeight = 0xBAL

  /** EBML varint: (value, bytesRead); ids keep the marker bit, sizes
    * strip it. Returns null length on malformed leading byte.
    */
  private def vint(b: Array[Byte], p: Int, keepMarker: Boolean): Option[(Long, Int)] = {
    if (p >= b.length) return None
    val first = u8(b, p)
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || p + len > b.length) return None
    var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | u8(b, p + i); i += 1 }
    Some((v, len))
  }

  private def ebmlFloat(b: Array[Byte], p: Int, size: Long): Option[Double] =
    size match {
      case 4 => Some(java.lang.Float.intBitsToFloat(u32(b, p).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(u64(b, p)))
      case _ => None
    }

  private def ebmlUint(b: Array[Byte], p: Int, size: Long): Option[Long] = {
    if (size < 1 || size > 8) return None
    var v = 0L
    var i = 0
    while (i < size) { v = (v << 8) | u8(b, p + i); i += 1 }
    Some(v)
  }

  private def probeMkv(b: Array[Byte]): Option[(String, Int, Int, Long)] = try {
    var tsScale = 1000000L // Matroska default: ns per timestamp tick
    var durTicks = -1.0
    var w = -1
    var h = -1
    // returns false on structural violation
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var p = from
      while (p + 2 <= to) {
        val id = vint(b, p.toInt, keepMarker = true) match {
          case Some(x) => x; case None => return false
        }
        val sz = vint(b, (p + id._2).toInt, keepMarker = false) match {
          case Some(x) => x; case None => return false
        }
        val body = p + id._2 + sz._2
        val size = sz._1
        if (body + size > to) return false
        id._1 match {
          case IdSegment | IdInfo | IdTracks | IdTrackEntry | IdVideo
              if depth < 8 =>
            if (!walk(body, body + size, depth + 1)) return false
          case IdTimestampScale =>
            ebmlUint(b, body.toInt, size).foreach(tsScale = _)
          case IdDuration =>
            ebmlFloat(b, body.toInt, size).foreach(durTicks = _)
          case IdPixelWidth =>
            ebmlUint(b, body.toInt, size).foreach(v => w = v.toInt)
          case IdPixelHeight =>
            ebmlUint(b, body.toInt, size).foreach(v => h = v.toInt)
          case _ => () // skip (clusters, codec private, …) by length
        }
        p = body + size
      }
      true
    }
    if (!walk(0L, b.length.toLong, 0)) return None
    val durNs =
      if (durTicks >= 0) math.round(durTicks * tsScale) else -1L
    if (w > 0 || durNs >= 0) Some(("matroska", w, h, durNs)) else None
  } catch { case _: Exception => None }
}

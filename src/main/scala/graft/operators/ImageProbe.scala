package graft.operators

/** Header-walk image metadata — the image twin of [[VideoProbe]]:
  * dimensions, bit depth, and format for the container families that
  * carry virtually all corpus imagery (PNG, JPEG/JFIF, GIF, BMP), read
  * from the HEADER STRUCTURE alone. No decoder runs: a 100 TB
  * metadata pass (size histograms, aspect-ratio filters, corrupt-rate
  * monitoring, decode-cost budgeting) should cost header bytes per
  * asset, not a full pixel decode — and unlike
  * [[Multimodal.decodeImages]] it also reads formats the JDK cannot
  * decode end-to-end.
  *
  * All parses are bounds-checked; any structural violation returns
  * None (the [[VideoProbe]] poison-record contract — degrade, never
  * throw).
  */
object ImageProbe {

  /** (format, width, height, bitDepth) or None if no known signature
    * parses. bitDepth is the format's native per-channel/px field:
    * PNG bit-depth byte, JPEG sample precision, GIF colour resolution
    * bits, BMP biBitCount.
    */
  def probe(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * width/height as big-endian u32 at fixed offsets 16/20, bit depth
    * at 24.
    */
  private def png(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 26 || !b.take(8).sameElements(sig)) None
    else if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) None
    else {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(("png", w.toInt, h.toInt, u8(b, 24)))
    }
  }

  /** JPEG: SOI then a marker walk — every non-standalone segment
    * carries a big-endian length INCLUDING its own two bytes; the
    * frame header (SOF0–15 minus DHT/JPG/DAC) carries precision,
    * height, width. Stops at SOS/EOI (past them lies entropy-coded
    * payload, not markers).
    */
  private def jpeg(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      // fill bytes: FF may repeat before the marker id
      var j = i
      while (j < b.length && u8(b, j) == 0xff) j += 1
      if (j + 1 >= b.length) return None
      val m = u8(b, j)
      j += 1
      m match {
        case 0xd8 | 0x01 => i = j                  // SOI / TEM: standalone
        case x if x >= 0xd0 && x <= 0xd7 => i = j  // RSTn: standalone
        case 0xd9 | 0xda => return None            // EOI / SOS before any SOF
        case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          if (j + 7 >= b.length) return None
          val h = be16(b, j + 3); val w = be16(b, j + 5)
          return if (w <= 0 || h <= 0) None
          else Some(("jpeg", w, h, u8(b, j + 2)))
        case _ =>
          if (j + 1 >= b.length) return None
          val len = be16(b, j)
          if (len < 2) return None
          i = j + len
      }
    }
    None
  }

  /** GIF87a/89a: logical-screen width/height as little-endian u16 at
    * offsets 6/8; colour resolution bits from the packed flags byte.
    */
  private def gif(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 13) return None
    val hdr = new String(b, 0, 6, "ISO-8859-1")
    if (hdr != "GIF87a" && hdr != "GIF89a") None
    else {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) None
      else Some(("gif", w, h, ((u8(b, 10) >> 4) & 0x7) + 1))
    }
  }

  /** BMP: "BM", then the DIB header's own size field (le32 at 14)
    * discriminates the layout — BITMAPINFOHEADER and its extensions
    * (size ≥ 40) store width/height as little-endian i32 at 18/22
    * (height may be negative = top-down) and biBitCount at 28; the
    * legacy BITMAPCOREHEADER (size 12) stores u16 width/height at
    * 18/20 and bitCount at 24. Reading the INFO offsets against a
    * core-header file would return garbage as Some(...), violating
    * the degrade-to-None contract (r12 ADVICE), so any other size
    * field is treated as structural violation.
    */
  private def bmp(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') None
    else le32(b, 14) match {
      case 12 =>
        val w = le16(b, 18); val h = le16(b, 20)
        if (w <= 0 || h <= 0) None
        else Some(("bmp", w, h, le16(b, 24)))
      case sz if sz >= 40 && b.length >= 30 =>
        val w = le32(b, 18).toInt
        val h = math.abs(le32(b, 22).toInt)
        if (w <= 0 || h <= 0) None
        else Some(("bmp", w, h, le16(b, 28)))
      case _ => None
    }
  }
}

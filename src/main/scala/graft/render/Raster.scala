package graft.render

/** Minimal raster + PNG toolkit — closes the reference's LAST surface
  * delta: the actual uploaded artifact there is a rasterized world-map
  * figure (world_map_transformer.py:214–273 draws matplotlib PNGs;
  * external_resources.py:54–68 uploads the bytes). The engine renders
  * the same merged frame to a real PNG with ZERO plotting dependencies:
  * an even-odd scanline polygon fill plus a from-scratch PNG encoder
  * over `java.util.zip` (Deflater emits the zlib stream IDAT requires,
  * CRC32 the chunk checksums) — both deterministic, so re-runs land
  * byte-identical artifacts.
  *
  * Scale posture: rasterization is an ARTIFACT step over the
  * planet-bounded world dim (≤ ~250 features), the same bound the SVG
  * path already folds through one collect_list row. Nothing here ever
  * touches a fact table.
  */
object Raster {

  /** Fill `features` (draw order = list order) into a w×h RGB raster.
    * Each feature: (rings in PIXEL coordinates, fill 0xRRGGBB). All of a
    * feature's rings share one even-odd fill pass, so interior rings cut
    * holes exactly as in SVG/GeoJSON semantics; ring edges then stroke
    * via Bresenham in `stroke` (pass a negative stroke to skip). */
  def fillPolygons(w: Int, h: Int, background: Int,
      features: Seq[(Seq[Seq[(Double, Double)]], Int)],
      stroke: Int = -1): Array[Int] = {
    val px = Array.fill(w * h)(background)
    features.foreach { case (rings, color) =>
      // closed edge list: every consecutive pair plus last→first
      val edges = rings.flatMap { ring =>
        if (ring.size < 3) Nil
        else (ring :+ ring.head).sliding(2).collect {
          case Seq((x1, y1), (x2, y2)) if y1 != y2 => (x1, y1, x2, y2)
        }.toSeq
      }
      if (edges.nonEmpty) {
        val yLo = math.max(0, math.floor(edges.map(e => math.min(e._2, e._4)).min).toInt)
        val yHi = math.min(h - 1, math.ceil(edges.map(e => math.max(e._2, e._4)).max).toInt)
        var y = yLo
        while (y <= yHi) {
          val yc = y + 0.5
          // half-open [min, max) intersection rule: a vertex shared by
          // two edges counts once, so crossings stay even-odd-consistent
          val xs = edges.collect {
            case (x1, y1, x2, y2)
                if (math.min(y1, y2) <= yc) && (yc < math.max(y1, y2)) =>
              x1 + (yc - y1) / (y2 - y1) * (x2 - x1)
          }.sorted
          var i = 0
          while (i + 1 < xs.length) {
            var x = math.max(0, math.ceil(xs(i) - 0.5).toInt)
            val xEnd = math.min(w - 1, math.floor(xs(i + 1) - 0.5).toInt)
            while (x <= xEnd) { px(y * w + x) = color; x += 1 }
            i += 2
          }
          y += 1
        }
      }
      if (stroke >= 0) rings.foreach { ring =>
        if (ring.size >= 2) (ring :+ ring.head).sliding(2).foreach {
          case Seq((xa, ya), (xb, yb)) =>
            drawLine(px, w, h, math.round(xa).toInt, math.round(ya).toInt,
              math.round(xb).toInt, math.round(yb).toInt, stroke)
          case _ => ()
        }
      }
    }
    px
  }

  /** Bresenham segment, clipped to the raster. */
  def drawLine(px: Array[Int], w: Int, h: Int,
      x0: Int, y0: Int, x1: Int, y1: Int, color: Int): Unit = {
    var (x, y) = (x0, y0)
    val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
    val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
    var err = dx + dy
    var done = false
    while (!done) {
      if (x >= 0 && x < w && y >= 0 && y < h) px(y * w + x) = color
      if (x == x1 && y == y1) done = true
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
  }

  /** Encode a w×h 0xRRGGBB raster as a PNG byte array: 8-bit truecolor,
    * filter 0 per scanline, one zlib-deflated IDAT. Chunk layout per the
    * PNG spec (signature, IHDR, IDAT, IEND; CRC32 over type+data). */
  def encodePng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"raster is ${px.length} pixels, want ${w * h}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(i: Int) = Array((i >>> 24).toByte, (i >>> 16).toByte,
        (i >>> 8).toByte, i.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be(crc.getValue.toInt))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter0, no interlace
    chunk("IHDR", ihdr.array())
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val row = y * (1 + 3 * w)
      raw(row) = 0 // filter: None
      var x = 0
      while (x < w) {
        val c = px(y * w + x)
        raw(row + 1 + 3 * x) = ((c >>> 16) & 0xff).toByte
        raw(row + 2 + 3 * x) = ((c >>> 8) & 0xff).toByte
        raw(row + 3 + 3 * x) = (c & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** "#rrggbb" → packed int (the palette literals the SVG render uses). */
  def hex(c: String): Int = Integer.parseInt(c.stripPrefix("#"), 16)
}

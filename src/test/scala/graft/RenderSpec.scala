package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.render.Raster

/** Raster + PNG render: the polygon fill is checked pixel-by-pixel on
  * hand-computable shapes, the PNG encoder round-trips through the JDK's
  * own independent decoder (javax.imageio), and the world-map artifact is
  * decoded back and probed at known coordinates. */
class RenderSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val sf = TestSpark.sf

  test("scanline fill: solid square, even-odd hole, background preserved") {
    val outer = Seq((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))
    val px = Raster.fillPolygons(10, 10, 0xffffff,
      Seq((Seq(outer, hole), 0xff0000)))
    def at(x: Int, y: Int) = px(y * 10 + x)
    assert(at(3, 3) == 0xff0000, "inside the ring band")
    assert(at(7, 7) == 0xff0000)
    assert(at(5, 5) == 0xffffff, "even-odd: the hole stays background")
    assert(at(0, 0) == 0xffffff && at(9, 9) == 0xffffff, "outside untouched")
    // fill area: 6x6 outer minus 2x2 hole = 32 red pixels
    assert(px.count(_ == 0xff0000) == 32,
      s"expected 32 filled pixels, got ${px.count(_ == 0xff0000)}")
  }

  test("PNG encoder round-trips through the JDK decoder bit-exactly") {
    val (w, h) = (31, 17) // odd sizes: no accidental stride alignment
    val px = Array.tabulate(w * h)(i => (i * 2654435761L).toInt & 0xffffff)
    val bytes = Raster.encodePng(w, h, px)
    assert(bytes.take(8).toSeq ==
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "PNG signature")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK decoder must accept the stream")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == px(y * w + x),
        s"pixel ($x,$y) corrupted")
  }

  test("world-map PNG artifact: decodes, right dims, land filled, deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toString
    val path = Jobs.renderWorldMapPng(s, sf, dir, "2024-01-01")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 1000 && img.getHeight == 500)
    val palette = Set("#f7fbff", "#deebf7", "#c6dbef", "#9ecae1", "#6baed6",
      "#4292c6", "#2171b5", "#08519c", "#08306b", "#cccccc").map(Raster.hex) +
      0x555555 // stroke
    def at(lon: Double, lat: Double) =
      img.getRGB(((lon + 180) / 360 * 1000).toInt, ((90 - lat) / 180 * 500).toInt) & 0xffffff
    // Southern Ocean at 65°S: guaranteed water — real price countries
    // never reach it and placeholder squares are bounded to lat ±60
    assert(at(0, -65) == 0xffffff, "open ocean must stay background")
    // continental interiors of boundary-dim countries land on palette fills
    for (((lon, lat), name) <- Seq(((-53.0, -10.0), "Brazil"),
        ((95.0, 62.0), "Russia"), ((105.0, 35.0), "China")))
      assert(palette.contains(at(lon, lat)),
        f"$name interior at ($lon,$lat) = #${at(lon, lat)}%06x not a palette fill")
    // determinism: a re-render lands byte-identical bytes
    val dir2 = java.nio.file.Files.createTempDirectory("graft_png2").toString
    val path2 = Jobs.renderWorldMapPng(s, sf, dir2, "2024-01-01")
    assert(java.util.Arrays.equals(bytes,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))),
      "re-render must be byte-identical")
  }
}

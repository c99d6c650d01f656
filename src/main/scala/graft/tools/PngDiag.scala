package graft.tools

import graft.multimodal.{Multimodal, Png}

/** Single-threaded codec microbench: fast PNG path vs ImageIO on both
  * the smooth decode-gate grid (pixelChannels) and the high-frequency
  * phash grid (phashPixelChannels). Not part of the library surface.
  *
  * Run: runMain graft.tools.PngDiag [nImages]
  */
object PngDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    javax.imageio.ImageIO.setUseCache(false)

    def encodeImageIo(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pixel(x, y)
          px(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, px, 0, w)
      val out = new java.io.ByteArrayOutputStream(w * h / 2)
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decodeImageIo(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      Multimodal.dHash64(img)
    }

    def run(tag: String, pixelOf: Long => ((Int, Int) => (Int, Int, Int))): Unit = {
      def dims(id: Long) = (((id % 48) + 16).toInt, ((id % 32) + 16).toInt)
      // warm
      (0 until 2000).foreach { i =>
        val (w, h) = dims(i)
        Png.decodeRgb(Png.encodeRgbFast(w, h, pixelOf(i)))
      }
      var t0 = System.nanoTime()
      var encBytes = 0L
      val encs = (0 until n).map { i =>
        val (w, h) = dims(i); val b = Png.encodeRgbFast(w, h, pixelOf(i)); encBytes += b.length; b
      }
      val tEncFast = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var acc = 0L
      encs.foreach { b => acc ^= Multimodal.dHash64(Png.decodeRgb(b)) }
      val tDecFast = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      var encBytesIo = 0L
      val encsIo = (0 until n).map { i =>
        val (w, h) = dims(i); val b = encodeImageIo(w, h, pixelOf(i)); encBytesIo += b.length; b
      }
      val tEncIo = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var accIo = 0L
      encsIo.foreach { b => accIo ^= decodeImageIo(b) }
      val tDecIo = (System.nanoTime() - t0) / 1e9
      // cross: ImageIO bytes through the fast decoder
      t0 = System.nanoTime()
      var accX = 0L
      encsIo.foreach { b => accX ^= Multimodal.dHash64(Png.decodeRgb(b)) }
      val tDecX = (System.nanoTime() - t0) / 1e9
      println(f"[pngdiag] $tag%-8s encFast=$tEncFast%.2f decFast=$tDecFast%.2f " +
        f"encIo=$tEncIo%.2f decIo=$tDecIo%.2f decFastOnIoBytes=$tDecX%.2f " +
        f"bytesFast=${encBytes / n}%d bytesIo=${encBytesIo / n}%d hashEq=${acc == accIo && acc == accX}%b")
    }

    run("smooth", id => (x, y) => Multimodal.pixelChannels(id, x, y))
    run("phash", id => (x, y) => Multimodal.phashPixelChannels(id, x, y))
  }
}

package graft.multimodal
// (package graft.multimodal for private[multimodal] access)

import MultimodalOps.ImageCodec

/** Micro-bench for the PNG long-tail decision (VERDICT r12 #5): how much does
  * the javax fallback cost for the profiles the from-scratch fast path
  * declines (16-bit, interlaced), vs the fast path on the equivalent 8-bit
  * image? Run with `sbt "Test/runMain graft.multimodal.PngTailBench"`; findings
  * recorded in SCALE.md (r13 PNG-long-tail note).
  */
object PngTailBench {
  private def time(n: Int)(f: => Unit): Double = {
    var i = 0
    while (i < math.min(n, 3000)) { f; i += 1 } // warm
    val t0 = System.nanoTime()
    i = 0
    while (i < n) { f; i += 1 }
    (System.nanoTime() - t0) / 1000.0 / n
  }

  def main(args: Array[String]): Unit = {
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    for ((w, h, n) <- Seq((9, 8, 60000), (64, 48, 20000), (256, 192, 3000))) {
      val rgb8 = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gray16 = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        rgb8.setRGB(x, y, ((x * 4 % 256) << 16) | ((y * 5 % 256) << 8) | ((x + y) % 256))
        gray16.getRaster.setSample(x, y, 0, (x * 400 + y * 600) % 65536)
      }
      val png8 = png(rgb8)
      val png16 = png(gray16)
      // above the 16384-px crossover the fast path itself routes color PNGs
      // back to javax (the r13 size gate this bench motivated)
      val gated = w.toLong * h > 16384
      require(ImageCodec.tryDecodePngFast(png8).isDefined != gated,
        "fast path take/decline disagrees with the size gate")
      require(ImageCodec.tryDecodePngFast(png16).isEmpty, "fast path must decline 16-bit")
      val fast8 = time(n)(ImageCodec.tryDecodePngFast(png8))
      val javax8 = time(n)(ImageCodec.tryDecodeJavax(png8))
      val javax16 = time(n)(ImageCodec.tryDecodeJavax(png16))
      println(f"${w}x$h${if (gated) " (gated->javax)" else ""}: " +
        f"fast 8-bit $fast8%8.2f | javax 8-bit $javax8%8.2f " +
        f"(${javax8 / fast8}%.2fx) | javax 16-bit gray $javax16%8.2f us/img")
      // write side (the resize hot path): ImageIO.write vs encodePngFast
      val encJavax = time(n)(png(rgb8))
      val encFast = time(n)(ImageCodec.encodePngFast(rgb8))
      println(f"${w}x$h encode: fast $encFast%8.2f | ImageIO.write $encJavax%8.2f " +
        f"(${encJavax / encFast}%.2fx) us/img")
    }
  }
}

package graft.tools

/** Dev probe (r18): javax.imageio PNG writer compression-quality sweep.
  * Checks (a) whether the JDK PNG writer honors an explicit compression
  * quality, (b) encode wall per level, (c) that decoded rasters stay
  * byte-identical (PNG is lossless at every level) — the precondition
  * for using a faster deflate level in the fixture synthesis paths. */
object R18PngProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val payloads = (0 until 2000).map { _ =>
      val b = new Array[Byte](300); rnd.nextBytes(b)
      // text-like bytes (printable range) — the corpus shape
      b.map(x => (32 + ((x & 0xff) % 95)).toByte)
    }
    def encodeAt(payload: Array[Byte], q: Option[Float]): Array[Byte] = {
      val rb = 48
      val h = math.max(1, (payload.length + rb - 1) / rb)
      val img = new java.awt.image.BufferedImage(
        16, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](16 * h)
      var p = 0
      while (p < px.length) {
        val i = 3 * p
        def b(j: Int): Int = if (j < payload.length) payload(j) & 0xff else 0
        px(p) = (b(i) << 16) | (b(i + 1) << 8) | b(i + 2)
        p += 1
      }
      img.setRGB(0, 0, 16, h, px, 0, 16)
      val baos = new java.io.ByteArrayOutputStream()
      q match {
        case None =>
          require(javax.imageio.ImageIO.write(img, "png", baos))
        case Some(quality) =>
          val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
          val param = w.getDefaultWriteParam
          if (param.canWriteCompressed) {
            param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionQuality(quality)
          }
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          w.setOutput(ios)
          w.write(null, new javax.imageio.IIOImage(img, null, null), param)
          ios.close(); w.dispose()
      }
      baos.toByteArray
    }
    def decode(png: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](w * h * 3)
      var p = 0
      while (p < px.length) {
        val rgb = px(p); val i = 3 * p
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        p += 1
      }
      out
    }
    val base = payloads.map(p => decode(encodeAt(p, None)))
    for (q <- Seq(None, Some(0.0f), Some(0.5f), Some(0.9f), Some(1.0f))) {
      // warm
      payloads.take(100).foreach(p => encodeAt(p, q))
      val t0 = System.nanoTime()
      val encs = payloads.map(p => encodeAt(p, q))
      val dt = (System.nanoTime() - t0) / 1e9
      val sz = encs.map(_.length.toLong).sum / encs.size
      val same = encs.zip(base).forall { case (e, b) =>
        java.util.Arrays.equals(decode(e), b) }
      println(f"quality=$q%-12s encode=${dt}%.3f s  avg_bytes=$sz  decoded_identical=$same")
    }
    // decode wall at the two extremes
    for (q <- Seq(None, Some(1.0f))) {
      val encs = payloads.map(p => encodeAt(p, q))
      encs.take(100).foreach(decode)
      val t0 = System.nanoTime()
      encs.foreach(decode)
      println(f"decode(quality=$q%-10s)=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}

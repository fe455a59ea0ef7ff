package graft.ops

/** Dev driver for the own-encoder cross-check (FIXTURES.md §WebP):
  * dumps MediaCodec.encodeWebpLossless streams (+ raw RGBA sidecars)
  * to /tmp/own_webp, which scripts/gen_webp_fixtures.py --check-own
  * feeds to the SYSTEM libwebp decoder — the canonical implementation
  * must reproduce every raster byte-exactly (verified r16: 24/24 OK,
  * incl. varying alpha and 1x1). Run via Test/runMain.
  */
object DumpOwnWebp {
  def main(args: Array[String]): Unit = {
    val out = new java.io.File("/tmp/own_webp"); out.mkdirs()
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 7L, 13L); (w, h) <- Seq((1,1), (5,3), (16, 32), (64, 80))) {
      val gray = Array.tabulate(w * h) { i =>
        val v = MediaCodec.pixel(docId, i % w, i / w)
        0xff000000 | (v << 16) | (v << 8) | v
      }
      val colr = Array.tabulate(w * h) { i =>
        val (r, g, b) = MediaCodec.pixelRgb(docId, i % w, i / w)
        // vary alpha too: exercise the alpha code path
        ((128 + ((i * 7) % 128)) << 24) | (r << 16) | (g << 8) | b
      }
      for ((name, raster) <- Seq(("gray", gray), ("color", colr))) {
        val webp = MediaCodec.encodeWebpLossless(raster, w, h)
        val rgba = new Array[Byte](w * h * 4)
        raster.zipWithIndex.foreach { case (p, i) =>
          rgba(4*i) = ((p >>> 16) & 0xff).toByte
          rgba(4*i+1) = ((p >>> 8) & 0xff).toByte
          rgba(4*i+2) = (p & 0xff).toByte
          rgba(4*i+3) = ((p >>> 24) & 0xff).toByte
        }
        val base = s"${out}/own_${name}_${docId}_${w}x$h"
        java.nio.file.Files.write(java.nio.file.Paths.get(base + ".webp"), webp)
        java.nio.file.Files.write(java.nio.file.Paths.get(base + ".rgba"), rgba)
      }
    }
    println("dumped " + out.listFiles().length + " files")
  }
}

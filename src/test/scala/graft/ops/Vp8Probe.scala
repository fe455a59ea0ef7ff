package graft.ops

/** Scratch diagnosis harness for the VP8 decoder bring-up (dev loop
  * only — prints stats and the spatial diff mask against the libwebp
  * truth plane for one fixture).
  */
object Vp8Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "grad_16x16_q75"
    def res(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/vp8/$n")
      require(in != null, s"missing $n")
      try in.readAllBytes() finally in.close()
    }
    val webp = res(s"$name.webp")
    val truth = res(s"$name.yuv")
    val (d, st) = Vp8Decode.decodeWithStats(webp)
    println(s"[probe] $name ${d.width}x${d.height} stats=$st")
    val w = d.width; val h = d.height
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val ty = truth.slice(0, w * h)
    val tu = truth.slice(w * h, w * h + cw * ch)
    val tv = truth.slice(w * h + cw * ch, truth.length)
    def mask(p: String, a: Array[Byte], b: Array[Byte], sw: Int, sh: Int): Unit = {
      val n = a.indices.count(i => a(i) != b(i))
      println(s"[probe] $p: $n/${a.length} differ")
      if (n > 0) {
        val maxd = a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
        println(s"[probe] $p maxAbsDiff=$maxd")
        for (y <- 0 until math.min(sh, 40)) {
          val row = (0 until math.min(sw, 64)).map { x =>
            val i = y * sw + x
            val dd = math.abs((a(i) & 0xff) - (b(i) & 0xff))
            if (dd == 0) '.' else if (dd < 10) ('0' + dd).toChar else 'X'
          }.mkString
          println(f"[probe] $p y=$y%3d $row")
        }
      }
    }
    mask("Y", d.y, ty, w, h)
    mask("U", d.u, tu, cw, ch)
    mask("V", d.v, tv, cw, ch)
  }
}

package graft.gdx

import java.nio.file.Files

/** SCALE.md §13 probe: merge a 10³-symbol catalog pair and measure the
  * per-symbol job overlap the r15 `parPerSymbol` thread pool buys over
  * the serial driver loop (the r12–r14 watch item). Run via
  * `Test/runMain graft.gdx.GdxMergeProbe [nSymbols]`.
  */
object GdxMergeProbe {
  def main(args: Array[String]): Unit = {
    val nSym = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = graft.Sessions.build("local[32]", "32")
    val t = Files.createTempDirectory("gdxmergeprobe")
    def write(path: String, salt: Int): String = {
      val b = new GdxBuilder()
      (0 until nSym).foreach { i =>
        b.addSymbol(f"sym$i%04d", SymbolType.Parameter, 1, Seq(
          (Seq(s"u$i"), Array(i * 1.5 + salt), None),
          (Seq(s"v$i"), Array(i * 2.5 + salt), None)))
      }
      GdxCodec.write(b.result(), path)
      path
    }
    val a = write(s"$t/a.gdx", 0)
    val bf = write(s"$t/b.gdx", 7)
    def timeMerge(out: String, par: Int): Double = {
      sys.props("graft.gdx.symbolJobs") = par.toString
      try {
        val t0 = System.nanoTime()
        val names = Gdx.merge(spark, Seq(a, bf), out)
        require(names.length == nSym, s"merged ${names.length} of $nSym")
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.gdx.symbolJobs")
    }
    val tSer = timeMerge(s"$t/out_ser", 1)
    val tPar = timeMerge(s"$t/out_par", 8)
    println(f"[gdxmerge] n=$nSym serial(1) ${tSer}%8.2f s  pooled(8) ${tPar}%8.2f s  " +
      f"overlap x${tSer / tPar}%.2f")
    // spot-verify a few merged symbols
    for (i <- Seq(0, nSym / 2, nSym - 1)) {
      val n = f"sym$i%04d"
      val rows = Gdx.symbol(spark, s"$t/out_par/$n", n)
        .select("dim_1", "dim_2", "value").collect()
      require(rows.length == 4, s"$n: ${rows.length} rows")
    }
    println("[gdxmerge] spot-verify ok (4 rows per symbol: 2 tags x 2 uels)")
    spark.stop()
  }
}

package graft.sources

/** SCALE.md §12 manifest-scale probe (r13 verdict #9): a sharded GDX
  * dataset with 10⁴ committed shards — measure manifest parse, scan
  * PLANNING (partition enumeration + membership + range pruning), and
  * the planned-partition count of a pushed dim_1 slice (which must be
  * ~1 of 10⁴ without opening any shard header).
  * Run via `Test/runMain graft.sources.ManifestProbe`.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[8]", "8")
    val nShards = 10000
    val dir = java.nio.file.Files.createTempDirectory("manifestprobe").toString
    println(s"[probe] assembling $nShards shards under $dir …")
    val t0 = System.nanoTime()
    // hand-assemble tiny clustered shards + one manifest, the layout
    // the sharded writer produces (each shard: 4 records, disjoint
    // zero-padded dim_1 ranges so range pruning has exact teeth)
    val entries = new StringBuilder("{\"shards\":[\n")
    for (i <- 0 until nShards) {
      val b = new graft.gdx.GdxBuilder()
      val labels = (0 until 4).map(j => f"k${i * 4 + j}%08d")
      b.addSymbol("p", graft.gdx.SymbolType.Parameter, 1,
        labels.map(l => (Seq(l), Array((i * 4).toDouble), None)))
      val f = f"shard-$i%05d.gdx"
      graft.gdx.GdxCodec.write(b.result(), s"$dir/$f")
      if (i > 0) entries.append(",\n")
      entries.append(GdxManifest.entryJson(GdxShardCommit(
        f, 4, Some(labels.head), Some(labels.last))))
    }
    entries.append("\n]}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifest.json"),
      entries.toString.getBytes("UTF-8"))
    println(f"[probe] assembled in ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"manifest ${new java.io.File(dir, "_manifest.json").length / 1024} KiB")

    def timed[A](label: String)(f: => A): A = {
      val reps = (1 to 3).map { _ =>
        val s = System.nanoTime(); val r = f; ((System.nanoTime() - s) / 1e9, r)
      }
      println(f"[probe] $label%-34s best=${reps.map(_._1).min}%7.3f s")
      reps.head._2
    }

    val nFiles = timed("manifest parse (files)") {
      GdxManifest.files(dir).map(_.size).getOrElse(-1)
    }
    val nRanges = timed("manifest parse (ranges)") {
      GdxManifest.ranges(dir).size
    }
    require(nFiles == nShards && nRanges == nShards, s"$nFiles/$nRanges")

    val full = spark.read.format("gdx").option("symbol", "p").load(dir)
    val nParts = timed("full-scan planning (partitions)") {
      full.rdd.getNumPartitions
    }
    println(s"[probe] full scan plans $nParts partitions")

    val sliced = full.filter(org.apache.spark.sql.functions.col("dim_1")
      === f"k${12345}%08d")
    val nSliced = timed("sliced-scan planning (partitions)") {
      sliced.rdd.getNumPartitions
    }
    println(s"[probe] dim_1-slice plans $nSliced partitions (want 1)")
    require(nSliced == 1, s"range pruning planned $nSliced shards")

    val cnt = timed("full count over 10k shards") { full.count() }
    require(cnt == 4L * nShards, s"count $cnt")
    val scnt = timed("sliced count (1 shard)") { sliced.count() }
    require(scnt == 1L, s"sliced count $scnt")
    spark.stop()
  }
}

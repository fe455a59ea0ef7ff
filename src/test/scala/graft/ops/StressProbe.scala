package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for SCALE.md §6: replicate the sf0.1 tables 10× (~sf1)
  * with key-shifted, slightly-perturbed copies (so dedup/novelty see
  * TRUE near-dup structure and joins stay honest), then time the
  * registered queries named on the command line against the replicated
  * dir. Run via `Test/runMain graft.ops.StressProbe q1 q2 …`.
  */
/** MemoryStream element for the streaming-semdedup probe (top-level:
  * encoders reject nested case classes).
  */
case class ProbeVec(vec_id: Long, embedding: Array[Float])

object StressProbe {
  private val out = "/tmp/graft_probe_sf1"

  private def build(spark: SparkSession): Unit = {
    val src = "/root/testdata/sf0.1"
    def repl(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.T(spark, src, name)
      val ten = (0 until 10).map(i => f(base, i)).reduce(_ unionByName _)
      ten.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }
    repl("documents") { (df, i) =>
      // copy i: shifted ids, one appended copy-specific token → each doc
      // has 9 true near-duplicates (Jaccard ≈ 0.97, containment ≈ 1)
      df.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" v$i")).as("text"),
        col("lang"), col("source"), (col("n_chars") + lit(3)).as("n_chars"))
    }
    repl("embeddings") { (df, i) =>
      df.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(i * 1e-3f)).cast("float")).as("embedding"),
        col("label"))
    }
    repl("events") { (df, i) =>
      // T() rebuilds events.ts from a nanos long — write it back that way
      df.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        (unix_micros(col("ts")) * lit(1000L)).as("ts"),
        (col("user_id") + lit(i * 100000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    // small dims referenced by some queries pass through unchanged
    Seq("nation", "region", "customer", "orders", "lineitem", "supplier", "part")
      .foreach { t =>
        graft.T(spark, src, t).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/$t.parquet")
      }
  }

  private val hotOut = "/tmp/graft_probe_hotuser"

  /** Planted hot-user events table for the r11 unbounded-group fold
    * probe: 12M events, ONE user owning 80% (9.6M rows). The pre-r11
    * collect_list form of ts_ewma/ts_holt would materialize that
    * user's whole (ts, event_id, value) sequence in a single
    * aggregation buffer (~400 MB of structs); the streaming fold
    * sorts it spillably and keeps O(1) state. ts increases with
    * event_id so the fold order is deterministic.
    */
  private def buildHot(spark: SparkSession): Unit = {
    spark.range(12000000L).select(
      col("id").as("event_id"),
      // nanos long on disk — graft.T rebuilds the micro timestamp
      ((lit(1700000000000000L) + col("id")) * 1000L).as("ts"),
      when(col("id") % 5 =!= 0, 0L)
        .otherwise(pmod(hash(col("id")), lit(100)) + 1).as("user_id"),
      lit("view").as("event_type"),
      (pmod(hash(col("id") * 7L), lit(1000)) / lit(100.0)).as("value"),
      lit(null).cast("string").as("props"))
      .write.mode(SaveMode.Overwrite).parquet(s"$hotOut/events.parquet")
  }

  /** Replicated embeddings-only dir for the ANN clamp probes:
    * `mult`× sf0.1 (2000·mult vectors), key-shifted and slightly
    * perturbed like [[build]]'s copies.
    */
  private def buildBig(spark: SparkSession, mult: Int): String = {
    val dir = s"/tmp/graft_probe_big$mult"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val base = graft.T(spark, "/root/testdata/sf0.1", "embeddings")
      (0 until mult).map(i => base.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 1e-3f)).cast("float"))
          .as("embedding"),
        col("label"))).reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  /** Candidate-volume accounting for the IVFADC layouts at `mult`×
    * sf0.1: reports Σ n_b(n_b−1) and max/avg bucket size for (a) the
    * law the registered query actually uses (flat ≤256 cells, two-level
    * past the clamp) and (b) the 256-clamped FLAT layout for contrast —
    * the quadratic the hierarchy kills. Run via `cand:MULT`.
    */
  private def candProbe(spark: SparkSession, mult: Int): Unit = {
    val dir = buildBig(spark, mult)
    val emb = graft.T(spark, dir, "embeddings").select("vec_id", "embedding")
    val n = emb.count()
    val rawCells = math.round(n / 125.0)
    def stats(buckets: DataFrame, tag: String): Unit = {
      val h = buckets.groupBy("b").count()
        .agg(sum(col("count") * (col("count") - 1)).as("cand"),
          max("count").as("mx"), avg("count").as("av")).head
      println(f"[cand] mult=$mult n=$n $tag%-10s candidates=${h.getLong(0)}%12d " +
        f"cand/n=${h.getLong(0).toDouble / n}%9.1f maxCell=${h.getLong(1)}%6d avgCell=${h.getDouble(2)}%8.1f")
    }
    if (rawCells <= 256) {
      val k = LlmOps.autoCells(n)
      val cents = emb.orderBy("vec_id").limit(k).collect()
        .map(_.getSeq[Float](1).toArray)
      stats(LlmOps.ivfAssign(emb, cents).select(col("cell").as("b")), s"flat-$k")
    } else {
      val k1 = LlmOps.hierK1(n, 125)
      stats(LlmOps.hierAssign(emb, k1, 125)
        .select(concat_ws(":", col("cell"), col("si")).as("b")), s"hier-$k1")
      // contrast: what the clamped flat layout would do at this n
      val cents256 = emb.orderBy("vec_id").limit(256).collect()
        .map(_.getSeq[Float](1).toArray)
      stats(LlmOps.ivfAssign(emb, cents256).select(col("cell").as("b")),
        "flat-256")
    }
  }

  /** Replicated documents-only dir (mult× sf0.1 = 5000·mult docs with
    * planted near-dup structure, like [[build]]'s copies).
    */
  private def buildBigDocs(spark: SparkSession, mult: Int): String = {
    val dir = s"/tmp/graft_probe_docs$mult"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val base = graft.T(spark, "/root/testdata/sf0.1", "documents")
      (0 until mult).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" v$i")).as("text"),
        col("lang"), col("source"), (col("n_chars") + lit(3)).as("n_chars")))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    }
    dir
  }

  /** Embeddings dir with a PLANTED MEGA-DUPLICATE cluster: mult× sf0.1
    * replicas plus `copies` EXACT copies of the corpus's first vector
    * (vec_id ≥ 5·10⁸) — the raw-crawl shape where one embedding
    * repeats by the million. Exercises the r16 duplicate collapse.
    */
  private def buildDup(spark: SparkSession, mult: Int, copies: Int): String = {
    val dir = s"/tmp/graft_probe_dup${mult}_$copies"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val base = graft.T(spark, "/root/testdata/sf0.1", "embeddings")
      val one = base.orderBy("vec_id").limit(1)
        .select("embedding", "label").collect()(0)
      val dupEmb = array(one.getSeq[Float](0).map(x => lit(x)): _*)
        .cast("array<float>")
      val dup = spark.range(copies.toLong).select(
        (col("id") + lit(500000000L)).as("vec_id"),
        dupEmb.as("embedding"), lit(one.get(1)).as("label"))
      ((0 until mult).map(i => base.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 1e-3f)).cast("float"))
          .as("embedding"),
        col("label"))) :+ dup).reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  /** Duplicate-cluster law probe (`dup:MULT:COPIES`): on the planted
    * corpus, report the NAIVE in-bucket pair volume Σ n_b(n_b−1) —
    * what the pre-r16 self-join would shuffle, quadratic in the
    * cluster — against the COLLAPSED group-pair volume Σ d_b(d_b−1)
    * (d = distinct payloads per bucket) that [[LlmOps.collapsedPairTopK]]
    * actually joins, plus its structural expand bound n·(k+1)². Then
    * run the registered `sim_ann_ivf_hier` end-to-end for wall clock.
    */
  private def dupProbe(spark: SparkSession, mult: Int, copies: Int): Unit = {
    val dir = buildDup(spark, mult, copies)
    val emb = graft.T(spark, dir, "embeddings").select("vec_id", "embedding")
    val n = emb.count()
    val k1 = LlmOps.hierK1(n, 25)
    val asg = LlmOps.hierAssign(emb, k1, 25)
      .select(col("cell"), col("si"), col("embedding"))
    val naive = asg.groupBy("cell", "si").count()
      .agg(sum(col("count") * (col("count") - 1)).as("cand"),
        max("count").as("mx")).head
    // group-level join volume: one row per DISTINCT (bucket, payload)
    // group, then Σ d_b(d_b−1) over buckets — what the collapsed
    // device's rep-pair join actually shuffles
    val groups = asg.groupBy("cell", "si", "embedding").count()
    val coll = groups.groupBy("cell", "si")
      .agg(count(lit(1)).as("d"), max("count").as("mg"))
      .agg(sum(col("d") * (col("d") - 1)).as("cand"),
        max("mg").as("mx"), sum("d").as("groups")).head
    graft.Sessions.releaseCheckpoints(spark)
    println(f"[dup] mult=$mult copies=$copies n=$n hier-$k1 " +
      f"naivePairs=${naive.getLong(0)}%12d (maxBucket=${naive.getLong(1)})  " +
      f"collapsedGroupPairs=${coll.getLong(0)}%10d (maxDupGroup=${coll.getLong(1)}, " +
      f"groups=${coll.getLong(2)})  expandBound=${n * 16}%12d")
    Seq("sim_ann_ivf_hier", "sim_ann_lsh", "sim_ann_pq").foreach { qn =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(qn)(spark, dir).count()
      graft.Sessions.releaseCheckpoints(spark)
      println(f"[dup] $qn%-18s end-to-end wall=${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$rows")
    }
    // the keep-list law (r17): output must be EXACTLY corpus-sized at
    // any planted copy count — the linear companion to the pair rows'
    // Θ(copies²)-by-contract output
    val t0 = System.nanoTime()
    val keepRows = graft.SparkEntry.queries("dedup_semdedup_keep")(spark, dir).count()
    graft.Sessions.releaseCheckpoints(spark)
    println(f"[dup] dedup_semdedup_keep end-to-end wall=${(System.nanoTime() - t0) / 1e9}%8.2f s " +
      f"rows=$keepRows (corpus n=$n, linear ⇔ rows==n: ${keepRows == n})")
  }

  /** Candidate-volume curves for the banded-minhash and auto-plane LSH
    * paths at `mult`× sf0.1 — the r14 #9 ask: observe the scaling laws
    * in practice, not just at 10×. Run via `curve:MULT`.
    */
  private def curveProbe(spark: SparkSession, mult: Int): Unit = {
    val ddir = buildBigDocs(spark, mult)
    val docs = graft.T(spark, ddir, "documents")
    val nDocs = docs.count()
    val mh = LlmOps.minhashBands(docs.select("doc_id", "text"))
      .groupBy("band", "sig").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"),
        max("count").as("mx")).head
    println(f"[curve] mult=$mult docs=$nDocs minhash-bands candidates=${mh.getLong(0)}%12d " +
      f"cand/doc=${mh.getLong(0).toDouble / nDocs}%8.2f maxBucket=${mh.getLong(1)}%7d")
    val edir = buildBig(spark, mult)
    val emb = graft.T(spark, edir, "embeddings")
    val nVec = emb.count()
    val planes = LlmOps.autoPlanes(nVec)
    val lsh = LlmOps.lshBucketed(spark, edir, planes)
      .groupBy("bucket").count()
      .agg(sum(col("count") * (col("count") - 1)).as("cand"),
        max("count").as("mx"), avg("count").as("av")).head
    println(f"[curve] mult=$mult vecs=$nVec lsh-auto($planes planes) candidates=${lsh.getLong(0)}%12d " +
      f"cand/vec=${lsh.getLong(0).toDouble / nVec}%8.2f maxBucket=${lsh.getLong(1)}%7d avg=${lsh.getDouble(2)}%7.1f")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[32]", "32")
    val curveArgs = args.filter(_.startsWith("curve:"))
    curveArgs.foreach(a => curveProbe(spark, a.stripPrefix("curve:").toInt))
    val dupArgs = args.filter(_.startsWith("dup:")) // dup:MULT:COPIES
    dupArgs.foreach { a =>
      val p = a.split(":")
      dupProbe(spark, p(1).toInt, p(2).toInt)
    }
    val docRuns = args.filter(_.startsWith("docs:")) // docs:MULT:query
    docRuns.foreach { a =>
      val parts = a.split(":")
      val dir = buildBigDocs(spark, parts(1).toInt)
      val t0 = System.nanoTime()
      val nOut = graft.SparkEntry.queries(parts(2))(spark, dir).count()
      graft.Sessions.releaseCheckpoints(spark)
      println(f"[docs] mult=${parts(1)} ${parts(2)}%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$nOut")
    }
    val candArgs = args.filter(_.startsWith("cand:"))
    candArgs.foreach(a => candProbe(spark, a.stripPrefix("cand:").toInt))
    // streaming SemDeDup burst law (r18, the §15.2 twin): ONE
    // micro-batch carrying sf0.1 embeddings + COPIES identical planted
    // vectors must emit EXACTLY batch-n decisions, with wall clock
    // tracking reps (the exact collapse), never copies². streamsem:COPIES
    val streamSemArgs = args.filter(_.startsWith("streamsem:"))
    streamSemArgs.foreach { a =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val copies = a.stripPrefix("streamsem:").toInt
      val base = graft.T(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      val dup = base.head._2
      val burst = base.map(v => ProbeVec(v._1, v._2)) ++
        (0 until copies).map(i => ProbeVec(10000000L + i, dup))
      val idx = java.nio.file.Files.createTempDirectory("semdedup-probe").toString
      val ms = MemoryStream[ProbeVec](spark)
      var outRows = 0L
      var kept = 0L
      val q = graft.streaming.StreamOps.corpusSemDedup(ms.toDF(), idx) { o =>
        outRows += o.count()
        kept += o.filter(col("keep")).count()
      }
      val t0 = System.nanoTime()
      try { ms.addData(burst.toIndexedSeq: _*); q.processAllAvailable() }
      finally q.stop()
      graft.Sessions.releaseCheckpoints(spark)
      println(f"[streamsem] copies=$copies batchN=${burst.length} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%8.2f s outRows=$outRows " +
        f"(linear ⇔ ==batchN: ${outRows == burst.length}) kept=$kept")
    }
    val bigRuns = args.filter(_.startsWith("big:")) // big:MULT:query
    bigRuns.foreach { a =>
      val parts = a.split(":")
      val dir = buildBig(spark, parts(1).toInt)
      val t0 = System.nanoTime()
      val nOut = graft.SparkEntry.queries(parts(2))(spark, dir).count()
      graft.Sessions.releaseCheckpoints(spark)
      println(f"[big] mult=${parts(1)} ${parts(2)}%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$nOut")
    }
    if (candArgs.nonEmpty || bigRuns.nonEmpty || curveArgs.nonEmpty ||
      docRuns.nonEmpty || dupArgs.nonEmpty || streamSemArgs.nonEmpty) {
      spark.stop(); return
    }
    val (hotNames, replNames) = args.partition(_.startsWith("hot:"))
    if (replNames.nonEmpty && !new java.io.File(s"$out/documents.parquet").exists()) {
      println("[probe] building 10x replicated tables …")
      build(spark)
    }
    if (hotNames.nonEmpty && !new java.io.File(s"$hotOut/events.parquet").exists()) {
      println("[probe] building planted hot-user events …")
      buildHot(spark)
    }
    def run(name: String, dir: String): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        graft.Sessions.releaseCheckpoints(spark)
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[probe] $name%-28s min=${times.map(_._1).min}%8.2f s  rows=${times.head._2}")
    }
    replNames.foreach(run(_, out))
    hotNames.foreach(a => run(a.stripPrefix("hot:"), hotOut))
    spark.stop()
  }
}

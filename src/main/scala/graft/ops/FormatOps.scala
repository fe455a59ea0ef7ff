package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SURVEY.md §2 — interchange formats and data layout.
  *
  * The parquet scan/sink surface is exercised by every other module;
  * this one covers the rest of the format matrix a production corpus
  * pipeline touches: sharded JSONL (the LLM training-data handoff
  * format), CSV (the ubiquitous ingest format), and Z-order layout
  * (the multi-column file-skipping story for 100 TB lakehouse tables).
  *
  * The two round-trip rows WRITE real files to a per-SF temp dir and
  * read them back through the matching Spark source — the oracle
  * recomputes the expected result from the original parquet, so a
  * lossy encode/decode (quoting, escaping, type coercion) fails the
  * hash, not just a row count.
  */
object FormatOps extends QueryModule {

  /** Per-(sfDir, tag, PID) scratch dir: process-unique, so two
    * harness JVMs running concurrently against the same sfDir
    * (Verify / Bench / the test JVM — the same premise GdxOps
    * buildOnce exists for) each write and read their OWN directory —
    * no racing reader can observe another process's overwrite
    * delete-before-commit gap. Within one process the path is stable,
    * so repeated runs overwrite rather than accumulate; a JVM
    * shutdown hook removes the dirs so crashed-run leftovers don't
    * pile up in tmp across a long session.
    */
  private val scratchRoots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  sys.addShutdownHook {
    scratchRoots.forEach { p =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    }
  }

  private def scratch(sfDir: String, tag: String): String = {
    val h = Integer.toHexString(sfDir.hashCode)
    val p = s"${sys.props("java.io.tmpdir")}/graft_fmt_${h}_p${ProcessHandle.current().pid()}_$tag"
    scratchRoots.add(p)
    p
  }

  /** Sharded JSONL export + read-back — the handoff format LLM
    * training stacks consume (one JSON doc per line, fixed shard
    * count). Shard assignment is content-keyed (doc_id mod 8), the
    * write is `partitionBy(shard)` so each shard lands as its own
    * directory — at 100 TB the same layout writes from all executors
    * with no coordination and re-reads with partition pruning on the
    * shard column. The read-back goes through Spark's JSON source
    * with an EXPLICIT schema (schema inference is a second full scan
    * — never pay it on a large corpus), and the verified aggregate
    * covers every field, so a quoting/escape bug in either direction
    * breaks the hash against the parquet-derived oracle.
    */
  q("sink_jsonl_shards",
    """SELECT CAST(doc_id % 8 AS BIGINT) AS shard, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(len(text)) AS BIGINT) AS sum_text_len,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(min(doc_id) AS BIGINT) AS min_id,
      |       CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY 1 ORDER BY shard""") { (s, d) =>
    val dir = scratch(d, "jsonl")
    T(s, d, "documents")
      .withColumn("shard", col("doc_id") % 8)
      .write.mode("overwrite").partitionBy("shard").json(dir)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT, shard BIGINT")
      .json(dir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct(col("lang")).as("n_langs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .reportSorted("shard")
  }

  /** Corrupt-tolerant JSONL ingestion — the failure mode every
    * web-scale pipeline hits (truncated uploads, encoding damage,
    * mid-line splits): write the corpus as JSON text lines with a
    * DETERMINISTIC fault injection (every doc_id ≡ 0 mod 7 line is
    * truncated mid-string), then read back in PERMISSIVE mode with a
    * `_corrupt` capture column — bad lines become quarantine rows
    * instead of killing the job (FAILFAST) or silently vanishing
    * (DROPMALFORMED). The report splits good/quarantined counts and
    * aggregates only parsed rows; the oracle recomputes both from the
    * parquet source using the same mod-7 rule, so a parser that
    * swallows or double-counts a corrupt line breaks the hash. Scale:
    * the text write and the permissive parse are both embarrassingly
    * parallel; quarantine rows carry the raw line for a replay queue.
    */
  q("source_jsonl_corrupt",
    """SELECT CAST(count(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS BIGINT) AS n_good,
      |       CAST(count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_quarantined,
      |       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT) AS good_chars,
      |       CAST(min(CASE WHEN doc_id % 7 <> 0 THEN doc_id END) AS BIGINT) AS min_good_id
      |FROM documents""") { (s, d) =>
    val dir = scratch(d, "jsonl_corrupt")
    val docs = T(s, d, "documents")
    docs.select(
        when(col("doc_id") % 7 === 0,
          // truncated mid-string: unterminated JSON the parser must flag
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"text\": \"trunc")))
          .otherwise(to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("value"))
      .write.mode("overwrite").text(dir)
    val parsed = s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT, _corrupt STRING")
      .json(dir)
    parsed.agg(
      count(when(col("_corrupt").isNull, 1)).as("n_good"),
      count(when(col("_corrupt").isNotNull, 1)).as("n_quarantined"),
      sum(when(col("_corrupt").isNull, col("n_chars"))).as("good_chars"),
      min(when(col("_corrupt").isNull, col("doc_id"))).as("min_good_id"))
  }

  /** Hive-style partitioned parquet layout — THE physical organization
    * of a 100 TB lakehouse table: `partitionBy(lang)` writes one
    * directory per language so a reader filtering on the partition
    * column never opens the other directories (partition PRUNING —
    * directory listing, not data IO, decides; the pruned plan is
    * asserted in PlanInvariantsSpec). The read-back aggregate covers
    * every surviving column, and the oracle recomputes from the
    * original parquet with the same predicate, so a row lost or
    * duplicated by the partitioned rewrite fails the hash. Partition
    * columns must be LOW-cardinality (languages, dates, sources — not
    * doc ids: a 10⁶-value partition column is 10⁶ directories of tiny
    * files, the classic small-files failure).
    */
  q("sink_partitioned_parquet",
    """SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(min(doc_id) AS BIGINT) AS min_id,
      |       CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM documents WHERE lang IN ('en', 'de')
      |GROUP BY 1, 2 ORDER BY lang, source""") { (s, d) =>
    val dir = scratch(d, "hivepart")
    T(s, d, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    s.read.parquet(dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .reportSorted("lang", "source")
  }

  /** CSV export + read-back with explicit schema and header — the
    * ingest format everything upstream of a lakehouse still speaks.
    * Verified the same way as the JSONL row: the aggregate touches
    * every column (timestamps included — CSV round-trips them through
    * ISO strings, the classic silent-precision trap), so coercion or
    * quoting loss fails the value hash. The read is schema-pinned:
    * CSV inference is both a second scan AND type-unstable across
    * corpus slices — never infer at scale.
    */
  q("source_csv_roundtrip",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       round(sum(o_totalprice), 4) AS sum_price,
      |       CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_date_us,
      |       CAST(max(o_custkey) AS BIGINT) AS max_cust
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    val dir = scratch(d, "csv")
    // o_orderdate is TIMESTAMP_NTZ (tz-naive parquet) — the CSV writer
    // formats it with timestampNTZFormat, so the read schema must say
    // TIMESTAMP_NTZ too or every value silently parses to null; the
    // final unix_micros goes through a cast to UTC-session timestamp
    T(s, d, "orders")
      .write.mode("overwrite").option("header", "true").csv(dir)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING")
      .option("header", "true")
      .csv(dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 4).as("sum_price"),
        unix_micros(min(col("o_orderdate")).cast("timestamp")).as("min_date_us"),
        max("o_custkey").as("max_cust"))
      .reportSorted("o_orderstatus", "o_orderpriority")
  }

  /** Line-delimited XML export + read-back — the scalable XML shape
    * (one self-contained record element per line, the form spark-xml's
    * rowTag splitting approximates and log pipelines emit natively):
    * records render via scala.xml with full attribute/text escaping,
    * land as plain text shards, and read back through a mapPartitions
    * parse — each line parses independently, so the scan splits like
    * any text file and the parse is map-side-only. The round trip is
    * verified value-exact against the parquet-derived oracle on every
    * column INCLUDING the text body (escaping bugs — &, <, quotes —
    * fail the hash, not just the row count). NULL text round-trips via
    * an explicit nil="true" marker (so `<doc></doc>` unambiguously
    * means the empty string, not null); NULL lang/source round-trip
    * via attribute absence (read back through attribute presence, not
    * `\@`'s null-vs-'' collapsing). Control characters (\n \r \t) are
    * written as XML character references so a text body can never
    * break the one-record-per-line framing the splittable scan relies
    * on — XML.loadString resolves them back to the original chars.
    */
  q("source_xml_roundtrip",
    """SELECT doc_id, lang, source, text FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sess = s
    import sess.implicits._
    val dir = scratch(d, "xml")
    T(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[(Long, String, String, String)]
      .map { case (id, lang, src, text) =>
        XmlCodec.render(id, lang, src, text)
      }
      .write.mode("overwrite").text(dir)
    s.read.textFile(dir)
      .mapPartitions(lines => lines.map(XmlCodec.parse))
      .toDF("doc_id", "lang", "source", "text")
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Avro Object Container File export + read-back (SPEC: the Avro
    * 1.12 OCF spec — magic, schema-in-header, deflate-compressed
    * blocks, sync markers; THE row-oriented interchange format of the
    * Kafka/Hive ecosystem, and the one builtin format family member
    * Spark ships the LIBRARY for but no connector). The writer emits
    * one real OCF shard per partition through the Avro generic API
    * (nullable unions for every string column, deflate codec — genuine
    * compressed binary, not JSON-in-disguise); the reader lists
    * shards, parallelizes per shard (the jsonl-shards granularity;
    * production readers additionally split on the sync markers inside
    * a shard) and streams records back map-side. Shards are written
    * through the Hadoop FileSystem API against a broadcast of the
    * driver's Configuration — the path resolves on whatever shared
    * storage `fs.defaultFS` names (HDFS/object store on a cluster,
    * local fs here), not on the executor's local disk, so the
    * write-then-read contract holds when executors and driver do NOT
    * share a filesystem. Round trip is value-exact on every column
    * against the parquet-derived oracle — a union-branch,
    * Utf8-vs-String, or codec slip fails the hash.
    */
  q("source_avro_roundtrip",
    """SELECT doc_id, lang, source, text FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sess = s
    import sess.implicits._
    val dir = scratch(d, "avro")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(s.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"source","type":["null","string"],"default":null},
        |{"name":"text","type":["null","string"],"default":null}]}""".stripMargin
    T(s, d, "documents").select("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)]
      .rdd.mapPartitionsWithIndex { (i, it) =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        val shard = new org.apache.hadoop.fs.Path(dir, f"part-$i%05d.avro")
        // Hadoop FS stream, not java.io.File: resolves on shared
        // storage so the read-back works off-driver; close() below
        // closes the stream through DataFileWriter
        w.create(schema, shard.getFileSystem(hconf.value).create(shard, true))
        var n = 0L
        it.foreach { case (id, lang, src, text) =>
          val r = new org.apache.avro.generic.GenericData.Record(schema)
          r.put("doc_id", id); r.put("lang", lang)
          r.put("source", src); r.put("text", text)
          w.append(r)
          n += 1
        }
        w.close()
        Iterator.single(n)
      }.count() // materialize the export before the read-back plan
    val back = s.sparkContext.binaryFiles(s"$dir/*.avro")
      .flatMap { case (_, pds) =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val rdr = new org.apache.avro.file.DataFileStream(pds.open(),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](schema))
        def str(r: org.apache.avro.generic.GenericRecord, f: String): String = {
          val v = r.get(f); if (v == null) null else v.toString
        }
        new Iterator[(Long, String, String, String)] {
          def hasNext: Boolean = {
            val h = rdr.hasNext
            if (!h) rdr.close()
            h
          }
          def next(): (Long, String, String, String) = {
            val r = rdr.next()
            (r.get("doc_id").asInstanceOf[Long],
              str(r, "lang"), str(r, "source"), str(r, "text"))
          }
        }
      }
    s.createDataFrame(back).toDF("doc_id", "lang", "source", "text")
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** ORC export + read-back — the other builtin columnar format (the
    * Hive-ecosystem sibling of parquet; a complete engine reads both).
    * The read-back applies a selective predicate so ORC's row-group
    * statistics pushdown is on the exercised path (same PushedFilters
    * machinery the parquet scans are plan-asserted on), and the
    * aggregate covers every surviving column against the
    * parquet-derived oracle.
    */
  q("source_orc_roundtrip",
    """SELECT l_returnflag, count(*) AS n,
      |       round(sum(l_extendedprice), 4) AS sum_price,
      |       CAST(max(l_orderkey) AS BIGINT) AS max_key
      |FROM lineitem WHERE l_quantity >= 45
      |GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    val dir = scratch(d, "orc")
    T(s, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .filter(col("l_quantity") >= 45)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 4).as("sum_price"),
        max("l_orderkey").as("max_key"))
      .reportSorted("l_returnflag")
  }

  /** 8-bit Morton spread: insert a zero bit between every bit of an
    * 8-bit value (the magic-mask cascade, 3 steps). Pure integer bit
    * algebra — identical on both engines, codegen'd end to end in
    * Spark; widening the cascade to 16/32-bit keys adds steps, not
    * structure.
    */
  private def spread8(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(255L))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 4))).bitwiseAND(lit(0x0F0FL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 2))).bitwiseAND(lit(0x3333L))
    (m2.bitwiseOR(shiftleft(m2, 1))).bitwiseAND(lit(0x5555L))
  }

  /** Z-order (Morton curve) clustering — the lakehouse data-layout
    * operator (Delta/Iceberg OPTIMIZE ZORDER): interleaving the bits
    * of two sort keys gives ONE linear order under which a contiguous
    * range of rows is simultaneously tight in BOTH dimensions, so
    * min/max file statistics prune scans filtered on either column —
    * a lexicographic (a, b) sort gives pruning on `a` only. The query
    * z-orders lineitem on folded (partkey, suppkey) bytes and reports
    * the per-file stats of a 256-file layout (z >> 8 = one 16×16
    * tile per file): the (min, max) spans per dimension ARE what a
    * scan planner prunes against, and the oracle pins them exactly —
    * every file spans ≤16 of EACH key space. Shape: the z-value is
    * map-side bit algebra, the file split at scale is
    * repartitionByRange(z) straight into the writer, and the stats
    * roll up in one two-phase aggregate over 256 groups.
    */
  /** Hilbert-curve clustering (Hilbert 1891 via the Warren/Wikipedia
    * xy2d bit algorithm; the space-filling curve Delta Lake's
    * OPTIMIZE and Iceberg's rewrite offer BESIDE z-order because its
    * per-file bounding boxes are tighter — the curve never makes the
    * long diagonal jumps Morton order does): same 8-bit (x, y) =
    * (partkey, suppkey) domain and same d >> 8 file grouping as
    * [[sort_zorder_cluster]] so the two rows are directly comparable.
    * At 4^k-ALIGNED granularity both curves tile the plane into the
    * same exact 16×16 boxes (measured: identical mean file area) —
    * Hilbert's advantage is MISALIGNED curve ranges, where Morton's
    * diagonal jumps blow the bounding box and Hilbert's unit-step
    * continuity keeps it ~minimal; OpsSemanticsSpec pins exactly that
    * (driver-side range-bbox comparison) plus the unit-step walk via
    * the INVERSE d2xy algorithm. The curve index is 8 unrolled
    * quadrant-rotate stages of PURE integer CASE/XOR arithmetic —
    * exactly replayable as chained CTEs, map-side, zero shuffle
    * before the file group-by.
    */
  q("sort_hilbert_cluster", {
    val head =
      """WITH b AS (SELECT l_partkey & 255 AS x0, l_suppkey & 255 AS y0 FROM lineitem),
        |h0 AS (SELECT x0, y0, x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d FROM b)""".stripMargin
    val stages = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map {
      case (s, k) =>
        s""",
           |h${k + 1} AS (SELECT x0, y0,
           |  CASE WHEN (y & $s) = 0
           |       THEN CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END
           |       ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0
           |       THEN CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END
           |       ELSE y END AS y,
           |  d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
           |                     CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
           |  FROM h$k)""".stripMargin
    }.mkString
    head + stages +
      """
        |SELECT CAST(d >> 8 AS BIGINT) AS hfile, count(*) AS n,
        |       CAST(min(x0) AS BIGINT) AS x_min, CAST(max(x0) AS BIGINT) AS x_max,
        |       CAST(min(y0) AS BIGINT) AS y_min, CAST(max(y0) AS BIGINT) AS y_max
        |FROM h8 GROUP BY 1 ORDER BY hfile""".stripMargin
  }) { (s, d) =>
    var df = T(s, d, "lineitem")
      .select(col("l_partkey").bitwiseAND(lit(255L)).as("x0"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("y0"))
      .withColumn("hx", col("x0")).withColumn("hy", col("y0"))
      .withColumn("hd", lit(0L))
    for (sq <- Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)) {
      val rx = when(col("hx").bitwiseAND(lit(sq)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("hy").bitwiseAND(lit(sq)) > 0, lit(1L)).otherwise(lit(0L))
      // rotate reads the PRE-update x/y — stage via temp columns
      df = df
        .withColumn("hd2", col("hd") + lit(sq * sq) * (lit(3L) * rx).bitwiseXOR(ry))
        .withColumn("hx2", when(ry === 0,
          when(rx === 1, lit(sq - 1) - col("hy")).otherwise(col("hy")))
          .otherwise(col("hx")))
        .withColumn("hy2", when(ry === 0,
          when(rx === 1, lit(sq - 1) - col("hx")).otherwise(col("hx")))
          .otherwise(col("hy")))
        .drop("hd", "hx", "hy")
        .withColumnRenamed("hd2", "hd")
        .withColumnRenamed("hx2", "hx")
        .withColumnRenamed("hy2", "hy")
    }
    df.groupBy(shiftright(col("hd"), 8).as("hfile"))
      .agg(count(lit(1)).as("n"),
        min("x0").as("x_min"), max("x0").as("x_max"),
        min("y0").as("y_min"), max("y0").as("y_max"))
      .reportSorted("hfile") // 256 curve files = report-sized
  }

  q("sort_zorder_cluster",
    """WITH b AS (
      |  SELECT l_partkey & 255 AS x, l_suppkey & 255 AS y FROM lineitem),
      |     sx AS (SELECT x, y, (x | (x << 4)) & 3855 AS x1,
      |                         (y | (y << 4)) & 3855 AS y1 FROM b),
      |     s2 AS (SELECT x, y, (x1 | (x1 << 2)) & 13107 AS x2,
      |                         (y1 | (y1 << 2)) & 13107 AS y2 FROM sx),
      |     s3 AS (SELECT x, y, (x2 | (x2 << 1)) & 21845 AS xs,
      |                         (y2 | (y2 << 1)) & 21845 AS ys FROM s2),
      |     z AS (SELECT x, y, (xs | (ys << 1)) >> 8 AS zfile FROM s3)
      |SELECT CAST(zfile AS BIGINT) AS zfile, count(*) AS n,
      |       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
      |       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
      |FROM z GROUP BY 1 ORDER BY zfile""") { (s, d) =>
    val df = T(s, d, "lineitem")
      .select(col("l_partkey").bitwiseAND(lit(255L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("y"))
      .withColumn("z", spread8(col("x")).bitwiseOR(shiftleft(spread8(col("y")), 1)))
    df.groupBy(shiftright(col("z"), 8).as("zfile"))
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .reportSorted("zfile")
  }

  /** Schema-evolution read: two parquet drops of the same table where
    * the newer drop ADDED a column (the routine long-lived-dataset
    * migration), read back in ONE scan with `mergeSchema` — old files
    * surface the new column as NULL, no rewrite of historical data.
    * The verified aggregate splits on NULL-ness of the added column,
    * so a wrong fill (default instead of NULL, or dropped rows) fails
    * the hash. At 100 TB this is exactly why mergeSchema exists:
    * schema drift is resolved per-footer at the executors; only the
    * requested columns are read from either generation of files.
    */
  q("source_parquet_evolution",
    """WITH u AS (
      |  SELECT doc_id, lang, NULL AS n_chars FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars_v2
      |FROM u GROUP BY lang ORDER BY lang""") { (s, d) =>
    val dir = scratch(d, "evolve")
    val docs = T(s, d, "documents")
    docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dir/gen=v1")
    docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/gen=v2")
    s.read.option("mergeSchema", "true").parquet(s"$dir/gen=v1", s"$dir/gen=v2")
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("n_chars").isNull, 1L).otherwise(0L)).cast("long").as("n_v1"),
        sum("n_chars").cast("long").as("sum_chars_v2"))
      .reportSorted("lang")
  }
}

/** Line-delimited XML record codec for `source_xml_roundtrip`.
  *
  * Contract (what the scan-side framing and the null model require):
  *   - one `<doc …>` element per physical line — control characters in
  *     any value are written as XML character references (`&#10;` etc.)
  *     so the record can never span lines;
  *   - NULL text ⇒ `nil="true"` attribute and a self-closed element;
  *     the empty string ⇒ `<doc …></doc>` (content-empty, NO nil) — the
  *     two are distinguishable on read-back;
  *   - NULL lang/source ⇒ attribute absent; read back via
  *     `e.attribute(name)` presence (`\@` would collapse absent to "").
  */
object XmlCodec {
  /** XML-escape plus character references for line/tab controls. */
  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\n' => sb.append("&#10;")
        case '\r' => sb.append("&#13;")
        case '\t' => sb.append("&#9;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def render(id: Long, lang: String, source: String, text: String): String = {
    val sb = new StringBuilder(64)
    sb.append("<doc id=\"").append(id).append('"')
    if (lang != null) sb.append(" lang=\"").append(esc(lang)).append('"')
    if (source != null) sb.append(" source=\"").append(esc(source)).append('"')
    if (text == null) sb.append(" nil=\"true\"/>").toString
    else sb.append('>').append(esc(text)).append("</doc>").toString
  }

  def parse(line: String): (Long, String, String, String) = {
    val e = scala.xml.XML.loadString(line)
    def attr(n: String): String = e.attribute(n).map(_.text).orNull
    val text = if (attr("nil") == "true") null else e.text
    ((e \@ "id").toLong, attr("lang"), attr("source"), text)
  }
}

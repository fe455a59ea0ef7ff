package graft.functions

import graft.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions: correctness vs the HOF formulation, float
  * and double element types, null handling, and both execution paths
  * (whole-stage codegen on/off → doGenCode and nullSafeEval).
  */
class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.build("local[4]", "4")

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)),
      (3L, Seq(-1.0f, 1.0f, 0.5f), Seq(2.0f, -2.0f, 4.0f)))
      .toDF("id", "a", "b")
  }

  test("vec_dot / vec_norm / vec_cosine match HOF math on float arrays") {
    val got = fixture.select(col("id"),
      vec.dot(col("a"), col("b")).as("dot"),
      vec.norm(col("a")).as("na"),
      vec.cosine(col("a"), col("b")).as("cos"))
      .orderBy("id").collect()
    val want = fixture.select(col("id"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (s, x) -> s + x)").as("dot"),
      sqrt(expr("aggregate(a, 0D, (s, x) -> s + CAST(x AS DOUBLE) * x)")).as("na"))
      .orderBy("id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g.getDouble(1) - w.getDouble(1)) < 1e-9, s"dot id=${g.getLong(0)}")
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-9, s"norm id=${g.getLong(0)}")
    }
    // zero vector → cosine 0 by definition (not NaN)
    assert(got.find(_.getLong(0) == 2L).get.getDouble(3) == 0.0)
    // cos(a,b) == dot/(|a||b|)
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(math.abs(r1.getDouble(3) - r1.getDouble(1) /
      (r1.getDouble(2) * math.sqrt(16 + 25 + 36))) < 1e-9)
  }

  test("double arrays accepted; result identical to float within 1e-6") {
    val d = fixture.select(col("id"),
      expr("transform(a, x -> CAST(x AS DOUBLE))").as("a"),
      expr("transform(b, x -> CAST(x AS DOUBLE))").as("b"))
    val f = fixture.select(col("id"), vec.cosine(col("a"), col("b")).as("c")).orderBy("id").collect()
    val g = d.select(col("id"), vec.cosine(col("a"), col("b")).as("c")).orderBy("id").collect()
    f.zip(g).foreach { case (x, y) => assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-6) }
  }

  test("null input → null output") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("id", "a", "b")
    val r = df.select(vec.dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val sql = spark.conf
    val before = sql.get("spark.sql.codegen.wholeStage", "true")
    val withCg = fixture.select(vec.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    try {
      sql.set("spark.sql.codegen.wholeStage", "false")
      sql.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val noCg = fixture.select(vec.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
      withCg.zip(noCg).foreach { case (x, y) => assert(x == y) }
    } finally {
      sql.set("spark.sql.codegen.wholeStage", before)
      sql.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("vec_quantize8 rounds half-away-from-zero exactly, incl. the 0.4999... edge double") {
    import spark.implicits._
    // 127.0 max → scale is exactly 1.0, so each element IS the value
    // handed to the rounder. 0.49999999999999994 is the largest double
    // below 0.5: `t + 0.5` truncation yields 1 (the FP add rounds up to
    // 1.0); exact half-away rounding yields 0, like C round / DuckDB.
    val edge = 0.49999999999999994
    val df = Seq(Tuple1(Seq(edge, -edge, 0.5, -0.5, 2.5, -2.5, 127.0)))
      .toDF("a")
    def run() = df.select(vec.quantize8(col("a"))).head
      .getSeq[Byte](0).toSeq
    val want = Seq[Byte](0, 0, 1, -1, 3, -3, 127)
    assert(run() === want) // codegen path
    val sql = spark.conf
    val before = sql.get("spark.sql.codegen.wholeStage", "true")
    try {
      sql.set("spark.sql.codegen.wholeStage", "false")
      sql.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === want) // interpreted path
    } finally {
      sql.set("spark.sql.codegen.wholeStage", before)
      sql.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("pq_encode: first-min argmin per subspace, codegen and interpreted agree") {
    import spark.implicits._
    // 2 subspaces × 2 dims, 2 centroids each (flattened [m][k][j]):
    //   m=0: c0=(0,0), c1=(1,1);  m=1: c0=(5,5), c1=(0,0)
    val cb = Seq(0.0, 0.0, 1.0, 1.0, 5.0, 5.0, 0.0, 0.0)
    val cbCol = array(cb.map(lit): _*)
    val df = Seq(
      Tuple1(Seq(0.9f, 0.9f, 4.0f, 4.0f)), // m0 → c1, m1 → c0
      Tuple1(Seq(0.5f, 0.5f, 0.0f, 0.0f))) // m0 tie (dist 0.5 both) → FIRST min c0; m1 → c1
      .toDF("v")
    def run() = df.select(vec.pqEncode(col("v"), cbCol, 2, 2)).collect()
      .map(_.getSeq[Int](0).toSeq).toSeq
    val want = Seq(Seq(1, 0), Seq(0, 1))
    assert(run() === want) // codegen
    val sql = spark.conf
    val before = sql.get("spark.sql.codegen.wholeStage", "true")
    try {
      sql.set("spark.sql.codegen.wholeStage", "false")
      sql.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === want) // interpreted
    } finally {
      sql.set("spark.sql.codegen.wholeStage", before)
      sql.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("simhash32 matches the explode+groupBy vote formulation bit-for-bit") {
    import spark.implicits._
    val docs = Seq((1L, "spark scale shuffle codegen spark"),
      (2L, "a completely different stream of tokens here"),
      (3L, "spark scale shuffle codegen sparks"), // near-dup of 1
      (4L, "wört zürich naïve 東京 data")) // non-ASCII: codepoint fold, not bytes
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      text.simhash32(split(col("text"), " ")).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      // reference vote formulation with the same SQL-expressible token
      // hash the expression uses: char polynomial spread to 32 bits
      .withColumn("h", expr(
        """aggregate(split(tok, ''), CAST(0 AS BIGINT),
          |  (a, c) -> (a * 31 + ascii(c)) % 1000000007L)
          |  * 2654435761L % 4294967296L""".stripMargin))
    val bitCols = (0 until 32).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val want = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(got.toSeq == want.toSeq)
    // near-dups land close in Hamming distance; unrelated docs far
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(0), got(2)) < ham(got(0), got(1)))
  }

  test("token_poly_hash matches the HOF char-fold formulation") {
    import spark.implicits._
    val docs = Seq("alpha beta", "x", "", "repeated repeated tokens",
      "wört zürich naïve 東京") // 2- and 3-byte UTF-8: must fold codepoints
      .toDF("text")
    val got = docs.select(text.tokenPolyHash(split(col("text"), " ")).as("h"))
      .collect().map(_.getSeq[Long](0))
    val want = docs.select(expr(
      """transform(split(text, ' '), t -> aggregate(split(t, ''), CAST(0 AS BIGINT),
        |  (a, c) -> (a * 31 + ascii(c)) % 1000000007L))""".stripMargin).as("h"))
      .collect().map(_.getSeq[Long](0))
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("property: polyOf equals the JDK codePoints fold on random unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    val Mod = 1000000007L
    def ref(t: String): Long = {
      var poly = 0L
      t.codePoints().forEach(cp => poly = (poly * 31 + cp) % Mod)
      poly
    }
    val rnd = new scala.util.Random(7)
    val pools = Seq(
      (0x20 to 0x7e),           // ASCII
      (0xa0 to 0x2ff),          // 2-byte UTF-8
      (0x4e00 to 0x4fff),       // CJK, 3-byte
      (0x1f300 to 0x1f3ff))     // astral, 4-byte (surrogate pairs)
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(12)
      val cps = Array.fill(len) {
        val pool = pools(rnd.nextInt(pools.length))
        pool(rnd.nextInt(pool.length))
      }
      val str = new String(cps, 0, cps.length)
      assert(graft.functions.TokenPolyHash.polyOf(UTF8String.fromString(str))
        == ref(str), s"mismatch on ${str.toList.map(_.toInt)}")
    }
  }

  test("SQL surface: vec_cosine resolvable by name via extensions") {
    fixture.createOrReplaceTempView("vecs")
    val n = spark.sql("SELECT vec_cosine(a, b) AS c FROM vecs WHERE vec_norm(a) > 0").count()
    assert(n == 2)
  }

  test("null ELEMENTS yield null results, never a silent 0.0 read") {
    // getDouble on a null slot returns 0.0 in both ArrayData impls —
    // a plausible-but-wrong similarity; the expressions must surface
    // NULL for the row instead, on BOTH execution paths
    import org.apache.spark.sql.functions._
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(1.0 AS DOUBLE), NULL, CAST(3.0 AS DOUBLE)),
        |   array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))),
        |  (array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
        |   array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)))
        |AS t(a, b)""".stripMargin)
    df.createOrReplaceTempView("nullvecs")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = spark.sql(
          """SELECT vec_dot(a, b) AS d, vec_norm(a) AS n, vec_cosine(a, b) AS c,
            |       vec_quantize8(a) AS q
            |FROM nullvecs""".stripMargin).collect()
        val withNull = rows(0)
        assert(withNull.isNullAt(0) && withNull.isNullAt(1) &&
          withNull.isNullAt(2) && withNull.isNullAt(3),
          s"[$codegen] null element must null the result: $withNull")
        val clean = rows(1)
        assert(!clean.isNullAt(0) && math.abs(clean.getDouble(2) - 1.0) < 1e-9,
          s"[$codegen] clean row must still compute: $clean")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("ingest validation: embeddings corpus is element-null-free, so the loader retag is sound") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // The T loader retags embeddings' elements containsNull=false
    // (KnownElementsNotNull) on the strength of THIS check: the actual
    // driver-written parquet must contain zero null elements and zero
    // null arrays. If a future testdata drop ships nulls, this fails
    // before any silent 0.0 corruption can reach a similarity.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val raw = spark.read.parquet(s"$dir/embeddings.parquet")
        val bad = raw.filter(
          col("embedding").isNull ||
            expr("exists(embedding, x -> x IS NULL)")).count()
        assert(bad == 0L, s"$sf: $bad rows with null array / null elements")
        // and the loader actually applies the retag
        val loaded = graft.T(spark, dir, "embeddings")
        assert(loaded.schema("embedding").dataType ===
          ArrayType(FloatType, containsNull = false),
          s"$sf: loader must declare element containsNull=false")
      }
    }
  }

  test("vec_elems_nonnull: identity on values, retags the declared element nullability") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // a conditionally-null lambda declares containsNull=true while the
    // branch never fires on this data — the same declared-vs-actual
    // gap as the parquet footer, in miniature
    val df = fixture.select(col("id"),
      expr("transform(a, x -> IF(x > 1e9, NULL, CAST(x AS DOUBLE)))").as("a"))
    assert(df.schema("a").dataType === ArrayType(DoubleType, containsNull = true))
    val tagged = df.select(col("id"), vec.elemsNonNull(col("a")).as("a"))
    assert(tagged.schema("a").dataType === ArrayType(DoubleType, containsNull = false))
    // values pass through untouched on both execution paths
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = tagged.orderBy("id").collect().map(_.getSeq[Double](1))
        val want = df.orderBy("id").collect().map(_.getSeq[Double](1))
        assert(got.toSeq === want.toSeq, s"[$codegen] retag must not alter values")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // a null ARRAY (top-level) still passes through as null — the retag
    // only claims element non-nullness
    import spark.implicits._
    val n = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "a")
      .select(vec.elemsNonNull(col("a"))).collect()
    assert(n.head.isNullAt(0))
    // and the downstream vector expression drops its guard: the gate is
    // `mayContainNull(child.dataType)`, observable through `nullable`
    // when the children themselves are non-nullable literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arrLit = Literal(new GenericArrayData(Array(1.0, 2.0)),
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true))
    assert(VecDot(arrLit, arrLit).nullable, "guard armed on containsNull=true")
    val tagged2 = KnownElementsNotNull(arrLit)
    assert(!VecDot(tagged2, tagged2).nullable,
      "guard must gate off over retagged inputs")
    assert(!VecCosine(tagged2, tagged2).nullable && !VecNorm(tagged2).nullable)
  }
}

package graft.gdx

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gdx.dump — gdxdump-tool semantics: GAMS assignment-line rendering
  * across the symbol classes (scalar, parameter, set with text,
  * variable level field).
  */
class GdxDumpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  test("renders scalars, multi-dim parameters, set text, and variable levels") {
    val p = Files.createTempDirectory("gdxdump").resolve("a.gdx").toString
    val b = new GdxBuilder()
    b.addSymbol("total", SymbolType.Parameter, 0,
      Seq((Seq.empty, Array(42.0), None)))
    b.addSymbol("p2", SymbolType.Parameter, 2,
      Seq((Seq("i1", "j1"), Array(1.5), None)))
    b.addSymbol("s", SymbolType.Set, 1, Seq(
      (Seq("k1"), Array.empty[Double], Some("with text")),
      (Seq("k2"), Array.empty[Double], None)))
    b.addSymbol("v", SymbolType.Variable, 1,
      Seq((Seq("x"), Array(3.25, 0.0, 0.0, 9.0, 1.0), None)))
    GdxCodec.write(b.result(), p)

    val lines = Gdx.dump(spark, p).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(lines === Set(
      ("total", "total = 42.000000;"),
      ("p2", "p2('i1','j1') = 1.500000;"),
      ("s", "s('k1') 'with text';"),
      ("s", "s('k2');"),
      ("v", "v('x') = 3.250000;")))
  }

  test("blocks format: header with domains and expl text, keyed records, footer") {
    val p = Files.createTempDirectory("gdxdump").resolve("blk.gdx").toString
    val b = new GdxBuilder()
    b.addSymbol("nat", SymbolType.Parameter, 1, Seq(
      (Seq("dz"), Array(1.0), None),
      (Seq("us"), Array(2.5), None)),
      explText = "nation codes", domains = Seq("n"))
    b.addSymbol("m", SymbolType.Set, 2, Seq(
      (Seq("a", "b"), Array.empty[Double], Some("pair")),
      (Seq("c", "d"), Array.empty[Double], None)))
    b.addSymbol("total", SymbolType.Parameter, 0,
      Seq((Seq.empty, Array(42.0), None)))
    GdxCodec.write(b.result(), p)

    val got = Gdx.dump(spark, p, format = "blocks")
      .orderBy("symbol", "rank", "key").collect()
      .map(r => (r.getString(0), r.getString(3)))
    // sorted by (symbol, rank, key) the frame IS the gdxdump text
    assert(got.toSeq === Seq(
      ("m", "Set m(*,*) /"),
      ("m", "'a'.'b' 'pair',"),
      ("m", "'c'.'d',"),
      ("m", "/;"),
      ("nat", "Parameter nat(n) \"nation codes\" /"),
      ("nat", "'dz' 1.000000,"),
      ("nat", "'us' 2.500000,"),
      ("nat", "/;"),
      ("total", "Parameter total /"),
      ("total", "42.000000,"),
      ("total", "/;")))
  }

  test("csv format: domain header, quoted labels, set text column; one symbol only") {
    val p = Files.createTempDirectory("gdxdump").resolve("csv.gdx").toString
    val b = new GdxBuilder()
    b.addSymbol("nat", SymbolType.Parameter, 1, Seq(
      (Seq("dz"), Array(1.0), None),
      (Seq("us"), Array(2.5), None)),
      domains = Seq("n"))
    b.addSymbol("m", SymbolType.Set, 2, Seq(
      (Seq("a", "b"), Array.empty[Double], Some("pair")),
      (Seq("c", "d"), Array.empty[Double], None)))
    GdxCodec.write(b.result(), p)

    val nat = Gdx.dumpCsv(spark, p, "nat")
      .orderBy("rn", "key").collect().map(r => r.getString(2))
    assert(nat.toSeq === Seq(
      "\"n\",\"Val\"",
      "\"dz\",1.000000",
      "\"us\",2.500000"))
    // sets: unnamed domains render positionally, text column quoted/empty
    val m = Gdx.dumpCsv(spark, p, "m")
      .orderBy("rn", "key").collect().map(r => r.getString(2))
    assert(m.toSeq === Seq(
      "\"Dim1\",\"Dim2\",\"Text\"",
      "\"a\",\"b\",\"pair\"",
      "\"c\",\"d\","))
    // CSV mode is single-symbol: a multi-match pattern must fail loudly
    val e = intercept[IllegalArgumentException] { Gdx.dumpCsv(spark, p, "*") }
    assert(e.getMessage.contains("matched 2"))
  }

  test("special values render as gdxdump tokens; huge magnitudes never null the line") {
    val p = Files.createTempDirectory("gdxdump").resolve("sv.gdx").toString
    val b = new GdxBuilder()
    b.addSymbol("p", SymbolType.Parameter, 1, Seq(
      (Seq("e"), Array(SpecialValues.EPS), None),
      (Seq("g"), Array(1.0e15), None), // overflows DECIMAL(18,6)
      (Seq("m"), Array(SpecialValues.MINF), None),
      (Seq("n"), Array(SpecialValues.NA), None),
      (Seq("pi"), Array(SpecialValues.PINF), None),
      (Seq("u"), Array(SpecialValues.UNDEF), None)))
    GdxCodec.write(b.result(), p)
    val lines = Gdx.dump(spark, p).collect().map(_.getString(1)).toSet
    assert(lines === Set(
      "p('e') = Eps;", "p('g') = 1.0E15;", "p('m') = -Inf;",
      "p('n') = NA;", "p('pi') = +Inf;", "p('u') = Undf;"))
  }

  test("quote-bearing labels and texts render unambiguously in dump and csv") {
    val dir = java.nio.file.Files.createTempDirectory("gdxdump-q")
    val p = dir.resolve("q.gdx").toString
    val b = new GdxBuilder()
    // gdxdump's rule: ' quotes by default, " when the token contains '
    b.addSymbol("s", SymbolType.Set, 1, Seq(
      (Seq("it's"), Array.empty[Double], Some("it's fine")),
      (Seq("plain"), Array.empty[Double], Some("a\"b"))))
    GdxCodec.write(b.result(), p)
    val lines = Gdx.dump(spark, p).collect().map(_.getString(1)).toSet
    assert(lines === Set(
      """s("it's") "it's fine";""",
      """s('plain') 'a"b';"""), s"got $lines")
    // CSV: embedded " doubles inside the always-quoted field
    val csv = Gdx.dumpCsv(spark, p, "s").collect()
      .sortBy(r => (r.getInt(0), r.getString(1))).map(_.getString(2))
    assert(csv(0) == "\"Dim1\",\"Text\"")
    assert(csv.contains("\"it's\",\"it's fine\""), s"got ${csv.toSeq}")
    assert(csv.contains("\"plain\",\"a\"\"b\""), s"got ${csv.toSeq}")
  }

  test("acronym values render by NAME, like the real tool; unknown indices as Acr<n>") {
    val p = java.nio.file.Files.createTempDirectory("gdxdump").resolve("acr.gdx").toString
    val b = new GdxBuilder()
    val hi = b.addAcronym("high", "priority high")
    b.addSymbol("p", SymbolType.Parameter, 1, Seq(
      (Seq("k1"), Array(hi), None),
      (Seq("k2"), Array(SpecialValues.acronymValue(12)), None), // not in the table
      (Seq("k3"), Array(2.5), None)))
    GdxCodec.write(b.result(), p)
    val lines = Gdx.dump(spark, p).collect().map(_.getString(1)).toSet
    assert(lines.contains("p('k1') = high;"), s"got $lines")
    assert(lines.contains("p('k2') = Acr12;"), s"got $lines")
    assert(lines.contains("p('k3') = 2.500000;"), s"got $lines")
    // CSV mode shares the rendering pipeline
    val csv = Gdx.dumpCsv(spark, p, "p").collect()
      .sortBy(r => (r.getInt(0), r.getString(1))).map(_.getString(2))
    assert(csv.contains("\"k1\",high"), s"got ${csv.toSeq}")
  }
}

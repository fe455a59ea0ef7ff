package graft.gdx

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Byte-level + property tests for the GDX codec (SURVEY.md §5.2#2-4).
  * These substitute for the missing GAMS conformance suite: the
  * round-trip identity read(write(x)) == x — including special values,
  * record order and associated texts — is the correctness anchor.
  */
class GdxCodecSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempFile("gdx-spec", ".gdx").toString

  private def roundTrip(c: GdxContainer, compress: Boolean = true): GdxContainer = {
    val p = tmp()
    GdxCodec.write(c, p, compress)
    val r = GdxCodec.read(p)
    Files.delete(java.nio.file.Paths.get(p))
    r
  }

  // fixture family per FIXTURES.md §B ------------------------------------

  test("sets1: 1-dim set with associated texts + alias") {
    val b = new GdxBuilder()
    b.addSymbol("i", SymbolType.Set, 1, Seq(
      (Seq("us"), Array.empty[Double], Some("United States")),
      (Seq("eu"), Array.empty[Double], Some("Europe")),
      (Seq("cn"), Array.empty[Double], None)), explText = "regions")
    b.addAlias("j", "i")
    val r = roundTrip(b.result())
    val i = r.symbol("i").get
    // sorted by UEL index = registration order, not label-alphabetical
    assert(i.records.map(x => r.label(x.keys(0))) == Vector("us", "eu", "cn"))
    assert(i.records.flatMap(_.text).toSet == Set("United States", "Europe"))
    assert(r.symbol("J").get.typ == SymbolType.Alias) // case-insensitive lookup
  }

  test("scalar: 0-dim parameter") {
    val b = new GdxBuilder()
    b.addSymbol("totalcost", SymbolType.Parameter, 0,
      Seq((Seq.empty, Array(42.5), None)))
    val r = roundTrip(b.result())
    assert(r.symbol("totalcost").get.records.head.values(0) == 42.5)
  }

  test("param2: sparse 2-dim with EPS and NA survive round-trip exactly") {
    val b = new GdxBuilder()
    b.addSymbol("d", SymbolType.Parameter, 2, Seq(
      (Seq("us", "eu"), Array(1.5), None),
      (Seq("us", "cn"), Array(SpecialValues.EPS), None),
      (Seq("eu", "cn"), Array(SpecialValues.NA), None)),
      domains = Seq("i", "i"))
    val r = roundTrip(b.result())
    val vals = r.symbol("d").get.records.map(_.values(0))
    assert(vals.contains(SpecialValues.EPS))
    assert(vals.contains(SpecialValues.NA))
    assert(r.symbol("d").get.domains == Seq("i", "i"))
  }

  test("var1: positive variable keeps 5 value fields + userInfo") {
    val b = new GdxBuilder()
    b.addSymbol("x", SymbolType.Variable, 2, Seq(
      (Seq("us", "eu"), Array(10.0, 0.5, 0.0, SpecialValues.PINF, 1.0), None)),
      userInfo = VarType.Positive)
    val r = roundTrip(b.result())
    val x = r.symbol("x").get
    assert(x.userInfo == VarType.Positive)
    assert(x.records.head.values.toSeq ==
      Seq(10.0, 0.5, 0.0, SpecialValues.PINF, 1.0))
    assert(VarType.defaultBounds(x.userInfo) == (0.0, SpecialValues.PINF))
  }

  test("equ1: =l= equation subtype") {
    val b = new GdxBuilder()
    b.addSymbol("supply", SymbolType.Equation, 1, Seq(
      (Seq("us"), Array(5.0, 0.0, SpecialValues.MINF, 5.0, 1.0), None)),
      userInfo = EquType.L)
    assert(roundTrip(b.result()).symbol("supply").get.userInfo == EquType.L)
  }

  test("deep: 6-dim, 63-char labels, >255 UELs, delta key encoding") {
    val b = new GdxBuilder()
    val longLabel = "L" * 63
    val recs = for (i <- 0 until 300) yield
      (Seq(s"a$i", "b", "c", "d", "e", if (i == 0) longLabel else s"f$i"),
        Array(i.toDouble), None)
    b.addSymbol("deep", SymbolType.Parameter, 6, recs)
    val r = roundTrip(b.result())
    assert(r.symbol("deep").get.records.size == 300)
    assert(r.uels.contains(longLabel))
  }

  test("empty: declared symbols, zero records") {
    val b = new GdxBuilder()
    b.addSymbol("nothing", SymbolType.Parameter, 3, Nil)
    val r = roundTrip(b.result())
    assert(r.symbol("nothing").get.records.isEmpty)
    assert(r.symbol("nothing").get.dim == 3)
  }

  test("compressed vs uncompressed decode identically") {
    val b = new GdxBuilder()
    b.addSymbol("d", SymbolType.Parameter, 2,
      (0 until 1000).map(i => (Seq(s"r$i", s"c${i % 7}"), Array(i * 1.1), None)))
    val c = b.result()
    assert(roundTrip(c, compress = true) == roundTrip(c, compress = false))
  }

  test("records come back sorted by key tuple regardless of input order") {
    val b = new GdxBuilder()
    b.addSymbol("p", SymbolType.Parameter, 2, Seq(
      (Seq("z", "z"), Array(1.0), None),
      (Seq("a", "b"), Array(2.0), None),
      (Seq("a", "a"), Array(3.0), None)))
    val r = roundTrip(b.result())
    val keys = r.symbol("p").get.records.map(_.keys.toSeq)
    assert(keys == keys.sortBy(k => (k(0), k(1))))
  }

  test("catalog read skips data blobs but reports correct metadata") {
    val b = new GdxBuilder()
    b.addSymbol("big", SymbolType.Parameter, 1,
      (0 until 5000).map(i => (Seq(s"u$i"), Array(i.toDouble), None)))
    b.addSymbol("small", SymbolType.Set, 1, Seq((Seq("only"), Array.empty[Double], None)))
    val p = tmp()
    GdxCodec.write(b.result(), p)
    val h = GdxCodec.readHeader(p)
    assert(h.metas.map(m => (m.name, m.records)) == Vector(("big", 5000), ("small", 1)))
    // selective read of the second symbol only
    val recs = GdxCodec.readSymbolRecords(p, h, h.metas(1))
    assert(recs.size == 1 && h.uels(recs.head.keys(0)) == "only")
    Files.delete(java.nio.file.Paths.get(p))
  }

  // property: random containers round-trip exactly ------------------------

  private val genLabel: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val genValue: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6),
    1 -> Gen.oneOf(SpecialValues.UNDEF, SpecialValues.NA, SpecialValues.PINF,
      SpecialValues.MINF, SpecialValues.EPS),
    1 -> Gen.oneOf(0.0, -0.0, 1.0))

  private val genSymbol: Gen[(String, Int, Int, Vector[(Seq[String], Array[Double], Option[String])])] =
    for {
      name <- genLabel
      typ <- Gen.oneOf(SymbolType.Set, SymbolType.Parameter, SymbolType.Variable)
      dim <- Gen.choose(0, 4)
      n <- Gen.choose(0, if (dim == 0) 1 else 60)
      recs <- Gen.listOfN(n, for {
        labels <- Gen.listOfN(dim, genLabel)
        vs <- typ match {
          case SymbolType.Set => Gen.const(Array.empty[Double])
          case SymbolType.Parameter => genValue.map(Array(_))
          case _ => Gen.listOfN(5, genValue).map(_.toArray)
        }
        txt <- if (typ == SymbolType.Set) Gen.option(genLabel) else Gen.const(None)
      } yield (labels.map(_.toString): Seq[String], vs, txt))
    } yield (name, typ, dim, recs.toVector)

  test("property: write→read identity on random containers") {
    val gen = Gen.listOfN(3, genSymbol)
    for (seed <- 1 to 25) {
      val syms = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val b = new GdxBuilder()
      syms.zipWithIndex.foreach { case ((nm, typ, dim, recs), i) =>
        // dedupe records by key tuple (GDX keys are unique per symbol)
        val uniq = recs.groupBy(_._1.map(_.toLowerCase)).map(_._2.head).toVector
        b.addSymbol(s"${nm}_$i", typ, dim, uniq)
      }
      val c = b.result()
      val r = roundTrip(c)
      assert(r.uels == c.uels)
      assert(r.symbols.size == c.symbols.size)
      c.symbols.zip(r.symbols).foreach { case (orig, back) =>
        assert(back.name == orig.name && back.typ == orig.typ && back.dim == orig.dim)
        assert(back.records.toSet == GdxCodec.sortRecords(orig.records).toSet)
        assert(back.records == GdxCodec.sortRecords(orig.records))
      }
    }
  }
}

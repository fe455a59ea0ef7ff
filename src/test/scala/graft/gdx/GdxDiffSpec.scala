package graft.gdx

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Gdx.diff — gdxdiff-tool semantics (SPEC: GAMS gdxdiff utility):
  * del/ins/chg classification, tolerance, case-insensitive UEL
  * matching, NA-vs-NA equality, whole-symbol presence, and the
  * dim-mismatch summary row.
  */
class GdxDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private def write(path: String)(build: GdxBuilder => Unit): String = {
    val b = new GdxBuilder()
    build(b)
    GdxCodec.write(b.result(), path)
    path
  }

  private def tmp(name: String): String =
    Files.createTempDirectory("gdxdiff").resolve(name).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, Option[Double], Option[Double])] =
    df.collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toSet

  test("del / ins / chg classification; equal records omitted") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("alpha"), Array(1.0), None),
        (Seq("beta"), Array(2.0), None),
        (Seq("gamma"), Array(3.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("beta"), Array(2.0), None),   // unchanged → omitted
        (Seq("delta"), Array(9.0), None),  // ins
        (Seq("gamma"), Array(4.0), None))) // chg
    }
    assert(rows(Gdx.diff(spark, a, bf)) === Set(
      ("p", "alpha", "del", Some(1.0), None),
      ("p", "delta", "ins", None, Some(9.0)),
      ("p", "gamma", "chg", Some(3.0), Some(4.0))))
  }

  test("tolerance suppresses sub-tol changes; labels match case-insensitively") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("US"), Array(1.0), None),
        (Seq("eu"), Array(5.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("EU"), Array(5.4), None),  // same UEL as 'eu', diff 0.4
        (Seq("us"), Array(1.0), None))) // same UEL as 'US', equal
    }
    assert(rows(Gdx.diff(spark, a, bf, tol = 0.5)) === Set.empty)
    assert(rows(Gdx.diff(spark, a, bf, tol = 0.1)) ===
      Set(("p", "eu", "chg", Some(5.0), Some(5.4))))
  }

  test("NA on both sides compares equal; NA vs number is a change") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("x"), Array(SpecialValues.NA), None),
        (Seq("y"), Array(SpecialValues.NA), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("x"), Array(SpecialValues.NA), None),
        (Seq("y"), Array(2.0), None)))
    }
    val got = rows(Gdx.diff(spark, a, bf))
    assert(got.map(r => (r._1, r._2, r._3)) === Set(("p", "y", "chg")))
  }

  test("EPS vs plain 0 and NA vs UNDEF are changes, readable via special tokens") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("e"), Array(SpecialValues.EPS), None),
        (Seq("n"), Array(SpecialValues.NA), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("e"), Array(0.0), None),                 // stored zero vs EPS
        (Seq("n"), Array(SpecialValues.UNDEF), None))) // NA vs UNDEF
    }
    val got = Gdx.diff(spark, a, bf)
      .select("key", "status", "special_a", "special_b").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got === Set(
      ("e", "chg", Some("Eps"), None),
      ("n", "chg", Some("NA"), Some("Undf"))))
  }

  test("non-first value fields diff losslessly too: marginal EPS vs 0 is a change") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, SpecialValues.EPS, 0.0, 0.0, 1.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, 0.0, 0.0, 0.0, 1.0), None)))
    }
    // levels equal → no diff on the default field
    assert(Gdx.diff(spark, a, bf).count() === 0)
    // marginals differ by EPS-ness → chg with tokens
    val got = Gdx.diff(spark, a, bf, field = "marginal")
      .select("key", "status", "special_a", "special_b").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got === Set(("x", "chg", Some("Eps"), None)))
  }

  test("whole-symbol presence and dim mismatch") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("onlya", SymbolType.Parameter, 1, Seq(
        (Seq("k"), Array(1.0), None)))
      b.addSymbol("shape", SymbolType.Parameter, 1, Seq(
        (Seq("k"), Array(1.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("onlyb", SymbolType.Parameter, 1, Seq(
        (Seq("m"), Array(2.0), None)))
      b.addSymbol("shape", SymbolType.Parameter, 2, Seq(
        (Seq("k", "k"), Array(1.0), None)))
    }
    assert(rows(Gdx.diff(spark, a, bf)) === Set(
      ("onlya", "k", "del", Some(1.0), None),
      ("onlyb", "m", "ins", None, Some(2.0)),
      ("shape", "dim 1<>2", "dim", None, None)))
  }

  test("a 300-symbol catalog diffs without blowing the analyzer (tree union)") {
    // 300 per-symbol frames union as a balanced tree (depth ~9); the
    // old linear unionByName chain recursed once per symbol at
    // resolution time — this pins the analyzer-depth guard
    def many(path: String, shift: Double): String = write(path) { b =>
      (0 until 300).foreach { i =>
        b.addSymbol(f"sym$i%03d", SymbolType.Parameter, 1, Seq(
          (Seq("k"), Array(i + shift), None)))
      }
    }
    val a = many(tmp("a.gdx"), 0.0)
    val bf = many(tmp("b.gdx"), 0.5) // every symbol changes
    val diff = Gdx.diff(spark, a, bf)
    assert(diff.count() === 300)
    assert(diff.filter(col("status") === "chg").count() === 300)
  }

  test("diff is reflexive-empty on generated files incl. special values (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genVal: Gen[Double] = Gen.choose(0, 5).flatMap {
      case 0 => Gen.choose(-1e6, 1e6)
      case 1 => Gen.const(SpecialValues.EPS)
      case 2 => Gen.const(SpecialValues.NA)
      case 3 => Gen.const(SpecialValues.UNDEF)
      case 4 => Gen.const(SpecialValues.PINF)
      case _ => Gen.const(SpecialValues.MINF)
    }
    for (seed <- 1 to 3) {
      val vals = Gen.listOfN(30, genVal)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val recs = vals.zipWithIndex.map { case (v, i) => (Seq(f"k$i%03d"), Array(v), None) }
      val p = write(tmp(s"prop$seed.gdx")) { b =>
        b.addSymbol("p", SymbolType.Parameter, 1, recs)
      }
      // NA/UNDEF decode to NaN — null-safe compare must still see a
      // file as identical to itself (gdxdiff on a copy reports nothing)
      assert(Gdx.diff(spark, p, p).count() === 0, s"seed=$seed: self-diff not empty")
    }
  }

  test("type mismatch reports a summary row instead of value-joining the set placeholder") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("mix", SymbolType.Parameter, 1, Seq(
        (Seq("k"), Array(0.0), None))) // stored zero — placeholder-equal to a set scan
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("mix", SymbolType.Set, 1, Seq(
        (Seq("k"), Array.empty[Double], None)))
    }
    assert(rows(Gdx.diff(spark, a, bf)) === Set(
      ("mix", "type parameter<>set", "type", None, None)))
  }

  test("sets diff by membership and associated text") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("s", SymbolType.Set, 1, Seq(
        (Seq("drop"), Array.empty[Double], Some("gone")),
        (Seq("keep"), Array.empty[Double], Some("same")),
        (Seq("retext"), Array.empty[Double], Some("old"))))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("s", SymbolType.Set, 1, Seq(
        (Seq("added"), Array.empty[Double], None),
        (Seq("keep"), Array.empty[Double], Some("same")),
        (Seq("retext"), Array.empty[Double], Some("new"))))
    }
    val got = Gdx.diff(spark, a, bf)
      .select("key", "status", "text_a", "text_b").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got === Set(
      ("drop", "del", Some("gone"), None),
      ("added", "ins", None, None),
      ("retext", "chg", Some("old"), Some("new"))))
  }

  test("field selection applies to var/equ only; parameters fall back, bad fields throw") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("k"), Array(1.0), None)))
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, 0.5, 0.0, 0.0, 1.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("k"), Array(2.0), None)))
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, 0.75, 0.0, 0.0, 1.0), None)))
    }
    // default-pattern diff on marginal must NOT abort on the parameter:
    // p diffs its value, v diffs its marginal (real gdxdiff semantics)
    assert(rows(Gdx.diff(spark, a, bf, field = "marginal")) === Set(
      ("p", "k", "chg", Some(1.0), Some(2.0)),
      ("v", "x", "chg", Some(0.5), Some(0.75))))
    // a field outside the five-field surface is still a caller error
    intercept[IllegalArgumentException] {
      Gdx.diff(spark, a, bf, field = "bogus")
    }
  }

  test("multi-dim keys dot-join GAMS-style; pattern restricts symbols") {
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("q2", SymbolType.Parameter, 2, Seq(
        (Seq("i1", "j1"), Array(1.0), None)))
      b.addSymbol("skipme", SymbolType.Parameter, 1, Seq(
        (Seq("z"), Array(7.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("q2", SymbolType.Parameter, 2, Seq(
        (Seq("i1", "j2"), Array(1.0), None)))
      b.addSymbol("skipme", SymbolType.Parameter, 1, Seq.empty)
    }
    assert(rows(Gdx.diff(spark, a, bf, patterns = "q*")) === Set(
      ("q2", "i1.j1", "del", Some(1.0), None),
      ("q2", "i1.j2", "ins", None, Some(1.0))))
  }

  test("dot-bearing labels never alias: ('a.b','c') vs ('a','b.c') is del+ins, not chg") {
    // quoted GAMS labels may contain '.': the join must key on the
    // label TUPLE, not the dot-joined display string, or these two
    // distinct records would concatenate identically ("a.b.c") and
    // pair as one 'chg' (or vanish entirely when values match)
    val a = write(tmp("a.gdx")) { b =>
      b.addSymbol("q", SymbolType.Parameter, 2, Seq(
        (Seq("a.b", "c"), Array(1.0), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("q", SymbolType.Parameter, 2, Seq(
        (Seq("a", "b.c"), Array(1.0), None)))
    }
    assert(rows(Gdx.diff(spark, a, bf)) === Set(
      ("q", "a.b.c", "del", Some(1.0), None),
      ("q", "a.b.c", "ins", None, Some(1.0))))
  }

  test("acronym vs NA is a change; tokens render the acronym name per side") {
    // both display as NaN (no numeric meaning), so the RAW compare is
    // what must catch the change — a display-level compare would call
    // them equal and silently lose the acronym
    var hiVal = 0.0
    val a = write(tmp("a.gdx")) { b =>
      hiVal = b.addAcronym("high", "priority high")
      b.addSymbol("q", SymbolType.Parameter, 1, Seq(
        (Seq("k1"), Array(hiVal), None),
        (Seq("k2"), Array(hiVal), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      val hv = b.addAcronym("high", "priority high")
      b.addSymbol("q", SymbolType.Parameter, 1, Seq(
        (Seq("k1"), Array(SpecialValues.NA), None),
        (Seq("k2"), Array(hv), None))) // same acronym both sides → equal
    }
    val d = Gdx.diff(spark, a, bf).collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getString(0) == "q" && r.getString(1) == "k1" && r.getString(2) == "chg")
    assert(r.getDouble(3).isNaN && r.getDouble(4).isNaN) // display form
    assert(r.getString(5) == "high" && r.getString(6) == "NA") // tokens disambiguate
  }

  test("an acronym index missing from the file's table renders as Acr<n>, not a huge double") {
    val a = write(tmp("a.gdx")) { b =>
      // value carries index 12 but no table entry (hand-built container)
      b.addSymbol("q", SymbolType.Parameter, 1, Seq(
        (Seq("k1"), Array(SpecialValues.acronymValue(12)), None)))
    }
    val bf = write(tmp("b.gdx")) { b =>
      b.addSymbol("q", SymbolType.Parameter, 1, Seq(
        (Seq("k1"), Array(1.0), None)))
    }
    val r = Gdx.diff(spark, a, bf).collect().head
    assert(r.getString(2) == "chg" && r.getString(5) == "Acr12")
  }
}

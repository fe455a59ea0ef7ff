package graft.gdx

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gdx.merge — gdxmerge-tool semantics (SPEC: GAMS gdxmerge utility):
  * file-tag dimension prepended, per-symbol union across files,
  * symbols missing from a file contribute nothing for that tag, set
  * text survives, mixed-shape symbols are rejected.
  */
class GdxMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private def write(path: String)(build: GdxBuilder => Unit): String = {
    val b = new GdxBuilder()
    build(b)
    GdxCodec.write(b.result(), path)
    path
  }

  private def tmpDir(): java.nio.file.Path = Files.createTempDirectory("gdxmerge")

  test("parameter merge: tag dimension prepended, dims shifted, partial presence") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("x"), Array(1.0), None), (Seq("y"), Array(2.0), None)))
      b.addSymbol("onlya", SymbolType.Parameter, 1, Seq(
        (Seq("z"), Array(7.0), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("x"), Array(3.0), None)))
    }
    val out = s"$t/out"
    val merged = Gdx.merge(spark, Seq(a, bf), out, tags = Seq("run1", "run2"))
    assert(merged === Seq("onlya", "p"))
    val p = Gdx.symbol(spark, s"$out/p", "p")
      .select("dim_1", "dim_2", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(p === Set(("run1", "x", 1.0), ("run1", "y", 2.0), ("run2", "x", 3.0)))
    val oa = Gdx.symbol(spark, s"$out/onlya", "onlya")
      .select("dim_1", "dim_2", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(oa === Set(("run1", "z", 7.0)))
  }

  test("set merge keeps associated text; pattern restricts symbols") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("s", SymbolType.Set, 1, Seq(
        (Seq("i1"), Array.empty[Double], Some("first"))))
      b.addSymbol("skip", SymbolType.Parameter, 1, Seq(
        (Seq("q"), Array(1.0), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("s", SymbolType.Set, 1, Seq(
        (Seq("i2"), Array.empty[Double], None)))
    }
    val out = s"$t/out"
    assert(Gdx.merge(spark, Seq(a, bf), out, patterns = "s") === Seq("s"))
    assert(!new java.io.File(s"$out/skip").exists())
    val s2 = Gdx.symbol(spark, s"$out/s", "s")
      .select("dim_1", "dim_2", "text").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(s2 === Set(("f1", "i1", Some("first")), ("f2", "i2", None)))
  }

  test("mixed dim across files is rejected") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq((Seq("x"), Array(1.0), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 2, Seq((Seq("x", "y"), Array(1.0), None)))
    }
    val e = intercept[IllegalArgumentException] {
      Gdx.merge(spark, Seq(a, bf), s"$t/out")
    }
    assert(e.getMessage.contains("mixed dim/type"))
  }

  test("special values survive the merge losslessly (flag-mode round trip)") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("e"), Array(SpecialValues.EPS), None),
        (Seq("u"), Array(SpecialValues.UNDEF), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("z"), Array(0.0), None)))
    }
    val out = s"$t/out"
    Gdx.merge(spark, Seq(a, bf), out)
    // flag-mode read back distinguishes EPS from the plain stored zero
    // and keeps UNDEF as UNDEF (not collapsed to NA)
    val back = Gdx.symbol(spark, s"$out/p", "p", specialValues = "columns")
      .select("dim_1", "dim_2", "is_eps", "is_na", "is_undef").collect()
      .map(r => (r.getString(0), r.getString(1),
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toSet
    assert(back === Set(
      ("f1", "e", (true, false, false)),
      ("f1", "u", (false, false, true)),
      ("f2", "z", (false, false, false))))
  }

  test("variable sentinels in non-first fields survive the merge (raw round trip)") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, SpecialValues.EPS, SpecialValues.MINF,
          SpecialValues.PINF, 1.0), None)))
    }
    val out = s"$t/out"
    Gdx.merge(spark, Seq(a), out)
    // re-read RAW: the marginal EPS and infinite bounds must be the
    // exact sentinel encodings, not 0.0 / NA-collapsed values
    val back = Gdx.symbol(spark, s"$out/v", "v", specialValues = "raw")
      .select("marginal", "lower", "upper").head
    assert(back.getDouble(0) === SpecialValues.EPS)
    assert(back.getDouble(1) === SpecialValues.MINF)
    assert(back.getDouble(2) === SpecialValues.PINF)
  }

  test("variable merge preserves the subtype; defaultFill on merged = per-input") {
    val t = tmpDir()
    // positive variables: v1 stores only a level (bounds unstored = 0)
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("x", SymbolType.Variable, 1, Seq(
        (Seq("v1"), Array(3.0, 0.0, 0.0, 0.0, 1.0), None)),
        userInfo = VarType.Positive)
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("x", SymbolType.Variable, 1, Seq(
        (Seq("v2"), Array(7.5, 0.0, 2.0, 9.0, 1.0), None)),
        userInfo = VarType.Positive)
    }
    val out = s"$t/out"
    Gdx.merge(spark, Seq(a, bf), out)
    // the vartype survives into the merged catalog (real gdxmerge keeps it)
    val sub = Gdx.catalog(spark, s"$out/x")
      .select("subtype").head.getInt(0)
    assert(sub === VarType.Positive)
    // and default-bound semantics driven BY that subtype match the
    // per-input result: unstored bounds → [0, +inf], stored bounds kept
    val filled = Gdx.defaultFill(Gdx.symbol(spark, s"$out/x", "x"), sub)
      .select("dim_2", "lower", "upper").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(filled === Set(
      ("v1", 0.0, Double.PositiveInfinity),
      ("v2", 2.0, 9.0)))
  }

  test("mixed subtype across files is rejected like mixed dim") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("x", SymbolType.Variable, 1, Seq(
        (Seq("v"), Array(1.0, 0.0, 0.0, 0.0, 1.0), None)),
        userInfo = VarType.Positive)
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("x", SymbolType.Variable, 1, Seq(
        (Seq("v"), Array(2.0, 0.0, 0.0, 0.0, 1.0), None)),
        userInfo = VarType.Free)
    }
    val e = intercept[IllegalArgumentException] {
      Gdx.merge(spark, Seq(a, bf), s"$t/out")
    }
    assert(e.getMessage.contains("mixed dim/type"))
  }

  test("renameUel relabels case-insensitively, keeps set text, sentinels and subtype") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("s", SymbolType.Set, 1, Seq(
        (Seq("US"), Array.empty[Double], Some("states")),
        (Seq("eu"), Array.empty[Double], None)))
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("us"), Array(1.0, SpecialValues.EPS, 0.0, 0.0, 1.0), None)),
        userInfo = VarType.Positive)
    }
    val out = s"$t/out"
    assert(Gdx.renameUel(spark, a, out, Map("US" -> "usa")) === Seq("s", "v"))
    // set: label renamed (case-insensitive match), text intact
    val s2 = Gdx.symbol(spark, s"$out/s", "s")
      .select("dim_1", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(s2 === Set(("usa", Some("states")), ("eu", None)))
    // variable: renamed label, marginal EPS survives raw, subtype kept
    val v = Gdx.symbol(spark, s"$out/v", "v", specialValues = "raw")
      .select("dim_1", "marginal").head
    assert(v.getString(0) === "usa" && v.getDouble(1) === SpecialValues.EPS)
    assert(Gdx.catalog(spark, s"$out/v").select("subtype").head.getInt(0)
      === VarType.Positive)
  }

  test("renameUel refuses collisions: existing target, two-to-one, case-colliding keys") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("p", SymbolType.Parameter, 1, Seq(
        (Seq("us"), Array(1.0), None), (Seq("eu"), Array(2.0), None)))
    }
    // target already exists and is not renamed away → duplicate keys
    val e1 = intercept[IllegalArgumentException] {
      Gdx.renameUel(spark, a, s"$t/o1", Map("us" -> "EU"))
    }
    assert(e1.getMessage.contains("already exist"))
    // two sources to one target
    val e2 = intercept[IllegalArgumentException] {
      Gdx.renameUel(spark, a, s"$t/o2", Map("us" -> "x", "eu" -> "X"))
    }
    assert(e2.getMessage.contains("one target"))
    // case-colliding mapping keys
    val e3 = intercept[IllegalArgumentException] {
      Gdx.renameUel(spark, a, s"$t/o3", Map("US" -> "x", "us" -> "y"))
    }
    assert(e3.getMessage.contains("collide"))
    // a swap renames both ways and is legal
    Gdx.renameUel(spark, a, s"$t/o4", Map("us" -> "eu", "eu" -> "us"))
    val back = Gdx.symbol(spark, s"$t/o4/p", "p").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(back === Map("eu" -> 1.0, "us" -> 2.0))
  }

  test("variable merge carries all five value fields") {
    val t = tmpDir()
    val a = write(s"$t/a.gdx") { b =>
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(1.0, 0.5, 0.0, 10.0, 1.0), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addSymbol("v", SymbolType.Variable, 1, Seq(
        (Seq("x"), Array(2.0, 0.0, 0.0, 20.0, 1.0), None)))
    }
    val out = s"$t/out"
    Gdx.merge(spark, Seq(a, bf), out)
    val v = Gdx.symbol(spark, s"$out/v", "v")
      .select("dim_1", "dim_2", "level", "marginal", "upper").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(v === Set(("f1", "x", 1.0, 0.5, 10.0), ("f2", "x", 2.0, 0.0, 20.0)))
  }

  test("acronym tables union through merge; sentinels survive; index conflicts rejected") {
    val t = tmpDir()
    var hiA = 0.0
    val a = write(s"$t/a.gdx") { b =>
      hiA = b.addAcronym("high", "priority high")
      b.addSymbol("p", SymbolType.Parameter, 1, Seq((Seq("x"), Array(hiA), None)))
    }
    val bf = write(s"$t/b.gdx") { b =>
      b.addAcronym("high") // same index 10, same name → unions cleanly
      val lo = b.addAcronym("low")
      b.addSymbol("p", SymbolType.Parameter, 1, Seq((Seq("y"), Array(lo), None)))
    }
    val out = s"$t/merged"
    Gdx.merge(spark, Seq(a, bf), out)
    // the merged dataset carries the UNION of both files' tables
    val acrs = Gdx.acronyms(spark, s"$out/p").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(acrs === Map(10 -> "high", 11 -> "low"))
    // and both sentinels survived the raw-mode union bit-exactly
    import org.apache.spark.sql.functions.col
    val raw = Gdx.symbol(spark, s"$out/p", "p", specialValues = "raw")
      .filter(col("value") >= 9.5e300).collect()
      .map(r => (r.getString(0), r.getString(1), SpecialValues.acronymIndex(r.getDouble(2))))
      .toSet
    assert(raw === Set(("f1", "x", 10), ("f2", "y", 11)))

    // same index, DIFFERENT name across files: silent first-wins would
    // rename f2's values — must reject instead
    val c = write(s"$t/c.gdx") { b =>
      b.addAcronym("veryhigh") // index 10 under a different name
      b.addSymbol("p", SymbolType.Parameter, 1, Seq((Seq("z"), Array(1.0), None)))
    }
    val e = intercept[IllegalArgumentException](
      Gdx.merge(spark, Seq(a, c), s"$t/conflict"))
    assert(e.getMessage.contains("acronym index 10"))

    // the CONVERSE conflict: same NAME under two different indices —
    // both rows would enter the merged table and one logical acronym
    // would own two sentinel values; must reject (case-insensitively,
    // mirroring GdxBuilder.addAcronym). The builder allocates indices
    // sequentially so this shape only arises in hand-crafted files —
    // craft one with HIGH at index 11 and nothing at 10.
    val db = new GdxBuilder()
    db.addSymbol("p", SymbolType.Parameter, 1,
      Seq((Seq("w"), Array(SpecialValues.acronymValue(11)), None)))
    GdxCodec.write(
      db.result().copy(acronyms = Vector(GdxAcronym(11, "HIGH", ""))),
      s"$t/d.gdx")
    val e2 = intercept[IllegalArgumentException](
      Gdx.merge(spark, Seq(a, s"$t/d.gdx"), s"$t/conflict2"))
    assert(e2.getMessage.toLowerCase.contains("high") &&
      e2.getMessage.contains("different"))
  }
}

package graft.gdx

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** GdxStreamEncoder (the sharded-write spill path): output must be
  * byte-compatible with GdxCodec.write for already-sorted input, track
  * the first-dim label range, and handle empty partitions and set
  * texts.
  */
class GdxStreamEncoderSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("gdx-enc").resolve(name).toString

  private val paramRecords = Seq(
    (Seq("a", "x"), Array(1.0), Option.empty[String]),
    (Seq("a", "y"), Array(2.5), None),
    (Seq("b", "x"), Array(SpecialValues.EPS), None),
    (Seq("c", "z"), Array(SpecialValues.NA, 0.0), None))

  test("byte-compatible with GdxCodec.write for sorted parameter input") {
    val ref = tmp("ref.gdx")
    val b = new GdxBuilder()
    b.addSymbol("p", SymbolType.Parameter, 2, paramRecords)
    GdxCodec.write(b.result(), ref)

    val out = tmp("stream.gdx")
    val enc = new GdxStreamEncoder(out, "p", SymbolType.Parameter, 2)
    paramRecords.foreach { case (ls, vs, t) => enc.add(ls.toArray, vs, t) }
    enc.finish()

    assert(Files.readAllBytes(java.nio.file.Paths.get(out)).toSeq ==
      Files.readAllBytes(java.nio.file.Paths.get(ref)).toSeq)
  }

  test("set records with associated texts round-trip") {
    val out = tmp("set.gdx")
    val enc = new GdxStreamEncoder(out, "s", SymbolType.Set, 1)
    enc.add(Array("ant"), Array.empty, Some("worker"))
    enc.add(Array("bee"), Array.empty, None)
    enc.add(Array("cat"), Array.empty, Some("worker")) // pooled text reused
    enc.finish()

    val c = GdxCodec.read(out)
    val s = c.symbols.head
    assert(s.records.map(r => (c.uels(r.keys(0)), r.text)) ==
      Vector(("ant", Some("worker")), ("bee", None), ("cat", Some("worker"))))
  }

  test("variable records write all five value fields") {
    val out = tmp("var.gdx")
    val enc = new GdxStreamEncoder(out, "v", SymbolType.Variable, 1)
    enc.add(Array("i1"), Array(1.0, 0.5, 0.0, 10.0, 1.0), None)
    enc.finish()
    val c = GdxCodec.read(out)
    assert(c.symbols.head.records.head.values.toSeq == Seq(1.0, 0.5, 0.0, 10.0, 1.0))
  }

  test("label range tracks lowercased first-dim min/max") {
    val out = tmp("range.gdx")
    val enc = new GdxStreamEncoder(out, "p", SymbolType.Parameter, 1)
    Seq("Beta", "alpha", "GAMMA").foreach(l => enc.add(Array(l), Array(1.0), None))
    enc.finish()
    assert(enc.labelRange == (Some("alpha"), Some("gamma")))
    assert(enc.records == 3L)
  }

  test("empty partition still produces a readable zero-record shard") {
    val out = tmp("empty.gdx")
    val enc = new GdxStreamEncoder(out, "p", SymbolType.Parameter, 1)
    enc.finish()
    val h = GdxCodec.readHeader(out)
    assert(h.metas.head.records == 0)
    assert(GdxCodec.readSymbolRecords(out, h, h.metas.head).isEmpty)
  }

  test("cross-group label reuse: shard keeps label order, records round-trip") {
    // 'z' is registered under dim_1='a' before 'm' appears under 'b', so
    // UEL-index order diverges from label order — the documented case
    // where the shard is NOT byte-identical to GdxCodec.write. The
    // contract is exact record round-trip in the input (label) order.
    val out = tmp("reuse.gdx")
    val enc = new GdxStreamEncoder(out, "p", SymbolType.Parameter, 2)
    val recs = Seq(
      (Array("a", "z"), 1.0), (Array("b", "m"), 2.0), (Array("b", "z"), 3.0))
    recs.foreach { case (ls, v) => enc.add(ls, Array(v), None) }
    enc.finish()
    val c = GdxCodec.read(out)
    val back = c.symbols.head.records.map(r =>
      (r.keys.map(c.uels).toSeq, r.values(0)))
    assert(back == recs.map { case (ls, v) => (ls.toSeq, v) }.toVector)
  }

  test("case-insensitive UEL registration preserves first-seen display case") {
    val out = tmp("case.gdx")
    val enc = new GdxStreamEncoder(out, "p", SymbolType.Parameter, 1)
    enc.add(Array("US"), Array(1.0), None)
    enc.add(Array("us"), Array(2.0), None) // same UEL, case-insensitive
    enc.finish()
    val c = GdxCodec.read(out)
    assert(c.uels == Vector("US"))
    assert(c.symbols.head.records.map(_.keys(0)) == Vector(0, 0))
  }
}

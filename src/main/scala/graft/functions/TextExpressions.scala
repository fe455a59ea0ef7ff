package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** simhash32(tokens): 32-bit SimHash of a token array, as a long.
  *
  * Per-token hash: CODEPOINT polynomial Σ cpᵢ·31^i mod 1e9+7 (UTF-8
  * decoded inline — see [[TokenPolyHash.polyOf]]), spread to 32 bits
  * by the Knuth multiplicative constant 2654435761. Chosen over
  * Murmur3 so the identical fingerprint is computable in plain SQL —
  * the dedup_simhash oracle reproduces it in DuckDB via ord() over
  * str_split and hash-checks the clusters, on ANY corpus, not just
  * ASCII. ±1
  * votes per bit position, sign → bit. Being a single UnaryExpression
  * means the whole document fingerprint is computed map-side inside
  * whole-stage codegen: the previous formulation (explode tokens →
  * groupBy(doc) with 32 conditional sums) shuffled every token of
  * every document; this shuffles nothing.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  import SimHash32.{Mod, Spread, M32}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j)
        val poly = TokenPolyHash.polyOf(t)
        val h = poly * Spread % M32
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val poly = ctx.freshName("poly")
      // The codepoint fold is parity-critical (every oracle CTE replays
      // it), so codegen calls the single canonical implementation
      // [[TokenPolyHash.polyOf]] — a monomorphic static the JIT inlines —
      // instead of inlining a second copy that could drift.
      s"""
         |int[] $votes = new int[32];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $poly = graft.functions.TokenPolyHash$$.MODULE$$.polyOf(
         |      $arr.getUTF8String($j));
         |    long $h = $poly * ${Spread}L % ${M32}L;
         |    for (int $b = 0; $b < 32; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
}

object SimHash32 {
  val Mod = 1000000007L
  val Spread = 2654435761L
  val M32 = 4294967296L
}

object TokenPolyHash {
  import SimHash32.Mod

  /** Codepoint polynomial Σ cpᵢ·31^i mod 1e9+7 over a UTF8String,
    * decoding UTF-8 inline (no String allocation). CODEPOINTS, not
    * bytes: DuckDB's `ord(c)` over `str_split(t, '')` — the form every
    * oracle CTE replays — folds codepoints, and a byte fold would
    * diverge on the first non-ASCII token (ö = bytes C3 B6 vs
    * codepoint 246), redding a dozen hash-checked queries on a real
    * multilingual corpus. Byte == codepoint on ASCII, so this is
    * value-identical on ASCII text.
    */
  def polyOf(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    var poly = 0L
    var i = 0
    val nb = t.numBytes
    while (i < nb) {
      val b0 = t.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xE0) {
        cp = ((b0 & 0x1f) << 6) | (t.getByte(i + 1) & 0x3f); i += 2
      } else if (b0 < 0xF0) {
        cp = ((b0 & 0x0f) << 12) | ((t.getByte(i + 1) & 0x3f) << 6) |
          (t.getByte(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((t.getByte(i + 1) & 0x3f) << 12) |
          ((t.getByte(i + 2) & 0x3f) << 6) | (t.getByte(i + 3) & 0x3f); i += 4
      }
      poly = (poly * 31 + cp) % Mod
    }
    poly
  }
}

/** token_poly_hash(tokens): per-token CODEPOINT-polynomial hash
  * (Σ cpᵢ·31^i mod 1e9+7) as array<bigint> — the shared base hash of
  * the minhash signatures and document fingerprints.
  *
  * Same value as `transform(tokens, t -> aggregate(split(t, ''), 0L,
  * (a, c) -> (a*31 + ascii(c)) % 1000000007))` for all BMP text (and
  * as DuckDB's ord()/str_split fold for ALL text — see
  * [[TokenPolyHash.polyOf]] for why codepoints, not bytes), but
  * computed in a primitive loop inside whole-stage codegen instead of
  * an interpreted lambda per character — the minhash signature stage
  * is the hottest map-side loop in the §2.L pipelines. Null tokens
  * hash like empty strings (0).
  */
case class TokenPolyHash(child: Expression) extends UnaryExpression {

  import SimHash32.Mod

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        out(j) = TokenPolyHash.polyOf(arr.getUTF8String(j))
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      // Same parity rationale as [[SimHash32.doGenCode]]: one canonical
      // fold ([[TokenPolyHash.polyOf]]), called from codegen, so the
      // interpreted and generated paths cannot drift.
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $out[$j] = graft.functions.TokenPolyHash$$.MODULE$$.polyOf(
         |      $arr.getUTF8String($j));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenPolyHash = copy(child = c)
}

/** lz78_stats(text, maxCps): LZ78 parse of the first `maxCps` CODE
  * POINTS → array<int> [n_chars, n_phrases] (SPEC: Ziv & Lempel 1978;
  * the deterministic repetitiveness signal behind the
  * `text_lz_complexity` registry row — semantics documented there and
  * replayed by its recursive-CTE oracle). The per-doc parse is
  * genuinely sequential (each phrase extends the dictionary), so the
  * expression's job is not vectorization but PLAN SHAPE: as a native
  * expression it runs map-side INSIDE whole-stage codegen with no
  * Encoder in the plan — the prior `Dataset.map` formulation
  * deserialized every row through a tuple encoder and broke the
  * codegen span. The generated code calls one static method; the
  * dictionary probing stays the same prefix-closed hash-set walk.
  *
  * Null-intolerant like the engine's own string expressions (null in →
  * null out); callers guard with coalesce(text, '') exactly as the
  * oracle SQL does, so empty and null both report [0, 0].
  */
case class Lz78Stats(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"expected string text, got ${left.dataType}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("maxCps must be an int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(t: Any, m: Any): Any =
    Lz78Stats.stats(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      m.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // call through the module singleton — unlike static forwarders,
    // MODULE$ access cannot be silently absent on a signature clash
    val mod = Lz78Stats.getClass.getName // ends in $
    defineCodeGen(ctx, ev, (t, m) => s"$mod.MODULE$$.stats($t, $m)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lz78Stats =
    Lz78Stats(l, r)
}

object Lz78Stats {
  /** The parse (see the expression scaladoc): returns [n_chars,
    * n_phrases] over the first `maxCps` code points. Public static so
    * generated code calls it directly.
    */
  def stats(text: org.apache.spark.unsafe.types.UTF8String, maxCps: Int): ArrayData = {
    if (text.numBytes == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(0, 0))
    val cpsAll = text.toString.codePoints().toArray
    val cps = if (cpsAll.length > maxCps) cpsAll.take(maxCps) else cpsAll
    def slice(from: Int, until: Int): String = new String(cps, from, until - from)
    val dict = new java.util.HashSet[String]()
    var pos = 0
    var n = 0
    while (pos < cps.length) {
      var end = pos + 1
      while (end <= cps.length && dict.contains(slice(pos, end))) end += 1
      if (end <= cps.length) { // extension char exists: new phrase
        dict.add(slice(pos, end))
        pos = end
      } else pos = cps.length // incomplete tail phrase: count, no entry
      n += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(cps.length, n))
  }
}

/** nfc_normalize(s): Unicode canonical composition (UAX #15 NFC) via
  * the JVM's built-in `java.text.Normalizer` — the cleanup pass a text
  * ingest runs so that visually-identical strings (decomposed accents,
  * singleton codepoints) compare, dedup and tokenize identically.
  * Spark ships no normalization builtin; this native expression keeps
  * the pass inside whole-stage codegen instead of a Scala UDF.
  * DuckDB's `nfc_normalize` is the oracle twin. Null in → null out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = NfcNormalize.getClass.getName // ends in $
    defineCodeGen(ctx, ev, c => s"$mod.MODULE$$.nfc($c)")
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  /** Public static so generated code calls it directly. Fast path: a
    * string already in NFC (the overwhelming majority of real text —
    * Normalizer.isNormalized is a cheap quick-check scan) returns the
    * input without re-encoding.
    */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Column-API entry point (resolved via GraftExtensions, like vec.*). */
object text {
  import org.apache.spark.sql.functions.call_function

  def simhash32(tokens: Column): Column = call_function("simhash32", tokens)
  def tokenPolyHash(tokens: Column): Column = call_function("token_poly_hash", tokens)
  def nfcNormalize(s: Column): Column = call_function("nfc_normalize", s)

  /** LZ78 [n_chars, n_phrases] over the first `maxCps` code points. */
  def lz78Stats(text: Column, maxCps: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("lz78_stats", text, lit(maxCps))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** simhash32(tokens): 32-bit SimHash of a token array, as a long.
  *
  * Per-token Murmur3 (seed 42 — bit-identical to `functions.hash` on a
  * string), ±1 votes per bit position, sign → bit. Being a single
  * UnaryExpression means the whole document fingerprint is computed
  * map-side inside whole-stage codegen: the previous formulation
  * (explode tokens → groupBy(doc) with 32 conditional sums) shuffled
  * every token of every document; this shuffles nothing.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

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
        val h = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >>> b) & 1) == 1) 1 else -1)
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
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[32];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($j);
         |    int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42);
         |    for (int $b = 0; $b < 32; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1) == 1) ? 1 : -1;
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

/** Column-API entry point (resolved via GraftExtensions, like vec.*). */
object text {
  import org.apache.spark.sql.functions.call_function

  def simhash32(tokens: Column): Column = call_function("simhash32", tokens)
}

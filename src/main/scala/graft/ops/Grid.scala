package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** THE shared dyadic-grid quantization device (oracle-checklist rule
  * 12): snap a value the two engines already agree on bit-for-bit onto
  * multiples of 2⁻²⁰ (or 2⁻¹² where products follow), so the NEXT
  * many-to-one double aggregation sums grid multiples — exact in IEEE
  * double regardless of accumulation order or tree shape, PROVIDED the
  * total stays under 2⁵³ in grid units (2³³ absolute for dy20 — state
  * the bound wherever magnitudes are data-dependent). One definition
  * serves WindowOps, CurationOps, and future modules so a correction
  * to the rounding form lands everywhere at once; the ε-SHIFTED
  * fixpoint variant (floor(x·1e6 + 0.5000005)/1e6, LlmOps) is a
  * DIFFERENT, deliberately offset device for iterative oracles — do
  * not fold it in here.
  */
private[ops] object Grid {
  /** NaN/±Inf pass THROUGH un-quantized: Spark's floor(double) returns
    * BIGINT, which would silently map NaN to 0.0 and clamp infinities
    * to Long bounds — turning an upstream bug into a legal-looking
    * grid value — while DuckDB's floor(double) returns DOUBLE and
    * propagates them. Passing them through keeps the Column path, the
    * driver twin [[dy20D]] (plain math.floor, which propagates), and
    * the SQL form in agreement on non-finite inputs. Finite contract
    * unchanged: exact for |x| < 2³³ (dy20) per the header note.
    */
  def dyGrid(c: Column, scale: Double): Column = {
    import org.apache.spark.sql.functions.when
    when(c.isNaN || c === Double.PositiveInfinity || c === Double.NegativeInfinity, c)
      .otherwise(floor(c * lit(scale) + lit(0.5)).cast("double") / lit(scale))
  }
  // ($scale) parenthesized in BOTH positions: an expression scale like
  // "a/b" would otherwise right-associate the trailing division
  def dyGridSql(x: String, scale: String): String =
    s"floor(($x) * ($scale) + 0.5) / ($scale)"

  def dy20(c: Column): Column = dyGrid(c, 1048576.0)
  def dy20Sql(x: String): String = dyGridSql(x, "1048576.0")

  /** Coarser 2⁻¹² grid for values that get MULTIPLIED before the next
    * sum (co-moment machinery): product grid 2⁻²⁴ with ≲2²⁵ totals
    * keeps the span under 53 bits, so sums of products stay exact.
    */
  def dy12(c: Column): Column = dyGrid(c, 4096.0)
  def dy12Sql(x: String): String = dyGridSql(x, "4096.0")

  /** One grid step — the floor used to keep quantized probabilities
    * strictly positive where a downstream division must not hit zero.
    */
  val Dy20Step: Double = 1.0 / 1048576.0

  /** Driver-side twin of [[dy20]] for bounded-state loops; same
    * formula, same boundary semantics.
    */
  def dy20D(x: Double): Double =
    math.floor(x * 1048576.0 + 0.5) / 1048576.0
}

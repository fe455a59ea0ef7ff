package graft.gdx

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the EPS-aware sum (SURVEY §5.3): the Aggregator's
  * merge must be commutative, associative, and zero-neutral for Spark
  * to produce one deterministic answer across any partitioning — these
  * properties ARE the distribution-safety proof, checked directly on
  * the buffer algebra with ScalaCheck generators.
  */
class EpsSumPropertySpec extends AnyFunSuite {

  private type Buf = (Double, Boolean, Boolean, Boolean, Boolean)

  private val genVal: Gen[EpsVal] = for {
    kind <- Gen.choose(0, 3)
    v <- Gen.choose(-1e6, 1e6)
  } yield kind match {
    case 0 => EpsVal(v, is_eps = false, is_na = false, is_undef = false)
    case 1 => EpsVal(0.0, is_eps = true, is_na = false, is_undef = false)
    case 2 => EpsVal(Double.NaN, is_eps = false, is_na = true, is_undef = false)
    case _ => EpsVal(Double.NaN, is_eps = false, is_na = false, is_undef = true)
  }

  private def sample(n: Int, seed: Long): List[EpsVal] =
    Gen.listOfN(n, genVal).pureApply(Gen.Parameters.default, Seed(seed))

  private def fold(vs: Seq[EpsVal]): Buf = vs.foldLeft(EpsSum.zero)(EpsSum.reduce)

  private def eq(a: EpsVal, b: EpsVal): Boolean =
    (a.value == b.value || (a.value.isNaN && b.value.isNaN)) &&
      a.is_eps == b.is_eps && a.is_na == b.is_na && a.is_undef == b.is_undef

  test("merge is commutative: finish(a⊕b) == finish(b⊕a)") {
    for (seed <- 1 to 50) {
      val vs = sample(20, seed)
      val (l, r) = vs.splitAt(10)
      val ab = EpsSum.finish(EpsSum.merge(fold(l), fold(r)))
      val ba = EpsSum.finish(EpsSum.merge(fold(r), fold(l)))
      assert(eq(ab, ba), s"seed=$seed")
    }
  }

  test("merge is associative and zero-neutral under any 3-way split") {
    for (seed <- 51 to 100) {
      val vs = sample(21, seed)
      val (a, rest) = vs.splitAt(7)
      val (b, c) = rest.splitAt(7)
      val left = EpsSum.merge(EpsSum.merge(fold(a), fold(b)), fold(c))
      val right = EpsSum.merge(fold(a), EpsSum.merge(fold(b), fold(c)))
      assert(eq(EpsSum.finish(left), EpsSum.finish(right)), s"seed=$seed")
      val withZero = EpsSum.merge(left, EpsSum.zero)
      assert(eq(EpsSum.finish(withZero), EpsSum.finish(left)), s"seed=$seed zero")
    }
  }

  test("semantics: only-EPS → EPS; any numeric breaks EPS; UNDEF > NA priority") {
    val eps = EpsVal(0.0, is_eps = true, is_na = false, is_undef = false)
    val num = EpsVal(2.5, is_eps = false, is_na = false, is_undef = false)
    val na = EpsVal(Double.NaN, is_eps = false, is_na = true, is_undef = false)
    val undef = EpsVal(Double.NaN, is_eps = false, is_na = false, is_undef = true)
    assert(eq(EpsSum.finish(fold(Seq(eps, eps))), eps))
    assert(eq(EpsSum.finish(fold(Seq(eps, num))),
      EpsVal(2.5, is_eps = false, is_na = false, is_undef = false)))
    assert(EpsSum.finish(fold(Seq(num, na))).is_na)
    assert(EpsSum.finish(fold(Seq(na, undef))).is_undef) // undef wins
  }
}

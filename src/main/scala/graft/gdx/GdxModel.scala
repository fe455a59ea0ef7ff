package graft.gdx

/** In-memory model of a GDX container: named, sparse, N-dimensional
  * symbols over a single file-level table of unique element labels
  * (UELs). Mirrors the GDX semantics documented by the public GAMS GDX
  * docs and the MIT-licensed GAMS-dev/gdx sources (SPEC citations per
  * SURVEY.md §0 — /root/reference is empty in this environment, so the
  * byte layout is re-derived and gated on round-trip tests, not on
  * reading GAMS-produced files).
  */
object SymbolType {
  val Set = 0
  val Parameter = 1
  val Variable = 2
  val Equation = 3
  val Alias = 4
  val names: Map[Int, String] =
    Map(Set -> "set", Parameter -> "parameter", Variable -> "variable",
      Equation -> "equation", Alias -> "alias")
}

/** GDX special values (SPEC gmsspecs GMS_SV_*): in-file sentinels in the
  * 1e300 range. EPS ≠ 0: "structurally present, value treated as 0" —
  * GDX is sparse, absence means default, EPS means stored zero.
  */
object SpecialValues {
  val UNDEF = 1.0e300
  val NA = 2.0e300
  val PINF = 3.0e300
  val MINF = 4.0e300
  val EPS = 5.0e300

  /** First acronym sentinel (SPEC gmsspecs GMS_SV_ACR / SURVEY §1.1
    * special-values row): acronym with table index n (n ≥ 10) stores as
    * the finite double n·1e300 — i.e. sentinels ≥ 1.0e301 in steps of
    * 1e300, above the named-special band. Encode and decode use the
    * SAME IEEE multiply/divide (n·1e300, round(v/1e300)) so the index
    * round-trips exactly; oracle SQL reproduces the multiply
    * bit-for-bit (`CAST(n AS DOUBLE) * 1e300`).
    */
  val ACR = 10.0e300
  /** Smallest acronym index (values below ACR are the named specials). */
  val MinAcrIndex = 10

  def isSpecial(v: Double): Boolean = v >= 1.0e300 && v < 1.0e301

  /** True for acronym sentinels: finite doubles at/above the acronym
    * band. Half a step of tolerance (9.5e300) so a value that went
    * through any faithful re-encode still classifies.
    */
  def isAcronym(v: Double): Boolean = !v.isInfinite && !v.isNaN && v >= 9.5e300

  /** Acronym table index of an acronym sentinel (≥ [[MinAcrIndex]]). */
  def acronymIndex(v: Double): Int = math.round(v / 1.0e300).toInt

  /** Sentinel double for acronym table index `idx`. */
  def acronymValue(idx: Int): Double = {
    require(idx >= MinAcrIndex, s"gdx: acronym index must be >= $MinAcrIndex, got $idx")
    idx.toDouble * 1.0e300
  }

  /** Lossy mapping used by default on load (matches gdxpy: nan/±inf/0;
    * acronyms have no numeric meaning → NaN, like NA/UNDEF — the
    * lossless forms are `specialValues=raw` or the
    * `is_acronym`/`acr_index` flag columns).
    */
  def toDouble(v: Double): Double = v match {
    case UNDEF => Double.NaN
    case NA => Double.NaN
    case PINF => Double.PositiveInfinity
    case MINF => Double.NegativeInfinity
    case EPS => 0.0
    case x if isAcronym(x) => Double.NaN
    case x => x
  }
}

/** One acronym-table entry: `index` is the sentinel multiplier
  * (value = index·1e300, index ≥ 10 — [[SpecialValues.acronymValue]]),
  * `name` the GAMS identifier, `text` its explanatory text.
  */
final case class GdxAcronym(index: Int, name: String, text: String = "") {
  require(index >= SpecialValues.MinAcrIndex,
    s"gdx: acronym index must be >= ${SpecialValues.MinAcrIndex}, got $index")
}

/** Variable subtypes (SPEC gmsspecs GMS_VARTYPE_*) with their default
  * lower/upper bounds for unstored fields.
  */
object VarType {
  val Unknown = 0
  val Binary = 1
  val Integer = 2
  val Positive = 3
  val Negative = 4
  val Free = 5
  val Sos1 = 6
  val Sos2 = 7
  val SemiCont = 8
  val SemiInt = 9

  /** (lower, upper) defaults per subtype. */
  def defaultBounds(vt: Int): (Double, Double) = vt match {
    case Binary => (0.0, 1.0)
    case Integer => (0.0, SpecialValues.PINF)
    case Positive => (0.0, SpecialValues.PINF)
    case Negative => (SpecialValues.MINF, 0.0)
    case SemiCont | SemiInt => (0.0, SpecialValues.PINF)
    case _ => (SpecialValues.MINF, SpecialValues.PINF)
  }
}

/** Equation subtypes (SPEC gmsspecs GMS_EQUTYPE_*). */
object EquType {
  val E = 0 // =e=
  val G = 1 // =g=
  val L = 2 // =l=
  val N = 3 // =n=
  val X = 4 // =x=
  val C = 5 // =c=

  /** (lower, upper) defaults for unstored fields per subtype (SPEC
    * gmsspecs defrecequ): an =g= row is rhs ≤ body ≤ +inf, etc.
    */
  def defaultBounds(et: Int): (Double, Double) = et match {
    case E | X => (0.0, 0.0)
    case G | C => (0.0, SpecialValues.PINF)
    case L => (SpecialValues.MINF, 0.0)
    case _ => (SpecialValues.MINF, SpecialValues.PINF)
  }
}

/** Value-field indices (SPEC GMS_VAL_*). Parameters store only LEVEL;
  * sets store none (an optional associated-text index instead);
  * variables/equations store all five.
  */
object ValField {
  val Level = 0
  val Marginal = 1
  val Lower = 2
  val Upper = 3
  val Scale = 4
  val names = Seq("level", "marginal", "lower", "upper", "scale")
}

/** One sparse record: UEL indices per dimension (into the file's UEL
  * table), stored values per the symbol type, and an optional
  * associated text (sets only).
  */
final case class GdxRecord(
    keys: Array[Int],
    values: Array[Double],
    text: Option[String] = None) {
  override def equals(o: Any): Boolean = o match {
    case r: GdxRecord =>
      keys.sameElements(r.keys) && values.sameElements(r.values) && text == r.text
    case _ => false
  }
  override def hashCode: Int =
    (keys.toSeq, values.toSeq, text).hashCode
}

/** One symbol: dim ≤ 20 (SPEC GMS_MAX_INDEX_DIM), records sorted
  * lexicographically by key tuple (the writer enforces this).
  * `domains` holds one controlling-set name per dimension ("*" = none).
  */
final case class GdxSymbol(
    name: String,
    typ: Int,
    dim: Int,
    explText: String = "",
    userInfo: Int = 0,
    domains: Seq[String] = Nil,
    records: Vector[GdxRecord] = Vector.empty) {
  require(dim >= 0 && dim <= 20, s"GDX dim must be 0..20, got $dim")
  def valueCount: Int = typ match {
    case SymbolType.Set | SymbolType.Alias => 0
    case SymbolType.Parameter => 1
    case _ => 5
  }
}

/** A whole GDX container: ordered UEL table + symbols. Labels are
  * case-insensitive for matching, case-preserving for display
  * (SPEC gdxUMUelGet).
  */
final case class GdxContainer(
    producer: String = "gdxpyspark",
    uels: IndexedSeq[String] = Vector.empty,
    symbols: Vector[GdxSymbol] = Vector.empty,
    acronyms: Vector[GdxAcronym] = Vector.empty) {

  def symbol(name: String): Option[GdxSymbol] = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    symbols.find(_.name.toLowerCase(java.util.Locale.ROOT) == lower)
  }

  def label(uel: Int): String = uels(uel)
}

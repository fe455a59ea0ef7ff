package graft.gdx

import scala.collection.mutable

/** Incremental builder: registers UELs (case-insensitive matching,
  * case-preserving display — SPEC gdxUMUelGet) and accumulates symbols
  * whose records are given with label strings rather than UEL indices.
  */
final class GdxBuilder(producer: String = "gdxpyspark") {
  private val uels = mutable.ArrayBuffer.empty[String]
  private val uelIndex = mutable.HashMap.empty[String, Int] // lower-cased key
  private val symbols = mutable.ArrayBuffer.empty[GdxSymbol]

  def registerUel(label: String): Int = {
    val key = label.toLowerCase(java.util.Locale.ROOT)
    uelIndex.getOrElseUpdate(key, { uels += label; uels.size - 1 })
  }

  /** Add a symbol from label-keyed records; UELs are registered in
    * first-seen order, records are sorted by the writer.
    */
  def addSymbol(name: String, typ: Int, dim: Int,
      records: Iterable[(Seq[String], Array[Double], Option[String])],
      explText: String = "", userInfo: Int = 0,
      domains: Seq[String] = Nil): this.type = {
    val recs = records.iterator.map { case (labels, values, text) =>
      require(labels.size == dim, s"record arity ${labels.size} != dim $dim for $name")
      GdxRecord(labels.map(registerUel).toArray, values, text)
    }.toVector
    symbols += GdxSymbol(name, typ, dim, explText, userInfo, domains, recs)
    this
  }

  def addAlias(name: String, target: String): this.type = {
    symbols += GdxSymbol(name, SymbolType.Alias, 0, explText = s"Aliased with $target")
    this
  }

  private val acrs = mutable.ArrayBuffer.empty[GdxAcronym]

  /** Register an acronym (SPEC gdxAcronymAdd): returns its sentinel
    * VALUE (index·1e300) to store in parameter records. Indices are
    * assigned sequentially from [[SpecialValues.MinAcrIndex]]; names are
    * unique case-insensitively (GAMS identifier semantics).
    */
  def addAcronym(name: String, text: String = ""): Double = {
    require(!acrs.exists(_.name.equalsIgnoreCase(name)),
      s"gdx: acronym '$name' already registered")
    val idx = SpecialValues.MinAcrIndex + acrs.size
    acrs += GdxAcronym(idx, name, text)
    SpecialValues.acronymValue(idx)
  }

  def result(): GdxContainer =
    GdxContainer(producer, uels.toVector, symbols.toVector, acrs.toVector)
}

package graft.functions

import scala.collection.mutable

/** Byte-pair encoding — the real subword tokenizer behind the repo's
  * token-dependent operator family (chunking, token budgets, packing,
  * length bucketing previously counted whitespace words only).
  *
  * Public-knowledge algorithm: Gage 1994 (the byte-pair compressor)
  * as adapted for NLP subwords by Sennrich, Haddow & Birch 2016
  * ("Neural Machine Translation of Rare Words with Subword Units"),
  * including their end-of-word marker so token sequences remain
  * word-reversible. Everything here is DETERMINISTIC — pair selection
  * breaks count ties lexicographically, training input is sorted by
  * (count desc, word) — so two training runs over the same corpus
  * produce byte-identical merge tables, the property the pipeline
  * rows rely on for reproducible token budgets (no RNG, no hash-map
  * iteration order leaks).
  *
  * Scale split: TRAINING runs on a bounded word-frequency vocabulary
  * (the caller aggregates word counts distributed and collects only
  * the top-K rows — same bounded-driver-state pattern as the k-means/
  * IVF/PQ centroid trainers); APPLICATION is embarrassingly parallel
  * — a broadcast rank table plus a per-partition memo, no shuffle.
  */
object Bpe {

  /** Sennrich end-of-word marker: appended as the final symbol of every
    * word so "est" inside "estimate" and "est" ending "lowest" are
    * distinct merge targets, and so decode can re-split words exactly.
    */
  val EndOfWord = "</w>"

  /** A trained tokenizer: merge list in creation order; rank = index. */
  final case class Model(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
  }

  /** Initial symbols of a word: one per Unicode CODE POINT, not UTF-16
    * code unit — `w.map(_.toString)` would split an astral-plane char
    * (emoji, rare CJK) into two unpaired surrogates, diverging from
    * the DuckDB oracle's code-point `string_split_regex`/`length`.
    */
  private[graft] def initialSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Train `numMerges` merges from a (word, count) vocabulary.
    *
    * Classic BPE training loop: count adjacent symbol pairs weighted
    * by word frequency, merge the most frequent pair everywhere,
    * repeat. Ties on count break on the lexicographically smallest
    * (left, right) pair — the determinism contract. Stops early when
    * no pair occurs twice (merging singleton pairs would just memorize
    * the vocabulary).
    */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Model = {
    var words: Array[(Array[String], Long)] = vocab
      .sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) =>
        (initialSymbols(w) :+ EndOfWord, c)
      }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (best, bestCount) = pairCounts.foldLeft(
          (("", ""), Long.MinValue)) { case (acc @ (bp, bc), (p, c)) =>
          if (c > bc || (c == bc && pairOrder(p, bp) < 0)) (p, c) else acc
        }
        if (bestCount < 2) exhausted = true
        else {
          merges += best
          words = words.map { case (syms, c) => (mergePair(syms, best), c) }
          i += 1
        }
      }
    }
    Model(merges.result())
  }

  private def pairOrder(a: (String, String), b: (String, String)): Int = {
    val c = a._1.compareTo(b._1)
    if (c != 0) c else a._2.compareTo(b._2)
  }

  /** Replace every left-to-right occurrence of `pair` in `syms`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var k = 0
    while (k < syms.length) {
      if (k < syms.length - 1 && syms(k) == pair._1 && syms(k + 1) == pair._2) {
        out += (pair._1 + pair._2)
        k += 2
      } else {
        out += syms(k)
        k += 1
      }
    }
    out.result()
  }

  /** Encode one word: start from characters + the end marker, repeatedly
    * merge the LOWEST-RANK adjacent pair present (all its occurrences,
    * left to right) until no ranked pair remains — the standard apply
    * rule, guaranteeing the same greedy order as training.
    */
  def encodeWord(word: String, model: Model): Vector[String] = {
    if (word.isEmpty) return Vector(EndOfWord)
    var syms: Array[String] = initialSymbols(word) :+ EndOfWord
    val ranks = model.ranks
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair)
    }
    syms.toVector
  }

  /** Encode whitespace-split text; `memo` amortizes repeated words
    * (natural text is Zipfian — a per-partition memo turns the
    * quadratic-in-word-length encode into a lookup for the bulk of
    * the stream). Callers pass one memo per partition, never shared.
    */
  /** Splits on U+0020 ONLY — deliberately the corpus-wide tokenization
    * convention (every registered query splits text with
    * `split(text, ' ')`), so token/word counts agree across the whole
    * suite; it is NOT a general whitespace splitter. A word containing
    * the end-of-word marker would make [[decode]] silently corrupt the
    * round-trip, so it is rejected loudly here.
    */
  def encode(text: String, model: Model,
      memo: mutable.Map[String, Vector[String]]): Vector[String] =
    if (text == null || text.isEmpty) Vector.empty
    else text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
      require(!w.contains(EndOfWord),
        s"bpe: word contains the end-of-word marker '$EndOfWord' — " +
          "decode(encode(text)) would corrupt it; strip or re-map the marker first")
      memo.getOrElseUpdate(w, encodeWord(w, model))
    }.toVector

  /** Inverse of [[encode]]: concatenate and re-split on the end-of-word
    * marker. `decode(encode(t)) == normalized t` is the BpeSpec
    * round-trip contract (normalized = single-space word separation).
    */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").split(EndOfWord, -1).filter(_.nonEmpty).mkString(" ")

  // ------------------------------------------------- byte-level BPE
  // GPT-2-style byte encoder beneath the trained merges (Radford et
  // al. 2019, encoder.py bytes_to_unicode — public reference): the
  // base alphabet becomes a CLOSED set of 256 symbols, so arbitrary
  // bytes (emoji, CJK, mojibake, binary-ish crawl junk) tokenize with
  // zero UNK and decode byte-exactly. Printable bytes (33–126,
  // 161–172, 174–255) map to their own code point — ASCII text stays
  // readable in token dumps — and the remaining 68 bytes map to
  // 256+n in byte order.

  /** Byte value → single-code-point symbol (256 entries, injective). */
  val ByteToChar: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
      b += 1
    }
    out
  }

  private lazy val charToByte: Map[Int, Int] =
    ByteToChar.iterator.zipWithIndex.map { case (s, b) => s.codePointAt(0) -> b }.toMap

  /** UTF-8 bytes of `w`, one mapped symbol char per byte. */
  def byteEncode(w: String): String = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(ByteToChar(bs(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Exact inverse of [[byteEncode]] — rejects symbols outside the
    * byte alphabet loudly (they cannot come from byteEncode).
    */
  def byteDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out.write(charToByte.getOrElse(cp,
        throw new IllegalArgumentException(
          f"bpe: code point U+$cp%04X is not a byte symbol")))
      i += Character.charCount(cp)
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Byte-level encode: each word byte-encodes first, then the trained
    * merges apply — `model` must have been trained on byte-encoded
    * words. Same U+0020-split convention and end-of-word contract as
    * [[encode]] (the marker's chars are printable ASCII, which map to
    * themselves, so the containment guard carries over unchanged).
    */
  def encodeBytes(text: String, model: Model,
      memo: mutable.Map[String, Vector[String]]): Vector[String] =
    if (text == null || text.isEmpty) Vector.empty
    else text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
      require(!w.contains(EndOfWord),
        s"bpe: word contains the end-of-word marker '$EndOfWord'")
      memo.getOrElseUpdate(w, encodeWord(byteEncode(w), model))
    }.toVector

  /** Inverse of [[encodeBytes]] down to the original bytes. */
  def decodeBytes(tokens: Seq[String]): String =
    decode(tokens).split(" ").filter(_.nonEmpty).map(byteDecode).mkString(" ")
}

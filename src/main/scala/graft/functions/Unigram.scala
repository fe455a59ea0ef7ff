package graft.functions

import scala.collection.mutable

/** Unigram-LM (SentencePiece-style) subword tokenizer (SPEC: Kudo 2018
  * "Subword regularization", §3 — the segmentation model SentencePiece
  * defaults to, trained by EM pruning of a seeded candidate vocabulary;
  * the alternative to [[Bpe]]'s bottom-up merging). This is the
  * DETERMINISTIC integer-rank variant of the checklist's rule-12
  * discipline: instead of float log-probabilities (whose libm `ln` and
  * sum order diverge across engines), pieces carry an integer RANK
  * assigned by (count desc, piece asc), and Viterbi minimizes the
  * composite objective (piece count, rank sum) — lexicographic, packed
  * into one BIGINT as `n·10⁹ + rankSum` so a single integer `min` is
  * the whole comparison. Rank order is monotone in estimated
  * probability under any Zipf-ish count law, so the segmentation
  * matches the max-likelihood one except on probability ties, where it
  * is deterministic instead of libm-dependent — and the (n, rankSum)
  * OBJECTIVE VALUE is unique even when the argmin path is not, which
  * is what lets oracle replays compare scores without agreeing on
  * paths.
  *
  * Training (hard/Viterbi EM, fixed rounds — deterministic):
  *  1. candidates = corpus alphabet (every code point of the training
  *     words — guarantees coverage) + multi-char seeds (the BPE merge
  *     outputs with end-of-word markers stripped: Kudo seeds from
  *     "frequent substrings"; BPE symbols ARE the frequent substrings
  *     and tie the two tokenizer families to one corpus pass).
  *  2. initial counts: overlapping substring occurrences weighted by
  *     word frequency.
  *  3. per EM round: rank by (count desc, piece asc) → Viterbi-segment
  *     every training word (ties broken longest-piece-first — fixed) →
  *     re-count piece uses weighted by word freq → prune multi-char
  *     pieces to the top `targetPieces` by the same order (alphabet
  *     chars are never pruned; Kudo keeps single chars for coverage).
  *  4. final ranks from the last round's counts.
  *
  * Unknown characters (absent from the training alphabet) segment as
  * single-char pieces at rank |vocab|+1 — the shared UNK rank, cheap
  * to replay relationally.
  */
object Unigram {

  /** Composite-score radix: score = nPieces·Radix + rankSum. Word
    * length and rank sum are both ≪ 10⁹, so the packed value is exact
    * in a Long (and in DuckDB's BIGINT).
    */
  val Radix = 1000000000L

  final case class Model(pieces: Vector[String], maxLen: Int)
      extends Serializable {
    @transient lazy val rank: Map[String, Int] =
      pieces.iterator.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    def unkRank: Int = pieces.size + 1
  }

  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def occurrences(w: String, p: String): Int = {
    var i = w.indexOf(p)
    var n = 0
    while (i >= 0) { n += 1; i = w.indexOf(p, i + 1) }
    n
  }

  /** Viterbi DP over code points: minimal packed (n, rankSum) score of
    * segmenting `word` with `m`; `path` additionally backtracks ONE
    * deterministic optimal segmentation (ties → longest piece, i.e.
    * smallest start) for EM counting.
    */
  def segScore(word: String, m: Model): Long = viterbi(word, m)._1

  private def viterbi(word: String, m: Model): (Long, Array[Int]) = {
    val cps = codePoints(word)
    val n = cps.length
    val best = new Array[Long](n + 1)
    val from = new Array[Int](n + 1)
    var k = 1
    while (k <= n) {
      var sc = Long.MaxValue
      var arg = k - 1
      var j = math.max(0, k - m.maxLen)
      while (j < k) {
        val piece = cps.slice(j, k).mkString
        val r = m.rank.getOrElse(piece, if (k - j == 1) m.unkRank else -1)
        if (r > 0 && best(j) != Long.MaxValue) {
          val cand = best(j) + Radix + r
          // strict <: ties keep the SMALLEST j already found (j scans
          // ascending, so first winner = longest piece) — fixed rule
          if (cand < sc) { sc = cand; arg = j }
        }
        j += 1
      }
      best(k) = sc
      from(k) = arg
      k += 1
    }
    (best(n), from)
  }

  /** One deterministic optimal segmentation (training + display). */
  def segment(word: String, m: Model): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    val cps = codePoints(word)
    val (_, from) = viterbi(word, m)
    val out = List.newBuilder[String]
    var stack = List.empty[String]
    var k = cps.length
    while (k > 0) {
      val j = from(k)
      stack = cps.slice(j, k).mkString :: stack
      k = j
    }
    out ++= stack
    out.result().toVector
  }

  def train(vocab: Seq[(String, Long)], seeds: Seq[String],
      targetPieces: Int, emRounds: Int): Model = {
    val alphabet = vocab.iterator.flatMap(v => codePoints(v._1)).toVector.distinct
    val multi = seeds.map(_.replace("</w>", ""))
      .filter(s => codePoints(s).length >= 2).distinct
      .filterNot(alphabet.contains)
    // initial counts: overlapping occurrences × word frequency
    val counts = mutable.LinkedHashMap.empty[String, Long]
    (alphabet ++ multi).foreach { p =>
      var c = 0L
      vocab.foreach { case (w, f) => c += occurrences(w, p).toLong * f }
      counts(p) = c
    }
    val alpha = alphabet.toSet
    var pieces = rankOrder(counts.toSeq)
    var maxLen = math.max(1, pieces.iterator.map(p => codePoints(p).length)
      .foldLeft(1)(math.max))
    var round = 0
    while (round < emRounds) {
      val m = Model(pieces, maxLen)
      val used = mutable.HashMap.empty[String, Long]
      vocab.foreach { case (w, f) =>
        segment(w, m).foreach(p => used(p) = used.getOrElse(p, 0L) + f)
      }
      // prune: alphabet chars survive always (coverage); multi-char
      // pieces need nonzero use and must fit the target budget
      val keptMulti = used.iterator
        .filter { case (p, c) => !alpha.contains(p) && c > 0 }
        .toSeq.sortBy { case (p, c) => (-c, p) }
        .take(targetPieces)
      val keptAlpha = alphabet.map(a => a -> used.getOrElse(a, 0L))
      pieces = rankOrder(keptAlpha ++ keptMulti)
      maxLen = math.max(1, pieces.iterator.map(p => codePoints(p).length)
        .foldLeft(1)(math.max))
      round += 1
    }
    Model(pieces, maxLen)
  }

  private def rankOrder(counted: Seq[(String, Long)]): Vector[String] =
    counted.sortBy { case (p, c) => (-c, p) }.map(_._1).toVector
}

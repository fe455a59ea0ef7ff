package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the BPE tokenizer the hash-oracle can't check (no SQL
  * engine replays iterative merging): the worked merge sequence from
  * Sennrich et al. 2016 §3.2's example vocabulary, determinism,
  * round-trip lossless-ness on real corpus data, apply/train greedy
  * agreement, and budget monotonicity of the parameterized pipeline row.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = graft.Sessions.build("local[4]", "4")

  private val dir = "/root/testdata/sf0.001"

  test("training replays the Sennrich worked example: 'est</w>' merges from lowest/newest") {
    // the paper's §3.2 vocabulary: low×5, lowest×2, newer×6, wider×3
    // (we add 'newest' to make est</w> dominate as in the figure)
    val vocab = Seq(("low", 5L), ("lowest", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.train(vocab, 4)
    // most frequent first pair: (e,s) occurs in lowest+newest+widest = 11
    assert(m.merges(0) == ("e", "s"), s"got ${m.merges}")
    // then (es,t) = 11, then (est,</w>) = 11
    assert(m.merges(1) == ("es", "t"), s"got ${m.merges}")
    assert(m.merges(2) == ("est", "</w>"), s"got ${m.merges}")
    // encoding a NEW word with the trained merges reuses the subword
    val memo = mutable.HashMap.empty[String, Vector[String]]
    val toks = Bpe.encode("tallest", m, memo)
    assert(toks.last == "est</w>", s"got $toks")
  }

  test("count ties break lexicographically — training is deterministic") {
    // ab and cd both occur exactly twice; (a,b) < (c,d) must win
    val vocab = Seq(("ab", 2L), ("cd", 2L))
    val m1 = Bpe.train(vocab, 1)
    assert(m1.merges == Vector(("a", "b")))
    // full determinism: two runs over a shuffled copy agree exactly
    val v2 = Seq(("cd", 2L), ("ab", 2L))
    assert(Bpe.train(v2, 10).merges == Bpe.train(vocab, 10).merges)
  }

  test("training stops when no pair repeats instead of memorizing the vocab") {
    val m = Bpe.train(Seq(("xy", 1L), ("zq", 1L)), 50)
    assert(m.merges.isEmpty, s"singleton pairs must not merge: ${m.merges}")
  }

  test("encode/decode round-trips every corpus document, and bpe never exceeds char count") {
    val docs = graft.T(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vocab = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val m = Bpe.train(vocab, 200)
    // the sf0.001 vocabulary exhausts before 200 merges (every pair
    // left occurs once) — the early-stop is the contract, not a miss
    assert(m.merges.size > 50 && m.merges.size <= 200,
      s"expected a substantial merge table, got ${m.merges.size}")
    val memo = mutable.HashMap.empty[String, Vector[String]]
    docs.foreach { case (id, text) =>
      val toks = Bpe.encode(text, m, memo)
      val normalized = text.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(Bpe.decode(toks) == normalized, s"doc $id round-trip")
      val nWs = text.split(" ").count(_.nonEmpty)
      assert(toks.size >= nWs, s"doc $id: every word is >=1 token")
      assert(toks.size <= normalized.length + nWs,
        s"doc $id: bpe cannot exceed chars+markers")
    }
    // merges actually fire: the corpus encodes to fewer tokens than chars
    val totToks = docs.map(d => Bpe.encode(d._2, m, memo).size).sum
    val totChars = docs.map(_._2.count(_ != ' ')).sum
    assert(totToks < totChars / 2,
      s"200 merges should at least halve the token stream: $totToks vs $totChars chars")
  }

  test("pipeline_chunk_documents_bpe: stride grid is dense, windows bounded, decode sane") {
    val chunks = graft.SparkEntry.queries("pipeline_chunk_documents_bpe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(chunks.nonEmpty)
    assert(chunks.forall(_._3 <= 32), "window is 32 tokens max")
    assert(chunks.forall(_._3 >= 1), "no empty chunks")
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val ids = cs.map(_._2).sorted
      assert(ids.toSeq == (0 until cs.length).toSeq, s"doc $docId chunk ids dense")
      // window length law: chunk k covers tokens [24k, min(24k+32, n))
      val sorted = cs.sortBy(_._2)
      val n = 24 * sorted.last._2 + sorted.last._3
      sorted.foreach { case (_, k, nTok, _) =>
        assert(nTok == math.min(32, n - 24 * k), s"doc $docId chunk $k window length")
      }
    }
    // decoded text never contains a marker remnant
    assert(chunks.forall(!_._4.contains("</w>")))
  }

  test("registered rows: roundtrip_ok everywhere; bpe budget keeps different docs than whitespace") {
    val rep = graft.SparkEntry.queries("text_bpe_tokenize")(spark, dir).collect()
    assert(rep.length > 0)
    assert(rep.forall(_.getBoolean(4)), "roundtrip_ok must hold on every doc")
    assert(rep.forall(r => r.getLong(2) >= r.getLong(1)),
      "subword count is never below word count")
    val bpeBudget = graft.SparkEntry.queries("pipeline_token_budget_bpe")(spark, dir)
      .collect()
    assert(bpeBudget.nonEmpty)
    // greedy-prefix invariant: per-source cum is monotone and <= budget
    bpeBudget.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val cums = rows.map(_.getLong(3)).sorted
      assert(cums.last <= 1000)
      assert(cums.distinct.length == cums.length)
    }
  }

  test("pipeline_pack_sequences_bpe: bins non-decreasing per lang, floor rule holds") {
    val rows = graft.SparkEntry.queries("pipeline_pack_sequences_bpe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._1)
      // replay the packing rule from the emitted token counts
      var cum = 0L
      ordered.foreach { case (id, _, nTok, bin) =>
        assert(bin == cum / 4096, s"doc $id: bin $bin != ${cum / 4096}")
        cum += nTok
      }
      assert(ordered.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        "bins must be non-decreasing in doc order")
    }
  }

  test("fertility disparity under a skew-trained tokenizer (the text_tokenizer_fertility motive)") {
    // the production failure the registered per-lang fertility row
    // audits: train BPE on a majority language only, then measure
    // tokens-per-word per language. The synthetic driver corpus can't
    // show it (all langs share one 31-word vocab → fertility exactly
    // 1.0, full merge coverage), so the effect is pinned here on a
    // crafted two-language corpus with disjoint vocabularies.
    val majority = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "and", "runs", "far", "away")
    val minority = Seq("zxqv", "wkjy", "vbnm", "qwrt", "plgh", "mnbx")
    val vocab = majority.map(w => w -> 50L) // trained on MAJORITY only
    val model = Bpe.train(vocab, numMerges = 200)
    val memo = mutable.HashMap.empty[String, Vector[String]]
    def fertility(words: Seq[String]): Double = {
      val text = words.mkString(" ")
      Bpe.encode(text, model, memo).length.toDouble / words.length
    }
    val fMaj = fertility(majority)
    val fMin = fertility(minority)
    assert(fMaj == 1.0, s"trained vocab must fully merge: $fMaj")
    assert(fMin > 2.0, s"unseen vocab must fragment to subwords: $fMin")
  }

  // ------------------------------------------------- unigram-LM twin

  test("unigram: segmentation covers every word exactly; score matches the path") {
    val vocab = Seq("the" -> 50L, "theory" -> 20L, "other" -> 10L,
      "there" -> 8L, "ore" -> 5L)
    val m = Unigram.train(vocab, seeds = Seq("th", "the", "ory", "er", "ore"),
      targetPieces = 16, emRounds = 2)
    for ((w, _) <- vocab; word <- Seq(w, "unseenword", "zzz")) {
      val segs = Unigram.segment(word, m)
      assert(segs.mkString == word, s"coverage broken on '$word': $segs")
      val sc = Unigram.segScore(word, m)
      assert(sc / Unigram.Radix == segs.length,
        s"score n=${sc / Unigram.Radix} != path length ${segs.length} on '$word'")
      val pathRs = segs.map(p =>
        m.rank.getOrElse(p, m.unkRank).toLong).sum
      assert(sc % Unigram.Radix == pathRs,
        s"score rankSum mismatch on '$word'")
    }
  }

  test("unigram: training is deterministic and EM pruning drops unused seeds") {
    val vocab = Seq("abab" -> 30L, "abc" -> 20L, "cab" -> 10L)
    val seeds = Seq("ab", "ba", "bc", "ca", "zz") // zz never occurs
    val m1 = Unigram.train(vocab, seeds, targetPieces = 8, emRounds = 2)
    val m2 = Unigram.train(vocab, seeds, targetPieces = 8, emRounds = 2)
    assert(m1.pieces == m2.pieces, "training must be deterministic")
    assert(!m1.pieces.contains("zz"), "zero-occurrence seed must be pruned")
    // Viterbi EM keeps only pieces USED by optimal segmentations —
    // 'ab' dominates (rank beats per-char splits), so it survives
    assert(m1.pieces.contains("ab"), s"dominant seed pruned: ${m1.pieces}")
  }

  test("unigram fertility delta: whole-word pieces give 1.0, unseen vocab fragments") {
    // the BPE fertility-disparity motive replayed for the unigram
    // family: seeds containing the full majority words make each a
    // single piece; disjoint-vocab words fall back to chars/UNK
    val majority = Seq("the", "quick", "brown", "fox", "jumps")
    val vocab = majority.map(_ -> 50L)
    val m = Unigram.train(vocab, seeds = majority ++ Seq("qu", "br", "ju"),
      targetPieces = 32, emRounds = 2)
    def fert(ws: Seq[String]): Double =
      ws.map(w => (Unigram.segScore(w, m) / Unigram.Radix).toDouble).sum / ws.length
    assert(fert(majority) == 1.0, s"in-vocab fertility: ${fert(majority)}")
    val unseen = Seq("zxqv", "wkjy", "vbnm")
    assert(fert(unseen) > 2.0, s"unseen fertility: ${fert(unseen)}")
    // and the unigram count can never beat one piece per char
    unseen.foreach(w =>
      assert(Unigram.segScore(w, m) / Unigram.Radix <= w.length))
  }

  test("registered unigram rows: n_tok_uni <= chars, >= 1 piece per word; budget differs from whitespace") {
    val uni = graft.SparkEntry.queries("text_unigram_tokenize")(spark, dir).collect()
    assert(uni.nonEmpty)
    uni.foreach { r =>
      val (ws, n) = (r.getLong(1), r.getLong(2))
      assert(n >= ws, s"fewer pieces than words: $r") // a piece never spans words
      if (ws == 0) assert(n == 0 && r.getLong(3) == 0)
    }
    // unigram budgeting must actually change the selection vs whitespace
    val base = graft.SparkEntry.queries("pipeline_token_budget")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val u = graft.SparkEntry.queries("pipeline_token_budget_unigram")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(u != base, "unigram budget selected exactly the whitespace set")
  }

  test("byte table is the GPT-2 bytes_to_unicode bijection") {
    val t = Bpe.ByteToChar
    assert(t.length == 256 && t.toSet.size == 256, "not injective")
    // printable bytes map to themselves
    for (b <- (33 to 126) ++ (161 to 172) ++ (174 to 255))
      assert(t(b) == new String(Character.toChars(b)), s"byte $b")
    // the 68 non-printable bytes map above 255, in byte order
    val shifted = (0 to 255).filterNot(b =>
      (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || b >= 174)
    assert(shifted.length == 68)
    shifted.zipWithIndex.foreach { case (b, n) =>
      assert(t(b) == new String(Character.toChars(256 + n)), s"byte $b")
    }
  }

  test("byte-level BPE round-trips arbitrary unicode with zero UNK") {
    // crafted emoji/CJK/mixed fixture — the exact realism gap the
    // byte fallback closes (the code-point tokenizer round-trips these
    // too, but with an OPEN alphabet; byte level keeps every symbol
    // inside the closed 256-char base + trained merges)
    val texts = Seq(
      "hello world",
      "数据 管道 训练",                       // CJK
      "🎉🎊 emoji 🚀 party 🎉🎉🎉",          // astral-plane emoji runs
      "mixed 中文 and ascii ÅÉÎ σπάρκ",     // latin-ext + greek + CJK
      "naïve café — em–dash … ellipsis",
      " nbsp and\ttab")           // exotic whitespace INSIDE words
    // train a tiny byte-level model on the fixture's own words
    val vocab = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (Bpe.byteEncode(w), ws.size.toLong) }
      .toSeq
    val m = Bpe.train(vocab, 50)
    val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
    texts.foreach { t =>
      val toks = Bpe.encodeBytes(t, m, memo)
      val normalized = t.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(Bpe.decodeBytes(toks) == normalized, s"round trip: '$t'")
      // every token decomposes into base byte symbols — no UNK concept
      toks.foreach { tok =>
        val body = tok.replace(Bpe.EndOfWord, "")
        if (body.nonEmpty) Bpe.byteDecode(body) // throws on a non-byte symbol
      }
    }
    // byteEncode/byteDecode exact inverse on raw strings incl. astral
    for (s <- Seq("🎉", "中", "á", "🎉x", ""))
      assert(Bpe.byteDecode(Bpe.byteEncode(s)) == s)
  }

  test("registered byte-BPE row: roundtrip_ok on every doc; budget differs from whitespace") {
    val rows = graft.SparkEntry.queries("text_bytebpe_tokenize")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"byte-BPE round trip failed: $r")
      // n_bytes >= code points >= whitespace tokens
      assert(r.getLong(3) >= r.getLong(1), s"byte count below word count: $r")
      // byte tokens can never outnumber bytes (every token >= 1 byte)
      assert(r.getLong(2) <= r.getLong(3) + r.getLong(1), s"token/byte bound: $r")
    }
    val base = graft.SparkEntry.queries("pipeline_token_budget")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.SparkEntry.queries("pipeline_token_budget_bytebpe")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b != base, "byte-BPE budget selected exactly the whitespace set")
  }
}

package graft.ops

import scala.collection.mutable

import graft.{QueryModule, T}
import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 — real subword tokenization (the round-7 verdict's #4:
  * the "pluggable BPE slot" gets its first real plug). Every
  * token-dependent operator previously counted whitespace words; these
  * rows run a genuine byte-pair-encoding tokenizer
  * ([[graft.functions.Bpe]], Sennrich et al. 2016) trained on the
  * corpus itself, and re-parameterize the token-budget family by it.
  *
  * Shape at 100 TB: training aggregates word frequencies DISTRIBUTED
  * (two-phase count, shuffle ∝ distinct words) and collects only the
  * top-K vocabulary rows (bounded driver state, the k-means-centroid
  * pattern); the trained model broadcasts once; encoding is a
  * map-side-only pass with a per-partition Zipf memo — no shuffle is
  * added anywhere by tokenization itself.
  *
  * HASH-CHECKED since round 11 via the data-parameterized-oracle
  * device: training is deterministic for a fixed corpus (count-desc +
  * lex tie-break, pinned against Sennrich's worked example in
  * BpeSpec), so Verify trains the SAME merge table the queries use,
  * embeds it as a DuckDB literal, and the oracle REPLAYS greedy
  * encoding independently as a recursive CTE (see [[encodeCtes]]).
  * What SQL re-derives: the entire apply path (lowest-rank-first
  * merging, end-of-word handling, decode round-trip) plus every
  * downstream pipeline computation. What it trusts: the merge table
  * itself (unit-pinned in BpeSpec) — iterative pair-count training
  * remains outside SQL, the documented residue of SURVEY §2's BPE row.
  */
object TokenizerOps extends QueryModule {

  /** Top-K word-frequency vocabulary rows collected for training —
    * bounded driver state regardless of corpus size. Rare words
    * outside the top-K still encode fine (down to characters).
    */
  private val TrainVocabSize = 2048

  /** Merge-table size. Small by production standards (GPT-2 uses 50k)
    * but enough to lift common subwords out of characters; the knob a
    * user turns, not a correctness constant.
    */
  private val NumMerges = 200

  /** Train a model from the documents table of `d` — deterministic for
    * a fixed corpus, so every query (and every bench reinvocation)
    * rebuilds the identical merge table. MEMOIZED per canonical corpus
    * dir (the ensureMediaFixture pattern): the model is a pure function
    * of the corpus, and one Verify run otherwise pays the full
    * word-count job + driver merge loop 8× (4 queries + 4 oracle
    * generators). The key carries a size+mtime FINGERPRINT of the
    * documents parquet, not the path alone: a long-lived JVM that
    * regenerates the data in place would otherwise be served a stale
    * merge table — and because Verify's oracle generator shares this
    * memo, the hash check would agree with the stale tokenization and
    * mask it. Bounded: one entry per distinct corpus generation seen.
    */
  private val modelMemo =
    scala.collection.concurrent.TrieMap.empty[String, Bpe.Model]

  private def corpusKey(d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val (sz, mt) = graft.Fingerprint.of(Seq(f))
    s"${f.getCanonicalPath}#$sz#$mt"
  }

  /** Top-K (word, freq) training vocabulary — ONE distributed count
    * job memoized per corpus generation, shared by the BPE and
    * unigram trainers so the two families train on the identical
    * sample (and one Verify run pays the job once).
    */
  private val vocabMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Long)]]

  private def vocabOf(s: SparkSession, d: String): Seq[(String, Long)] =
    vocabMemo.getOrElseUpdate(corpusKey(d), {
      T(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)
        .limit(TrainVocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    })

  private def trainOn(s: SparkSession, d: String): Bpe.Model =
    modelMemo.getOrElseUpdate(corpusKey(d),
      Bpe.train(vocabOf(s, d), NumMerges))

  /** Byte-level twin: the SAME training sample, each word passed
    * through the GPT-2 byte encoder first — merges live over the
    * closed 256-symbol byte alphabet ([[Bpe.ByteToChar]]).
    */
  private val byteModelMemo =
    scala.collection.concurrent.TrieMap.empty[String, Bpe.Model]

  private def trainBytesOn(s: SparkSession, d: String): Bpe.Model =
    byteModelMemo.getOrElseUpdate(corpusKey(d),
      Bpe.train(vocabOf(s, d).map { case (w, c) => (Bpe.byteEncode(w), c) },
        NumMerges))

  /** Unigram-LM twin (see [[graft.functions.Unigram]]): EM-pruned from
    * the BPE-seeded candidate vocab over the same training sample.
    */
  private val uniMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.functions.Unigram.Model]

  private def trainUnigram(s: SparkSession, d: String): graft.functions.Unigram.Model =
    uniMemo.getOrElseUpdate(corpusKey(d), {
      val bpe = trainOn(s, d)
      graft.functions.Unigram.train(vocabOf(s, d),
        bpe.merges.map { case (l, r) => l + r },
        targetPieces = 256, emRounds = 2)
    })

  // ---------------------------------------------------------------
  // Oracle-side encode replay (the round-10 "make the recurrence
  // engine-replayable" device, applied to greedy BPE application).
  // ---------------------------------------------------------------

  /** The trained merges as a DuckDB VALUES literal `(rank, left,
    * right)`. Symbols come from corpus text (no quotes expected, but
    * escaped anyway); an EMPTY model gets one unmatchable row so the
    * downstream list machinery stays well-typed.
    */
  private def mergesLiteral(m: Bpe.Model): String =
    if (m.merges.isEmpty) "(1, chr(2), chr(2))"
    else m.merges.zipWithIndex.map { case ((l, r), i) =>
      def esc(x: String) = x.replace("'", "''")
      s"(${i + 1}, '${esc(l)}', '${esc(r)}')"
    }.mkString(", ")

  /** Shared CTE prelude replaying [[Bpe.encodeWord]] in DuckDB over
    * every DISTINCT corpus word (the memo, relationally).
    *
    * Representation: a word state is its symbol sequence joined AND
    * bracketed by chr(1) (`·s1·s2·…·sn·`) — the separators make merge
    * patterns boundary-exact, and chr(1)/`</w>` are verified absent
    * from the corpus alphabet. Each recursion step finds the
    * LOWEST-RANK pair present (list comprehension over the ≤200
    * patterns + list_min — no aggregation over the recursive
    * reference, the sim_pca device) and rewrites the LEFTMOST
    * occurrence only. One-occurrence-at-a-time is provably identical
    * to [[Bpe.mergePair]]'s left-to-right replace-all: a newly formed
    * symbol only participates in STRICTLY HIGHER-RANK pairs (its
    * forming merge trained earlier than any pair containing it), so
    * re-selecting the best rank between single rewrites can never
    * jump to a different pair mid-merge, and leftmost-first resolves
    * self-overlap chains (`aaaaa`) in the same order as the Scala
    * scan. Plain string replace() would NOT: its post-match scan
    * resume merges alternating occurrences of odd self-chains
    * (`·aa·a·aa·` where the scan gives `·aa·aa·a·`).
    *
    * CTEs exposed to callers: `wtk(w, toks)` — final token list per
    * distinct word; `dtk(doc_id, pos, w)` — the per-document word
    * stream with 1-based positions (checklist rule 9: ordinality via
    * list indexing, DuckDB has no WITH ORDINALITY).
    */
  private def encodeCtes(m: Bpe.Model): String = encodeCtes(m, byteLevel = false)

  /** GPT-2 byte table as a 256-element DuckDB list literal (index =
    * byte value + 1), for the byte-level oracle's word re-encoding.
    */
  private lazy val byteCharsLiteral: String =
    Bpe.ByteToChar.map(s => s"chr(${s.codePointAt(0)})").mkString("[", ", ", "]")

  private def encodeCtes(m: Bpe.Model, byteLevel: Boolean): String = {
    // byte level: hex(encode(w)) exposes the UTF-8 bytes; each 2-hex
    // chunk indexes the byte table — the oracle re-derives the byte
    // encoding itself, trusting only the public 256-entry table
    // NOTE: embedded in the outer template BEFORE its stripMargin runs,
    // so no line here may begin with '|' after this inner strip (a
    // leading '||' would get half-eaten by the outer stripMargin)
    val wordSource =
      if (!byteLevel)
        """ini AS (
          |  SELECT w, chr(1) || list_aggregate([s || chr(1)
          |           FOR s IN string_split_regex(w, '')], 'string_agg', '') ||
          |         '</w>' || chr(1) AS s0
          |  FROM wd),""".stripMargin
      else
        s"""bc AS (SELECT $byteCharsLiteral AS t),
           |bw AS (
           |  SELECT w, array_to_string([bc.t[
           |           16 * strpos('0123456789ABCDEF', substring(h, 2*i+1, 1))
           |           - 16 + strpos('0123456789ABCDEF', substring(h, 2*i+2, 1))]
           |           FOR i IN range(0, length(h) // 2)], '') AS bws
           |  FROM (SELECT w, hex(encode(w)) AS h FROM wd), bc),
           |ini AS (
           |  SELECT w, chr(1) || list_aggregate([s || chr(1)
           |           FOR s IN string_split_regex(bws, '')], 'string_agg', '') ||
           |         '</w>' || chr(1) AS s0
           |  FROM bw),""".stripMargin
    s"""WITH RECURSIVE
       |mg AS (
       |  SELECT list(chr(1)||l||chr(1)||r||chr(1) ORDER BY rk) AS pat,
       |         list(chr(1)||l||r||chr(1) ORDER BY rk) AS rep,
       |         count(*) AS nm
       |  FROM (VALUES ${mergesLiteral(m)}) m(rk, l, r)),
       |wd AS (
       |  SELECT DISTINCT unnest([x FOR x IN string_split(text, ' ') IF x <> '']) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |$wordSource
       |enc(w, s) AS (
       |  SELECT w, s0 FROM ini
       |  UNION ALL
       |  SELECT t.w, substr(t.s, 1, strpos(t.s, t.bpat) - 1) || t.brep ||
       |         substr(t.s, strpos(t.s, t.bpat) + length(t.bpat))
       |  FROM (SELECT e.w, e.s, mg.pat[b.best] AS bpat, mg.rep[b.best] AS brep
       |        FROM enc e, mg,
       |          LATERAL (SELECT list_min([i FOR i IN range(1, mg.nm + 1)
       |                                    IF contains(e.s, mg.pat[i])]) AS best) b
       |        WHERE b.best IS NOT NULL) t),
       |wtk AS (
       |  SELECT e.w, [x FOR x IN string_split(e.s, chr(1)) IF x <> ''] AS toks
       |  FROM enc e, mg
       |  WHERE list_min([i FOR i IN range(1, mg.nm + 1)
       |                  IF contains(e.s, mg.pat[i])]) IS NULL),
       |dw AS (
       |  SELECT doc_id, [x FOR x IN string_split(coalesce(text, ''), ' ') IF x <> ''] AS ws
       |  FROM documents),
       |dtk AS (
       |  SELECT t.doc_id, t.i AS pos, t.ws[t.i] AS w
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM dw) t)""".stripMargin
  }

  /** Per-doc subword tokenization report: whitespace vs BPE token
    * counts, the compression they buy (chars per BPE token), and the
    * round-trip flag (decode(encode(text)) reproduces the
    * space-normalized text — lossless-ness checked on every doc, not
    * just in the spec). One training pass + one map-side encode pass.
    * chars_per_tok is floor-quantized (the ε-shifted 1e-6 grid, not
    * rint: half-even vs half-away library semantics would diverge on
    * exact .5 grid hits, e.g. an odd char count over 128 tokens).
    */
  qDyn("text_bpe_tokenize") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainOn(s, d))
    T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val toks = Bpe.encode(text, m, memo)
          val nWs = if (text == null) 0L
            else text.split(" ").count(_.nonEmpty).toLong
          val normalized = if (text == null) ""
            else text.split(" ").filter(_.nonEmpty).mkString(" ")
          // code points, not UTF-16 units — must match DuckDB length()
          val nChars = normalized.codePointCount(0, normalized.length).toLong
          (id, nWs, toks.length.toLong,
            if (toks.isEmpty) 0.0
            else math.floor(nChars.toDouble / toks.length * 1e6 + 0.5000005) / 1e6,
            Bpe.decode(toks) == normalized)
        }
      }
      .toDF("doc_id", "n_tok_ws", "n_tok_bpe", "chars_per_tok", "roundtrip_ok")
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    encodeCtes(trainOn(s, d)) +
      s""",
         |ds AS (
         |  SELECT k.doc_id, CAST(sum(len(t.toks)) AS BIGINT) AS n_bpe,
         |         list_aggregate(flatten(list(t.toks ORDER BY k.pos)),
         |                        'string_agg', '') AS cat
         |  FROM dtk k JOIN wtk t ON t.w = k.w GROUP BY k.doc_id)
         |SELECT w0.doc_id,
         |       CAST(len(w0.ws) AS BIGINT) AS n_tok_ws,
         |       coalesce(s.n_bpe, 0) AS n_tok_bpe,
         |       CASE WHEN coalesce(s.n_bpe, 0) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE floor(CAST(length(array_to_string(w0.ws, ' ')) AS DOUBLE)
         |                   / s.n_bpe * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000
         |       END AS chars_per_tok,
         |       CASE WHEN coalesce(s.n_bpe, 0) = 0
         |            -- len() = 0, NOT = '': array_to_string of an empty
         |            -- list is NULL in DuckDB, and NULL = '' is NULL
         |            -- where the Spark side emits true
         |            THEN len(w0.ws) = 0
         |            ELSE rtrim(replace(s.cat, '</w>', ' '))
         |                   = array_to_string(w0.ws, ' ')
         |       END AS roundtrip_ok
         |FROM dw w0 LEFT JOIN ds s ON s.doc_id = w0.doc_id
         |ORDER BY w0.doc_id""".stripMargin
  }

  /** Tokenizer fertility by language (SPEC: the tokens-per-word /
    * chars-per-token disparity audit every multilingual stack runs —
    * Conneau 2020 §5's sampling law exists because fertility varies by
    * language; a tokenizer trained on a skewed mix bills some
    * languages 2-3× the tokens for the same text). Per lang: docs,
    * words, BPE tokens, chars; fertility = tokens/word, compression =
    * chars/token. Every aggregate is an INTEGER sum (exact at any
    * partitioning), the two ratios are single rounded divisions.
    * Map-side tokenize + one lang-keyed two-phase agg — no new
    * shuffle beyond the ≤|langs| row aggregation.
    *
    * On THIS synthetic corpus every language draws from one shared
    * 31-word vocabulary, so fertility is exactly 1.0 across the board
    * (the 200-merge table fully merges the whole vocab — itself a
    * meaningful audit result: full coverage) while chars_per_token
    * varies by language. The disparity the metric exists to catch —
    * a majority-language-trained tokenizer billing unseen-vocab
    * languages multiple tokens per word — is demonstrated in BpeSpec
    * ("fertility disparity under a skew-trained tokenizer") on a
    * crafted two-language corpus, where it shows 1.0 vs >2.
    */
  qDyn("text_tokenizer_fertility") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainOn(s, d))
    T(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (_, lang, text) =>
          val toks = Bpe.encode(text, m, memo)
          val words = if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          val normalized = words.mkString(" ")
          (lang, 1L, words.length.toLong, toks.length.toLong,
            normalized.codePointCount(0, normalized.length).toLong)
        }
      }
      .toDF("lang", "one", "w", "t", "ch")
      .groupBy("lang")
      .agg(sum("one").as("n_docs"), sum("w").as("n_words"),
        sum("t").as("n_tokens"), sum("ch").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        // empty-text language ⇒ zero denominators: pin 0.0 on both
        // engines (the text_bpe_tokenize guard — Spark's x/0 NULL vs
        // DuckDB's IEEE inf would otherwise fork the hash)
        when(col("n_words") === 0, lit(0.0))
          .otherwise(round(col("n_tokens") * lit(1.0) / col("n_words"), 6))
          .as("fertility"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_chars") * lit(1.0) / col("n_tokens"), 6))
          .as("chars_per_token"))
      .reportSorted("lang")
  } { (s, d) =>
    encodeCtes(trainOn(s, d)) +
      s""",
         |dt AS (
         |  SELECT k.doc_id, CAST(coalesce(sum(len(t.toks)), 0) AS BIGINT) AS n_tok
         |  FROM dtk k JOIN wtk t ON t.w = k.w GROUP BY k.doc_id),
         |pd AS (
         |  SELECT d.lang, CAST(len(w0.ws) AS BIGINT) AS w,
         |         coalesce(dt.n_tok, 0) AS t,
         |         CAST(length(coalesce(array_to_string(w0.ws, ' '), '')) AS BIGINT) AS ch
         |  FROM documents d JOIN dw w0 ON w0.doc_id = d.doc_id
         |  LEFT JOIN dt ON dt.doc_id = d.doc_id)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(w) AS BIGINT) AS n_words,
         |       CAST(sum(t) AS BIGINT) AS n_tokens,
         |       CASE WHEN sum(w) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE round(sum(t) * 1.0 / sum(w), 6) END AS fertility,
         |       CASE WHEN sum(t) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE round(sum(ch) * 1.0 / sum(t), 6) END AS chars_per_token
         |FROM pd GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** The token-budget family parameterized by tokenizer — the same
    * greedy-prefix selection as `pipeline_token_budget` (rank docs per
    * source, keep while the running total fits) but budgeting REAL
    * subword tokens, which is what an actual pretraining mixture
    * meters. Tokenization adds no shuffle: counts are computed
    * map-side, then the ONE source-partitioned window sort the
    * whitespace variant already pays.
    */
  qDyn("pipeline_token_budget_bpe") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainOn(s, d))
    val counted = T(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, src, text) =>
          (id, src, Bpe.encode(text, m, memo).length.toLong)
        }
      }
      .toDF("doc_id", "source", "n_tok")
    val w = Window.partitionBy("source")
      .orderBy(col("n_tok").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= 1000)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum"))
      .orderBy("source", "cum") // kept-docs-sized output
  } { (s, d) =>
    encodeCtes(trainOn(s, d)) +
      s""",
         |cnt AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(coalesce(sum(len(t.toks)), 0) AS BIGINT) AS n_tok
         |  FROM documents d
         |  LEFT JOIN dtk k ON k.doc_id = d.doc_id
         |  LEFT JOIN wtk t ON t.w = k.w
         |  GROUP BY d.doc_id, d.source),
         |r AS (
         |  SELECT doc_id, source, n_tok,
         |         CAST(sum(n_tok) OVER (PARTITION BY source
         |           ORDER BY n_tok DESC, doc_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM cnt)
         |SELECT doc_id, source, n_tok, cum
         |FROM r WHERE cum <= 1000 ORDER BY source, cum""".stripMargin
  }

  /** Byte-level BPE tokenization report (r13 verdict #8 — the GPT-2
    * byte encoder beneath the trained merges, [[Bpe.byteEncode]]):
    * the base alphabet is the CLOSED 256-symbol byte table, so ANY
    * unicode — emoji, CJK, mojibake — tokenizes with zero UNK and
    * round-trips byte-exactly (flag checked on EVERY doc, plus the
    * crafted emoji/CJK fixture in BpeSpec). The oracle re-derives the
    * byte encoding itself from `hex(encode(w))` + the public 256-entry
    * table as a list literal, then replays greedy merging with the
    * byte-trained merge table — the same data-parameterized device as
    * text_bpe_tokenize, one CTE deeper. n_bytes pins the byte length
    * both engines computed the symbols from.
    */
  qDyn("text_bytebpe_tokenize") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainBytesOn(s, d))
    T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val toks = Bpe.encodeBytes(text, m, memo)
          val nWs = if (text == null) 0L
            else text.split(" ").count(_.nonEmpty).toLong
          val normalized = if (text == null) ""
            else text.split(" ").filter(_.nonEmpty).mkString(" ")
          val nBytes = normalized
            .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
          (id, nWs, toks.length.toLong, nBytes,
            Bpe.decodeBytes(toks) == normalized)
        }
      }
      .toDF("doc_id", "n_tok_ws", "n_tok_bbpe", "n_bytes", "roundtrip_ok")
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    encodeCtes(trainBytesOn(s, d), byteLevel = true) +
      s""",
         |ds AS (
         |  SELECT k.doc_id, CAST(sum(len(t.toks)) AS BIGINT) AS n_bbpe,
         |         list_aggregate(flatten(list(t.toks ORDER BY k.pos)),
         |                        'string_agg', '') AS cat,
         |         array_to_string(list(b.bws ORDER BY k.pos), ' ') AS bcat
         |  FROM dtk k JOIN wtk t ON t.w = k.w JOIN bw b ON b.w = k.w
         |  GROUP BY k.doc_id)
         |SELECT w0.doc_id,
         |       CAST(len(w0.ws) AS BIGINT) AS n_tok_ws,
         |       coalesce(s.n_bbpe, 0) AS n_tok_bbpe,
         |       CAST(octet_length(encode(array_to_string(w0.ws, ' ')))
         |            AS BIGINT) AS n_bytes,
         |       CASE WHEN coalesce(s.n_bbpe, 0) = 0
         |            THEN len(w0.ws) = 0
         |            ELSE rtrim(replace(s.cat, '</w>', ' ')) = s.bcat
         |       END AS roundtrip_ok
         |FROM dw w0 LEFT JOIN ds s ON s.doc_id = w0.doc_id
         |ORDER BY w0.doc_id""".stripMargin
  }

  /** Token budget over BYTE-LEVEL BPE counts — the budget row
    * parameterized by the no-UNK tokenizer (what a production corpus
    * budget actually counts: a context window holds byte-level tokens,
    * and exotic-unicode docs cost what they really cost instead of
    * one whitespace word per glyph cluster). Same greedy fill shape as
    * [[pipeline_token_budget_bpe]].
    */
  qDyn("pipeline_token_budget_bytebpe") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainBytesOn(s, d))
    val counted = T(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, src, text) =>
          (id, src, Bpe.encodeBytes(text, m, memo).length.toLong)
        }
      }
      .toDF("doc_id", "source", "n_tok")
    val w = Window.partitionBy("source")
      .orderBy(col("n_tok").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= 1000)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum"))
      .orderBy("source", "cum") // kept-docs-sized output
  } { (s, d) =>
    encodeCtes(trainBytesOn(s, d), byteLevel = true) +
      s""",
         |cnt AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(coalesce(sum(len(t.toks)), 0) AS BIGINT) AS n_tok
         |  FROM documents d
         |  LEFT JOIN dtk k ON k.doc_id = d.doc_id
         |  LEFT JOIN wtk t ON t.w = k.w
         |  GROUP BY d.doc_id, d.source),
         |r AS (
         |  SELECT doc_id, source, n_tok,
         |         CAST(sum(n_tok) OVER (PARTITION BY source
         |           ORDER BY n_tok DESC, doc_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM cnt)
         |SELECT doc_id, source, n_tok, cum
         |FROM r WHERE cum <= 1000 ORDER BY source, cum""".stripMargin
  }

  /** Sequence packing over REAL subword tokens — the third
    * tokenizer-parameterized family member: the same fixed-budget
    * (4096) per-language bin assignment as `pipeline_pack_sequences`,
    * but the running total counts BPE tokens (what actually fills a
    * context window; whitespace counts under-fill bins by the
    * compression ratio). Counts map-side (broadcast model +
    * per-partition memo), then the ONE language-partitioned window
    * cumsum the whitespace variant already pays.
    */
  qDyn("pipeline_pack_sequences_bpe") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainOn(s, d))
    val counted = T(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, lang, text) =>
          (id, lang, Bpe.encode(text, m, memo).length.toLong)
        }
      }
      .toDF("doc_id", "lang", "n_tok")
    val w = Window.partitionBy("lang").orderBy("doc_id")
    counted
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / 4096).as("bin"))
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    encodeCtes(trainOn(s, d)) +
      s""",
         |cnt AS (
         |  SELECT d.doc_id, d.lang,
         |         CAST(coalesce(sum(len(t.toks)), 0) AS BIGINT) AS n_tok
         |  FROM documents d
         |  LEFT JOIN dtk k ON k.doc_id = d.doc_id
         |  LEFT JOIN wtk t ON t.w = k.w
         |  GROUP BY d.doc_id, d.lang)
         |SELECT doc_id, lang, n_tok,
         |       CAST((cum - n_tok) // 4096 AS BIGINT) AS bin
         |FROM (SELECT doc_id, lang, n_tok,
         |             CAST(sum(n_tok) OVER (PARTITION BY lang
         |               ORDER BY doc_id) AS BIGINT) AS cum
         |      FROM cnt) t
         |ORDER BY doc_id""".stripMargin
  }

  /** Document chunking over REAL subword tokens — the second
    * tokenizer-parameterized family member: the same 32-token /
    * stride-24 sliding grid as `pipeline_chunk_documents`, but the
    * window counts BPE tokens (what actually fills a model's context)
    * and the chunk text is the DECODED slice. Chunks may start or end
    * mid-word — token-level slicing is exactly what a pretraining
    * loader does; the end-of-word markers make the decode
    * unambiguous. Tokenize once per doc map-side (broadcast model +
    * per-partition memo), then the grid explode and array slicing are
    * plain codegen'd functions — no shuffle before the output sort.
    */
  qDyn("pipeline_chunk_documents_bpe") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainOn(s, d))
    val toks = T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) => (id, Bpe.encode(text, m, memo)) }
      }
      .toDF("doc_id", "toks")
    toks.withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("st", explode(sequence(lit(0), col("n") - 1, lit(24))))
      .select(col("doc_id"), (col("st") / 24).cast("int").as("chunk_id"),
        size(slice(col("toks"), col("st") + 1, lit(32))).as("n_tok"),
        // decode: concatenate, end-of-word markers become spaces
        rtrim(regexp_replace(
          array_join(slice(col("toks"), col("st") + 1, lit(32)), ""),
          "</w>", " ")).as("chunk"))
      .orderBy("doc_id", "chunk_id") // chunk per 24 input tokens = input-sized
  } { (s, d) =>
    encodeCtes(trainOn(s, d)) +
      s""",
         |dtl AS (
         |  SELECT k.doc_id, flatten(list(t.toks ORDER BY k.pos)) AS toks
         |  FROM dtk k JOIN wtk t ON t.w = k.w GROUP BY k.doc_id),
         |g AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |         unnest(range(0, len(toks), 24)) AS st
         |  FROM dtl WHERE len(toks) > 0)
         |SELECT doc_id, CAST(st // 24 AS INTEGER) AS chunk_id,
         |       CAST(len(list_slice(toks, st + 1, least(st + 32, n))) AS INTEGER) AS n_tok,
         |       rtrim(replace(array_to_string(
         |         list_slice(toks, st + 1, least(st + 32, n)), ''), '</w>', ' ')) AS chunk
         |FROM g ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Unigram-LM tokenizer rows (r12 verdict #6). Same
  // data-parameterized-oracle device as the BPE family: training
  // (Viterbi-EM pruning, unit-pinned in BpeSpec) stays outside SQL;
  // the APPLY — integer-rank Viterbi segmentation — is replayed
  // relationally per distinct word as a recursive-CTE dynamic program.
  // ---------------------------------------------------------------

  /** The ranked piece table as a VALUES literal `(rank, piece)`. */
  private def piecesLiteral(m: graft.functions.Unigram.Model): String =
    if (m.pieces.isEmpty) s"(1, chr(2))"
    else m.pieces.zipWithIndex.map { case (p, i) =>
      s"(${i + 1}, '${p.replace("'", "''")}')"
    }.mkString(", ")

  /** CTE prelude replaying [[graft.functions.Unigram.segScore]]: per
    * DISTINCT word a recursive DP over character positions. The state
    * is the best-score VECTOR so far (a BIGINT list, one packed
    * `n·10⁹ + rankSum` score per prefix length) carried in ONE row per
    * word — each step appends position k's best as a list_min over the
    * ≤ maxLen candidate split points (list comprehension, no
    * aggregation over the recursive reference — the sim_pca device).
    * A 1-char piece is always admissible (vocab rank or the shared
    * UNK rank nm+1), so the candidate list is never empty and every
    * word terminates after length(w) steps. Exposes `utk(w, n_tok,
    * rank_sum)` + the `dw`/`dtk` word-stream CTEs.
    */
  private def unigramCtes(m: graft.functions.Unigram.Model): String =
    s"""WITH RECURSIVE
       |ug AS (SELECT list(p ORDER BY rk) AS ps, count(*) AS nm
       |       FROM (VALUES ${piecesLiteral(m)}) u(rk, p)),
       |wd AS (
       |  SELECT DISTINCT unnest([x FOR x IN string_split(text, ' ') IF x <> '']) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |seg(w, st) AS (
       |  SELECT w, [CAST(0 AS BIGINT)] FROM wd
       |  UNION ALL
       |  SELECT e.w, list_append(e.st, b.sc)
       |  FROM seg e, ug,
       |    LATERAL (SELECT list_min(
       |      [e.st[j + 1] + 1000000000 + CAST(coalesce(
       |         list_position(ug.ps, substr(e.w, j + 1, len(e.st) - j)),
       |         ug.nm + 1) AS BIGINT)
       |       FOR j IN range(greatest(len(e.st) - ${m.maxLen}, 0), len(e.st))
       |       IF list_position(ug.ps, substr(e.w, j + 1, len(e.st) - j)) IS NOT NULL
       |          OR len(e.st) - j = 1]) AS sc) b
       |  WHERE len(e.st) <= length(e.w)),
       |utk AS (
       |  SELECT w, CAST(st[len(st)] // 1000000000 AS BIGINT) AS n_tok,
       |         CAST(st[len(st)] % 1000000000 AS BIGINT) AS rank_sum
       |  FROM seg WHERE len(st) = length(w) + 1),
       |dw AS (
       |  SELECT doc_id, [x FOR x IN string_split(coalesce(text, ''), ' ') IF x <> ''] AS ws
       |  FROM documents),
       |dtk AS (
       |  SELECT t.doc_id, t.i AS pos, t.ws[t.i] AS w
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM dw) t)""".stripMargin

  /** Per-doc unigram-LM tokenization report beside
    * [[text_bpe_tokenize]]: whitespace vs unigram piece counts, the
    * exact integer rank_sum (the Viterbi objective's second component
    * — unique even where the optimal segmentation is not), and
    * chars-per-piece on the same ε-shifted floor grid as the BPE row.
    * One training pass (memoized, shared vocab job with BPE) +
    * map-side Viterbi with a per-partition word memo — tokenization
    * adds no shuffle.
    */
  qDyn("text_unigram_tokenize") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainUnigram(s, d))
    T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          val ws = if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          var n = 0L
          var rs = 0L
          ws.foreach { w =>
            val sc = memo.getOrElseUpdate(w, graft.functions.Unigram.segScore(w, m))
            n += sc / graft.functions.Unigram.Radix
            rs += sc % graft.functions.Unigram.Radix
          }
          val normalized = ws.mkString(" ")
          val nChars = normalized.codePointCount(0, normalized.length).toLong
          (id, ws.length.toLong, n, rs,
            if (n == 0) 0.0
            else math.floor(nChars.toDouble / n * 1e6 + 0.5000005) / 1e6)
        }
      }
      .toDF("doc_id", "n_tok_ws", "n_tok_uni", "rank_sum", "chars_per_tok")
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    unigramCtes(trainUnigram(s, d)) +
      s""",
         |agg AS (
         |  SELECT k.doc_id, CAST(sum(t.n_tok) AS BIGINT) AS n_uni,
         |         CAST(sum(t.rank_sum) AS BIGINT) AS rs
         |  FROM dtk k JOIN utk t ON t.w = k.w GROUP BY k.doc_id)
         |SELECT w0.doc_id,
         |       CAST(len(w0.ws) AS BIGINT) AS n_tok_ws,
         |       coalesce(a.n_uni, 0) AS n_tok_uni,
         |       coalesce(a.rs, 0) AS rank_sum,
         |       CASE WHEN coalesce(a.n_uni, 0) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE floor(CAST(length(array_to_string(w0.ws, ' ')) AS DOUBLE)
         |                   / a.n_uni * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000
         |       END AS chars_per_tok
         |FROM dw w0 LEFT JOIN agg a ON a.doc_id = w0.doc_id
         |ORDER BY w0.doc_id""".stripMargin
  }

  /** Token-budget selection parameterized by the UNIGRAM tokenizer —
    * the fourth tokenizer-parameterized family member (whitespace /
    * BPE / unigram all meter the same greedy-prefix budget): rank docs
    * per source by unigram piece count, keep while the running total
    * fits 1000. Same one-window shape as the BPE row.
    */
  qDyn("pipeline_token_budget_unigram") { (s, d) =>
    import s.implicits._
    val model = s.sparkContext.broadcast(trainUnigram(s, d))
    val counted = T(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = model.value
        val memo = mutable.HashMap.empty[String, Long]
        it.map { case (id, src, text) =>
          val ws = if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          var n = 0L
          ws.foreach { w =>
            n += memo.getOrElseUpdate(w,
              graft.functions.Unigram.segScore(w, m)) / graft.functions.Unigram.Radix
          }
          (id, src, n)
        }
      }
      .toDF("doc_id", "source", "n_tok")
    val w = Window.partitionBy("source")
      .orderBy(col("n_tok").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= 1000)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum"))
      .orderBy("source", "cum") // kept-docs-sized output
  } { (s, d) =>
    unigramCtes(trainUnigram(s, d)) +
      s""",
         |cnt AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(coalesce(sum(t.n_tok), 0) AS BIGINT) AS n_tok
         |  FROM documents d
         |  LEFT JOIN dtk k ON k.doc_id = d.doc_id
         |  LEFT JOIN utk t ON t.w = k.w
         |  GROUP BY d.doc_id, d.source),
         |r AS (
         |  SELECT doc_id, source, n_tok,
         |         CAST(sum(n_tok) OVER (PARTITION BY source
         |           ORDER BY n_tok DESC, doc_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM cnt)
         |SELECT doc_id, source, n_tok, cum
         |FROM r WHERE cum <= 1000 ORDER BY source, cum""".stripMargin
  }
}

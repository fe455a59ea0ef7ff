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
  * No DuckDB oracle can replay iterative BPE merging → rows-only by
  * design; the algorithmic contracts (determinism, round-trip,
  * Sennrich's worked merge sequence, budget-monotonicity vs the
  * whitespace variant) are pinned in BpeSpec.
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
    * rebuilds the identical merge table.
    */
  private def trainOn(s: SparkSession, d: String): Bpe.Model = {
    val vocab = T(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(TrainVocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.train(vocab, NumMerges)
  }

  /** Per-doc subword tokenization report: whitespace vs BPE token
    * counts, the compression they buy (chars per BPE token), and the
    * round-trip flag (decode(encode(text)) reproduces the
    * space-normalized text — lossless-ness checked on every doc, not
    * just in the spec). One training pass + one map-side encode pass.
    */
  qRowsOnly("text_bpe_tokenize") { (s, d) =>
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
          val nChars = normalized.length.toLong
          (id, nWs, toks.length.toLong,
            if (toks.isEmpty) 0.0
            else math.rint(nChars.toDouble / toks.length * 1e6) / 1e6,
            Bpe.decode(toks) == normalized)
        }
      }
      .toDF("doc_id", "n_tok_ws", "n_tok_bpe", "chars_per_tok", "roundtrip_ok")
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** The token-budget family parameterized by tokenizer — the same
    * greedy-prefix selection as `pipeline_token_budget` (rank docs per
    * source, keep while the running total fits) but budgeting REAL
    * subword tokens, which is what an actual pretraining mixture
    * meters. Tokenization adds no shuffle: counts are computed
    * map-side, then the ONE source-partitioned window sort the
    * whitespace variant already pays.
    */
  qRowsOnly("pipeline_token_budget_bpe") { (s, d) =>
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
  qRowsOnly("pipeline_pack_sequences_bpe") { (s, d) =>
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
  qRowsOnly("pipeline_chunk_documents_bpe") { (s, d) =>
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
  }
}

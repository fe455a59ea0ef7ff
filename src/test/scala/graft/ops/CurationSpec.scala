package graft.ops

import graft.{Sessions, SparkEntry, T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-formulation cross-checks for the round-11 curation-QA
  * rows: each registry query is recomputed driver-side (plain Scala
  * over the collected sf0.001 slice, naive algorithm form) so a shared
  * bug in the scalable formulation can't self-confirm. The key checks:
  * ts_page_cusum's prefix-sum closed form against the textbook
  * per-row recurrence, and pref_bradley_terry's grid-join wins matrix
  * against a naive all-pairs loop.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.build("local[4]", "4")

  private val dir = "/root/testdata/sf0.001"

  test("dq_cohen_kappa matches a driver-side 2x2 recomputation") {
    val perDoc = T(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = Option(r.getString(1)).getOrElse("")
          .split(" ").filter(_.nonEmpty)
        (toks.length >= 50,
          toks.nonEmpty && 2L * toks.distinct.length >= toks.length)
      }
    val n = perDoc.length.toDouble
    val na = perDoc.count(_._1)
    val nb = perDoc.count(_._2)
    val agree = perDoc.count(p => p._1 == p._2)
    val po = agree / n
    val pe = (na / n) * (nb / n) + ((n - na) / n) * ((n - nb) / n)
    val kappa = (po - pe) / (1 - pe)
    val got = SparkEntry.queries("dq_cohen_kappa")(spark, dir).collect()(0)
    assert(got.getLong(0) == perDoc.length)
    assert(got.getLong(1) == na && got.getLong(2) == nb && got.getLong(3) == agree)
    assert(math.abs(got.getDouble(6) - kappa) < 1e-6)
    // both raters actually vary on this corpus — otherwise the test is vacuous
    assert(na > 0 && na < perDoc.length && nb > 0 && nb < perDoc.length)
  }

  test("dq_krippendorff_alpha matches a driver-side recomputation; " +
      "abstentions drop units instead of voting 0") {
    // driver recompute on the real slice (no empty docs here, so all
    // units are doubly-rated — the α value itself is the check)
    val perDoc = T(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = Option(r.getString(1)).getOrElse("")
          .split(" ").filter(_.nonEmpty)
        (toks.length >= 50,
          if (toks.isEmpty) None
          else Some(2L * toks.distinct.length >= toks.length))
      }
    def alphaOf(units: Array[(Boolean, Boolean)]): (Long, Long, Double) = {
      val n = units.length
      val ndis = units.count(p => p._1 != p._2)
      val n1 = units.count(_._1) + units.count(_._2)
      val n0 = 2L * n - n1
      val nn = 2.0 * n
      val dE = (n1 / nn) * (n0 / (nn - 1)) * 2
      (n.toLong, ndis.toLong, 1.0 - (ndis.toDouble / n) / dE)
    }
    val rated = perDoc.collect { case (a, Some(b)) => (a, b) }
    val (n, ndis, alpha) = alphaOf(rated)
    val got = SparkEntry.queries("dq_krippendorff_alpha")(spark, dir).collect()(0)
    assert(got.getLong(0) == n && got.getLong(1) == ndis)
    assert(math.abs(got.getDouble(4) - alpha) < 1e-6)
    assert(ndis > 0, "gates must actually disagree somewhere or the test is vacuous")
    // crafted corpus WITH abstentions: 3 empty-text docs must DROP from
    // n_units (α semantics) — under κ they'd be forced 0-votes
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_alphaprobe").toString
    val many = "w1 " * 60 // 60 tokens, 1 type: A keeps, B rejects → disagree
    val docs =
      (1 to 4).map(i => (i.toLong, many.trim, "en", "s", 180L)) ++
        (5 to 8).map(i => (i.toLong, "a b c", "en", "s", 5L)) ++ // both reject/keep? A:no B:yes → disagree
        (9 to 11).map(i => (i.toLong, "", "en", "s", 0L)) // abstain
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val probe = SparkEntry.queries("dq_krippendorff_alpha")(spark, dir2).collect()(0)
    assert(probe.getLong(0) == 8, s"empty docs must be excluded, n=${probe.getLong(0)}")
    val refRatings = Array.fill(4)((true, false)) ++ Array.fill(4)((false, true))
    val (_, _, refAlpha) = alphaOf(refRatings)
    assert(math.abs(probe.getDouble(4) - refAlpha) < 1e-6)
    assert(probe.getDouble(4) < 0.0,
      "all-disagree units must drive alpha below zero (worse than chance)")
  }

  test("ts_page_cusum closed form equals the textbook max(0, s + x - k) recurrence") {
    val rows = T(spark, dir, "events")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        math.round(r.getDouble(3) * 100)))
    val kc = rows.map(_._4).sum / rows.length // integral floor division
    val got = SparkEntry.queries("ts_page_cusum")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == rows.map(_._1).distinct.length)
    rows.groupBy(_._1).foreach { case (uid, es) =>
      var s = 0L
      var mx = 0L
      var alarms = 0L
      var first = Option.empty[Long]
      es.sortBy(e => (e._3, e._2)).foreach { case (_, eid, _, cents) =>
        s = math.max(0L, s + cents - kc) // the naive sequential fold
        mx = math.max(mx, s)
        if (s >= 25000) { alarms += 1; if (first.isEmpty) first = Some(eid) }
      }
      val r = got(uid)
      assert(r.getLong(1) == es.length, s"user $uid n_events")
      assert(r.getDouble(2) == mx.toDouble / 100, s"user $uid cusum_max")
      assert(r.getLong(3) == alarms, s"user $uid n_alarms")
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == first,
        s"user $uid first_alarm_event")
    }
    // the alarm path fires for someone and not everyone
    val alarmUsers = got.values.count(_.getLong(3) > 0)
    assert(alarmUsers > 0 && alarmUsers < got.size)
  }

  test("dq_mutual_information matches driver-side plain-math MI and its bounds") {
    val cells = T(spark, dir, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = cells.length.toDouble
    val cl = cells.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val cs = cells.groupBy(_._2).map { case (k, v) => k -> v.length.toDouble }
    val mi = cells.groupBy(identity).map { case ((l, s), v) =>
      (v.length / n) * math.log(v.length * n / (cl(l) * cs(s)))
    }.sum
    val hl = -cl.values.map(c => (c / n) * math.log(c / n)).sum
    val hs = -cs.values.map(c => (c / n) * math.log(c / n)).sum
    val got = SparkEntry.queries("dq_mutual_information")(spark, dir).collect()(0)
    assert(got.getLong(0) == cells.length)
    assert(math.abs(got.getDouble(1) - mi) < 1e-5)
    assert(math.abs(got.getDouble(2) - hl) < 1e-5)
    assert(math.abs(got.getDouble(3) - hs) < 1e-5)
    // information-theoretic sanity: 0 <= MI <= min(H_lang, H_source)
    assert(got.getDouble(1) >= -1e-6 && got.getDouble(1) <= math.min(hl, hs) + 1e-6)
    assert(math.abs(got.getDouble(4) - mi / math.sqrt(hl * hs)) < 1e-4)
  }

  test("pref_bradley_terry wins matrix equals a naive all-pairs loop; fit is a distribution") {
    val docs = T(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .flatMap { r =>
        val toks = Option(r.getString(3)).getOrElse("")
          .split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some((r.getString(1), r.getString(2),
          20L * toks.distinct.length / toks.length))
      }
    // naive quadratic wins count (the formulation the grid join avoids)
    val wins = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    for {
      a <- docs; b <- docs
      if a._1 == b._1 && a._2 != b._2 && a._3 > b._3
    } wins((a._2, b._2)) += 1
    val got = SparkEntry.queries("pref_bradley_terry")(spark, dir).collect()
    val bySrc = got.map(r => r.getString(0) -> r).toMap
    val wTot = wins.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    bySrc.foreach { case (src, r) =>
      assert(r.getLong(1) == wTot.getOrElse(src, 0L), s"wins of $src")
      val g = wins.collect { case ((a, b), n) if a == src || b == src => n }.sum
      assert(r.getLong(2) == g, s"games of $src")
    }
    // strengths normalize to ~1 and ranks are the dense 1..S order
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    assert(got.map(_.getLong(4)).sorted.toSeq == (1L to got.length).toSeq)
    val sorted = got.sortBy(r => (-r.getDouble(3), r.getString(0)))
    assert(sorted.map(_.getLong(4)).toSeq == (1L to got.length).toSeq)
  }

  test("lz78Phrases pins the textbook parses") {
    // Ziv & Lempel 1978 worked shapes: phrase = longest known prefix + 1 char
    assert(CurationOps.lz78Phrases("aaaaa")._2 == 3) // a | aa | aa(tail)
    assert(CurationOps.lz78Phrases("abab")._2 == 3) // a | b | ab
    assert(CurationOps.lz78Phrases("abcd")._2 == 4) // all fresh
    assert(CurationOps.lz78Phrases("")._2 == 0)
    assert(CurationOps.lz78Phrases(null)._2 == 0)
    assert(CurationOps.lz78Phrases("aaaaaaaa")._2 == 4) // a|aa|aaa|aa(tail)
    // repetitive text parses into fewer phrases than diverse text
    val rep = "ab" * 60
    val div = (0 until 120).map(i => ('a' + i % 26).toChar).mkString
    assert(CurationOps.lz78Phrases(rep)._2 < CurationOps.lz78Phrases(div)._2)
  }

  test("lz78Phrases property: matches a naive no-prefix-closure reimplementation") {
    // independent second implementation: longest match by scanning the
    // WHOLE dictionary per step (no reliance on prefix-closure probing),
    // so a bug in the incremental hash-set extension can't self-confirm
    def naive(text: String): Int = {
      if (text == null || text.isEmpty) return 0
      val s = text.take(240)
      var dict = Vector.empty[String]
      var pos = 0
      var n = 0
      while (pos < s.length) {
        val bl = dict.filter(w => s.startsWith(w, pos)).map(_.length)
          .foldLeft(0)(math.max)
        if (pos + bl < s.length) { dict :+= s.substring(pos, pos + bl + 1); pos += bl + 1 }
        else pos = s.length
        n += 1
      }
      n
    }
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    (0 until 300).foreach { i =>
      val s = gen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong))
      assert(CurationOps.lz78Phrases(s)._2 == naive(s), s"input: '$s'")
      // the NATIVE expression the registered query runs (Lz78Stats)
      // agrees with both driver-side formulations on every sample
      val st = graft.functions.Lz78Stats.stats(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 240)
      assert(st.getInt(1) == naive(s) &&
        st.getInt(0) == CurationOps.lz78Phrases(s)._1, s"native: '$s'")
    }
  }

  test("ts_page_cusum property: reflection closed form equals the recurrence on random walks") {
    // the identity s_t = S_t - min(0, min_{j<=t} S_j) vs the textbook
    // fold, on adversarial random deltas (sign-mixed, zero runs)
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(-50L, 50L))
    (0 until 300).foreach { i =>
      val ds = gen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(1000L + i))
      var s = 0L
      val naive = ds.map { d => s = math.max(0L, s + d); s }
      var ps = 0L
      var runmin = 0L
      val closed = ds.map { d =>
        ps += d; runmin = math.min(runmin, ps); ps - math.min(0L, runmin)
      }
      assert(naive == closed, s"deltas: $ds")
    }
  }

  test("text_lz_complexity ranks repetitive docs below diverse docs on the corpus") {
    val got = SparkEntry.queries("text_lz_complexity")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nc, np) = (r.getLong(1), r.getInt(2))
      assert(np <= nc, s"doc ${r.getLong(0)}: phrases cannot exceed chars")
      if (nc > 0) assert(np > 0)
    }
    // the signal varies across the corpus (not a constant column)
    assert(got.map(_.getDouble(3)).distinct.length > 1)
  }
}

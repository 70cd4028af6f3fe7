package graft

import graft.operators.TextPolicy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction and contamination detection behavior + plan shape. */
class TextPolicySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextPolicy.redactPii(col("t")).as("r"))
      .head().getString(0)
  }

  test("redacts emails, SSNs, phones, and IPv4s; leaves clean text alone") {
    assert(redact("mail bob.smith+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("ssn 123-45-6789 on file") == "ssn <SSN> on file")
    assert(redact("call +1 555-0142 today") == "call <PHONE> today")
    assert(redact("host 192.168.10.7 down") == "host <IP> down")
    assert(redact("all clear, nothing sensitive here") ==
      "all clear, nothing sensitive here")
    // several kinds in one string, replaced independently
    assert(redact("a@b.io at 10.0.0.1 ssn 111-22-3333") ==
      "<EMAIL> at <IP> ssn <SSN>")
  }

  test("version-ish dotted numbers of fewer than four octets survive") {
    assert(redact("release 3.11.4 is out") == "release 3.11.4 is out")
  }

  test("contamination probes the training corpus with a broadcast of the benchmark side") {
    val df = TextPolicy.contamination(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingles must broadcast; plan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty, "synthetic corpus must produce shared 5-gram pairs")
    assert(rows.forall(r => r.getAs[Long]("train_id") >= 20 &&
      r.getAs[Long]("bench_id") < 20))
  }

  test("repetition signals match hand-computed Gopher fractions") {
    val rows = TextPolicy.repetitionSignals(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // recompute doc 0 by hand from the raw text
    val text = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val ws = text.trim.toLowerCase.split("\\s+").toSeq
    val dupFrac = (ws.size - ws.distinct.size).toDouble / ws.size
    val bigrams = ws.sliding(2).map(_.mkString(" ")).toSeq
    val (topBg, topCnt) = bigrams.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy { case (bg, c) => (-c, bg) }.head
    val row = rows(0L)
    assert(row.getAs[Long]("n_words") == ws.size.toLong)
    assert(math.abs(row.getAs[Double]("dup_word_frac") - dupFrac) < 1e-3)
    assert(row.getAs[String]("top_bigram") == topBg)
    val expectFrac = math.min(1.0, topCnt.toDouble * topBg.length / text.length)
    assert(math.abs(row.getAs[Double]("top_bigram_char_frac") - expectFrac) < 1e-3)
    // the synthetic word-soup corpus is highly repetitive — the signal must
    // actually discriminate (non-constant across docs)
    val fracs = rows.values.map(_.getAs[Double]("dup_word_frac")).toSet
    assert(fracs.size > 10, s"dup_word_frac is near-constant: $fracs")
  }

  test("mixture sampling hits each source's recipe rate with a deterministic coin") {
    val rows = graft.operators.TextAnalysis.mixtureSample(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (target, achieved) =
        (r.getAs[Double]("target_rate"), r.getAs[Double]("achieved_rate"))
      val n = r.getAs[Long]("n_total")
      // the md5 coin is uniform: achieved rate within 4 sigma of target
      val sigma = math.sqrt(target * (1 - target) / n)
      assert(math.abs(achieved - target) < 4 * sigma + 0.02,
        s"source ${r.getAs[String]("source")}: achieved $achieved vs target $target (n=$n)")
    }
    // deterministic: a second run is bit-identical
    val again = graft.operators.TextAnalysis.mixtureSample(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("boilerplate flags documents dominated by cross-corpus frequent shingles") {
    import spark.implicits._
    // 6 docs share the 4-token header ("subscribe to our newsletter" -> two
    // frequent 3-grams); d10 is ONLY the header (coverage 1.0), the others
    // carry enough unique tail that coverage stays under the 0.5 threshold.
    // d20 has no shingles at all (2 tokens).
    val docs = ((1 to 5).map(i =>
      (i.toLong, s"subscribe to our newsletter item$i alpha$i beta$i gamma$i delta$i")) :+
      (10L, "subscribe to our newsletter") :+
      (20L, "short doc")).toDF("doc_id", "text")
    val res = TextPolicy.boilerplateFlags(docs, 3, 2, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // top-2 by doc frequency (6 docs each): the two header 3-grams
    assert(res(10L) == ((2L, 2L, 1.0, true)), s"got ${res(10L)}")
    // tail docs: 9 tokens -> 7 shingles, 2 boiler -> 0.2857, unflagged
    (1 to 5).foreach { i =>
      val (n, b, cov, fl) = res(i.toLong)
      assert(n == 7L && b == 2L && cov == 0.2857 && !fl, s"doc $i: ${res(i.toLong)}")
    }
    assert(res(20L) == ((0L, 0L, 0.0, false)))
  }

  test("perplexity: common text scores lower NLL than rare text, OOV counted") {
    import spark.implicits._
    // vocab=2 keeps {the, cat}; "zq" and "xv" are OOV. Corpus: 4x the,
    // 2x cat, 1x zq, 1x xv -> total 8, smoothing denom 8 + 2 + 1 = 11.
    val docs = Seq(
      (1L, "the cat the cat"), // all in-vocab
      (2L, "the zq xv the")    // half OOV
    ).toDF("doc_id", "text")
    val res = TextPolicy.perplexityScores(docs, vocab = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3)))).toMap
    val nllThe = -math.log(5.0 / 11.0) // cnt 4 + 1
    val nllCat = -math.log(3.0 / 11.0)
    val nllOov = -math.log(1.0 / 11.0)
    def r4(x: Double) = BigDecimal(x + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(1L) == ((4L, r4((2 * nllThe + 2 * nllCat) / 4), 0L)),
      s"got ${res(1L)}")
    assert(res(2L) == ((4L, r4((2 * nllThe + 2 * nllOov) / 4), 2L)),
      s"got ${res(2L)}")
    assert(res(2L)._2 > res(1L)._2, "OOV-heavy doc must score higher NLL")
  }

  test("url canonicalization: case, fragments, and tracking params") {
    import spark.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM/A?utm_source=x&ref=1#frag",
        "https://www.ex.com/A?ref=1", "ex.com"),
      ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p", "ex.com"),
      ("http://sub.ex.com/p?ref=1&gclid=zz", "http://sub.ex.com/p?ref=1",
        "sub.ex.com"),
      ("https://ex.com/plain", "https://ex.com/plain", "ex.com"),
      // boundary anchoring: a param whose name merely CONTAINS a tracking
      // name must survive intact (unanchored regex fabricated '?easy')
      ("https://ex.com/p?easygclid=keepme&x=1",
        "https://ex.com/p?easygclid=keepme&x=1", "ex.com"),
      // consecutive tracking params: both strip, debris collapses
      ("https://ex.com/p?utm_a=1&utm_b=2&ref=3&gclid=4",
        "https://ex.com/p?ref=3", "ex.com"),
      // tracking aliases that defeated the old case-sensitive single-run
      // match: uppercase UTM_SOURCE and GA4's multi-underscore name
      ("https://ex.com/p?UTM_SOURCE=x&ref=1",
        "https://ex.com/p?ref=1", "ex.com"),
      ("https://ex.com/p?utm_source_platform=web&ref=1",
        "https://ex.com/p?ref=1", "ex.com"),
      // scheme-less / malformed input passes through UNCHANGED (the old
      // behavior collapsed it to '://', whose '' domain never matched the
      // blocklist)
      ("/relative/path?utm_source=x", "/relative/path?utm_source=x", ""),
      ("not a url", "not a url", ""))
    // NOTE: path case is preserved — only scheme+host lowercase
    val df = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val res = df.select(col("id"),
        TextPolicy.canonicalizeUrl(col("url")).as("c"))
      .withColumn("d", TextPolicy.urlDomain(col("c")))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    cases.zipWithIndex.foreach { case ((raw, canon, dom), i) =>
      assert(res(i.toLong) == ((canon, dom)),
        s"$raw -> ${res(i.toLong)}, expected ($canon, $dom)")
    }
  }

  test("hygiene funnel: stages conserve the corpus and attribute first failure") {
    import spark.implicits._
    val docs = Seq(
      // el/la/de markers dominate -> dropped at a_lang even though the
      // quality floor would ALSO fail it: first failing stage owns the doc
      (1L, "el la de que el la de que"),
      // english markers, quality >= 0.5 (long enough, stopwords, no punct
      // flood), distinct words -> kept
      (2L, "the cat and dog of the house is happy with all the good things around here today"),
      // english but degenerate repetition -> c_repetition
      (3L, "the the the the the the the the the the the the the the the the"),
      // exact duplicate of doc 2 (same fingerprint) -> d_fingerprint_dup
      (4L, "the cat and dog of the house is happy with all the good things around here today"))
      .toDF("doc_id", "text")
    val res = TextPolicy.hygieneFunnel(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(res.values.map(_._1).sum == 4, s"funnel must conserve: $res")
    assert(res("a_lang") == ((1L, 1L)), s"got $res")
    assert(res("c_repetition") == ((1L, 3L)), s"got $res")
    assert(res("d_fingerprint_dup") == ((1L, 4L)), s"got $res")
    assert(res("kept") == ((1L, 2L)), s"got $res")
  }

  test("hygiene funnel: a dropped twin cannot eliminate the surviving copy") {
    import spark.implicits._
    // doc 0 and doc 2 share a fingerprint (normalization strips the
    // punctuation flood) but doc 0 fails the quality floor. The dedup rank
    // must count only survivors of the earlier stages: ranking the whole
    // corpus would hand keep-first to the dropped doc 0 and drop doc 2 as
    // its dup — leaving NO copy of the content in the kept set.
    val base = "the cat and dog of the house is happy with all the good " +
      "things around here today"
    val docs = Seq(
      (0L, base.split(" ").mkString("!!! ", "!!! ", "!!!")), // punct flood
      (2L, base)).toDF("doc_id", "text")
    val staged = TextPolicy.hygieneStaged(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    // the flood drops doc 0 at a PRE-dedup stage (a_lang here: '!'-glued
    // tokens stop matching the language markers) — which stage doesn't
    // matter, only that it is before the dedup rank
    assert(Set("a_lang", "b_quality")(staged(0L)), s"got $staged")
    assert(staged(2L) == "kept",
      s"survivor must keep despite the dropped lower-id twin: $staged")
  }

  test("hygiene funnel: empty-fingerprint docs are not mutual duplicates") {
    import spark.implicits._
    // whitespace/punct-only texts all normalize to fingerprint '' — under
    // a raw fingerprint partition they would be attributed mutual dups on
    // ONE hot key; the per-doc fallback key must keep them independent
    val docs = Seq(
      (1L, "!!! ??? ..."),
      (2L, "...   !!!"),
      (3L, "the cat and dog of the house is happy with all the good things around here today"))
      .toDF("doc_id", "text")
    val staged = TextPolicy.hygieneStaged(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    // docs 1-2 fail pre-dedup gates (punct-only text has no language
    // markers), but neither may ever be d_fingerprint_dup of the other
    assert(!staged.values.exists(_ == "d_fingerprint_dup"),
      s"empty fingerprints must not dedup against each other: $staged")
    assert(staged(3L) == "kept", s"got $staged")
  }

  test("cross-batch dedup reads the checkpointed fingerprint — zero " +
    "re-evaluations in the batch plan (r16)") {
    import spark.implicits._
    val base = "the cat and dog of the house is happy with all the good " +
      "things around here today"
    val docs = Seq(
      (1L, base),                          // fp already in the prior store
      (2L, base + " plus fresh tail here"), // new content, keeps
      (3L, "!!! ??? ..."))                  // empty fingerprint: never x-batch
      .toDF("doc_id", "text")
    val prior = Seq(
      base.toLowerCase.replaceAll("[^a-z0-9]", "").take(320))
      .toDF("fp")
    val (staged, signals) =
      TextPolicy.hygieneStagedCheckpointed(docs, Some(prior))
    // the prior-store join must read _fp_raw OFF the checkpointed signal
    // frame — a recomputed fingerprint would surface as a regexp_replace
    // in the post-checkpoint plan (the r15 double-eval this closes)
    val plan = staged.queryExecution.optimizedPlan.toString
    assert(!plan.contains("regexp_replace"),
      s"fingerprint re-evaluated downstream of the signal checkpoint:\n$plan")
    val got = staged.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    // semantics unchanged vs the lazy form
    val lazyGot = TextPolicy.hygieneStaged(docs, Some(prior)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    assert(got == lazyGot, s"checkpointed $got != lazy $lazyGot")
    assert(got(1L) == "e_cross_batch_dup", s"got $got")
    assert(got(2L) == "kept", s"got $got")
    assert(got(3L) != "e_cross_batch_dup",
      s"empty fingerprint must not cross-batch dedup: $got")
    graft.functions.releaseCheckpoint(signals)
  }

  test("semantic dedup: keepers are the min-id member of each near-dup cluster") {
    val rows = graft.operators.Dedup
      .semanticDedup(spark, "/root/testdata/sf0.001", threshold = 0.35)
      .collect()
    assert(rows.nonEmpty, "threshold 0.35 must produce clusters on the driver corpus")
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (comp, members) =>
      val ids = members.map(_.getAs[Long]("vec_id"))
      assert(ids.min == comp, s"component label $comp != min id ${ids.min}")
      val keepers = members.filter(_.getAs[Boolean]("is_keeper"))
      assert(keepers.map(_.getAs[Long]("vec_id")).toSeq == Seq(comp),
        s"exactly the min-id member keeps; got ${keepers.toSeq}")
      assert(ids.length >= 2, s"singleton component $comp should not appear")
    }
  }

  test("semantic dedup: a mega-bucket of identical embeddings stays ONE " +
    "component under the salted chain+star candidate generation") {
    import spark.implicits._
    // identical embeddings collapse into one sign bucket in EVERY band —
    // SemDeDup's exact target shape. The salted form (vec_id % 64 sub-
    // groups + per-salt anchor chain) must keep the bucket connected:
    // one component, min-id keeper. Ids are sparse and non-contiguous so
    // the modulo scatters them across many salts.
    val base = (0 until 32).map(i => math.sin(i * 1.7).toFloat).toArray
    val vecs = (0 until 500).map(i => (i * 37L + 5, base))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Dedup.semanticDedup(vecs, threshold = 0.9)
      .collect()
    assert(out.length == 500, s"all members cluster; got ${out.length}")
    val minId = out.map(_.getAs[Long]("vec_id")).min
    assert(out.map(_.getAs[Long]("component")).distinct.toSeq == Seq(minId),
      "salting must not fragment the identical-embedding bucket")
    assert(out.count(_.getAs[Boolean]("is_keeper")) == 1)
  }

  test("bigram LM perplexity: hand-computed NLL, OOV degradation, short-doc " +
    "neutrality, fluency ordering (CCNet shape, r14)") {
    import spark.implicits._
    // reference "a b a b a": uni a=3 b=2 (T=5, V=2); bi (a,b)=2 (b,a)=2
    val ref = Seq((100L, "a b a b a")).toDF("doc_id", "text")
    val lm = graft.operators.TextPolicy.bigramLmTrain(ref)
    val docs = Seq(
      (1L, "a b"), // seen bigram: ln((2 + (2+1)/7) / (3+1))
      (2L, "z z"), // fully OOV:   ln((0 + (0+1)/7) / (0+1)) = ln(1/7)
      (3L, "a")) // no bigrams -> neutral
      .toDF("doc_id", "text")
    val out = graft.operators.TextPolicy.bigramPerplexity(docs, lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def q(term: Double): Double = // the op's micro-quantization + round4
      BigDecimal(-math.round(term * 1e6 + 1e-3) / 1e6 + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 1L)
    assert(out(1L)._2 == q(math.log((2.0 + 3.0 / 7.0) / 4.0)), s"$out")
    assert(out(2L)._1 == 1L)
    assert(out(2L)._2 == q(math.log(1.0 / 7.0)), s"$out")
    assert(out(3L) == (0L, 0.0), s"$out")
    // fluency ordering: the reference-like doc beats the OOV doc
    assert(out(1L)._2 < out(2L)._2)
  }

  test("classifier AUC: separable corpus scores 1.0, all-tied scores " +
    "exactly 0.5 by average-rank construction (r14)") {
    import spark.implicits._
    val separable = (
      (1 to 6).map(i => (i.toLong, "cur", "insight wisdom clarity depth")) ++
        (7 to 12).map(i => (i.toLong, "raw", "spam junk noise clickbait")))
      .toDF("doc_id", "source", "text")
    val a = graft.operators.TextPolicy
      .classifierAuc(separable, Seq("cur"), 9.0).collect().head
    assert(a.getAs[Long]("n_pos") == 6 && a.getAs[Long]("n_neg") == 6)
    assert(a.getAs[Double]("auc") == 1.0, s"$a")
    // identical text everywhere -> one tied score group -> AUC 0.5 exactly
    val tied = (1 to 10).map(i =>
      (i.toLong, if (i <= 4) "cur" else "raw", "same words every time"))
      .toDF("doc_id", "source", "text")
    val t = graft.operators.TextPolicy
      .classifierAuc(tied, Seq("cur"), 9.0).collect().head
    assert(t.getAs[Double]("auc") == 0.5, s"$t")
  }

  test("decontamination apply: a verbatim benchmark 5-gram marks the doc, " +
    "clean docs keep, minShared thresholds (r14)") {
    import spark.implicits._
    val bench = Seq(
      (900L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val train = Seq(
      // copies one benchmark 5-gram run ("quick brown fox jumps over")
      (1L, "story begins and quick brown fox jumps over everything else entirely"),
      // shares words but never five in a row
      (2L, "the brown quick fox never jumps while the dog stays lazy"),
      // copies a LONG run -> many shared 5-grams
      (3L, "prefix words the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextPolicy.decontaminate(train, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && out(1L)._1 >= 1, s"$out")
    assert(!out(2L)._2 && out(2L)._1 == 0, s"$out")
    assert(out(3L)._2 && out(3L)._1 > out(1L)._1, s"$out")
    // a higher minShared keeps the single-collision doc
    val strict = graft.operators.TextPolicy
      .decontaminate(train, bench, minShared = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!strict(1L) && strict(3L), s"$strict")
  }

  test("decontamination agrees with the pairwise contamination report at " +
    "minShared=1 on the driver corpus (r14 cross-op consistency)") {
    // any-shared-shingle marking == appearing in ANY (train, bench) pair:
    // the apply op and the report must never disagree about WHO is dirty
    val sf = "/root/testdata/sf0.001"
    val marked = graft.operators.TextPolicy.decontaminateScore(spark, sf)
      .filter(org.apache.spark.sql.functions.col("contaminated"))
      .collect().map(_.getLong(0)).toSet
    val reported = graft.operators.TextPolicy.contamination(spark, sf)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(marked == reported,
      s"apply/report disagree: only-marked=${marked -- reported} " +
        s"only-reported=${reported -- marked}")
  }

  test("gopher rules: each rule trips on its crafted violator, attribution " +
    "follows canonical order, a clean document keeps") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val clean = "the quick brown fox and the lazy dog run to town with " +
      "plenty of ordinary words that have good shape " + fifty
    val docs = Seq(
      (1L, clean), // keeps: >=50 words, sane lengths, stopwords present
      (2L, "too few words to pass the count gate"), // word_count
      (3L, ("a b c d " * 20) + fifty.split(" ").map(_ => "xy").mkString(" ")),
      // ^ mean word length < 3 (all 1-2 char tokens, 130 words)
      (4L, clean + " " + ("#" * 40)), // symbol ratio > 0.1 (40 '#', ~111 words)
      (5L, clean.split(" ").map(_ => "123").mkString(" ")), // no alpha words
      (6L, (1 to 60).map(i => s"unique$i").mkString(" ")), // no stopwords
      (7L, clean + " lorem ipsum dolor sit amet"), // C4 lorem page drop
      (8L, clean + " function() { return 42; }")) // C4 brace page drop
      .toDF("doc_id", "text")
    val out = graft.operators.TextPolicy.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("first_violation"), r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) == (("kept", true)), s"clean doc: ${out(1L)}")
    assert(out(2L) == (("word_count", false)), s"${out(2L)}")
    assert(out(3L) == (("mean_word_len", false)), s"${out(3L)}")
    assert(out(4L) == (("symbol_ratio", false)), s"${out(4L)}")
    assert(out(5L)._1 == "alpha_words" || out(5L)._1 == "stopwords",
      s"digit-only doc must drop before 'kept': ${out(5L)}")
    assert(out(5L)._2 == false)
    assert(out(6L) == (("stopwords", false)), s"${out(6L)}")
    assert(out(7L) == (("lorem", false)), s"${out(7L)}")
    assert(out(8L) == (("brace", false)), s"${out(8L)}")
    // canonical-order attribution: a doc violating BOTH word count and
    // stopwords reports word_count (the earlier rule)
    val multi = graft.operators.TextPolicy
      .gopherRules(Seq((9L, "zz qq pp")).toDF("doc_id", "text"))
      .head.getAs[String]("first_violation")
    assert(multi == "word_count", s"canonical order: $multi")
  }

  // Scala replica of the operator's deterministic pareto draw:
  // u = md5("qc" || doc_id) first-15-hex mod 1e6, pareto=(1-u)^(-1/9)-1,
  // quantized to micro-units with the +1e-3 nudge.
  private def paretoU(docId: Long, alpha: Double = 9.0): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qc$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val u = (BigInt(hex, 16) % 1000000).toDouble / 1e6
    math.round((math.pow(1.0 - u, -1.0 / alpha) - 1.0) * 1e6 + 1e-3)
  }

  test("quality classifier: curated-like docs score positive, crawl-like " +
    "negative; positive scores always keep") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cur", "insight wisdom clarity insight depth"),
      (2L, "cur", "wisdom clarity depth nuance insight"),
      (3L, "raw", "spam junk noise spam clickbait"),
      (4L, "raw", "junk noise clickbait spam junk"),
      (5L, "raw", "insight wisdom clarity depth nuance"), // curated-shaped
      (6L, "cur", "spam junk noise clickbait spam")) // crawl-shaped
      .toDF("doc_id", "source", "text")
    val out = TextPolicy.qualityClassifier(docs, Seq("cur"), 9.0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    assert(out(5L)._1 > 0, s"curated-shaped doc must score > 0: ${out(5L)}")
    assert(out(6L)._1 < 0, s"crawl-shaped doc must score < 0: ${out(6L)}")
    // pareto >= 0 always, so score > 0 implies keep regardless of the draw
    out.values.filter(_._1 > 0).foreach(v => assert(v._2, s"$v"))
    // and every negative-scoring doc's keep must match the exact long rule
    val full = TextPolicy.qualityClassifier(docs, Seq("cur"), 9.0).collect()
    full.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(math.abs(r.getAs[Double]("pareto") - paretoU(id) / 1e6)
        <= 1e-4 + 1e-9,
        s"pareto mismatch for $id: ${r.getAs[Double]("pareto")} vs " +
          s"${paretoU(id) / 1e6}")
    }
  }

  test("quality classifier: score and keep match a hand-computed NB " +
    "log-odds with the deterministic pareto rule") {
    import spark.implicits._
    val rows = Seq(
      (10L, "cur", "good text good signal"),
      (11L, "raw", "bad text bad noise"),
      (12L, "raw", "good signal bad noise"))
    val docs = rows.toDF("doc_id", "source", "text")
    // hand NB: token counts by class, add-one smoothing, micro-quantized
    val toks = rows.map { case (id, s, t) =>
      (id, s == "cur", t.trim.toLowerCase.split("\\s+").toSeq)
    }
    val posCnt = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val negCnt = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    toks.foreach { case (_, pos, ws) =>
      ws.foreach(w => if (pos) posCnt(w) += 1 else negCnt(w) += 1)
    }
    val vocab = (posCnt.keySet ++ negCnt.keySet).toSeq
    val (pt, nt, v) = (posCnt.values.sum, negCnt.values.sum, vocab.size)
    val wU = vocab.map { w =>
      w -> math.round((math.log((posCnt(w) + 1.0) / (pt + v)) -
        math.log((negCnt(w) + 1.0) / (nt + v))) * 1e6 + 1e-3)
    }.toMap
    val expected = toks.map { case (id, _, ws) =>
      val llrU = ws.map(wU).sum
      val keep = llrU > -paretoU(id) * ws.size
      id -> ((llrU.toDouble / 1e6 / ws.size, keep))
    }.toMap
    val out = TextPolicy.qualityClassifier(docs, Seq("cur"), 9.0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    expected.foreach { case (id, (score, keep)) =>
      assert(math.abs(out(id)._1 - score) <= 1e-4 + 1e-9,
        s"score mismatch for $id: ${out(id)._1} vs $score")
      assert(out(id)._2 == keep, s"keep mismatch for $id")
    }
  }

  test("quality classifier: feature-hashed form agrees with the exact " +
    "form's kept set at sf0.01 and its weight table is bounded (r13)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    def keptOf(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val exact = keptOf(TextPolicy.qualityClassifier(
      docs, Seq("src0", "src1", "src2"), 9.0))
    val hashed = keptOf(TextPolicy.qualityClassifierHashed(
      docs, Seq("src0", "src1", "src2"), 9.0, buckets = 4096))
    assert(hashed.keySet == exact.keySet, "same docs scored")
    val agree = exact.count { case (id, k) => hashed(id) == k }.toDouble /
      exact.size
    info(f"kept-set agreement exact-vs-hashed(4096) = $agree%.4f " +
      f"(${exact.size} docs)")
    assert(agree >= 0.9,
      f"feature hashing should preserve most keep decisions: $agree%.4f")
    // collisions only COARSEN the vocabulary; the bucketed weight table
    // must never exceed the bucket count
    val nFeatures = TextPolicy.qualityClassifierHashed(
      docs, Seq("src0"), 9.0, buckets = 64)
    assert(nFeatures.collect().nonEmpty)
  }

  test("quality classifier: the per-doc-token aggregate is shared via " +
    "ReusedExchange") {
    val df = TextPolicy.qualityClassifier(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    // collect first: under AQE exchange reuse materializes only in the
    // FINAL adaptive plan (same idiom as DataSelectionSpec's dsir pin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"vocabulary build and scoring join must share the dtc aggregate:\n" +
        plan.take(4000))
  }
}

package graft

import graft.domain.PlaceholderEmbedding
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties from SURVEY.md §5: tag-prefix roundtrip, dedup
  * idempotence, score-component monotonicity, embedding determinism.
  */
class PropertiesSpec extends AnyFunSuite {
  /** Drive a ScalaCheck generator n times (scalatestplus bridge is not in
    * the offline cache, so we sample directly).
    */
  def forSamples[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (1 to n).foreach { i => gen.sample.foreach(f) }

  lazy val spark = SparkTestSession.spark

  val tagGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    parts <- Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5)))
  } yield parts.mkString(":")

  test("tag-prefix expansion: every prefix chain is present and lowercase") {
    import spark.implicits._
    forSamples(Gen.listOfN(3, tagGen)) { tags =>
      if (tags.nonEmpty && tags.forall(_.nonEmpty)) {
        val got = Seq(tags).toDF("tags")
          .select(TextFunctions.tagPrefixes(col("tags")))
          .head().getSeq[String](0).toSet
        tags.foreach { t =>
          val parts = t.toLowerCase.split(":").toSeq
          (1 to parts.length).foreach { i =>
            assert(got.contains(parts.take(i).mkString(":")),
              s"missing prefix of $t in $got")
          }
        }
      }
    }
  }

  test("fingerprint is idempotent and normalization-invariant") {
    import spark.implicits._
    forSamples(Gen.alphaNumStr) { s =>
      val df = Seq((s, s.toUpperCase, s + "!!!")).toDF("a", "b", "c")
      val row = df.select(
        TextFunctions.fingerprint(col("a"), 64),
        TextFunctions.fingerprint(col("b"), 64),
        TextFunctions.fingerprint(col("c"), 64)).head()
      assert(row.getString(0) == row.getString(1), "case-insensitive")
      assert(row.getString(0) == row.getString(2), "punctuation-insensitive")
    }
  }

  test("placeholder embedding: deterministic, unit-norm, content-sensitive") {
    forSamples(Gen.asciiPrintableStr, 30) { s =>
      val a = PlaceholderEmbedding.embed(s)
      val b = PlaceholderEmbedding.embed(s)
      assert(a.toSeq == b.toSeq)
      val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("recency component is monotonically non-increasing in age") {
    import graft.domain.Scoring
    import spark.implicits._
    val ages = (0 until 400 by 10).map(_.toDouble)
    val got = ages.toDF("age")
      .select(Scoring.recency(col("age")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == got.sorted(Ordering[Double].reverse))
    assert(got.head == 1.0 && got.last == 0.0)
  }

  test("final score is monotone in each weighted component") {
    import graft.domain.Scoring
    import spark.implicits._
    val base = Seq((0.5, 0.5)).toDF("lo", "hi")
    def scoreWith(vector: Double): Double = {
      val c = Scoring.ComponentColumns(lit(vector), lit(0.2), lit(0.0), lit(0.0),
        lit(0.1), lit(0.5), lit(0.5), lit(0.5), lit(0.0), lit(0.0), lit(0.0))
      base.select(Scoring.finalScore(c).as("s")).head().getDouble(0)
    }
    assert(scoreWith(0.9) > scoreWith(0.5))
    assert(scoreWith(0.5) > scoreWith(0.1))
  }

  test("relevance gate scales query-independent components below the gate") {
    import graft.domain.Scoring
    import spark.implicits._
    val base = Seq(1).toDF("x")
    // zero topical evidence -> importance/confidence/recency contribute 0
    val c = Scoring.ComponentColumns(lit(0.0), lit(0.0), lit(0.0), lit(0.0),
      lit(0.0), lit(1.0), lit(1.0), lit(1.0), lit(0.0), lit(1.0), lit(0.0))
    val gated = base.select(Scoring.finalScore(c, Scoring.Weights(),
      relevanceGate = Some(0.2)).as("s")).head().getDouble(0)
    val ungated = base.select(Scoring.finalScore(c).as("s")).head().getDouble(0)
    assert(gated == 0.0 && ungated > 0.0)
  }

  test("rolling fingerprint: equal token sequences collide, reorderings do not") {
    import spark.implicits._
    val wordGen = Gen.listOfN(6,
      Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
    forSamples(wordGen) { words =>
      if (words.distinct.size >= 2) {
        val text = words.mkString(" ")
        val reordered = words.reverse.mkString(" ")
        val fps = Seq(text, text, reordered).toDF("text")
          .select(TextFunctions.rollingFingerprint(col("text"))).collect()
          .map(_.getLong(0))
        assert(fps(0) == fps(1), "same text must fingerprint identically")
        if (words != words.reverse)
          assert(fps(0) != fps(2),
            s"order-sensitive: '$text' vs '$reordered' collided")
      }
    }
  }

  test("pigeonhole lev-1 blocking is complete: one substitution always pairs") {
    import spark.implicits._
    // any single-substitution pair of equal-length strings agrees exactly on
    // one half, so the half-key joins can never miss a true pair
    val base = "Customer#000123456"
    val variants = (9 until 18).map { pos =>
      base.updated(pos, if (base(pos) == '7') '8' else '7')
    }
    variants.foreach { v =>
      val h1 = (s: String) => s.substring(9, 14)
      val h2 = (s: String) => s.substring(14)
      assert(h1(base) == h1(v) || h2(base) == h2(v),
        s"pair ($base, $v) shares no half — blocking would miss it")
    }
  }

  test("exact dedup is idempotent: deduping a deduped set is a no-op") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val once = operators.Dedup.fingerprintDedup(spark, "/root/testdata/sf0.001")
    // survivors have unique fingerprints -> grouping again changes nothing
    val n = once.count()
    val again = once.groupBy(col("fp")).count().filter(col("count") > 1).count()
    assert(again == 0, "deduped output must have unique fingerprints")
    assert(n > 0)
  }

  /** Driver-side union-find, the independent reference for the distributed
    * pointer-jumping CC loop.
    */
  private def bruteComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n.toLong).map(i => i -> find(i)).toMap
  }

  private def ccOnSpark(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val vertices = (0L until n.toLong).toDF("id")
    val edgeDf =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
    domain.Consolidation.connectedComponents(vertices, edgeDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connected components match union-find on random graphs") {
    val graphGen = for {
      n <- Gen.choose(5, 25)
      m <- Gen.choose(0, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n, es.filter(e => e._1 != e._2))
    forSamples(graphGen, n = 8) { case (n, edges) =>
      assert(ccOnSpark(n, edges) == bruteComponents(n, edges))
    }
  }

  test("connected components converge on a long chain within the iteration cap") {
    // a 40-node path has diameter 39 >> maxIter 15: only the pointer-jumping
    // (O(log diameter) rounds) makes this converge — plain min-label
    // propagation would stall at the cap with a wrong labelling
    val n = 40
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val got = ccOnSpark(n, chain)
    assert(got.values.toSet == Set(0L), s"all nodes must collapse to 0: $got")
  }

  /** Driver-side PageRank, the independent reference for the iterative
    * DataFrame loop (same simplified formula: no dangling redistribution).
    */
  private def brutePageRank(edges: Seq[(String, String)], iters: Int,
      damping: Double): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outDeg = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outDeg(s) }.sum).toMap
      r = nodes.map(v => v -> (1 - damping + damping * inflow.getOrElse(v, 0.0))).toMap
    }
    r.map { case (k, v) => k -> BigDecimal(v + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  test("pagerank matches a driver-side reference on random multigraphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(3, 12)
      m <- Gen.choose(1, 25)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield es.filter(e => e._1 != e._2).map(e => (s"n${e._1}", s"n${e._2}"))
    forSamples(graphGen, n = 6) { edges =>
      if (edges.nonEmpty) {
        val got = operators.GraphAnalytics
          .pageRank(edges.toDF("src", "dst"), iters = 3, damping = 0.85,
            topK = 1000)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == brutePageRank(edges, 3, 0.85),
          s"mismatch on edges $edges")
      }
    }
  }

  test("hygiene: the checkpointed signal form equals the lazy form " +
    "row-for-row on random corpora (r15)") {
    import spark.implicits._
    val word = Gen.oneOf("the", "and", "of", "is", "walk", "dog", "park",
      "el", "la", "de", "que", "spam", "x1")
    val docGen = for {
      n <- Gen.choose(2, 18)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, docGen)
      twin <- Gen.choose(0, 3) // planted duplicates incl. cross-id twins
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      docs.take(twin).zipWithIndex.map { case (t, i) =>
        ((100 + i).toLong, t) } ++
      Seq((990L, ""), (991L, "   ")) // empty-fingerprint rows never dedup
    forSamples(corpusGen, n = 8) { rows =>
      val docs = rows.toDF("doc_id", "text")
      def staged(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "stage").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val lazyForm = staged(operators.TextPolicy.hygieneStaged(docs))
      val (ckForm, ck) =
        operators.TextPolicy.hygieneStagedCheckpointed(docs, None)
      val got = staged(ckForm)
      graft.functions.releaseCheckpoint(ck)
      assert(got == lazyForm, s"forms diverged on $rows")
    }
  }

  /** Driver-side sync LPA: each round every node adopts its neighbors'
    * most frequent label, ties to the SMALLEST label; isolated keep their
    * own — the contract labelPropagation's min_by aggregate implements.
    */
  private def bruteLpa(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nodes = sym.map(_._1).distinct
    var labels = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      val best = sym.groupBy(_._1).view.mapValues { es =>
        es.groupBy(e => labels(e._2)).view.mapValues(_.size).toSeq
          .minBy { case (lbl, cnt) => (-cnt, lbl) }._1
      }.toMap
      labels = nodes.map(v => v -> best.getOrElse(v, labels(v))).toMap
    }
    labels
  }

  test("label propagation (min_by aggregate, r15) matches a driver-side " +
    "reference on random graphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(3, 14)
      m <- Gen.choose(1, 28)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      iters <- Gen.choose(1, 3)
    } yield (es.filter(e => e._1 != e._2), iters)
    forSamples(graphGen, n = 8) { case (edges, iters) =>
      if (edges.nonEmpty) {
        val got = operators.GraphAnalytics
          .labelPropagation(edges.toDF("u", "v"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == bruteLpa(edges, iters),
          s"mismatch on edges $edges iters $iters")
      }
    }
  }

  test("winnowing pairs match a driver-side reference on random corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hash15(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val wordGen = Gen.oneOf("ant", "bee", "cat", "doe", "elk", "fox")
    val docGen = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val corpusGen = Gen.choose(3, 7).flatMap(k => Gen.listOfN(k, docGen))
    val (w, maxDf, minShared) = (4, 20, 2)
    forSamples(corpusGen, n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val fps = docs.map { case (id, t) =>
        val hs = t.split("\\s+").sliding(3).filter(_.length == 3)
          .map(g => hash15(g.mkString(" "))).toIndexedSeq
        id -> (0 to hs.length - w).map(i => hs.slice(i, i + w).min).toSet
      }.toMap
      val df = fps.values.flatten.toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val rare = df.filter(_._2 <= maxDf).keySet
      val expected = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        shared = fa.intersect(fb).count(rare)
        if shared >= minShared
      } yield (a, b, shared.toLong)).toSet
      val tmp = java.nio.file.Files.createTempDirectory("graft-winp").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val got = operators.Dedup
        .winnowingPairs(spark, tmp, w = w, maxDf = maxDf, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"corpus $texts: got $got expected $expected")
    }
  }

  test("containment pairs match a driver-side reference on random corpora") {
    import spark.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val docGen = for {
      n <- Gen.choose(3, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val corpusGen = Gen.choose(4, 8).flatMap(k => Gen.listOfN(k, docGen))
    def shingles(text: String): Set[String] =
      text.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    forSamples(corpusGen, n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val df = sets.values.flatten.toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val rare = df.filter(_._2 <= 3).keySet
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        if sa.intersect(sb).exists(rare)
        inter = sa.intersect(sb).size
        cMax = BigDecimal(inter.toDouble / math.min(sa.size, sb.size) + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if cMax >= 0.5
      } yield (a, b, inter.toLong, cMax)).toSet
      // route the random corpus through the library operator via a temp view
      val tmp = java.nio.file.Files.createTempDirectory("graft-cont").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val got = operators.Dedup.containmentPairs(spark, tmp, maxDf = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == expected, s"corpus $texts: got $got expected $expected")
    }
  }

  test("salted cumsum stitch: shardPack is width-invariant on random " +
    "corpora with NEGATIVE and sparse doc_ids (r14)") {
    import spark.implicits._
    // the stitch relies on `doc_id DIV width` being monotone and
    // contiguous; DIV truncates toward ZERO, so salt 0 spans
    // (-width, width) — still one contiguous range, which this property
    // pins for ids on both sides of zero and adversarial widths
    val corpusGen = for {
      n <- Gen.choose(5, 40)
      ids <- Gen.listOfN(n, Gen.choose(-5000L, 5000L)).map(_.distinct)
      lens <- Gen.listOfN(ids.length, Gen.choose(1, 30))
    } yield ids.zip(lens)
    val widthGen = Gen.oneOf(1L, 2L, 3L, 7L, 100L, 4999L, 5000L, 5001L,
      Long.MaxValue)
    forSamples(Gen.zip(corpusGen, widthGen), n = 12) {
      case (corpus, width) =>
        if (corpus.nonEmpty) {
          val docs = corpus.map { case (id, len) =>
            (id, if (id % 2 == 0) "web" else "books",
              Seq.fill(len)("tok").mkString(" "))
          }.toDF("doc_id", "source", "text")
          val unsalted = operators.TextAnalysis
            .shardPack(docs, 17.0, Long.MaxValue).collect().toSeq
          val salted = operators.TextAnalysis
            .shardPack(docs, 17.0, width).collect().toSeq
          assert(salted == unsalted,
            s"width=$width diverged on ids=${corpus.map(_._1)}")
        }
    }
  }

  test("applyPatches properties: id conservation, unpatched rows " +
    "bit-identical, re-embed fires iff content changed (r16)") {
    import spark.implicits._
    import graft.domain.{Ingest, Memory}
    def mem(id: String, content: String): Memory = {
      val t = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      Memory(id, content, t, t, None, t, t, 0.5, 0.7, "Context",
        Seq("base"), Seq("base"), "{}", None, enriched = false,
        processed = false, 1.0, archived = false, protected_flag = false,
        PlaceholderEmbedding.embed(content))
    }
    val caseGen = for {
      n <- Gen.choose(2, 8)
      // which ids get a patch row; some patch ids are ghosts (not stored)
      patched <- Gen.listOfN(n, Gen.oneOf(true, false))
      ghosts <- Gen.choose(0, 2)
      // per patched id: Some(new content) (sometimes EQUAL to current),
      // None = content not in payload
      kinds <- Gen.listOfN(n, Gen.choose(0, 2))
    } yield (n, patched, ghosts, kinds)
    forSamples(caseGen, n = 12) { case (n, patched, ghosts, kinds) =>
      val store = (0 until n).map(i => mem(s"m$i", s"original content $i"))
      val patchRows = (0 until n).filter(patched).map { i =>
        val content = kinds(i) match {
          case 0 => None // absent -> keep, no re-embed
          case 1 => Some(s"original content $i") // EQUAL -> no re-embed
          case _ => Some(s"patched content $i") // changed -> re-embed
        }
        (s"m$i", content, Some(0.9))
      } ++ (0 until ghosts).map(g => (s"ghost$g", Some("x"), Some(0.1)))
      // a DISTINCT re-embed function makes the gate observable: a row
      // that re-embeds carries the "redo:" vector, a row that keeps its
      // stored vector carries the original embed — equal-content and
      // absent-content patches must KEEP, changed-content must REDO
      val redo: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => PlaceholderEmbedding.embedColumn()(concat(lit("redo:"), c))
      val out = Ingest.applyPatches(store.toDF(),
          patchRows.toDF("id", "content", "importance"),
          now = to_timestamp(lit("2026-06-01 00:00:00")),
          embed = Some(redo))
        .collect().map(r => r.getAs[String]("id") -> r).toMap
      // conservation: exactly the store's ids, ghosts dropped
      assert(out.keySet == store.map(_.id).toSet)
      (0 until n).foreach { i =>
        val r = out(s"m$i")
        val emb = r.getSeq[Float](r.fieldIndex("embedding"))
        if (!patched(i)) {
          // unpatched rows pass through bit-identically
          assert(r.getAs[String]("content") == s"original content $i")
          assert(r.getAs[Double]("importance") == 0.5)
          assert(emb == PlaceholderEmbedding.embed(s"original content $i").toSeq)
        } else {
          assert(r.getAs[Double]("importance") == 0.9)
          val expectContent =
            if (kinds(i) == 2) s"patched content $i" else s"original content $i"
          assert(r.getAs[String]("content") == expectContent)
          val expectEmb =
            if (kinds(i) == 2) // changed -> RE-EMBEDDED with the new fn
              PlaceholderEmbedding.embed(s"redo:$expectContent").toSeq
            else // absent or equal payload -> stored vector kept
              PlaceholderEmbedding.embed(expectContent).toSeq
          assert(emb == expectEmb,
            s"m$i kind=${kinds(i)}: re-embed gate fired wrongly")
        }
      }
    }
  }

  test("native rolling-fp / minhash expressions are bitwise-equal to the " +
      "HOF forms they replaced (r19)") {
    import spark.implicits._
    // the exact HOF formulas the r19 codegen expressions replaced
    def hofRolling(text: org.apache.spark.sql.Column) = {
      val hs = transform(TextFunctions.tokens(text),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
      when(size(hs) === 1, element_at(hs, 1))
        .otherwise(aggregate(slice(hs, lit(2), size(hs) - 1), element_at(hs, 1),
          (h, x) => (h * 31 + x) % 1000000007L))
    }
    def hofMinhash(text: org.apache.spark.sql.Column, seed: Int) =
      array_min(transform(array_distinct(TextFunctions.tokens(text)),
        t => md5(concat(t, lit("#" + seed)))))
    // real corpus + adversarial shapes: single token, empty string,
    // whitespace-only, unicode, repeated tokens (distinct-vs-not), long doc
    val edge = Seq("one", "", "   ", "a b a b a", "x " * 500,
      "caf\u00e9 na\u00efve \u4e2d\u6587 tok", "UPPER lower MiXeD")
      .toDF("text")
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).unionByName(edge)
    val rows = corpus.select(
      TextFunctions.rollingFingerprint(col("text")).as("fp_new"),
      hofRolling(col("text")).as("fp_old"),
      TextFunctions.minhashComponent(col("text"), 1).as("mh1_new"),
      hofMinhash(col("text"), 1).as("mh1_old"),
      TextFunctions.minhashComponent(col("text"), 3).as("mh3_new"),
      hofMinhash(col("text"), 3).as("mh3_old")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"rolling fp diverged: $r")
      assert(r.get(2) == r.get(3), s"minhash seed1 diverged: $r")
      assert(r.get(4) == r.get(5), s"minhash seed3 diverged: $r")
    }
  }

  test("two rolling-fp instances share one codegen scope without fallback " +
      "(r20)") {
    import spark.implicits._
    // Regression for the fixed-name codegen local (ADVICE r19): with a
    // NON-NULLABLE child, nullSafeExec emits no brace block, so two
    // instances of the expression in one projection land their locals in
    // the SAME Java scope. The old fixed `graftRfp` name made that a
    // duplicate declaration — codegen compile failure and a silent
    // interpreted fallback. fallback=false turns that silent cliff into a
    // test failure. coalesce(col, lit) is the non-nullable wrapper (a bare
    // lit would be constant-folded before codegen ever sees it).
    val prior = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(("a b c", "d e f g"), ("solo", "x y")).toDF("t1", "t2")
      val both = df.select(
        TextFunctions.rollingFingerprint(coalesce(col("t1"), lit("z")))
          .as("f1"),
        TextFunctions.rollingFingerprint(coalesce(col("t2"), lit("z")))
          .as("f2")).collect()
      val one = df.select(
        TextFunctions.rollingFingerprint(col("t1")).as("f1")).collect()
      assert(both.map(_.getLong(0)).toSeq == one.map(_.getLong(0)).toSeq,
        "two-instance projection diverged from single-instance results")
      assert(both.forall(r => !r.isNullAt(1)))
    } finally spark.conf.set("spark.sql.codegen.fallback", prior)
  }
}

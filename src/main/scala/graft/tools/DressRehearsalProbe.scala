package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10x dress rehearsal of the COMPOSED pipeline (r15, VERDICT r14 item
  * 6): the r14 skew fixes were each probed in isolation; this runs the
  * full `CorpusPipelineJob.runWithSelection` + decontamination end-to-end
  * over a 10^6-doc corpus carrying EVERY adversarial skew at once —
  *
  *  - mega-source: ~99% of docs in ONE source ("web") — the shardPack /
  *    UniMax / classifier per-source paths;
  *  - mega-fingerprint: one boilerplate page planted n/10 times (one
  *    content fingerprint) — the hygiene keep-first path;
  *  - planted contamination: every 1000th doc embeds a fixed eval
  *    sentence behind a unique prefix (unique fingerprints, shared
  *    5-grams) — the decontam path;
  *  - near-identical-embedding block: 10% of 10^6 vectors share one
  *    base vector — the semanticDedup path, exercised through the r15
  *    MaintenanceJob plan (exact + semantic composition).
  *
  * Runs under the production config (AQE ON — this is the rehearsal, not
  * the skew-signature exhibit; PipelineScaleProbe keeps the AQE-off
  * A/Bs) with a SkewListener recording per-stage max/mean task reads.
  * Prints the per-phase worst-stage table for NOTES, asserts zero errors
  * and funnel conservation at 10x.
  *
  * Run: `sbt "runMain graft.tools.DressRehearsalProbe [nDocs]"`
  */
object DressRehearsalProbe {

  private def mix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(c))

  /** 10^6 docs with all three text-side skews planted. */
  def rehearsalDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = Seq("pipeline", "review", "standup", "retro", "incident",
      "migration", "rollout", "oncall", "postmortem", "planning", "shuffle",
      "broadcast", "partition", "executor", "catalyst", "codegen")
    val vocabCol = array(vocab.map(lit): _*)
    // survives a_lang/b_quality/c_repetition — all twins reach keep-first
    val boiler = "the pipeline review and standup of the incident is " +
      "planning the rollout and oncall of the retro"
    val evalSentence = "the quick morning walk through the park with " +
      "the dog was long and the weather was mild"
    val soup = concat_ws(" ", (0 until 12).map(p =>
      element_at(vocabCol,
        (mix(col("id") * 41 + p) % vocab.size).cast("int") + 1)): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit(boiler))                 // mega-fp
        .when(col("id") % 1000 === 7,                         // contaminated
          concat(lit("u"), col("id").cast("string"), lit(" is noting " +
            "that "), lit(evalSentence), lit(" and "), soup))
        .otherwise(concat(lit("the "), soup, lit(" of the day is here")))
        .as("text"),
      when(col("id") % 100 === 99, "cur").otherwise("web").as("source"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master(
        sys.env.getOrElse("GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import spark.implicits._

    val docs = rehearsalDocs(spark, n).repartition(32).cache()
    docs.count()
    val bench = Seq((0L, "an eval item asking whether the quick morning " +
      "walk through the park with the dog was long and the weather was " +
      "mild today")).toDF("doc_id", "text")

    val skew = new SkewListener
    spark.sparkContext.addSparkListener(skew)
    def phase(label: String)(f: => Unit): Unit = {
      skew.reset()
      val t0 = System.nanoTime()
      f
      Thread.sleep(1000)
      println(f"[dress] $label ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      skew.worstStages(8).foreach { case (sid, name, nT, maxR, meanR) =>
        println(f"[dress]   $label stage=$sid [$name] tasks=$nT " +
          f"maxReadRec=$maxR meanReadRec=$meanR%.0f " +
          f"skew=${maxR / math.max(meanR, 1.0)}%.1fx")
      }
    }

    var funnelTotal = -1L
    var funnelRows: Seq[String] = Nil
    phase(s"pipeline+selection+decontam n=$n") {
      val out = graft.jobs.CorpusPipelineJob.runWithSelection(
        docs, graft.jobs.CorpusPipelineJob.SelectionConfig(Seq("cur")),
        tokenBudget = 500.0, benchmark = Some(bench))
      try {
        val f = out.funnel.collect()
        funnelRows = f.map(r => s"${r.getString(0)}=${r.getLong(1)}").toSeq
        funnelTotal = f.map(_.getLong(1)).sum
        out.selected.count(); out.mixture.count(); out.base.shards.count()
      } finally out.release()
    }
    println(s"[dress] funnel: ${funnelRows.mkString(", ")} total=$funnelTotal")
    assert(funnelTotal == n,
      s"funnel conservation FAILED at 10x: $funnelTotal != $n")

    // the store-audit composition at the same scale: exact twins (the
    // boiler block) + a 10% near-identical embedding block. The embedding
    // block sits on id % 10 == 3 — DISJOINT from the exact-twin block
    // (id % 10 == 0), so the semantic stage genuinely ranks a 10^5-member
    // near-dup component among exact-stage SURVIVORS instead of finding
    // its members already deleted.
    val vecs = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)), i => {
        val base = sin(i.cast("double") * 1.7).cast("float")
        val noise = ((mix(col("id") * 257 + i) % 2000 - 1000)
          .cast("float") / 1000f)
        when(col("id") % 10 === 3, base + noise / lit(10000f))
          .otherwise(noise)
      }).as("embedding")).repartition(32).cache()
    vecs.count()
    val store = docs.select(col("doc_id").as("id"), col("text").as("content"))
    var plan: DataFrame = null
    phase(s"maintenance dedupPlan n=$n") {
      plan = graft.jobs.MaintenanceJob.dedupPlan(store, Some(vecs))
        .localCheckpoint()
      val planTotal = plan.groupBy(col("verdict")).count().collect()
      println(s"[dress] plan: " + planTotal
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
      assert(planTotal.map(_.getLong(1)).sum == n,
        "dedup plan must conserve the store")
    }
    // the --apply leg AT SCALE (r16, VERDICT r15 item 8): write the kept
    // store the way MaintenanceJob --apply does, then RE-AUDIT it — the
    // fixed point (all keeps, zero verdict changes) must hold on the 10^6
    // rehearsal corpus with both planted 10^5 blocks, not just in the
    // spec fixture.
    var keepCount = -1L
    val applyTmp = java.nio.file.Files
      .createTempDirectory("dress-apply").toString
    phase(s"maintenance --apply write + re-audit n=$n") {
      store.join(plan.filter(col("verdict") === "keep").select(col("id")),
          Seq("id"))
        .write.mode("overwrite").parquet(s"$applyTmp/kept")
      val kept = spark.read.parquet(s"$applyTmp/kept")
      keepCount = kept.count()
      val keptVecs = vecs.join(kept.select(col("id").as("vec_id")),
        Seq("vec_id"))
      val re = graft.jobs.MaintenanceJob.dedupPlan(kept, Some(keptVecs))
        .groupBy(col("verdict")).count().collect()
      println(s"[dress] re-audit: " + re
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ") +
        s" (kept store = $keepCount rows)")
      assert(re.length == 1 && re.head.getString(0) == "keep" &&
        re.head.getLong(1) == keepCount,
        s"apply must be a FIXED POINT at scale: ${re.toSeq}")
    }
    graft.functions.releaseCheckpoint(plan)
    spark.sparkContext.removeSparkListener(skew)
    docs.unpersist(); vecs.unpersist()
    println("[dress] PASS zero errors, funnel conserved, apply fixed-point at 10x")
    spark.stop()
  }
}

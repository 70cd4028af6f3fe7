package graft.jobs

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Near-dup AUDIT of the live memory store, as one job — the twin of the
  * reference's store-maintenance script family
  * (`/root/reference/scripts/deduplicate_qdrant.py`: scroll the whole
  * collection, key each memory by content|timestamp, keep the first
  * occurrence, delete the rest, with a dry-run report mode). This is the
  * one reference *script* family without a direct job twin until r15; it
  * composes two already-gated operators — exact keep-first dedup (the
  * script's own key) and `Dedup.semanticDedup` (LSH-banded near-dup
  * components over the embedding column, the audit the script's exact key
  * cannot do) — and adds only composition, verdict attribution, and I/O.
  *
  * Verdict relation (`plan`): every input id gets EXACTLY one verdict —
  * `keep`, `delete_exact_dup` (content+timestamp twin of an earlier id),
  * or `delete_near_dup` (embedding-cosine component member that is not
  * the component keeper) — with `kept_by` naming the surviving id, so the
  * report conserves the store and the apply step is a pure filter.
  * Stage order mirrors the hygiene funnel doctrine: the near-dup stage
  * only considers exact-stage SURVIVORS (a deleted exact twin must not
  * claim a near-dup component's keeper slot).
  *
  * Determinism: the script keeps "first seen in scroll order", which is
  * not reproducible; the twin keeps min(id) — the same determinization
  * every dedup operator in this library uses. Keep-first is the
  * aggregate+join idiom, never a window partitioned by the content key
  * (a recovery accident that duplicates one memory 10^6x is ONE key).
  *
  * Scale shape: exact stage = one combiner-friendly hash aggregate + one
  * AQE-splittable join on the same key; near stage = semanticDedup's
  * bounded banded pairs + connected components over the (tiny) duplicate
  * pair graph; apply = partition-local filter. No stage is more than
  * linear in the store at fixed duplicate density.
  *
  * Usage: MaintenanceJob <memoriesPath> <outRoot>
  *          [--embeddings <path>] [--threshold <t>] [--apply]
  * Report mode (default, the script's --dry-run) writes `plan/` and
  * `summary/`; `--apply` additionally writes the deduplicated store to
  * `kept/` — the input is never mutated in place.
  */
object MaintenanceJob {

  /** Per-id dedup verdicts over a (id, content[, timestamp]) store, plus
    * the optional embedding-based near-dup stage over (vec_id, embedding)
    * rows keyed by the same ids.
    */
  def dedupPlan(memories: DataFrame, embeddings: Option[DataFrame],
      threshold: Double = 0.9): DataFrame = {
    // the script's identity: (content, timestamp) — but keyed as a STRUCT,
    // not its concat_ws("|") string (ADVICE r15): the delimited key is
    // collision-prone (content "a|b" + ts "c" == content "a" + ts "b|c"
    // for string timestamps) and the relational form never needed it;
    // timestamp stays optional in the twin — schema without one keys on
    // content alone
    val key =
      if (memories.columns.contains("timestamp"))
        struct(col("content"), col("timestamp"))
      else col("content")
    val keepers = memories.withColumn("_k", key)
      .groupBy(col("_k")).agg(min(col("id")).as("_keep"))
    val exact = memories.withColumn("_k", key)
      .join(keepers, Seq("_k"))
      .withColumn("verdict",
        when(col("id") === col("_keep"), lit(null).cast("string"))
          .otherwise("delete_exact_dup"))
      .withColumn("kept_by",
        when(col("id") =!= col("_keep"), col("_keep")))
      .drop("_k", "_keep")
    val judged = embeddings match {
      case None => exact
      case Some(em) =>
        // near-dup stage over exact SURVIVORS only; component keeper =
        // min id (semanticDedup's is_keeper contract)
        val survIds = exact.filter(col("verdict").isNull).select(col("id"))
        val comps = Dedup.semanticDedup(
          em.select(col("vec_id"), col("embedding"))
            .join(survIds, em("vec_id") === survIds("id"))
            .select(col("vec_id"), col("embedding")),
          threshold)
        exact.join(
          comps.select(col("vec_id").as("id"),
            col("component").as("_comp"), col("is_keeper").as("_isk")),
          Seq("id"), "left")
          .withColumn("verdict",
            when(col("verdict").isNotNull, col("verdict"))
              .when(col("_isk") === false, "delete_near_dup"))
          .withColumn("kept_by",
            when(col("verdict") === "delete_near_dup", col("_comp"))
              .otherwise(col("kept_by")))
          .drop("_comp", "_isk")
    }
    judged
      .withColumn("verdict", coalesce(col("verdict"), lit("keep")))
      .select(col("id"), col("verdict"), col("kept_by"))
      .orderBy("id")
  }

  /** The script's printed summary, as a relation. */
  def summaryOf(plan: DataFrame): DataFrame =
    plan.groupBy(col("verdict")).agg(count(lit(1)).as("n")).orderBy("verdict")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MaintenanceJob <memoriesPath> <outRoot> " +
        "[--embeddings <path>] [--threshold <t>] [--apply]")
    val Array(memPath, outRoot) = args.take(2)
    val rest = args.drop(2)
    def flagValue(flag: String): Option[String] = {
      val i = rest.indexOf(flag)
      require(i < 0 || i + 1 < rest.length, s"$flag requires a value")
      if (i >= 0) Some(rest(i + 1)) else None
    }
    val applyMode = rest.contains("--apply")
    val threshold = flagValue("--threshold").map(_.toDouble).getOrElse(0.9)
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName("graft-maintenance")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(builder.master).getOrCreate()
    try {
      val memories = spark.read.parquet(memPath)
      val embeddings = flagValue("--embeddings").map(spark.read.parquet)
      val plan = dedupPlan(memories, embeddings, threshold).localCheckpoint()
      try {
        plan.write.mode("overwrite").parquet(s"$outRoot/plan")
        summaryOf(plan).write.mode("overwrite").parquet(s"$outRoot/summary")
        if (applyMode)
          memories.join(plan.filter(col("verdict") === "keep")
              .select(col("id")), Seq("id"))
            .write.mode("overwrite").parquet(s"$outRoot/kept")
      } finally graft.functions.releaseCheckpoint(plan)
    } finally if (!preExisting) spark.stop()
  }
}

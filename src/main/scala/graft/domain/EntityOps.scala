package graft.domain

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Entity maintenance: U7 dedup-and-merge (`/root/reference/automem/
  * consolidation/entity_dedup.py:43-322`) and the identity-synthesis hook
  * (U6, `consolidation/identity_synthesis.py` — the LLM writer stays behind
  * a trait; the deterministic default is extractive).
  *
  * Candidate generation blocks by (category, slug length bucket) plus a
  * frequency-capped shared-token channel, so the pairwise levenshtein join
  * never goes quadratic in the entity count — the same blocking idea the
  * reference applies in-memory.
  */
object EntityOps {

  /** Near-duplicate entity pairs: same category, length-bucket-blocked,
    * slug similarity = 1 - levenshtein/maxlen >= threshold, or one slug
    * contains the other.
    */
  def dedupCandidates(entities: DataFrame, threshold: Double = 0.5,
      maxTokenBlock: Int = 50): DataFrame = {
    val blocked = entities.select(col("category"), col("slug"))
      .distinct()
      .withColumn("lb", (length(col("slug")) / 4).cast("int"))
    val a = blocked.select(col("category"), col("slug").as("a_slug"), col("lb"))
      .withColumn("lb", explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
    val b = blocked.select(col("category"), col("slug").as("b_slug"), col("lb"))
    val byLength = a.join(b, Seq("category", "lb"))
      .select(col("category"), col("a_slug"), col("b_slug"))
    // second candidate channel: shared hyphen-token blocking. The length
    // buckets alone can never pair slugs whose lengths differ by more than
    // ~7 chars, yet those are exactly the containment pairs the reference
    // merges ("bob" vs "bob-the-builder", `entity_dedup.py` substring rule
    // scores max(0.6, ratio)); a contained slug shares at least one full
    // token with its container, so token-equality blocks the token-aligned
    // containment case. Blocks are FREQUENCY-CAPPED like minhashLshPairs'
    // maxBucket: a token shared by > maxTokenBlock slugs (think thousands
    // of "john-*" people) would emit C(k,2) candidates from one block —
    // such a token carries no discriminating signal, so it is dropped and
    // the pair must surface via the length-bucket channel or another token
    val tokens = slugTokens(blocked)
    val rareTokens = tokens.groupBy(col("category"), col("tk"))
      // countDistinct, not count: a slug with a repeated token
      // ("bob-bob-bob") must not inflate the block size and drop a token
      // shared by fewer than maxTokenBlock DISTINCT slugs. (tokens is
      // already distinct on (category, slug, tk), so this is belt and
      // braces against future callers.)
      .agg(countDistinct(col("slug")).as("_blk"))
      .filter(col("_blk") <= maxTokenBlock)
      .select(col("category"), col("tk"))
    val cappedTokens = tokens.join(rareTokens, Seq("category", "tk"), "left_semi")
    val byToken = cappedTokens
      .select(col("category"), col("slug").as("a_slug"), col("tk"))
      .join(cappedTokens.select(col("category"), col("slug").as("b_slug"), col("tk")),
        Seq("category", "tk"))
      .select(col("category"), col("a_slug"), col("b_slug"))
    byLength.unionByName(byToken)
      .filter(col("a_slug") < col("b_slug"))
      .distinct()
      .withColumn("sim",
        lit(1.0) - levenshtein(col("a_slug"), col("b_slug")) /
          greatest(length(col("a_slug")), length(col("b_slug"))).cast("double"))
      .withColumn("containment",
        col("a_slug").contains(col("b_slug")) || col("b_slug").contains(col("a_slug")))
      .filter(col("sim") >= threshold || col("containment"))
      .select(col("category"), col("a_slug"), col("b_slug"), col("sim"))
      .distinct()
  }

  /** Distinct (category, slug, token) rows feeding the shared-token
    * candidate channel: hyphen tokens of length >= 3, one row per distinct
    * slug even when the slug repeats a token.
    */
  private def slugTokens(blocked: DataFrame): DataFrame =
    blocked.select(col("category"), col("slug"),
      explode(split(col("slug"), "-")).as("tk"))
      .filter(length(col("tk")) >= 3)
      .distinct()

  /** No-silent-caps signal for [[dedupCandidates]]: the tokens whose blocks
    * exceeded `maxTokenBlock` distinct slugs and were therefore excluded
    * from the shared-token channel, with their true block sizes. Pairs in a
    * dropped block only surface via the length-bucket channel (which spans
    * ~±7 chars), so token-aligned containment pairs across a dropped token
    * ("john" vs "john-the-famous-builder" in a category with thousands of
    * "john-*" slugs) are unreachable — run this alongside dedupCandidates
    * and log/alert on nonzero rows rather than discovering the recall gap
    * in production.
    */
  def droppedTokenBlocks(entities: DataFrame, maxTokenBlock: Int = 50): DataFrame = {
    val blocked = entities.select(col("category"), col("slug")).distinct()
    slugTokens(blocked).groupBy(col("category"), col("tk"))
      .agg(countDistinct(col("slug")).as("block_size"))
      .filter(col("block_size") > maxTokenBlock)
  }

  /** The entity-dedup JOB result: the merge map plus the no-silent-caps
    * accounting a production run must surface — [[droppedTokenBlocks]] rows
    * are the tokens whose candidate blocks were frequency-capped, i.e. the
    * exact places where a containment pair can be missed.
    */
  final case class MergeResult(mergeMap: DataFrame, droppedTokenBlocks: DataFrame)

  /** Run the dedup-and-merge job WITH its cap accounting: the returned
    * [[MergeResult.droppedTokenBlocks]] is what an operator alerts on
    * (nonzero rows = the shared-token channel silently skipped blocks), and
    * any dropped block is also logged at WARN here so the signal reaches
    * the job log even when the caller ignores the frame — the same
    * surface-the-numbers contract the C1/C4 jobs keep by returning their
    * distribution columns on every row.
    */
  def mergeJob(entities: DataFrame, threshold: Double = 0.5,
      maxTokenBlock: Int = 50): MergeResult = {
    val dropped = droppedTokenBlocks(entities, maxTokenBlock)
    val trips = dropped.limit(21).collect()
    if (trips.nonEmpty) {
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      val shown = trips.take(20).map(r =>
        s"${r.getAs[String]("category")}/${r.getAs[String]("tk")}=" +
          r.getAs[Long]("block_size")).mkString(", ")
      log.warn(s"entity dedup: ${if (trips.length > 20) ">20" else trips.length.toString}" +
        s" token block(s) exceeded maxTokenBlock=$maxTokenBlock and were " +
        s"dropped from the shared-token channel: $shown — containment " +
        "pairs across these tokens only surface via length buckets")
    }
    MergeResult(mergeMap(entities, threshold, maxTokenBlock), dropped)
  }

  /** Merge: every slug resolves to the canonical (lexicographically smallest)
    * slug of its duplicate group via connected components over the candidate
    * pairs; entity-referencing edges rewrite src/dst accordingly
    * (`entity_dedup.py` merge-moves-edges semantics).
    */
  def mergeMap(entities: DataFrame, threshold: Double = 0.5,
      maxTokenBlock: Int = 50): DataFrame = {
    // merges are CATEGORY-SCOPED (the reference merges Entity nodes within
    // a category) — key the CC by "category|slug" so a people merge can
    // never rewrite a same-slugged project, then split the key back out
    val keyed = (c: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =>
      concat(c, lit("|"), s)
    val pairs = dedupCandidates(entities, threshold, maxTokenBlock)
      .select(keyed(col("category"), col("a_slug")).as("src"),
        keyed(col("category"), col("b_slug")).as("dst"))
    val vertices = entities
      .select(keyed(col("category"), col("slug")).as("id")).distinct()
    Consolidation.connectedComponents(vertices, pairs)
      .select(
        substring_index(col("id"), "|", 1).as("category"),
        substring_index(col("id"), "|", -1).as("slug"),
        substring_index(col("component"), "|", -1).as("canonical_slug"))
  }
}

/** U6 identity synthesis hook: the profile writer is pluggable; default is
  * extractive (first snippets of the entity's current memories), the LLM
  * implementation is an external batch stage.
  */
trait IdentityWriter extends Serializable {
  def write(entitySlug: String, snippets: Seq[String]): String
}

class ExtractiveIdentityWriter extends IdentityWriter {
  override def write(entitySlug: String, snippets: Seq[String]): String =
    s"$entitySlug: " + snippets.take(3).mkString(" | ")
}

/** U6 identity synthesis pipeline (`/root/reference/automem/consolidation/
  * identity_synthesis.py:106-310`): per entity slug, gather its current
  * memories' snippets (newest first, bounded), write a versioned identity
  * profile via the pluggable writer. The writer call runs once per entity
  * group — the shape an external LLM batch stage needs.
  */
object IdentitySynthesis {
  import org.apache.spark.sql.expressions.Window

  def synthesize(memories: org.apache.spark.sql.DataFrame,
      writer: IdentityWriter, maxSnippets: Int = 5,
      version: Int = 1): org.apache.spark.sql.DataFrame = {
    val spark = memories.sparkSession
    val entityTag = explode(filter(col("tags"), t => t.startsWith("entity:")))
    val base = memories
      .filter(coalesce(col("archived"), lit(false)) === false)
      .select(col("id"), col("timestamp"),
        substring(col("content"), 1, 160).as("snippet"), entityTag.as("etag"))
      .withColumn("slug", element_at(split(col("etag"), ":"), 3))
    // the SOURCE COUNT is the total current memory count
    // (`identity_synthesis.py` gathers refs with limit=None) — the
    // reference's staleness check compares it to the live reference
    // count, so a capped value would mis-trigger re-synthesis forever
    // past maxSnippets memories. It is a combiner aggregate over ALL
    // mentions, joined back — never computed inside the snippet ranking.
    val stats = base.groupBy(col("slug"))
      .agg(count(lit(1)).as("identity_source_count"),
        max(col("timestamp")).as("identity_updated_at"))
    // two-phase top-maxSnippets per entity (the hot-key doctrine): a
    // celebrity entity's mention count grows with the corpus, so phase 1
    // keeps top-k per (slug, id-salt) on bounded groups and the final
    // rank sees <= 64k rows per slug — exact, same total order
    val w1 = Window.partitionBy(col("slug"),
        pmod(xxhash64(col("id")), lit(64L)))
      .orderBy(desc("timestamp"), asc("id"))
    val w = Window.partitionBy(col("slug"))
      .orderBy(desc("timestamp"), asc("id"))
    val snippets = base
      .withColumn("_p1", row_number().over(w1))
      .filter(col("_p1") <= maxSnippets)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxSnippets)
      .groupBy(col("slug"))
      .agg(sort_array(collect_list(struct(col("_rn"), col("snippet"))))
        .getField("snippet").as("snippets"))
    val perEntity = stats.join(snippets, Seq("slug"))
      .select(col("slug"), col("snippets"), col("identity_source_count"),
        col("identity_updated_at"))
    val writeUdf = org.apache.spark.sql.functions.udf(
      (slug: String, snippets: Seq[String]) => writer.write(slug, snippets))
    perEntity
      .withColumn("identity", writeUdf(col("slug"), col("snippets")))
      .withColumn("identity_version", lit(version))
      .drop("snippets")
  }
}

package graft.domain

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal chat-completion client seam for the LLM-backed stages (U4
  * summarization, U6 identity synthesis). The reference calls an
  * OpenAI-compatible `chat.completions.create` with a system + user message
  * (`/root/reference/automem/utils/text.py:157-165`,
  * `automem/consolidation/identity_synthesis.py:249-266`); this trait is
  * that call shape and nothing more, so a deployment plugs in any
  * compatible endpoint while the deterministic fallbacks stay the default
  * in this zero-egress build.
  *
  * `complete` returns None on ANY failure — the reference's contract
  * (`summarize_content` returns None on exception and the caller keeps the
  * original content / extractive path), so a flaky LLM can degrade quality
  * but never break ingest.
  */
trait ChatClient extends Serializable {
  def complete(system: String, user: String): Option[String]
}

/** OpenAI-compatible chat transport on the JDK HttpClient (zero added
  * dependencies, same construction as [[HttpEmbeddingTransport]]): POST
  * `{"model", "messages":[{system},{user}], "temperature", "max_tokens"}`,
  * Bearer auth, answer at `choices[0].message.content`. Executor-safe: the
  * client is transient and rebuilt per JVM.
  */
class HttpChatTransport(
    endpoint: String,
    apiKey: Option[String],
    model: String,
    temperature: Double = 0.3,
    maxTokens: Int = 500,
    timeoutMs: Long = 30000) extends ChatClient {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def complete(system: String, user: String): Option[String] = {
    try {
      val root = mapper.createObjectNode()
      root.put("model", model)
      val msgs = root.putArray("messages")
      val sys = msgs.addObject()
      sys.put("role", "system"); sys.put("content", system)
      val usr = msgs.addObject()
      usr.put("role", "user"); usr.put("content", user)
      root.put("temperature", temperature)
      root.put("max_tokens", maxTokens)
      val builder = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(root)))
      apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
      val resp = client.send(builder.build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() < 200 || resp.statusCode() >= 300) return None
      val body = mapper.readTree(resp.body())
      val content = body.path("choices").path(0).path("message").path("content")
      if (content.isTextual) Some(content.asText()) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** U4 LLM summarization (`automem/utils/text.py:105-191`): the reference's
  * system prompt verbatim in spirit (condense, preserve decisions/outcomes,
  * no formatting), target-length in the prompt, and the same validation —
  * a summary that is empty or NOT SHORTER than the input returns None and
  * the caller keeps the extractive path. Content at or under the target
  * passes through unchanged, as the reference's early return does.
  */
class LlmSummarizer(client: ChatClient, targetLength: Int = 300)
    extends Serializable {

  private def systemPrompt: String =
    "You are a memory summarization assistant. Condense the memory into a " +
      "brief, information-dense summary. Preserve the key decision, insight," +
      " pattern, or context; keep names, files, and technical terms; output " +
      s"ONLY the summary text. Target length: under $targetLength characters."

  def summarize(content: String): Option[String] = {
    if (content == null || content.isEmpty) return None
    if (content.length <= targetLength) return Some(content)
    client.complete(systemPrompt, content) match {
      case Some(s) if s.trim.nonEmpty && s.trim.length < content.length =>
        Some(s.trim)
      case _ => None
    }
  }

  /** Column form for [[Ingest.prepare]]'s pluggable summary stage: LLM
    * summary when the call succeeds and shortens, else the extractive
    * fallback — the reference's exact degradation order
    * (`automem/api/memory.py` summarize-then-fallback on None).
    */
  def column: Column => Column = { c =>
    val self = this
    val f = udf((content: String) => self.summarize(content).orNull)
    org.apache.spark.sql.functions.coalesce(f(c), Ingest.extractiveSummary(c))
  }
}

/** U6 LLM identity writer (`identity_synthesis.py:185-310`): formats the
  * entity's snippets as the reference's numbered memory block, asks for a
  * concise identity definition, and falls back to the extractive writer
  * when the call fails — synthesis must never lose an entity to a flaky
  * endpoint.
  */
class LlmIdentityWriter(client: ChatClient,
    fallback: IdentityWriter = new ExtractiveIdentityWriter)
    extends IdentityWriter {

  override def write(entitySlug: String, snippets: Seq[String]): String = {
    val block = snippets.zipWithIndex
      .map { case (s, i) => s"${i + 1}. $s" }.mkString("\n")
    client.complete(
      "You synthesize concise identity definitions from episodic memories.",
      s"Entity: $entitySlug\nMemories:\n$block\n" +
        "Write a concise identity definition for this entity.")
      .map(_.trim).filter(_.nonEmpty)
      .getOrElse(fallback.write(entitySlug, snippets))
  }
}

/** U2 memory-classifier LLM fallback (`automem/classification/
  * memory_classifier.py:107-199`) — the last reference LLM chokepoint to
  * get a trait seam. Contract, in the reference's order:
  *
  *  1. the deterministic regex table first ([[Ingest.TypePatterns]] — same
  *     first-type-wins + count-boosted confidence as [[Ingest.classify]],
  *     spec-pinned to agree with the column form row-for-row);
  *  2. only when EVERY pattern misses, one chat call carrying the
  *     reference's system prompt (the 7 canonical types + a JSON-object
  *     instruction) and the content truncated to 1000 chars
  *     (`memory_classifier.py:160-166`);
  *  3. the answer parses as `{"type": ..., "confidence": ...}`; the type
  *     normalizes through the canonical/alias table; an unmappable type
  *     yields ("Context", 0.5) exactly as the reference's fallback does;
  *  4. any transport failure, empty answer, or invalid JSON degrades to the
  *     reference's terminal default — ("Memory", 0.3), which this engine's
  *     alias table canonicalizes to "Context" — so a flaky LLM can never
  *     break ingest (same None-on-failure doctrine as [[LlmSummarizer]]).
  */
class LlmClassifier(client: ChatClient) extends Serializable {

  /** The reference's classification system prompt in spirit: the 7 types
    * with one-line definitions and the JSON response contract.
    */
  def systemPrompt: String =
    "You are a memory classification system. Classify each memory into " +
      "exactly ONE of these types:\n" +
      "- Decision: choices made, selected options, what was decided\n" +
      "- Pattern: recurring behaviors, typical approaches\n" +
      "- Preference: likes/dislikes, favorites, personal tastes\n" +
      "- Style: communication approach, formatting, tone\n" +
      "- Habit: regular routines, repeated actions, schedules\n" +
      "- Insight: discoveries, learnings, realizations\n" +
      "- Context: situational background, circumstances\n" +
      "Return JSON with: {\"type\": \"<type>\", \"confidence\": <0.0-1.0>}"

  /** Row form of [[Ingest.classify]]'s pattern stage: Some((type, conf))
    * when any pattern matches, None when the content falls through to the
    * LLM. Kept semantically identical to the Column form (first type in
    * table order with a match wins; 0.6 + 0.1 per extra pattern of that
    * type, capped 0.95) so swapping the classifier in cannot change
    * already-classifiable rows.
    */
  def patternClassify(content: String): Option[(String, Double)] =
    Ingest.TypePatterns.collectFirst {
      case (t, ps) if ps.exists(p => p.r.findFirstIn(content).isDefined) =>
        val m = ps.count(p => p.r.findFirstIn(content).isDefined)
        (t, math.min(0.95, 0.6 + (m - 1) * 0.1))
    }

  private def normalizeType(raw: String): Option[String] = {
    val t = Option(raw).map(_.trim).getOrElse("")
    if (Ingest.MemoryTypes.contains(t)) Some(t)
    else Ingest.TypeAliases.get(t.toLowerCase)
  }

  /** The LLM leg alone: None on transport failure / empty / invalid JSON. */
  def classifyWithLlm(content: String): Option[(String, Double)] =
    client.complete(systemPrompt, content.take(1000)).flatMap { raw =>
      try {
        val mapper = new ObjectMapper()
        val node = mapper.readTree(raw)
        if (!node.isObject) None
        else {
          // clamp: a misbehaving model returning 100 or -1 must not
          // persist out-of-range confidence into the memories relation
          // (Ingest.prepare's [0,1] clamp only covers explicitly-typed rows)
          val conf = if (node.path("confidence").isNumber)
            math.min(1.0, math.max(0.0, node.path("confidence").asDouble()))
          else 0.7
          normalizeType(node.path("type").asText("")) match {
            case Some(t) => Some((t, conf))
            // unmappable type: the reference logs and returns Context 0.5
            case None => Some(("Context", 0.5))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Full classify contract: patterns, then LLM, then the terminal
    * default. "Memory" 0.3 is the reference's literal fallback pair;
    * through this engine's alias table that canonicalizes to Context.
    */
  def classify(content: String): (String, Double) =
    patternClassify(content)
      .orElse(classifyWithLlm(content))
      .getOrElse(("Context", 0.3))

  /** Column form for [[Ingest.prepare]]'s pluggable classify stage: a
    * struct (_1 = type, _2 = confidence). Pattern-matched rows stay on the
    * codegen regex path — the UDF (and therefore the chat call) evaluates
    * ONLY on the no-pattern branch, so classification cost is one HTTP
    * call per genuinely ambiguous row, not per row.
    */
  def resolve: Column => Column = { c =>
    val self = this
    val llm = udf((content: String) =>
      self.classifyWithLlm(content).getOrElse(("Context", 0.3)))
    val (pt, pc) = Ingest.classify(c)
    org.apache.spark.sql.functions.when(Ingest.anyPatternMatch(c),
      org.apache.spark.sql.functions.struct(pt.as("_1"), pc.as("_2")))
      .otherwise(llm(c))
  }
}

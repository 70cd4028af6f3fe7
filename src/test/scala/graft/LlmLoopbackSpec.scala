package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** U4/U6 LLM stages exercised END-TO-END through the HTTP trait against a
  * loopback chat-completions server (VERDICT r9 item 8) — the way
  * HttpTransportSpec proves U1: request shape, auth header, response
  * parsing, and the None-on-failure fallback contract all run for real,
  * not just the deterministic fallbacks.
  */
class LlmLoopbackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** One-endpoint loopback chat server; `handler(body, exchange)` returns
    * (status, responseBody). Returns the requests the server saw.
    */
  private def withServer(handler: (String, HttpExchange) => (Int, String))(
      f: String => Unit): Seq[String] = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seen.synchronized { seen += body }
      val (status, resp) = handler(body, ex)
      val bytes = resp.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
    seen.toSeq
  }

  private def chatResponse(text: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val choice = root.putArray("choices").addObject()
    choice.putObject("message").put("role", "assistant").put("content", text)
    mapper.writeValueAsString(root)
  }

  test("U4: ingest summarize-gate runs through the HTTP chat trait") {
    import spark.implicits._
    val canned = "Canned LLM summary. Decision preserved. Outcome noted."
    val requests = withServer((_, _) => (200, chatResponse(canned))) { url =>
      val client = new HttpChatTransport(url, Some("test-key"), "test-model")
      val summarizer = new LlmSummarizer(client, targetLength = 300)
      val long = "the quarterly design review decided to keep the v2 api. " * 12
      val docs = Seq(("short content"), (long)).toDF("content")
      val out = Ingest.prepare(docs, summarize = Some(summarizer.column))
        .select("content", "summary").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      // only the oversized row is summarized, and by the LLM not extractive
      assert(out("short content") == null, "under-limit content has no summary")
      assert(out(long) == canned, s"expected the canned LLM summary: $out")
    }
    // exactly one chat call (one oversized row), carrying the reference's
    // prompt shape: model + system/user messages + the target length
    assert(requests.size == 1, s"expected 1 chat call, got ${requests.size}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val req = mapper.readTree(requests.head)
    assert(req.get("model").asText() == "test-model")
    val roles = (0 until req.get("messages").size())
      .map(i => req.get("messages").get(i).get("role").asText())
    assert(roles == Seq("system", "user"), s"got $roles")
    assert(req.get("messages").get(0).get("content").asText()
      .contains("under 300 characters"))
  }

  test("U4: a failing or non-shortening LLM falls back to extractive") {
    import spark.implicits._
    val long = "first sentence about the migration decision. " +
      ("filler words repeated over and over again. " * 20)
    // server answers 500 -> summarize() None -> extractive fallback
    withServer((_, _) => (500, """{"error":"boom"}""")) { url =>
      val client = new HttpChatTransport(url, None, "m")
      val out = Ingest.prepare(Seq(long).toDF("content"),
        summarize = Some(new LlmSummarizer(client).column))
        .select("summary").head.getString(0)
      assert(out == "first sentence about the migration decision.",
        s"expected extractive fallback, got: $out")
    }
    // server answers but does NOT shorten -> same fallback (the reference
    // validates len(summary) < len(content) before accepting)
    withServer((_, _) => (200, chatResponse(long + long))) { url =>
      val client = new HttpChatTransport(url, None, "m")
      assert(new LlmSummarizer(client).summarize(long).isEmpty,
        "a non-shortening summary must be rejected")
    }
  }

  test("U6: identity synthesis runs through the HTTP trait with fallback") {
    import spark.implicits._
    val requests = withServer { (body, _) =>
      // echo back an identity that names the entity from the user prompt
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val user = mapper.readTree(body).get("messages").get(1)
        .get("content").asText()
      val slug = user.linesIterator.next().stripPrefix("Entity: ")
      (200, chatResponse(s"$slug is a long-term collaborator."))
    } { url =>
      val client = new HttpChatTransport(url, Some("k"), "id-model")
      val writer = new LlmIdentityWriter(client)
      val now = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
      val mem = Seq(
        ("m1", "alice shipped the ingest fix", now,
          Seq("entity:people:alice"), false),
        ("m2", "alice reviewed the recall design", now,
          Seq("entity:people:alice"), false))
        .toDF("id", "content", "timestamp", "tags", "archived")
      val ids = IdentitySynthesis.synthesize(mem, writer).collect()
      assert(ids.length == 1)
      val row = ids.head
      assert(row.getAs[String]("slug") == "alice")
      assert(row.getAs[String]("identity") ==
        "alice is a long-term collaborator.", s"got $row")
    }
    assert(requests.size == 1, "one entity -> one chat call")
    // fallback: dead endpoint -> the extractive writer's profile, never a
    // lost entity
    val writer = new LlmIdentityWriter(
      new HttpChatTransport("http://127.0.0.1:1/nope", None, "m",
        timeoutMs = 300))
    val profile = writer.write("bob", Seq("snippet a", "snippet b"))
    assert(profile == "bob: snippet a | snippet b", profile)
  }

  test("U2: classifier LLM fallback runs through the HTTP trait end-to-end") {
    import spark.implicits._
    // server classifies anything it is asked about as a lowercase alias —
    // proving the normalize path — with its own confidence
    val requests = withServer((_, _) =>
      (200, chatResponse("""{"type": "insight", "confidence": 0.85}"""))) { url =>
      val client = new HttpChatTransport(url, Some("k"), "cls-model")
      val classifier = new LlmClassifier(client)
      val docs = Seq(
        "decided to use parquet for the backup format", // pattern hit
        "zxqv plorf miltrane oseta").toDF("content") // no pattern -> LLM
      val out = Ingest.prepare(docs, classifier = Some(classifier.resolve))
        .select("content", "type", "confidence").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      // pattern row: codegen regex path, untouched by the LLM
      assert(out("decided to use parquet for the backup format") ==
        ("Decision", 0.6), s"got $out")
      // ambiguous row: LLM answer, alias-normalized to canonical
      assert(out("zxqv plorf miltrane oseta") == ("Insight", 0.85), s"got $out")
    }
    // exactly ONE chat call — the pattern-matched row never reaches the LLM
    assert(requests.size == 1, s"expected 1 chat call, got ${requests.size}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val req = mapper.readTree(requests.head)
    assert(req.get("model").asText() == "cls-model")
    val sys = req.get("messages").get(0).get("content").asText()
    assert(sys.contains("memory classification system") &&
      sys.contains("\"confidence\""), s"system prompt shape: $sys")
    assert(req.get("messages").get(1).get("content").asText() ==
      "zxqv plorf miltrane oseta")
  }

  test("U2: out-of-range LLM confidence is clamped to [0,1] (r12 ADVICE)") {
    // Ingest.prepare's clamp only covers explicitly-typed rows, so the
    // classifier leg must clamp itself or a misbehaving model persists
    // confidence=100 into the memories relation
    withServer((_, _) =>
      (200, chatResponse("""{"type": "insight", "confidence": 100}"""))) {
      url =>
        val classifier = new LlmClassifier(
          new HttpChatTransport(url, Some("k"), "cls-model"))
        assert(classifier.classify("zxqv plorf") == ("Insight", 1.0))
    }
    withServer((_, _) =>
      (200, chatResponse("""{"type": "insight", "confidence": -3.5}"""))) {
      url =>
        val classifier = new LlmClassifier(
          new HttpChatTransport(url, Some("k"), "cls-model"))
        assert(classifier.classify("zxqv plorf") == ("Insight", 0.0))
    }
  }

  test("U2: classifier degrades to the reference's terminal default") {
    // dead endpoint -> ("Memory", 0.3) in the reference, canonicalized
    // Context here; unmappable type -> Context 0.5; invalid JSON -> default
    val dead = new LlmClassifier(new HttpChatTransport(
      "http://127.0.0.1:1/nope", None, "m", timeoutMs = 300))
    assert(dead.classify("zxqv plorf") == ("Context", 0.3))
    withServer((_, _) => (200, chatResponse("""{"type": "saga"}"""))) { url =>
      val c = new LlmClassifier(new HttpChatTransport(url, None, "m"))
      assert(c.classify("zxqv plorf") == ("Context", 0.5),
        "unmappable LLM type must yield Context 0.5")
    }
    withServer((_, _) => (200, chatResponse("not json at all"))) { url =>
      val c = new LlmClassifier(new HttpChatTransport(url, None, "m"))
      assert(c.classify("zxqv plorf") == ("Context", 0.3),
        "invalid JSON must fall to the terminal default")
    }
    // content truncates to 1000 chars before the call (reference :160-166)
    val long = "y" * 5000
    val seen = withServer((_, _) =>
      (200, chatResponse("""{"type": "habit", "confidence": 0.6}"""))) { url =>
      val c = new LlmClassifier(new HttpChatTransport(url, None, "m"))
      assert(c.classify(long) == ("Habit", 0.6))
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(seen.head).get("messages").get(1)
      .get("content").asText().length == 1000)
  }

  test("U2: row-form pattern stage agrees with the Column classifier") {
    import spark.implicits._
    // never-called client: patternClassify must not need the LLM
    val c = new LlmClassifier((_: String, _: String) => fail("LLM reached"))
    val samples = Seq(
      "decided to go with spark", "we prefer tabs rather than spaces",
      "daily routine: standup then review", "realized the cache was stale",
      "a recurring pattern appears every time", "naming convention for tags",
      "completely ambiguous text with no signal")
    val fromCols = samples.toDF("content")
      .select(col("content"), Ingest.classify(col("content"))._1.as("t"),
        Ingest.classify(col("content"))._2.as("cf"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    samples.foreach { s =>
      val expected = c.patternClassify(s).getOrElse(("Context", 0.5))
      assert(expected == fromCols(s), s"row/column divergence on: $s")
    }
  }

  test("auth header and temperature/max_tokens reach the endpoint") {
    var auth: Option[String] = None
    val requests = withServer { (_, ex) =>
      auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      (200, chatResponse("ok"))
    } { url =>
      val client = new HttpChatTransport(url, Some("sk-test"), "m",
        temperature = 0.3, maxTokens = 150)
      assert(client.complete("sys", "usr").contains("ok"))
    }
    assert(auth.contains("Bearer sk-test"))
    val req = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(requests.head)
    assert(req.get("temperature").asDouble() == 0.3)
    assert(req.get("max_tokens").asInt() == 150)
  }
}

package graft

import graft.domain.MetadataScoring
import org.scalatest.funsuite.AnyFunSuite

/** Strong-evidence metadata scoring pinned to values RECOMPUTED by running
  * the reference's own `_metadata_match_score` / `_collect_metadata_terms`
  * (`/root/reference/automem/search/runtime_recall_helpers.py:245-340`,
  * `/root/reference/automem/utils/scoring.py:40-63`) on each crafted row —
  * one case per branch: two-hit strong evidence, weak single short hit,
  * single exact long hit, multi-token single-hit rejection, the repo
  * coverage guard, the off-field 0.6 penalty, entities exclusion and
  * opt-in, entities.people hard exclusion, source-agent phrase
  * disambiguation, and the requested-field bonus.
  */
class MetadataScoringSpec extends AnyFunSuite {

  private def assertScore(query: String, json: String, expected: Double): Unit = {
    val got = MetadataScoring.matchScore(query, json)
    assert(math.abs(got - expected) < 1e-9,
      s"matchScore('$query', $json) = $got, reference says $expected")
  }

  test("two-hit multi-token value is strong evidence (no fields requested)") {
    assertScore("postgres migration plan", """{"project": "postgres migration"}""",
      0.8833333333333333)
  }

  test("single short (<5 char) hit is not evidence") {
    assertScore("use the beta env", """{"tool": "beta"}""", 0.0)
  }

  test("single long exact hit with few query tokens is evidence") {
    assertScore("deploys for grafana", """{"tool": "grafana"}""", 0.85)
  }

  test("one hit on a multi-token value is rejected (needs min(2,n) hits)") {
    assertScore("grafana dashboards latency", """{"tool": "grafana-cloud"}""", 0.0)
  }

  test("repo guard: requested repo must cover all query value tokens") {
    assertScore("repo automem fixes", """{"repo": "verygoodplugins/automem"}""", 0.0)
  }

  test("repo fully covered scores with exact and requested-field bonuses") {
    assertScore("repo verygoodplugins automem",
      """{"repo": "verygoodplugins/automem"}""", 1.0)
  }

  test("hit on a non-requested field takes the 0.6 penalty") {
    assertScore("for project alpha beta", """{"tool": "alpha beta"}""",
      0.5700000000000001)
  }

  test("entities values are excluded unless the query asks for entities") {
    assertScore("alpha sprint summary",
      """{"entities": {"projects": ["alpha sprint"]}}""", 0.0)
    assertScore("entities alpha sprint",
      """{"entities": {"projects": ["alpha sprint"]}}""", 1.0)
  }

  test("entities.people are always excluded") {
    assertScore("entities mara quinn",
      """{"entities": {"people": ["mara quinn"]}}""", 0.0)
  }

  test("source agent phrase requests the agent fields, not source") {
    assertScore("source agent claude memories", """{"source_agent": "claude"}""", 1.0)
    assert(MetadataScoring.requestedFields("source agent claude memories") ==
      Set("source_agent", "source_agents"))
  }

  test("single long hit on a requested field scores without exact bonus") {
    assertScore("repo verygoodplugins", """{"repo": "verygoodplugins/automem"}""",
      0.7749999999999999)
  }

  test("single non-exact hit with no requested fields is rejected") {
    assertScore("find memories about caching", """{"trigger": "caching strategy"}""", 0.0)
  }

  test("requested model field with exact short-but-3+ hit is evidence") {
    assertScore("model gpt4 benchmarks", """{"model": "gpt4"}""", 1.0)
  }

  test("exact component term set: values and their tokens, never keys or entities") {
    // reference _collect_metadata_terms on {"project": "alpha"}: key names
    // are NOT terms — the raw-JSON substring probe would fire on 'project'
    assert(MetadataScoring.collectTerms("""{"project": "alpha"}""") == Set("alpha"))
    assert(MetadataScoring.collectTerms("""{"project": "alpha beta"}""") ==
      Set("alpha", "beta", "alpha beta"))
    // cross-token substrings ('pha be') are not terms either
    assert(!MetadataScoring.collectTerms("""{"project": "alpha beta"}""").contains("pha be"))
    // the entities subtree is skipped wholesale
    assert(MetadataScoring.collectTerms("""{"entities": {"tools": ["spark"]}}""").isEmpty)
    // nested containers are walked
    assert(MetadataScoring.collectTerms("""{"a": {"b": ["Nested Val"]}}""") ==
      Set("nested", "val", "nested val"))
  }

  test("prefilter terms drop field tokens and metadata stopwords, cap 12") {
    assert(MetadataScoring.prefilterTerms("find repo automem memories") == Seq("automem"))
    assert(MetadataScoring.prefilterTerms("the of to") == Nil)
    val many = (1 to 20).map(i => s"term$i").mkString(" ")
    assert(MetadataScoring.prefilterTerms(many).length == 12)
  }

  test("malformed and non-object metadata JSON scores zero, yields no terms") {
    assertScore("postgres migration plan", "not json", 0.0)
    assertScore("postgres migration plan", """["postgres migration"]""", 0.0)
    assert(MetadataScoring.collectTerms("{broken").isEmpty)
  }
}

package graft

import graft.domain.EntityQuality
import org.scalatest.funsuite.AnyFunSuite

/** Entity quality gate pinned to the reference's own accept/reject decisions
  * (`/root/reference/tests/test_entity_quality.py:22-333`) — every example
  * below is taken from that suite, asserting the same outcome and (where the
  * reference asserts it) the same reason string.
  */
class EntityQualitySpec extends AnyFunSuite {

  private val allCats = Seq("people", "organizations", "tools", "projects", "concepts")

  test("issue72 low-quality slugs are rejected across all categories") {
    val slugs = Seq("completed", "advocacy", "involvement", "key-findings",
      "deployed-automem", "config-file-approach", "recommended", "word",
      "ud83d-udc4d")
    for (cat <- allCats; slug <- slugs) {
      val r = EntityQuality.validateSlug(cat, slug)
      assert(!r.accepted, s"$cat/$slug must be rejected")
      assert(r.category == cat && r.slug == slug && r.reason.nonEmpty)
    }
  }

  test("structural noise slugs are rejected with the reference's exact reason") {
    val cases = Seq(
      ("concepts", "00-00-berlin", "duration_or_count_slug"),
      ("concepts", "400ms", "duration_or_count_slug"),
      ("concepts", "12k", "duration_or_count_slug"),
      ("concepts", "12209-berlin", "duration_or_count_slug"),
      ("concepts", "7bd06aa-ed36b98e", "generated_fragment_slug"),
      ("tools", "ud83c-udd95-starting", "unicode_escape_slug"),
      ("tools", "ud83d-udea7-active-projects", "unicode_escape_slug"),
      ("tools", "venv-bin-python-m", "markdown_or_code_fragment"),
      ("tools", "tmp-settings", "markdown_or_code_fragment"),
      ("tools", "system-settings-wallpaper", "markdown_or_code_fragment"),
      ("tools", "twitter-x-https-x-com-example", "generated_phrase_slug"),
      ("tools", "terms-and-conditions-negotiation", "generated_phrase_slug"),
      ("tools", "sep-22-2025", "generated_phrase_slug"),
      ("concepts", "the-plan", "generic_entity_slug"),
      ("projects", "add-longmemeval", "generic_entity_slug"))
    for ((cat, slug, reason) <- cases) {
      val r = EntityQuality.validateSlug(cat, slug)
      assert(!r.accepted && r.reason == reason,
        s"$cat/$slug: expected $reason, got ${r.reason} (accepted=${r.accepted})")
    }
  }

  test("generic and tooling noise is rejected") {
    val okReasons = Set("generic_entity_slug", "low_signal_slug",
      "low_signal_people_slug", "markdown_or_code_fragment",
      "non_name_people_slug", "tool_or_organization_looking_people")
    val cases = Seq(
      ("organizations", "time"), ("organizations", "tags"),
      ("tools", "system"), ("tools", "workflow"),
      ("concepts", "before-after"),
      ("people", "docker-compose"), ("people", "complete-deliverable"),
      ("people", "youtube-pipeline"))
    for ((cat, slug) <- cases) {
      val r = EntityQuality.validateSlug(cat, slug)
      assert(!r.accepted && okReasons.contains(r.reason),
        s"$cat/$slug: got ${r.reason} (accepted=${r.accepted})")
    }
  }

  test("possessive and suffix variants canonicalize to the base people slug") {
    for (slug <- Seq("alex-beck-s", "alex-beck-a")) {
      val r = EntityQuality.validateSlug("people", slug)
      assert(r.accepted && r.canonicalSlug == "alex-beck")
      assert(r.canonicalTag == "entity:people:alex-beck")
      assert(r.confidence >= 0.8)
    }
  }

  test("people slugs must have person name shape") {
    val okReasons = Set("low_signal_people_slug", "markdown_or_code_fragment",
      "non_name_people_slug", "tool_or_organization_looking_people")
    for (slug <- Seq("alex-beck-extra", "alex-beck-extra-name",
      "recreated-claude-code", "sora-2", "config-file", "phase-five")) {
      val r = EntityQuality.validateSlug("people", slug)
      assert(!r.accepted && okReasons.contains(r.reason), s"$slug: ${r.reason}")
    }
  }

  test("tool-like camelcase name is not emitted as people but accepted as tool") {
    val context = Some("Met with MetricForge about B2B SaaS pipeline automation.")
    val people = EntityQuality.validateValue("people", "MetricForge", context)
    val tool = EntityQuality.validateValue("tools", "MetricForge", context)
    assert(!people.accepted && people.reason == "tool_or_organization_looking_people")
    assert(tool.accepted)
  }

  test("single-token specific entities need no curated allowlist") {
    val cases = Seq(
      ("tools", "vectorstorex"), ("tools", "graphdbx"), ("tools", "containerkit"),
      ("tools", "forgehub"), ("tools", "testrunner"),
      ("organizations", "northstarops"), ("organizations", "orbitlabs"),
      ("concepts", "recallgraph"), ("concepts", "episodicindex"))
    for ((cat, slug) <- cases) {
      val r = EntityQuality.validateSlug(cat, slug)
      assert(r.accepted && r.canonicalSlug == slug, s"$cat/$slug: ${r.reason}")
    }
  }

  test("multi-token person names survive technical context") {
    for (value <- Seq("Mara Quinn", "Tobias Lehman", "Priya J Raman")) {
      val context = Some(s"Met with $value about the data pipeline project; " +
        "the platform tooling and database service migration are on track.")
      val r = EntityQuality.validateValue("people", value, context)
      assert(r.accepted, s"$value: ${r.reason}")
    }
  }

  test("single-token brand-like people still rejected in tool context") {
    val context = Some("Deployed memvault to the platform; the data pipeline project uses it.")
    val r = EntityQuality.validateValue("people", "memvault", context)
    assert(!r.accepted && r.reason == "tool_or_organization_looking_people")
  }

  test("tool-or-org suffix people rejected even with person shape") {
    val context = Some("GrowthMath specializes in B2B SaaS analytics.")
    val r = EntityQuality.validateValue("people", "growthmath", context)
    assert(!r.accepted && r.reason == "tool_or_organization_looking_people")
  }

  test("code-suffixed tool names are accepted; code/markdown fragments rejected") {
    for (slug <- Seq("claude-code", "vs-code", "code-server")) {
      val r = EntityQuality.validateSlug("tools", slug)
      assert(r.accepted && r.canonicalSlug == slug, s"$slug: ${r.reason}")
    }
    for ((cat, slug) <- Seq(("people", "claude-code"), ("organizations", "claude-md"),
      ("tools", "venv-bin-python-m"), ("tools", "tmp-settings"))) {
      assert(!EntityQuality.validateSlug(cat, slug).accepted, s"$cat/$slug")
    }
  }

  test("event and opportunity categories are supported and normalized") {
    val cases = Seq(
      ("events", "events", "launch-summit-2026"),
      ("event", "events", "launch-summit-2026"),
      ("opportunities", "opportunities", "hosting-partnerships"),
      ("opportunity", "opportunities", "hosting-partnerships"))
    for ((cat, normalized, slug) <- cases) {
      val r = EntityQuality.validateSlug(cat, slug)
      assert(r.accepted && r.category == normalized, s"$cat/$slug: ${r.reason}")
      assert(r.canonicalTag == s"entity:$normalized:$slug")
    }
  }

  test("common word pairs are not people") {
    for (slug <- Seq("bottom-line", "deck-today", "email-highlights", "claude-desktop")) {
      val r = EntityQuality.validateSlug("people", slug)
      assert(!r.accepted && r.reason == "low_signal_people_slug", s"$slug: ${r.reason}")
    }
  }

  test("people tags survive technical context on the slug-only tag path") {
    for (slug <- Seq("mara-quinn", "tobias-lehman")) {
      val display = slug.split("-").map(_.capitalize).mkString(" ")
      val context = Some(s"Met with $display about the data pipeline project; " +
        "the platform tooling and database service migration are on track.")
      val r = EntityQuality.validateTag(s"entity:people:$slug", context)
      assert(r.accepted, s"$slug: ${r.reason}")
    }
  }

  test("brand-like token pairs rejected on the slug path without context") {
    val r = EntityQuality.validateTag("entity:people:data-dog")
    assert(!r.accepted && r.reason == "low_signal_people_slug")
  }

  test("malformed tags are rejected as invalid_entity_tag") {
    assert(EntityQuality.validateTag("not-an-entity-tag").reason == "invalid_entity_tag")
    assert(EntityQuality.validateTag("entity:people").reason == "invalid_entity_tag")
  }

  test("confidence ladder: single-token people 0.6, multi-token 0.95, canonicalized 0.85+") {
    assert(EntityQuality.validateSlug("people", "alice").confidence == 0.6)
    assert(EntityQuality.validateSlug("people", "mara-quinn").confidence == 0.95)
    assert(EntityQuality.validateSlug("tools", "testrunner").confidence == 0.95)
  }
}

package graft

import graft.domain.{Enrichment, Ingest, NerLite}
import org.scalatest.funsuite.AnyFunSuite

/** Rule-based NER channel (VERDICT r3 missing #3 — the reference's optional
  * spaCy path, `entity_extraction.py:151-182`, restored as deterministic
  * rules): span chunking, label lexicons, and the merge with the regex
  * channel behind the shared EntityQuality gate.
  */
class NerLiteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cats(text: String): Set[(String, String)] =
    NerLite.candidates(text).toSet

  test("multi-token people names are recognized mid-sentence") {
    assert(cats("Yesterday Elena Vasquez reviewed the draft")
      .contains(("people", "Elena Vasquez")))
    // the cue-word regex channel cannot see this name (no 'with/met' cue)
    assert(cats("The analysis Maria Schmidt prepared was thorough")
      .contains(("people", "Maria Schmidt")))
  }

  test("honorifics mark the following span as a person") {
    assert(cats("We asked Dr Osei for a second opinion")
      .contains(("people", "Osei")))
  }

  test("organization suffix and head lexicons label organizations") {
    assert(cats("She joined Helix Labs last spring")
      .contains(("organizations", "Helix Labs")))
    assert(cats("He studied at University of Oslo for two years")
      .contains(("organizations", "University of Oslo")))
  }

  test("location prepositions map to concepts (the spaCy GPE/LOC mapping)") {
    assert(cats("The team met in Lisbon for the offsite")
      .contains(("concepts", "Lisbon")))
    // the 2-token case the r5 rule reorder exists for: the location
    // preposition check must run BEFORE the Firstname-Lastname shape, or
    // "New York" labels as a person (NerLite.scala location rule precedes
    // the 2-3-token people rule)
    val ny = cats("We met in New York last week")
    assert(ny.contains(("concepts", "New York")))
    assert(!ny.exists { case (cat, name) => cat == "people" && name == "New York" })
  }

  test("noise is dropped: sentence-start singles, months, bare capitals") {
    // single capitalized sentence-start word: ambiguous, dropped
    assert(!cats("Spark is the framework we use").exists(_._2 == "Spark"))
    // month capitals never become entities
    assert(!cats("The review happened in May this year").exists(_._2 == "May"))
    // mid-sentence single capital with no cue: dropped
    assert(!cats("We shipped the Falcon build").exists(_._2 == "Falcon"))
    // spans never cross sentence punctuation
    assert(!cats("We met Elena. Vasquez arrived later")
      .exists(_._2 == "Elena Vasquez"))
  }

  test("NER channel merges with the regex channel behind the quality gate") {
    import spark.implicits._
    val mem = Ingest.prepare(Seq(
      ("m1", "Quarterly sync where Elena Vasquez presented the Helix Labs roadmap"),
      ("m2", "Deployed the service with `kubectl` after review"))
      .toDF("id", "content"))
    val withNer = Enrichment.extractEntities(mem, ner = true)
      .select("id", "category", "slug").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(withNer.contains(("m1", "people", "elena-vasquez")))
    assert(withNer.contains(("m1", "organizations", "helix-labs")))
    assert(withNer.contains(("m2", "tools", "kubectl")))
    // regex-only path stays unchanged (the oracle-gated default)
    val plain = Enrichment.extractEntities(mem)
      .select("category").collect().map(_.getString(0)).toSet
    assert(!plain.contains("organizations"))
  }
}

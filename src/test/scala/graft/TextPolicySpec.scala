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
}

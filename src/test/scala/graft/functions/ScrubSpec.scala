package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii counts and redacts each PII class") {
    val df = Seq(
      (0L, "mail alice.b+spam@sub.example.co.uk and bob@x.io, call 555-123-4567"),
      (1L, "server at 192.168.0.1 and 10.0.0.255; version 1.2 is fine"),
      (2L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = Scrub.scrubPii(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == (2, 1, 0))
    assert(out(0).getString(4) == "mail <EMAIL> and <EMAIL>, call <PHONE>")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == (0, 0, 2))
    assert(out(1).getString(4) == "server at <IP> and <IP>; version 1.2 is fine")
    assert(out(2).getString(4) == "clean text with no pii at all")
  }

  test("counts reflect the replacements actually made, not raw-text matches") {
    // the whole phone-shaped string is consumed by the email match
    // (digits/hyphens are valid local-part chars), so NO <PHONE> token is
    // produced — and n_phones must say 0, not 1
    val df = Seq((0L, "call 555-123-4567@mail.io now")).toDF("doc_id", "text")
    val out = Scrub.scrubPii(df, col("doc_id"), col("text")).collect()(0)
    assert(out.getString(4) == "call <EMAIL> now")
    assert((out.getInt(1), out.getInt(2), out.getInt(3)) == (1, 0, 0))
  }

  test("scrubbing is idempotent and leaves no residual matches") {
    val df = Seq((0L, "x user@example.com 555-000-1111 8.8.8.8 y")).toDF("doc_id", "text")
    val once = Scrub.scrubPii(df, col("doc_id"), col("text"))
      .select(col("doc_id"), col("scrubbed").as("text"))
    val twice = Scrub.scrubPii(once, col("doc_id"), col("text")).collect().head
    assert(twice.getString(4) == "x <EMAIL> <PHONE> <IP> y")
    assert(twice.getInt(1) + twice.getInt(2) + twice.getInt(3) == 0,
      "no PII pattern may match the scrubbed text")
  }
}

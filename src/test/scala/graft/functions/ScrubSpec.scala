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

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data preparation: detect and redact
  * email addresses, NANP-style phone numbers, and IPv4 addresses,
  * reporting per-document match counts alongside the scrubbed text.
  *
  * Patterns deliberately avoid lookarounds and backreferences so the
  * SAME pattern strings run identically under Java regex (Spark
  * codegen'd `regexp_replace`/`regexp_count`) and RE2-family engines
  * (DuckDB, Go) — portability is part of the operator contract, since
  * the redaction must be reproducible wherever the corpus is re-read.
  *
  * Entirely map-side: a narrow projection at any corpus size.
  */
object Scrub {

  /** Email-ish: local part @ dotted domain with an alphabetic TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style `ddd-ddd-dddd` phone numbers on word boundaries. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** `(doc_id, n_emails, n_phones, n_ips, scrubbed)` — counts of each
    * PII class plus the text with matches replaced by typed tokens.
    * Emails are replaced first (their domains would otherwise be
    * partially shadowed by the IPv4 pattern on numeric hosts).
    *
    * Each class is counted on the text AS IT EXISTS at that stage of
    * the sequential replacement, so the counts equal the replacements
    * actually made — counting every class against the raw text would
    * report a phone inside an already-redacted email (digits and
    * hyphens are valid local-part chars) that produces no `<PHONE>`
    * token in the output.
    */
  def scrubPii(df: DataFrame, id: Column, text: Column): DataFrame = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    df.select(
      id.as("doc_id"),
      regexp_count(text, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(afterEmail, lit(PhoneRe)).cast("int").as("n_phones"),
      regexp_count(afterPhone, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_replace(afterPhone, Ipv4Re, "<IP>").as("scrubbed"))
  }
}

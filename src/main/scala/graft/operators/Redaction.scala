package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: mask email addresses and long
  * digit runs (account/phone/id numbers) in a text column, and count what
  * was masked so a pipeline can audit redaction rates per source.
  *
  * The reference pipeline ships identifiers around in cleartext
  * (reference: src/etl/transform.py builds per-user journey rows keyed by
  * user ids); a corpus pipeline feeding an LLM must scrub them instead —
  * this is the standard regex-scrub pass every open-data pipeline runs
  * (C4, RefinedWeb, Dolma all ship one).
  *
  * Scale shape: a pure narrow map — two `regexp_replace`s and two
  * `regexp_extract_all` counts directly on top of the scan, no shuffle,
  * no UDF (codegen'd string expressions), embarrassingly parallel at
  * 100 TB. Patterns are RE2-safe (no backrefs/lookahead), so external
  * engines replay them byte-for-byte: emails are masked BEFORE digit
  * runs (an email usually contains a maskable digit run; the order is
  * part of the contract), and counts are taken on the same intermediate
  * the replacements see.
  */
object Redaction {

  /** Deliberately RE2-compatible (and Java-regex-identical): character
    * classes + bounded quantifiers only. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Six-or-more consecutive digits — short enough to catch ids/accounts,
    * long enough to leave prices and dates alone. */
  val LongDigitsRe = "[0-9]{6,}"

  /** Adds `redacted` (the scrubbed text), `n_emails`, and `n_numbers` to
    * `df`. Emails are replaced with `emailToken` first; digit runs with
    * `numberToken` on the email-scrubbed text, so a digit run inside an
    * email is counted once (as an email), never twice. Tokens are escaped
    * for the replacement position (Java Matcher treats `$`/`\` as group
    * references there — a token like `$EMAIL$` would throw mid-job
    * otherwise). A numberToken containing 6+ consecutive digits would be
    * re-masked by its own pass, so it is rejected up front.
    */
  def redact(
      df: DataFrame,
      textCol: String,
      emailToken: String = "[EMAIL]",
      numberToken: String = "[NUMBER]"): DataFrame = {
    require(!emailToken.matches(s".*$LongDigitsRe.*"),
      s"emailToken '$emailToken' contains a 6+-digit run the digit pass would re-mask")
    require(!numberToken.matches(s".*$LongDigitsRe.*"),
      s"numberToken '$numberToken' contains a 6+-digit run its own pass would re-mask")
    val emailTok = java.util.regex.Matcher.quoteReplacement(emailToken)
    val numberTok = java.util.regex.Matcher.quoteReplacement(numberToken)
    val noEmail = regexp_replace(col(textCol), EmailRe, emailTok)
    df
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_numbers",
        size(regexp_extract_all(noEmail, lit(LongDigitsRe), lit(0))).cast("long"))
      .withColumn("redacted", regexp_replace(noEmail, LongDigitsRe, numberTok))
  }
}

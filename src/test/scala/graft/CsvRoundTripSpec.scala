package graft

/** The q66 CSV sink/source option pair must be content-lossless even for
  * text the current testdata happens not to contain: embedded newlines,
  * quotes, commas, and edge whitespace. Without multiLine=true the default
  * reader splits a quoted multi-line record into broken rows — q66 would
  * then pass only by luck of newline-free data (r7 advice). */
class CsvRoundTripSpec extends SparkSpec {
  test("CSV sink/source pair survives newlines, quotes, commas, edge spaces") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "line one\nline two\nline three"),
      (2L, "a \"quoted\" value, with commas"),
      (3L, "  leading and trailing  "),
      (4L, "plain"),
      (5L, "crlf\r\nline")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    rows.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    val back = s.read.option("header", "true").option("multiLine", "true")
      .schema(rows.schema).csv(path)
    val want = rows.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val got = back.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got === want)
  }
}

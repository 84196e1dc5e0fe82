package graft.maef

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replays the reference's committed golden artifacts
  * (/root/reference/data/output) through the loader / chunker / grouping
  * operators and asserts the facts SURVEY §5 extracts from them. */
class MaefGoldenSpec extends SparkSpec {

  test("loader flattens api_response.json to 3703 attribution rows, 1940 journeys") {
    val acj = Loader.load(spark, s"$RefOut/api_response.json")
    assert(acj.count() === 3703)
    assert(acj.select(col("conv_id")).distinct().count() === 1940)
    // PK (conv_id, session_id) — no duplicates survive the dedup
    assert(acj.groupBy(col("conv_id"), col("session_id")).count()
      .filter(col("count") > 1).count() === 0)
    val totalIhc = acj.agg(sum(col("ihc"))).first().getDouble(0)
    assert(totalIhc > 0)
    // ihc ∈ [0, 1] per record (attribution weights)
    assert(acj.filter(col("ihc") < 0 || col("ihc") > 1.0001).count() === 0)
  }

  test("journey-entry contract: required_format.json reads under JourneyEntry schema") {
    val df = JsonArrayIO.readJsonArray(spark, s"$RefOut/required_format.json", MaefModel.JourneyEntry)
    assert(df.count() === 5070)
    assert(df.filter(col("conversion_id").isNull || col("session_id").isNull).count() === 0)
  }

  test("transformed_data groups to 1940 journeys of 3703 sessions (A1)") {
    val entries = JsonArrayIO.readJsonArray(
      spark, s"$RefOut/transformed_data_2023-08-01_2023-09-30.json", MaefModel.JourneyEntry)
    assert(entries.count() === 3703)
    val perJourney = entries.groupBy(col("conversion_id")).agg(count(lit(1)).as("n"))
    assert(perJourney.count() === 1940)
    val stats = perJourney.agg(min(col("n")), max(col("n"))).first()
    assert(stats.getLong(0) === 1L)
    assert(stats.getLong(1) === 37L) // BASELINE.md: sessions per journey 1..37
    // v2 strict `<` ⇒ conversion flag always 0 (SURVEY §7.4.3)
    assert(entries.filter(col("conversion") =!= 0).count() === 0)
  }

  test("chunker reproduces the 23-chunk split under the 85/2750 caps (L3)") {
    val entries = JsonArrayIO.readJsonArray(
      spark, s"$RefOut/transformed_data_2023-08-01_2023-09-30.json", MaefModel.JourneyEntry)
    val assigned = Chunker.chunked(entries)
    assert(assigned.select(col("chunk_id")).distinct().count() === 23) // ⌈1940/85⌉
    val perChunk = assigned.groupBy(col("chunk_id")).agg(
      countDistinct(col("conversion_id")).as("journeys"),
      count(lit(1)).as("sessions"))
    assert(perChunk.filter(col("journeys") > Chunker.MaxJourneys).count() === 0)
    assert(perChunk.filter(col("sessions") > Chunker.MaxSessions).count() === 0)
    // journey integrity: no journey split across chunks
    assert(assigned.groupBy(col("conversion_id"))
      .agg(countDistinct(col("chunk_id")).as("nc"))
      .filter(col("nc") > 1).count() === 0)
  }

  test("loader envelope dispatch handles value/data/results/error shapes (P8)") {
    import spark.implicits._
    val json = Seq(
      """[{"statusCode": 200, "value": [{"conversion_id": "c1", "session_id": "s1", "ihc": 0.5}]},
         | {"data": [{"conversion_id": "c2", "session_id": "s2", "ihc": 0.25}]},
         | {"results": [{"conversion_id": "c3", "session_id": "s3", "ihc": 0.25}]},
         | {"statusCode": 500, "error": "boom"},
         | {"statusCode": 200, "value": [{"conversion_id": "c1", "session_id": "s1", "ihc": 0.9}]}]"""
        .stripMargin.replaceAll("\n", ""))
    val dir = java.nio.file.Files.createTempDirectory("graft_loader").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/resp.json"), json.head)
    val acj = Loader.load(spark, s"$dir/resp.json")
    assert(acj.count() === 3)
    // first-wins dedup: (c1, s1) keeps ihc=0.5 from the first envelope
    assert(acj.filter(col("conv_id") === "c1").select(col("ihc")).first().getDouble(0) === 0.5)
  }
}

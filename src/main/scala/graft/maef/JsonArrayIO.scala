package graft.maef

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.types.StructType

/** The reference's file interchange formats (SURVEY §2.1 S5-S7):
  *
  *   - S6: JSON *array* files (one top-level array, not JSONL) —
  *     `spark.read.option("multiLine", true)`;
  *   - S5: pretty-printed 4-space-indent JSON array sink, one file —
  *     matches `json.dump(list, indent=4)` (src/etl/transform.py:276-288);
  *   - S7: single-file CSV with header (src/etl/reporting.py:169-170).
  *
  * The single-file sinks collect through the driver by design: they exist
  * for parity with the reference's API-boundary artifacts (thousands of
  * rows), NOT for bulk data. Bulk paths write partitioned parquet.
  */
object JsonArrayIO {

  def readJsonArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(path)

  /** Pretty JSON array with field order taken from the schema — byte-style
    * parity with python's `json.dump(..., indent=4)` for string/int
    * fields. */
  def writePrettyJsonArray(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fields = df.schema.fields
    // ignoreNullFields=false: python's json.dump writes "field": null where
    // df.toJSON would DROP the key entirely — a schema-strict consumer of
    // the artifact (or a byte-level golden comparison) needs every key
    val rows = df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*),
        java.util.Collections.singletonMap("ignoreNullFields", "false")).as("j"))
      .collect().map(_.getString(0)) // compact per-row JSON, schema field order
    val indented = rows.map { r =>
      // re-indent each record: {"a": 1} -> 4-space pretty block
      val obj = r.stripPrefix("{").stripSuffix("}")
      "    {\n" + splitTopLevel(obj).map("        " + _.trim.replaceFirst(":", ": "))
        .mkString(",\n") + "\n    }"
    }
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new BufferedWriter(new OutputStreamWriter(
      fs.create(new Path(path), true), StandardCharsets.UTF_8))
    try {
      out.write("[\n")
      out.write(indented.mkString(",\n"))
      out.write("\n]")
    } finally out.close()
    val _ = fields // field order is the schema's; kept for clarity
  }

  /** Split a JSON object body on top-level commas (values here are scalars
    * or quoted strings — the journey/response records contain no nested
    * objects). */
  private def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    var esc = false
    s.foreach { c =>
      if (esc) { cur += c; esc = false }
      else if (c == '\\' && inStr) { cur += c; esc = true }
      else if (c == '"') { cur += c; inStr = !inStr }
      else if (c == ',' && !inStr) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq
  }

  /** S7: header CSV as exactly one file at `path`. */
  def writeSingleCsv(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val tmp = path + "_tmp_csvdir"
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.globStatus(new Path(tmp, "part-*")).head.getPath
    fs.delete(new Path(path), false)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, new Path(path), false, conf)
    fs.delete(new Path(tmp), true)
  }
}

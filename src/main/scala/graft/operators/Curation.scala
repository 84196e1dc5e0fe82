package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** The end-to-end corpus-curation pipeline a pre-training data run
  * actually executes — exact dedup, language ID, quality gating, token
  * accounting — composed from the individual operators into one
  * declarative plan so Catalyst fuses the narrow stages.
  *
  * Plan shape at 100 TB: ONE shuffle on the content fingerprint (dedup),
  * then langid / quality / token counting are all narrow codegen'd maps
  * over the survivors, then ONE partial-aggregated rollup shuffle on the
  * (low-cardinality) predicted language. Ratio metrics aggregate as exact
  * integer sums and divide once at the end — never an average of per-row
  * doubles — so results are partial-aggregation-order independent and
  * bit-reproducible (q39).
  */
object Curation {

  /** True iff Spark's hash expressions accept the type as-is — i.e. no
    * MapType anywhere inside it (map entry order is undefined, so maps
    * have no well-defined hash). */
  private def hashableType(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case a: ArrayType => hashableType(a.elementType)
    case s: StructType => s.fields.forall(f => hashableType(f.dataType))
    case _ => true
  }

  /** The hashable shape of `dt`: every MapType — at any nesting depth —
    * replaced by its key-sorted array<struct<key,value>> entry form. */
  private def canonicalType(dt: DataType): DataType = dt match {
    case m: MapType => ArrayType(StructType(Seq(
      StructField("key", canonicalType(m.keyType), nullable = false),
      StructField("value", canonicalType(m.valueType), nullable = m.valueContainsNull))),
      containsNull = false)
    case a: ArrayType => a.copy(elementType = canonicalType(a.elementType))
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = canonicalType(f.dataType))))
    case other => other
  }

  /** Rewrite `c` (of type `dt`) into its canonical hashable form: maps
    * become `array_sort(map_entries(...))` at EVERY depth (keys are
    * unique within a map, so the sort is deterministic and two maps
    * canonicalize equal iff they hold the same entry set), arrays and
    * structs are rebuilt only as far as needed to reach their maps.
    * After the rewrite no MapType remains anywhere, so the result is
    * both hashable and orderable (array_sort needs the latter).
    *
    * Two traps this shape dodges:
    *  - a NULL struct must stay NULL through the rebuild — a bare
    *    `struct(fields...)` of a null row yields a struct of nulls,
    *    which renders (and therefore keys) EQUAL to a genuinely
    *    all-null struct: two distinct rows, one synthetic key, row loss
    *    (the failure class this whole canonicalization exists to
    *    prevent);
    *  - the flat-map fast path (`hashableType` key and value) skips the
    *    per-entry struct rebuild, keeping the pre-existing plan shape —
    *    the lambda rebuilds run on Catalyst's interpreted HOF path and
    *    are reserved for schemas that actually nest maps. */
  private def canonicalizeMaps(c: Column, dt: DataType): Column = dt match {
    case m: MapType if hashableType(m.keyType) && hashableType(m.valueType) =>
      array_sort(map_entries(c))
    case m: MapType =>
      array_sort(transform(map_entries(c), e => struct(
        canonicalizeMaps(e.getField("key"), m.keyType).as("key"),
        canonicalizeMaps(e.getField("value"), m.valueType).as("value"))))
    case a: ArrayType if !hashableType(a.elementType) =>
      transform(c, x => canonicalizeMaps(x, a.elementType))
    case s: StructType if !hashableType(s) =>
      when(c.isNull, lit(null).cast(canonicalType(s)))
        .otherwise(struct(s.fields.toSeq.map(f =>
          canonicalizeMaps(c.getField(f.name), f.dataType).as(f.name)): _*))
    case _ => c
  }

  /** Keep the lowest-doc_id copy of each whitespace-normalized content
    * fingerprint. Window `row_number`, not groupBy+self-join: one shuffle,
    * no second pass over the corpus.
    *
    * NULL-text docs have a NULL fingerprint — a window keyed on it
    * directly would lump them ALL into one partition (a single reducer
    * owning every null-text row: the skew that kills this at corpus
    * scale) and keep one "canonical" copy of content that was never
    * compared. They are spread by a SYNTHETIC per-doc key instead:
    * `coalesce(fingerprint, "n-" || doc_id || "-" || contentHash)` gives
    * each distinct null-text row its own group (the `n-` prefix cannot
    * collide with 32-hex md5; the content hash covers duplicate and null
    * doc_ids), so each passes through undeduped, hash-distributed like
    * every other row — only byte-identical null-text rows collapse. This form was measured (r13,
    * `BenchAuditProbe q39ab`) against the r12 split-union (separate
    * IsNull/IsNotNull branches) and the r9 disjunct
    * (`__rn = 1 OR text IS NULL`): it keeps Catalyst's WindowGroupLimit
    * pushdown (the disjunct defeats it — on clustered duplication the
    * map-side top-1 prune is the win: 0.33 s vs 0.40 s on 200 k rows with
    * 3 600-copy groups) while reading the corpus ONCE (the split-union
    * scans it twice and pays a union: 0.74 s vs 0.59 s on the dup-light
    * corpus). All three forms emit identical rows. */
  def dedupCanonical(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // null-text tier: these rows have no fingerprint to group on, so the
    // synthetic key spreads them by (doc_id, content hash) — doc_id alone
    // would collapse distinct null-text rows SHARING an id (nothing in
    // this operator requires id uniqueness), and a null doc_id would
    // null-propagate through concat into one skewed null-key group. With
    // both parts (null id rendered as a literal), every distinct
    // null-text row survives as its own group; only byte-identical rows
    // collapse to one — with every cell equal there is nothing to tell
    // copies apart by, and either survivor is the same row.
    //
    // The content hash is xxhash64 over a CANONICAL JSON rendering of
    // the non-text columns (null fields rendered explicitly), not a
    // structural xxhash64 over the columns themselves, because Spark's
    // hash expressions SKIP null inputs — hash(null) is the seed
    // unchanged — which makes structurally different rows certain (not
    // random) collisions: (a=NULL, b="x") hashes identically to
    // (a="x", b=NULL), and a NULL struct identically to a struct of all
    // NULLs, at every nesting depth. Each such pair is two distinct
    // null-text rows sharing one synthetic key: one silently dropped.
    // JSON with ignoreNullFields=false renders null-ness positionally,
    // so distinct stored values get distinct text; hashing THAT text
    // keeps the key 64-bit (same random-collision baseline as before,
    // none of the structural ones).
    //
    // MAP-typed columns are rewritten to key-sorted entry arrays FIRST
    // ([[canonicalizeMaps]], recursive): to_json renders map entries in
    // storage order, so un-canonicalized equal maps could render — and
    // hash — differently (over-keeping; the pre-r14 behavior of
    // EXCLUDING maps was the row-loss direction instead). After the
    // rewrite no MapType remains, and the sorted-array rendering is a
    // pure function of the map's entry SET.
    val rest = docs.schema.fields
      .filterNot(f => f.name == textCol)
      .map { f =>
        val c = if (hashableType(f.dataType)) col(f.name)
                else canonicalizeMaps(col(f.name), f.dataType)
        c.as(f.name)
      }
    // timestampFormat defaults render MILLISECONDS ([.SSS]) while Spark
    // stores microseconds — two rows one microsecond apart would render,
    // and key, identically (the same certain-collision row loss the JSON
    // form exists to prevent, found by an adversarial review of this
    // change). Six fixed fraction digits make the rendering injective on
    // the stored micros, at every nesting depth. (TIME-typed columns
    // have no JSON format option in Spark 4.1; none of this engine's
    // operators produce them.)
    val contentHash =
      if (rest.isEmpty) lit("0")
      else xxhash64(to_json(struct(rest.toSeq: _*), Map(
        "ignoreNullFields" -> "false",
        "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
        "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))).cast("string")
    val key = coalesce(col("fingerprint"),
      concat(lit("n-"), coalesce(col("doc_id").cast("string"), lit("null")),
        lit("-"), contentHash))
    val w = Window.partitionBy(key).orderBy(col("doc_id"))
    TextOps.fingerprint(docs, textCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full curation rollup: dedup → langid → quality gate
    * (`quality_score > 0`, i.e. ≥5 words and sane word lengths) → per-
    * (predicted language, source) corpus accounting — the grain a data-mix
    * plan is written against — with doc/token totals and the aggregate
    * stopword ratio. */
  def curate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val gated = TextOps.tokenCounts(
      TextOps.quality(TextOps.langId(dedupCanonical(docs, textCol), textCol), textCol),
      textCol)
      .filter(col("quality_score") > 0.0)
    gated
      .groupBy(col("predicted_lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_ish_tokens")).as("total_bpe_tokens"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_stopwords")).as("total_stopwords"),
        (sum(col("n_stopwords")).cast("double") / sum(col("n_words")).cast("double"))
          .as("corpus_stopword_ratio"))
  }
}

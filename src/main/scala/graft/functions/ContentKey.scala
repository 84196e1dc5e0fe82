package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Content-identity hashing over arbitrary row schemas — the ONE
  * implementation behind `Curation.dedupCanonical`'s synthetic dedup keys
  * (where a key collision between distinct rows is ROW LOSS) and
  * `ParquetWarehouse.lastWins`' survivor tiebreak (where a collision
  * surrenders the documented content-deterministic survivor to partition
  * order). Both sites previously rolled their own near-identical logic,
  * and both carried the same two classes of CERTAIN collision:
  *
  *  - Spark's hash expressions SKIP null inputs (`hash(null)` leaves the
  *    seed unchanged), so a structural `xxhash64(cols…)` cannot tell
  *    `(a=NULL, b="x")` from `(a="x", b=NULL)`, nor a NULL struct from a
  *    struct of all NULLs — at any nesting depth;
  *  - MapType has no defined entry order, so maps either had to be
  *    excluded (row loss) or rendered order-sensitively (over-keying).
  *
  * The canonical form fixes both: every map — at any depth — is rewritten
  * to its key-sorted entry array (equal iff the entry SETS are equal),
  * then the row renders as JSON with null fields EXPLICIT and timestamps
  * at full microsecond precision, and the TEXT is hashed. Distinct stored
  * values get distinct text, so the only remaining collisions are the
  * random 64-bit kind — the same accepted baseline as before, none of the
  * structural ones. (`to_json`'s DEFAULTS would break both guarantees:
  * `ignoreNullFields=true` re-merges the null pairs, and the millisecond
  * `timestampFormat` renders micros-apart values identically — both were
  * found as live row-loss defects, the second by an adversarial review
  * after the first shipped.)
  *
  * TIME-typed columns have no JSON format option in Spark 4.1 and no
  * operator in this engine produces them; CalendarInterval columns are
  * rejected by `to_json` at analysis — loud, not silent. */
object ContentKey {

  /** True iff Spark's hash expressions accept the type as-is — i.e. no
    * MapType anywhere inside it. Used only to decide whether a column
    * needs the canonical map rewrite before rendering. */
  def hashableType(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case a: ArrayType => hashableType(a.elementType)
    case s: StructType => s.fields.forall(f => hashableType(f.dataType))
    case _ => true
  }

  /** The map-free shape of `dt`: every MapType — at any nesting depth —
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

  /** Rewrite `c` (of type `dt`) into its map-free canonical form: maps
    * become `array_sort(map_entries(...))` at EVERY depth (keys are
    * unique within a map, so the sort is deterministic and two maps
    * canonicalize equal iff they hold the same entry set), arrays and
    * structs are rebuilt only as far as needed to reach their maps.
    *
    * Two traps this shape dodges:
    *  - a NULL struct must stay NULL through the rebuild — a bare
    *    `struct(fields...)` of a null row yields a struct of nulls,
    *    which renders (and therefore keys) EQUAL to a genuinely
    *    all-null struct: exactly the collision class this object exists
    *    to prevent;
    *  - the flat-map fast path (`hashableType` key and value) skips the
    *    per-entry struct rebuild — the lambda rebuilds run on Catalyst's
    *    interpreted HOF path and are reserved for schemas that actually
    *    nest maps. */
  def canonicalizeMaps(c: Column, dt: DataType): Column = dt match {
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

  /** 64-bit content hash over the given schema fields (resolved with
    * `col(name)`): xxhash64 of the null-explicit, microsecond-precise,
    * map-canonical JSON rendering. None when `fields` is empty — the
    * caller decides what an empty content means at its site. */
  def contentHash(fields: Seq[StructField]): Option[Column] = {
    if (fields.isEmpty) None
    else {
      val canonical = fields.map { f =>
        // backtick-quoted resolution: a bare col("a.b") parses a legal
        // dotted COLUMN name as a nested-field path and fails analysis
        // (backticks inside the name escape by doubling, per the parser)
        val resolved = col(s"`${f.name.replace("`", "``")}`")
        val c = if (hashableType(f.dataType)) resolved
                else canonicalizeMaps(resolved, f.dataType)
        c.as(f.name)
      }
      Some(xxhash64(to_json(struct(canonical: _*), Map(
        "ignoreNullFields" -> "false",
        "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
        "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))))
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy self-join for entity resolution: all pairs of rows whose string
  * key is within Levenshtein distance 1 — near-identical names, ids with
  * one typo, OCR'd duplicates. The reference keys everything on exact
  * string ids (reference: src/etl/transform.py builds journey keys by
  * exact user/conv id equality); record linkage is the fuzzy sibling a
  * curation pipeline needs when ids come from humans.
  *
  * Scale shape — FastSS deletion-neighborhood blocking (Bocek et al.
  * 2007), not an O(n²) cross join: two strings are within edit distance 1
  * iff their ≤1-deletion neighborhoods intersect (equal strings share the
  * identity variant; one substitution ⇒ deleting the differing position
  * from both yields equality; one insert/delete ⇒ the shorter string
  * itself appears in the longer one's deletion set). So: explode each key
  * into its |s|+1 deletion variants, equi-join on the variant (a plain
  * hash shuffle — no theta join, no cartesian), dedup the candidate
  * pairs, and verify with ONE bounded `levenshtein(·,·,1)` call per
  * DISTINCT pair (the neighborhood test admits some distance-2 pairs —
  * "ab"/"ba" share "a" — so the verify is load-bearing, not
  * belt-and-braces). Work is Σ|s| explode + |distinct candidates|
  * verifies; two variants can only be equal when the original lengths
  * differ by ≤1, so no cross-length blow-up exists by construction.
  *
  * Three deliberate shapes keep the verify off the hot path (measured
  * 11 s → 3 s at sf0.1, then the r21 narrow-dedup below): the candidate
  * dedup runs on the (a_key, b_key) LONG pair ONLY — the texts are
  * re-attached by equi-join against the (small) input AFTER the dedup,
  * so the candidate exchange carries 16 bytes/row instead of the two
  * name strings, and the dedup is a HashAggregate on two longs (a
  * `first(text)` carrier aggregate has a variable-width buffer, which
  * forces SortAggregate — two full sorts of the widest frame in the
  * plan, measured as the q88 hot stage); the dist filter still cannot
  * reach the variant join because the texts it references only exist
  * above the dedup (levenshtein runs once per DISTINCT pair); and the
  * verify uses the THRESHOLD levenshtein (O(n·k) early-exit band, not
  * the O(n²) full DP). Keys are entity ids — one text per key (the
  * attach join is key-equi and would fan out a duplicated key).
  */
object FuzzyJoin {

  /** All unordered pairs (`a_key < b_key`) with
    * `levenshtein(a.text, b.text) <= 1`. Output:
    * `a_key, b_key, a_text, b_text, dist`. */
  def selfMatch1(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    // index 0 = the string itself; index i>0 = the string with the i-th
    // (1-based) character removed. The user-supplied column names are
    // resolved ONCE through the Column API onto fixed internal names —
    // interpolating the raw identifier into SQL text would break on any
    // name needing backticks and is the injection surface the repo's
    // convention bans (see Sampling.weightedSample)
    val base = df.select(col(keyCol).as("k"), col(textCol).as("t"))
    val variants = base
      .select(
        col("k"),
        col("t"),
        explode(expr(
          """transform(sequence(0, length(t)),
            |  i -> CASE WHEN i = 0 THEN t
            |            ELSE concat(substring(t, 1, i - 1),
            |                        substring(t, i + 1, length(t)))
            |       END)""".stripMargin)).as("v"))
    val a = variants.as("a")
    val b = variants.as("b")
    // narrow candidate dedup: keys only through the exchange (see scaladoc)
    val pairs = a.join(b, expr("a.v = b.v AND a.k < b.k"))
      .select(col("a.k").as("a_key"), col("b.k").as("b_key"))
      .distinct()
    pairs
      .join(base.select(col("k").as("a_key"), col("t").as("a_text")), Seq("a_key"))
      .join(base.select(col("k").as("b_key"), col("t").as("b_text")), Seq("b_key"))
      .withColumn("dist", levenshtein(col("a_text"), col("b_text"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a_key"), col("b_key"), col("a_text"), col("b_text"), col("dist"))
  }
}

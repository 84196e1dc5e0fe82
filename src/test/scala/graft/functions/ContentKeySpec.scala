package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct specs for the content-identity key ([[ContentKey]]) — the r15
  * binary (null-flag-framed, length-prefixed) form, pinned two ways:
  * targeted certain-collision cases (each a class that has bitten a hash
  * encoding in this repo's history, plus the array-boundary class the
  * size prefix exists for), and an EQUIVALENCE check against the r14
  * JSON-render form on an adversarial corpus — both encodings must
  * induce the same row grouping, so the cheaper binary form inherits the
  * JSON form's audited guarantees. The production sites' behavior is
  * separately pinned through dedupCanonical/upsert specs. */
class ContentKeySpec extends SparkSpec {
  import spark.implicits._

  private def keysOf(df: org.apache.spark.sql.DataFrame): (Array[Long], Array[Long]) = {
    val fields = df.schema.fields.toSeq
    val bin = ContentKey.contentHash(fields).get
    val json = ContentKey.contentHashJson(fields).get
    val rows = df.select(bin.as("b"), json.as("j")).as[(Long, Long)].collect()
    (rows.map(_._1), rows.map(_._2))
  }

  private def assertAllDistinct(df: org.apache.spark.sql.DataFrame): Unit = {
    val (b, j) = keysOf(df)
    assert(b.distinct.length === b.length, s"binary keys collide: ${b.toList}")
    assert(j.distinct.length === j.length, s"json keys collide: ${j.toList}")
  }

  test("swapped nulls, null struct vs struct-of-nulls, and micros-apart timestamps key distinct") {
    assertAllDistinct(Seq(
      (Option("x"), Option.empty[String]),
      (Option.empty[String], Option("x"))
    ).toDF("a", "b"))
    assertAllDistinct(Seq(
      Tuple1(Option.empty[(Option[String], Option[String])]),
      Tuple1(Some((Option.empty[String], Option.empty[String])))
    ).toDF("s"))
    val t1 = Timestamp.valueOf("2020-01-01 00:00:00.000001")
    val t2 = Timestamp.valueOf("2020-01-01 00:00:00.000002")
    assertAllDistinct(Seq(Tuple1(t1), Tuple1(t2)).toDF("ts"))
  }

  test("the size prefix separates array-boundary shufflings; null/empty/zero-bearing arrays key distinct") {
    // ([0], []) vs ([], [0]): WITHOUT the explicit size mix these frame
    // to the same flat hash-input stream — a zero element's (flag, value)
    // mixes are indistinguishable from the neighbor array's flag mixes —
    // so this is the certain-collision class the length prefix closes
    assertAllDistinct(Seq(
      (Seq(0L), Seq.empty[Long]),
      (Seq.empty[Long], Seq(0L))
    ).toDF("a1", "a2"))
    assertAllDistinct(spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null),          // null array
        org.apache.spark.sql.Row(Seq.empty[Long]), // empty array
        org.apache.spark.sql.Row(Seq(0L)),       // zero element
        org.apache.spark.sql.Row(Seq(null))),    // null element
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("arr",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true))))))
    // "" vs null string, 0 vs null long: the flag disambiguates the zero
    // placeholder from a genuine zero
    assertAllDistinct(Seq(
      (Option(""), Option(0L)),
      (Option.empty[String], Option(0L)),
      (Option(""), Option.empty[Long]),
      (Option.empty[String], Option.empty[Long])
    ).toDF("s", "n"))
  }

  test("signed zeros and NaN payloads key EQUAL; map entry order keys equal") {
    val (b, j) = keysOf(Seq(
      Tuple1(-0.0), Tuple1(0.0)
    ).toDF("v"))
    assert(b.distinct.length === 1, "binary: -0.0 must key as 0.0")
    assert(j.distinct.length === 1, "json: -0.0 must key as 0.0")
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val (bn, jn) = keysOf(Seq(Tuple1(nan1), Tuple1(nan2)).toDF("v"))
    assert(bn.distinct.length === 1 && jn.distinct.length === 1)
    val (bm, jm) = keysOf(Seq(
      Tuple1(Map("a" -> 1L, "b" -> 2L)),
      Tuple1(Map("b" -> 2L, "a" -> 1L))
    ).toDF("m"))
    assert(bm.distinct.length === 1 && jm.distinct.length === 1)
  }

  test("binary and JSON forms induce the SAME grouping on an adversarial mixed-schema corpus") {
    // rows engineered to sit one mutation apart along every axis the
    // encodings must distinguish (plus genuine duplicates they must
    // merge); if either form over- or under-keys relative to the other,
    // some pair lands equal under one and distinct under the other
    val t = Timestamp.valueOf("2020-06-01 12:00:00.123456")
    val tMicro = Timestamp.valueOf("2020-06-01 12:00:00.123457")
    def row(
        a: Option[String], n: Option[Long], v: Double, ts: Option[Timestamp],
        s: Option[(Option[String], Option[Long])], arr: Option[Seq[Long]],
        m: Option[Map[String, Long]]) = (a, n, v, ts, s, arr, m)
    val base = row(Some("x"), Some(1L), 1.5, Some(t),
      Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L)))
    val corpus = Seq(
      base,
      base, // exact duplicate: must merge under BOTH forms
      row(None, Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), None, 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), -0.0, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 0.0, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))), // merges with the -0.0 row
      row(Some("x"), Some(1L), 1.5, Some(tMicro), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, None, Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((None, Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), None, Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((None, None)), Some(Seq(1L, 2L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(2L, 1L)), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq.empty), Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), None, Some(Map("k" -> 1L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 2L))),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map())),
      row(Some("x"), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), None),
      row(Some(""), Some(1L), 1.5, Some(t), Some((Some("f"), Some(2L))), Some(Seq(1L, 2L)), Some(Map("k" -> 1L)))
    ).toDF("a", "n", "v", "ts", "s", "arr", "m")
    val (b, j) = keysOf(corpus)
    // same PARTITION of rows: every pair equal under one form is equal
    // under the other (stronger than equal distinct-counts)
    for (i <- b.indices; k <- i + 1 until b.length)
      assert((b(i) == b(k)) === (j(i) == j(k)),
        s"grouping divergence at rows $i,$k: binary ${(b(i), b(k))} json ${(j(i), j(k))}")
    // and the engineered merges/distinctions hold: 18 rows, 16 groups
    // (the exact-duplicate pair and the signed-zero pair each merge)
    assert(b.distinct.length === 16, s"expected 16 binary groups, got ${b.distinct.length}")
  }

  test("randomized equivalence: 300 seeded rows, binary and JSON groupings match pairwise") {
    // the fixed adversarial corpus pins the KNOWN divergence classes;
    // this seeded sweep guards the unknown ones. Values are drawn from
    // deliberately TINY domains (2-3 distinct values per column, heavy
    // null weight, ±0.0/NaN in the double pool, micros-apart timestamps)
    // so the 300 rows are dense with genuine duplicates and
    // one-mutation-apart near-misses — the regime where an encoding
    // divergence would actually surface as a grouping difference.
    val rnd = new scala.util.Random(42)
    def opt[A](v: => A): Option[A] = if (rnd.nextInt(3) == 0) None else Some(v)
    val t0 = java.sql.Timestamp.valueOf("2021-03-04 05:06:07.000001")
    def ts(): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(t0.getTime)
      t.setNanos(1000 * (1 + rnd.nextInt(3))) // 1-3 micros: sub-milli apart
      t
    }
    val doubles = Array(0.0, -0.0, 1.5, Double.NaN)
    // a 30-row random pool sampled 300× with replacement: duplicates are
    // guaranteed dense, near-misses come from the tiny per-column domains
    // WITHIN the pool
    val pool = IndexedSeq.fill(30)((
      opt(if (rnd.nextBoolean()) "x" else ""),
      opt(rnd.nextInt(2).toLong),
      doubles(rnd.nextInt(doubles.length)),
      opt(ts()),
      opt((opt("f"), opt(rnd.nextInt(2).toLong))),
      opt(Seq.fill(rnd.nextInt(3))(rnd.nextInt(2).toLong)),
      opt(Map(Seq.fill(rnd.nextInt(3))(
        ("k" + rnd.nextInt(2)) -> rnd.nextInt(2).toLong): _*))
    ))
    val rows = Seq.fill(300)(pool(rnd.nextInt(pool.length)))
      .toDF("a", "n", "v", "ts", "s", "arr", "m")
    val (b, j) = keysOf(rows)
    var pairs = 0
    for (i <- b.indices; k <- i + 1 until b.length) {
      assert((b(i) == b(k)) === (j(i) == j(k)),
        s"grouping divergence at rows $i,$k")
      if (b(i) == b(k)) pairs += 1
    }
    // the domains are tiny on purpose — if nothing collides the sweep
    // proves nothing; fail loudly if the generator drifts sparse
    assert(pairs > 100, s"generator must produce dense duplicates, got $pairs equal pairs")
  }

  test("a VOID column (uncast lit(null)) keys fine, as the JSON form always did") {
    // regression guard: the first binary cut threw at plan build for
    // NullType, narrowing public upsert/dedupCanonical inputs the r14
    // JSON form accepted (rendered as null). A VOID column is constant —
    // it must not change any grouping.
    val df = Seq(("x", 1L), ("y", 2L), ("x", 1L)).toDF("a", "n")
      .select(col("a"), col("n"), lit(null).as("note"))
    val (b, j) = keysOf(df)
    assert(b.distinct.length === 2 && j.distinct.length === 2)
    assert(b(0) === b(2) && j(0) === j(2))
  }

  test("unsupported leaf types fail loudly at plan build, naming the type") {
    val df = Seq(Tuple1(1L)).toDF("x")
      .select(col("x"), expr("INTERVAL '1' YEAR").as("iv"))
    val e = intercept[IllegalArgumentException] {
      ContentKey.contentHash(df.schema.fields.toSeq)
    }
    assert(e.getMessage.toLowerCase.contains("interval"))
  }
}

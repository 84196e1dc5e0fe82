package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** Randomized (seeded) equivalence of the custom codegen/compiled
  * expressions against straight-line Scala reference implementations —
  * the adversarial check that generated code and hand-written eval agree
  * on arbitrary inputs, not just the fixtures. */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812)

  test("VectorDot equals a plain fold for random float vectors (incl. length mismatch)") {
    val vecs = Seq.fill(200) {
      val n = 1 + rng.nextInt(96)
      (Array.fill(n)(rng.nextFloat() * 4f - 2f), Array.fill(n)(rng.nextFloat() * 4f - 2f))
    } :+ ((Array(1f, 2f, 3f), Array(4f, 5f))) // differing lengths → min-length fold
    val df = vecs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a.toSeq, b.toSeq) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    vecs.zipWithIndex.foreach { case ((a, b), i) =>
      val want = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      assert(got(i.toLong) === want, s"vector $i")
    }
  }


  test("OrderedPairs equals the interpreted lambda formulation for random arrays") {
    OrderedPairs.register(spark)
    val arrays = Seq.fill(100) {
      val n = rng.nextInt(12)
      (1 to n).map(_ => rng.nextLong(1000)).distinct.sorted
    } :+ Seq.empty[Long] :+ Seq(42L)
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
    val got = df
      .select(col("id"), call_function("ordered_pairs", col("arr")).as("p"))
      .select(col("id"), expr("transform(p, x -> struct(x.a AS a, x.b AS b))").as("p"))
      .as[(Long, Seq[(Long, Long)])].collect().toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val want = for (x <- a.indices; y <- x + 1 until a.length) yield (a(x), a(y))
      assert(got(i.toLong) === want, s"array $i")
    }
  }

  test("RollingHash equals the byte fold for random unicode strings") {
    val strings = Seq.fill(200) {
      val n = rng.nextInt(64)
      new String(Array.fill(n)((rng.nextInt(0x24F) + 1).toChar)) // latin + extensions
    } :+ "" :+ "a b  c" :+ "日本語テキスト"
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val got = df.select(col("id"), RollingHash.rollingHash(spark, col("t")).as("h"))
      .as[(Long, Long)].collect().toMap
    strings.zipWithIndex.foreach { case (s, i) =>
      val want = s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
      assert(got(i.toLong) === want, s"string $i: ${s.take(20)}")
    }
  }

  test("WordShingles equals a plain-Scala shingler for random word sequences") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val texts = Seq.fill(200) {
      val n = rng.nextInt(12)
      Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    } :+ "" :+ "a" :+ "a b" :+ "a  b c" // short docs + double space (empty token)
    def ref(text: String, n: Int): Seq[String] = {
      val w = text.split(" ", -1)
      if (w.length < n) Seq.empty
      else w.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    for (n <- Seq(2, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"), TextOps.shingles(col("t"), n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === ref(t, n), s"n=$n text $i: '$t'")
      }
    }
  }

  test("KgramHashes equals per-window RollingHash folds for random unicode strings") {
    for (k <- Seq(1, 3, 7, 20)) {
      val strings = Seq.fill(100) {
        val n = rng.nextInt(80)
        new String(Array.fill(n)((rng.nextInt(0x24F) + 1).toChar)) // multi-byte UTF-8 too
      } :+ "" :+ "a" * (k - 1) :+ "a" * k
      val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
      val got = df.select(col("id"), KgramHashes.kgramHashes(spark, col("t"), k).as("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      strings.zipWithIndex.foreach { case (s, i) =>
        val bytes = s.getBytes("UTF-8")
        val want = (0 to bytes.length - k).map { off =>
          bytes.slice(off, off + k).foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
        }
        assert(got(i.toLong) === want, s"k=$k string $i")
      }
    }
  }

  test("BpeApply equals a straight-line greedy fold for random rules over random tokens") {
    val vocab = Vector("a", "b", "c", "d", "ee")
    def refApply(toks: Seq[String], rules: Seq[(String, String)]): Seq[String] =
      rules.foldLeft(toks) { case (ts, (x, y)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < ts.length) {
          if (j + 1 < ts.length && ts(j) == x && ts(j + 1) == y) {
            out += s"$x $y"; j += 2
          } else { out += ts(j); j += 1 }
        }
        out.toSeq
      }
    val cases = Seq.fill(120) {
      val toks = Seq.fill(rng.nextInt(20))(vocab(rng.nextInt(vocab.length)))
      val rules = Seq.fill(1 + rng.nextInt(4))(
        (vocab(rng.nextInt(vocab.length)), vocab(rng.nextInt(vocab.length))))
      (toks, rules)
    }
    cases.zipWithIndex.foreach { case ((toks, rules), i) =>
      val df = Seq(Tuple1(toks.mkString(" "))).toDF("text")
      val got = df.select(BpeApply.bpeApply(spark,
          filter(split(col("text"), " "), x => x =!= lit("")), rules).as("t"))
        .as[Seq[String]].collect().head
      assert(got === refApply(toks, rules), s"case $i toks=$toks rules=$rules")
    }
  }
}

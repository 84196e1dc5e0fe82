package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeApply

class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private def tokenize(text: String, rules: Seq[(String, String)]): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("text")
    df.select(BpeApply.bpeApply(spark,
        filter(split(col("text"), " "), x => x =!= lit("")), rules).as("t"))
      .as[Seq[String]].collect().head
  }

  test("greedy left-to-right non-overlap: (a,a) on runs") {
    assert(tokenize("a a a a", Seq(("a", "a"))) === Seq("a a", "a a"))
    assert(tokenize("a a a", Seq(("a", "a"))) === Seq("a a", "a"))
  }

  test("rules apply in priority order; an earlier merge swallows a later one's operand") {
    // rule 1 fuses (b,c) first, so rule 2's (a,b) never finds a bare b
    assert(tokenize("a b c", Seq(("b", "c"), ("a", "b"))) === Seq("a", "b c"))
    // reversed priority: (a,b) wins, (b,c) starved
    assert(tokenize("a b c", Seq(("a", "b"), ("b", "c"))) === Seq("a b", "c"))
  }

  test("merged phrase symbols never re-match single-word rules") {
    // after (x,y)->"x y", rule (y,z) must not fire on the swallowed y
    assert(tokenize("x y z", Seq(("x", "y"), ("y", "z"))) === Seq("x y", "z"))
    // but an untouched y elsewhere still merges
    assert(tokenize("x y z y z", Seq(("x", "y"), ("y", "z"))) ===
      Seq("x y", "z", "y z"))
  }

  test("empty rule list and sub-pair-length inputs pass through") {
    assert(tokenize("lone", Nil) === Seq("lone"))
    assert(tokenize("two words", Nil) === Seq("two", "words"))
    assert(tokenize("", Seq(("a", "b"))) === Seq.empty)
  }

  test("fuzz: expression matches a direct Scala replay, incl. multi-word symbols") {
    // the space-join invariant under attack: the vocabulary contains
    // symbols that ARE phrase spellings ("a b", "a b c"), so rule operands
    // and merged outputs collide textually — the expression must still
    // behave exactly per its definition (token equality, not re-parsing)
    def refApply(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
      var t = toks.toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < t.length) {
          if (j + 1 < t.length && t(j) == a && t(j + 1) == b) { out += (a + " " + b); j += 2 }
          else { out += t(j); j += 1 }
        }
        t = out.result()
      }
      t
    }
    val vocab = Vector("a", "b", "c", "a b", "b c", "a b c")
    val rnd = new scala.util.Random(42)
    val cases = (1 to 60).map { _ =>
      val toks = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val merges = Seq.fill(rnd.nextInt(5))(
        (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size))))
      (toks, merges)
    }
    cases.zipWithIndex.foreach { case ((toks, merges), i) =>
      val got = Seq(Tuple1(toks)).toDF("toks")
        .select(BpeApply.bpeApply(spark, col("toks"), merges).as("t"))
        .as[Seq[String]].head()
      assert(got === refApply(toks, merges),
        s"case $i diverged: toks=$toks merges=$merges")
    }
  }
}

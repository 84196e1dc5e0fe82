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
}

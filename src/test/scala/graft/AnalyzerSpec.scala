package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Analyzer, functions => ga}

class AnalyzerSpec extends AnyFunSuite {

  test("golden vectors: standard-analyzer semantics") {
    assert(Analyzer.tokenize("Hello, World!").toSeq == Seq("hello", "world"))
    assert(Analyzer.tokenize("foo_bar baz-qux").toSeq == Seq("foo", "bar", "baz", "qux"))
    assert(Analyzer.tokenize("The 42 quick-brown FOXES").toSeq ==
      Seq("the", "42", "quick", "brown", "foxes"))
    assert(Analyzer.tokenize("Wörld Straße ÉTÉ").toSeq == Seq("wörld", "straße", "été"))
    assert(Analyzer.tokenize("a.b.c").toSeq == Seq("a", "b", "c"))
    assert(Analyzer.tokenize("  \t\n ").isEmpty)
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
    assert(Analyzer.tokenize("1234").toSeq == Seq("1234"))
    assert(Analyzer.tokenize("x").toSeq == Seq("x"))
  }

  test("countTokens matches tokenize length") {
    val cases = Seq("Hello, World!", "", "a b c", "   ", "Wörld 42 foo_bar", "1 2 3 4 5")
    cases.foreach(c => assert(Analyzer.countTokens(c) == Analyzer.tokenize(c).length))
  }

  test("Tokenize expression matches the kernel (interpreted + codegen)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq("Hello, World!", "The 42 quick-brown FOXES", "", "Wörld Straße")
    val got = texts.toDF("text")
      .select(ga.tokenize(col("text")).as("toks"), ga.token_count(col("text")).as("n"))
      .collect()
    texts.zip(got).foreach { case (t, row) =>
      assert(row.getSeq[String](0) == Analyzer.tokenize(t).toSeq, s"text=$t")
      assert(row.getInt(1) == Analyzer.countTokens(t), s"text=$t")
    }
  }

  test("per-row invariant: byte-identical tokens across parallelism") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Corpus.pages(spark, 200)
    def hashOf(parts: Int): Array[(String, Int)] = df.repartition(parts)
      .select(col("url"), hash(ga.tokenize(col("text"))).as("h"))
      .as[(String, Int)].collect().sortBy(_._1)
    assert(hashOf(1).toSeq == hashOf(7).toSeq)
  }
}

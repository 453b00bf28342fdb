package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants for the quality/text operators over
  * generated corpora: mathematical bounds that must hold for ANY
  * input, not just the fixtures. Deterministic seeds — reproducible
  * CI; small budgets — each property runs Spark jobs. */
class QualityPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 4)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong * 7919)
      gen.apply(Gen.Parameters.default.withSize(14), seed).foreach(body)
    }

  private val word = Gen.oneOf("alpha", "beta", "the", "a", "of", "x1",
    "42", "###", "spark", "data", "row", "value")
  private val docGen: Gen[Seq[String]] =
    Gen.listOfN(8, Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" ")))

  test("repetitionStats bounds hold for any corpus") {
    forSamples(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = Quality.repetitionStats(docs).collect()
      assert(rows.length === texts.size)
      rows.foreach { r =>
        val ttr = r.getAs[Double]("type_token_ratio")
        val top = r.getAs[Double]("top_token_frac")
        val dup = r.getAs[Double]("dup_bigram_frac")
        val n = r.getAs[Long]("n_tokens")
        val k = r.getAs[Long]("n_distinct_tokens")
        assert(ttr > 0.0 && ttr <= 1.0)
        assert(top >= 1.0 / n - 1e-9 && top <= 1.0)
        assert(dup >= 0.0 && dup < 1.0)
        assert(k <= n)
      }
    }
  }

  test("entropy bounds: 0 <= H <= ln(distinct); norm in [0,1]") {
    forSamples(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Quality.tokenEntropy(docs).collect().foreach { r =>
        val h = r.getAs[Double]("entropy")
        val norm = r.getAs[Double]("norm_entropy")
        val k = r.getAs[Long]("n_distinct_tokens")
        assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6)
        assert(norm >= 0.0 && norm <= 1.0 + 1e-9)
      }
    }
  }

  test("bpe segments: count bounded by non-space chars; ws tokens <= segments+mixed") {
    forSamples(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      docs.select(
          Text.bpeSegmentCount(col("text")).as("seg"),
          length(regexp_replace(col("text"), "\\s+", "")).as("chars"),
          Text.tokenCount(col("text")).as("ws"))
        .collect().foreach { r =>
          assert(r.getAs[Int]("seg") <= r.getAs[Int]("chars"))
          // a whitespace token is one or more segments
          assert(r.getAs[Int]("ws") <= r.getAs[Int]("seg"))
        }
    }
  }

  test("gopher gate is monotone in word count for clean text") {
    // same clean sentence repeated: below 50 words fails, above passes
    val unit = "the quick brown fox and a dog of his" // 9 words, has stopwords
    val docs = Seq(1L -> Seq.fill(3)(unit).mkString(" "),
        2L -> Seq.fill(8)(unit).mkString(" "))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Quality.passesGopher(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(1L) && out(2L))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("passesGopher rejects short, symbol-heavy, and stopword-free docs") {
    val good = ("the quick brown fox jumps over a lazy dog and then " * 6).trim
    val short = "the a of tiny"
    val symbols = (Seq.fill(30)("$$$ %%% ^^^").mkString(" ") + " the a of to and")
    val noStop = Seq.fill(60)("alpha beta gamma").mkString(" ")
    val out = docs(1L -> good, 2L -> short, 3L -> symbols, 4L -> noStop)
      .select($"doc_id", Quality.passesGopher($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L))
    assert(!out(2L)) // < 50 words
    assert(!out(3L)) // alpha ratio too low
    assert(!out(4L)) // no stopwords
  }

  test("repetitionStats counts duplicate bigrams set-based") {
    // "x y x y x y" -> tokens 6, distinct 2; bigrams: "x y"×3, "y x"×2
    val out = Quality.repetitionStats(docs(1L -> "x y x y x y")).collect().head
    assert(out.getAs[Long]("n_tokens") === 6L)
    assert(out.getAs[Long]("n_distinct_tokens") === 2L)
    assert(out.getAs[Long]("n_bigrams") === 5L)
    // distinct bigrams = 2 -> dup frac = 1 - 2/5
    assert(math.abs(out.getAs[Double]("dup_bigram_frac") - 0.6) < 1e-9)
    assert(math.abs(out.getAs[Double]("top_bigram_frac") - 0.6) < 1e-9)
    assert(math.abs(out.getAs[Double]("top_token_frac") - 0.5) < 1e-9)
  }

  test("single-token doc has zero bigrams and zero entropy") {
    val rep = Quality.repetitionStats(docs(1L -> "solo")).collect().head
    assert(rep.getAs[Long]("n_bigrams") === 0L)
    assert(rep.getAs[Double]("dup_bigram_frac") === 0.0)
    val ent = Quality.tokenEntropy(docs(1L -> "solo")).collect().head
    assert(ent.getAs[Double]("entropy") === 0.0)
    assert(ent.getAs[Double]("norm_entropy") === 0.0)
  }

  test("C4 line features discriminate every boilerplate branch") {
    val clean = Seq(
      "This is a proper first sentence with plenty of words.",
      "Here is another sentence that also ends with punctuation!",
      "And a third full sentence, because C4 wants at least three?")
      .mkString("\n")
    val bullets = Seq("- first item", "* second item", "• third", "A sentence here with five words.").mkString("\n")
    val trailing = Seq("this one trails off...", "and this one too…", "short.").mkString("\n")
    val policy = clean + "\nAll Rights Reserved. Read our Cookie Policy."
    val braces = clean + "\nfunction f() { return 1; }"
    val out = docs(1L -> clean, 2L -> bullets, 3L -> trailing,
        4L -> policy, 5L -> braces)
      .select($"doc_id",
        size(Quality.docLines($"text")).as("n_lines"),
        Quality.terminalPunctLines(Quality.docLines($"text")).as("tp"),
        Quality.keptLines(Quality.docLines($"text")).as("kept"),
        Quality.bulletLines(Quality.docLines($"text")).as("bul"),
        Quality.ellipsisLines(Quality.docLines($"text")).as("ell"),
        Quality.policyPhraseHits($"text").as("pol"),
        Quality.passesC4($"text").as("c4"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_lines") === 3)
    assert(out(1L).getAs[Int]("tp") === 3)
    assert(out(1L).getAs[Int]("kept") === 3)
    assert(out(1L).getAs[Boolean]("c4")) // the only passing page
    assert(out(2L).getAs[Int]("bul") === 3)
    assert(out(2L).getAs[Int]("kept") === 1)
    assert(!out(2L).getAs[Boolean]("c4")) // < 3 sentence-like lines
    assert(out(3L).getAs[Int]("ell") === 2)
    assert(out(3L).getAs[Int]("kept") === 0) // no punctuated line has ≥5 words
    assert(out(4L).getAs[Int]("pol") === 2) // rights reserved + cookie policy
    assert(!out(4L).getAs[Boolean]("c4"))
    assert(out(5L).getAs[Int]("pol") === 0)
    assert(!out(5L).getAs[Boolean]("c4")) // brace kills it
  }

  test("tokenEntropy: uniform tokens maximize normalized entropy") {
    val out = Quality.tokenEntropy(docs(
        1L -> "a b c d", // uniform over 4 -> H = ln 4, norm = 1
        2L -> "a a a b")).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("norm_entropy")).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-6)
    assert(out(2L) < 1.0 && out(2L) > 0.0)
  }

  test("unicode_normalize converges NFD/NFC forms; NFKC folds compatibility chars") {
    import UnicodeNorm.unicodeNormalize
    val nfd = "café"      // e + combining acute
    val nfc = "café"       // precomposed é
    val out = docs(1L -> nfd, 2L -> nfc, 3L -> "① ﬁne") // ①, ﬁ ligature
      .select($"doc_id", unicodeNormalize($"text", "NFC").as("c"),
        unicodeNormalize($"text", "NFKC").as("kc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 === nfc)               // NFD -> NFC composes
    assert(out(2L)._1 === nfc)               // already NFC: fixpoint
    assert(out(3L)._2 === "1 fine")          // NFKC: ① -> 1, ﬁ -> fi
    assert(out(3L)._1 === "① ﬁne") // NFC keeps compatibility chars
  }

  test("mojibake_repair inverts double-encoding but never touches plausible latin-1") {
    import UnicodeNorm.{mojibakeRepair, repairMojibake}
    val clean = "café résumé"
    // the mojibake victim: UTF-8 bytes read back as Latin-1
    val moji = new String(clean.getBytes("UTF-8"), "ISO-8859-1")
    assert(repairMojibake(moji) === clean)
    // genuine Latin-1-ish text: 'à' then '!' is NOT valid UTF-8 -> kept
    assert(repairMojibake("voilà!") === "voilà!")
    // pure ASCII: untouched by construction
    assert(repairMojibake("plain ascii") === "plain ascii")
    // expression path (codegen) agrees with the kernel
    val got = docs(1L -> moji, 2L -> "voilà!", 3L -> "plain ascii")
      .select(mojibakeRepair($"text").as("r")).as[String].collect()
    assert(got.toSeq === Seq(clean, "voilà!", "plain ascii"))
  }

  test("quality gates score mojibake'd and repaired text differently") {
    import UnicodeNorm.mojibakeRepair
    // 60 accented words: mojibake doubles every é into 'Ã©', inflating
    // mean token length — the distortion normalization exists to undo
    val clean = Seq.fill(60)("café olé").mkString(" ")
    val moji = new String(clean.getBytes("UTF-8"), "ISO-8859-1")
    val mejLen = docs(1L -> moji)
      .select(Text.meanTokenLen($"text")).as[Double].head()
    val repLen = docs(1L -> moji)
      .select(Text.meanTokenLen(mojibakeRepair($"text"))).as[Double].head()
    assert(mejLen > repLen, s"moji $mejLen should exceed repaired $repLen")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level pins for utf8_truncate: boundary behavior at every
  * alignment of 1-4 byte codepoints, the never-split invariant, NULL
  * propagation, and SQL registration. Corpus-scale agreement with a
  * first-principles replay is gated by q234. */
class Utf8TruncateSpec extends SparkSpec {
  import spark.implicits._

  private def cut(s: String, n: Int): String =
    Utf8Truncate.truncate(UTF8String.fromString(s), n).toString

  test("never splits a codepoint at any budget") {
    // a=1 byte, é=2, 汉=3, 🚀=4 → byte layout 1|2|3|4
    val s = "aé汉🚀"
    val bytes = s.getBytes("UTF-8")
    assert(bytes.length === 10)
    val expected = Map(
      0 -> "", 1 -> "a", 2 -> "a", 3 -> "aé", 4 -> "aé", 5 -> "aé",
      6 -> "aé汉", 7 -> "aé汉", 8 -> "aé汉", 9 -> "aé汉", 10 -> "aé汉🚀",
      11 -> "aé汉🚀")
    expected.foreach { case (n, want) =>
      assert(cut(s, n) === want, s"budget $n")
      // invariant: result is valid UTF-8 within budget
      val got = cut(s, n).getBytes("UTF-8")
      assert(got.length <= math.max(0, n))
    }
  }

  test("ascii fast path and degenerate budgets") {
    assert(cut("hello", 3) === "hel")
    assert(cut("hello", 5) === "hello")
    assert(cut("hello", 99) === "hello")
    assert(cut("hello", 0) === "")
    assert(cut("hello", -4) === "")
    assert(cut("", 10) === "")
  }

  test("column API, NULL propagation, SQL registration") {
    val df = Seq(Some("aé汉🚀"), None).toDF("s")
      .select(Utf8Truncate.utf8Truncate($"s", lit(6)).as("c"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0) === Some("aé汉") && got(1).isEmpty)
    assert(spark.sql("SELECT utf8_truncate('aé汉🚀', 3) AS c")
      .as[String].head() === "aé")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join") {
    // key 1 is hot: 1000 of 1010 rows
    val left = ((1 to 1000).map(i => (1L, s"v$i")) ++
      (1 to 10).map(i => (i.toLong + 1, s"w$i"))).toDF("k", "payload")
    val right = (1 to 11).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")

    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), factor = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 1010)
  }

  test("salt spreads even identical hot-key rows over multiple salts") {
    val left = (1 to 1000).map(_ => (1L, "x")).toDF("k", "payload")
    val salts = left.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }
}

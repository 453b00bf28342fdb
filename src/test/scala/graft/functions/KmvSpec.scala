package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("kmv sketch is exactly the k smallest distinct digests across partitions") {
    // duplicated values across many partitions: exercises update dedup,
    // partial-buffer serialization, and merge
    val df = (0L until 5000L).map(i => i % 1000L).toDF("v")
      .repartition(16)
      .withColumn("h", md5($"v".cast("string")))
    val sketch = df.agg(Kmv.kmvDigests($"h", 8).as("kmv"))
      .select(explode($"kmv")).as[String].collect().toSeq
    val expected = df.select($"h").distinct()
      .orderBy($"h").limit(8).as[String].collect().toSeq
    assert(sketch === expected) // ascending, deduped, exactly k
  }

  test("re-sketching stored sketches equals sketching the union (query-level merge)") {
    // the incremental-rollup contract (q107): k smallest of a union of
    // per-shard k-smallest sets == k smallest of the union
    val k = 16
    val a = (0L until 3000L).toDF("v")
    val b = (1500L until 4500L).toDF("v") // overlap exercises dedup
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(Kmv.kmvDigests(md5($"v".cast("string")), k).as("kmv"))
    val merged = sk(a).union(sk(b))
      .select(explode($"kmv").as("d"))
      .agg(Kmv.kmvDigests($"d", k).as("kmv"))
      .select(explode($"kmv")).as[String].collect().toSeq
    val direct = sk(a.union(b))
      .select(explode($"kmv")).as[String].collect().toSeq
    assert(merged === direct)
  }

  test("kmv estimate: exact below k, within sketch rsd above k") {
    val k = 64
    def estimate(n: Long): Double =
      (0L until n).toDF("v")
        .agg(Kmv.kmvDigests(md5($"v".cast("string")), k).as("kmv"))
        .select(Kmv.kmvEstimate($"kmv", k)).as[Double].head()
    assert(estimate(40L) === 40.0) // sub-k: the sketch IS the distinct set
    val est = estimate(10000L)
    // rsd ≈ 1/√(k−2) ≈ 12.7%; 4σ
    assert(math.abs(est - 10000.0) <= 10000.0 * 0.51, s"estimate $est")
  }

  test("kmv buffer never exceeds k entries") {
    val buf = new KmvBuffer(4)
    (0 until 100).foreach(i => buf.insert(f"$i%03d"))
    assert(buf.set.size === 4)
    assert(buf.set.first === "000")
    assert(buf.set.last === "003")
    // re-inserting an existing member must not evict anything
    buf.insert("000")
    assert(buf.set.size === 4 && buf.set.last === "003")
  }
}

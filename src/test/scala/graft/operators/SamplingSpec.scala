package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 5000L).toDF("id")

  test("hash sample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("sampled fraction lands near the requested fraction") {
    val n = Sampling.hashSample(ids, "id", 0.2).count()
    assert(n > 800 && n < 1200, s"got $n of 5000 at fraction 0.2")
  }

  test("split is total, disjoint, and consistent with the sample") {
    val split = Sampling.trainTestSplit(ids, "id", 0.2)
    assert(split.count() === 5000)
    val test = split.filter($"split" === "test").collect().map(_.getLong(0)).toSet
    val train = split.filter($"split" === "train").collect().map(_.getLong(0)).toSet
    assert(test.intersect(train).isEmpty)
    assert(test.size + train.size === 5000)
    // the same bucket function drives both operators
    val sampled = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(sampled === test)
  }

  test("fraction 1.0 keeps everything, 0.0 keeps nothing") {
    assert(Sampling.hashSample(ids, "id", 1.0).count() === 5000)
    assert(Sampling.hashSample(ids, "id", 0.0).count() === 0)
  }

  test("split at fraction 1.0 tags every row test (ffff-bucket boundary)") {
    // id 41296 hashes into the top bucket "ffff", which a capped
    // threshold comparison would mis-tag 'train' at fraction 1.0
    val top = (0L until 200000L).toDF("id")
      .filter(Sampling.hashBucket($"id") === "ffff").limit(1)
    assert(top.count() === 1, "fixture needs an id in bucket ffff")
    val split = Sampling.trainTestSplit(ids.union(top.select($"id")), "id", 1.0)
    assert(split.filter($"split" =!= "test").count() === 0)
  }

  test("weighted sample key: ln-form ranks identically to the classic u^(1/w)") {
    // weights spanning 4 orders of magnitude; the log form must give
    // the same top-k order as pow(u, 1/w) wherever pow doesn't
    // underflow (which is the reason the log form exists)
    val rows = (0L until 2000L).map(i => (i, 1.0 + (i % 1000) * 10.0)).toDF("id", "w")
    val u = (conv(substring(md5($"id".cast("string")), 1, 12), 16, 10)
      .cast("double") + 1.0d) / lit(math.pow(2, 48) + 1.0d)
    val both = rows.select($"id",
        Sampling.weightedSampleKey($"id", $"w").as("lnKey"),
        pow(u, lit(1.0d) / $"w").as("powKey"))
    val byLn = both.orderBy($"lnKey".desc, $"id".asc).select("id")
      .collect().map(_.getLong(0)).toSeq
    val byPow = both.orderBy($"powKey".desc, $"id".asc).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(byLn === byPow)
  }

  test("weighted sampling favors heavy rows and is weight-monotone per id") {
    // same uniform per id ⇒ raising the weight must raise the key
    val rows = (0L until 5000L).toDF("id")
    val k1 = rows.select($"id", Sampling.weightedSampleKey($"id", lit(1.0)).as("k"))
    val k10 = rows.select($"id", Sampling.weightedSampleKey($"id", lit(10.0)).as("k"))
    val joined = k1.withColumnRenamed("k", "k1")
      .join(k10.withColumnRenamed("k", "k10"), "id")
    assert(joined.filter($"k10" <= $"k1").count() === 0)

    // statistically: in a 50/50 light/heavy population with 100×
    // weight ratio, the top-100 draw should be dominated by heavy rows
    val pop = (0L until 10000L).map(i => (i, if (i % 2 == 0) 1.0 else 100.0))
      .toDF("id", "w")
    val top = pop.select($"id", $"w", Sampling.weightedSampleKey($"id", $"w").as("k"))
      .orderBy($"k".desc).limit(100)
    assert(top.filter($"w" === 100.0).count() >= 90)
  }
}

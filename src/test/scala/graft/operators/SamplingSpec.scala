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
}

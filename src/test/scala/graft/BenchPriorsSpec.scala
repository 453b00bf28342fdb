package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-defense depends on parsing per-query times out of
  * earlier rounds' BENCH_r*.json artifacts — which the driver stores
  * with the bench JSON EMBEDDED AS AN ESCAPED STRING ("tail" field,
  * \"qNN\":1.23). This pins the parser against both formats so a
  * format drift degrades to "no priors" (weaker thresholds), never to
  * wrong ones. */
class BenchPriorsSpec extends AnyFunSuite {

  private def withDir(body: java.io.File => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("bench_priors").toFile
    try body(d)
    finally org.apache.commons.io.FileUtils.deleteDirectory(d)
  }

  test("parses plain and escaped-tail artifacts, keeping the per-query min") {
    withDir { d =>
      // round 1: plain bench JSON line (our own format)
      val plain = """{"metric":"total","value":9.9,"unit":"sec","queries":{"q01_pricing_summary":0.45,"q24_minhash_lsh":4.6},"sf":"/x"}"""
      java.nio.file.Files.write(new java.io.File(d, "BENCH_r01.json").toPath,
        plain.getBytes)
      // round 2: driver wrapper with the escaped tail
      val wrapped = """{"n": 3, "sf": 0.1, "tail": "\"q01_pricing_summary\":0.31,\"q64_tpch_q21_sole_late_supplier\":2.75"}"""
      java.nio.file.Files.write(new java.io.File(d, "BENCH_r02.json").toPath,
        wrapped.getBytes)
      // round 5+: compact short-key line + full-name detail file
      val compact = """{"metric":"total","value":9.90,"unit":"sec","queries":{"q01":0.28,"q77":1.25},"sf":"/x"}"""
      java.nio.file.Files.write(new java.io.File(d, "BENCH_r05.json").toPath,
        compact.getBytes)
      java.nio.file.Files.write(new java.io.File(d, "BENCH_DETAIL.json").toPath,
        """{"total":9.9,"queries":{"q77_table_checksum":1.21}}""".getBytes)
      // not a bench artifact: ignored
      java.nio.file.Files.write(new java.io.File(d, "CORRECTNESS_r01.json").toPath,
        """{"q99_fake": 0.001}""".getBytes)
      val p = Bench.priorTimes(Seq(d))
      assert(p("q01") === 0.28) // min across rounds, keyed by qNN prefix
      assert(p("q24") === 4.6)
      assert(p("q64") === 2.75)
      assert(p("q77") === 1.21) // detail file min-merges with the compact line
      assert(!p.contains("q99"))
    }
  }

  test("a detail file recorded at a different SF is excluded from priors") {
    withDir { d =>
      java.nio.file.Files.write(new java.io.File(d, "BENCH_DETAIL.json").toPath,
        """{"total":1.0,"queries":{"q01_pricing_summary":0.01},"sf":"/x/sf0.001"}""".getBytes)
      assert(Bench.priorTimes(Seq(d), sfDir = Some("/x/sf0.1")).isEmpty)
      assert(Bench.priorTimes(Seq(d), sfDir = Some("/x/sf0.001"))("q01") === 0.01)
      // without an SF to check against, the file still feeds priors
      assert(Bench.priorTimes(Seq(d))("q01") === 0.01)
    }
  }

  test("missing directories and malformed files yield no priors, not a crash") {
    assert(Bench.priorTimes(Seq(new java.io.File("/nonexistent_dir_xyz"))).isEmpty)
    withDir { d =>
      java.nio.file.Files.write(new java.io.File(d, "BENCH_r07.json").toPath,
        "not json at all {{{".getBytes)
      assert(Bench.priorTimes(Seq(d)).isEmpty)
    }
  }
}

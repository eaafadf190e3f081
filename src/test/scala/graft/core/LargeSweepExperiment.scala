package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Large-sweep experiment (opt-in via GRAFT_SCALEUP=1): 100k psets through
  * the full run pipeline — the reference's "many small workloads" dask
  * niche (ref manual.md:1049-1053) served by Spark task scheduling.
  *
  * Measured (local[4]): ~47 µs/pset end-to-end orchestration overhead
  * (ids, hashes, schema inference, union, partitioned write) — the Spark
  * analog of the reference's µs-scale `_pset_runtime` floor. This
  * experiment caught an O(n²) positional-indexing bug in the work builder
  * (144 s -> 4.7 s at 100k psets), which is exactly what it exists for.
  */
class LargeSweepExperiment extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  test("100k-pset sweep completes with sub-ms/pset orchestration overhead") {
    assume(sys.env.contains("GRAFT_SCALEUP"),
      "slow: opt in with GRAFT_SCALEUP=1 sbt test")
    val calc = tmpDir("graft-large-")
    val params = Grid.pgrid(
      Grid.plist("a", 0 until 1000), Grid.plist("b", 0 until 100))
    assert(params.size == 100000)
    val t0 = System.nanoTime()
    val out = Study(spark, calc).run(
      p => Map("r_" -> (p("a").asInstanceOf[Long] * 0.5)), params)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[large] 100k psets in $wall%.1fs (${wall * 1e6 / 100000}%.0f us/pset)")
    assert(out.executed == 100000)
    assert(out.db.count() == 100000)
    assert(wall / 100000 < 0.001, s"orchestration ${wall * 1e6 / 100000} us/pset")
    // dedup against 100k existing rows stays cheap
    val t1 = System.nanoTime()
    val out2 = Study(spark, StudyConfig(calcDir = calc, skipDups = true))
      .run(p => Map("r_" -> 0.0), params.take(5000))
    println(f"[large] 5k-dup check against 100k rows in ${(System.nanoTime() - t1) / 1e9}%.1fs")
    assert(out2.executed == 0)
  }
}

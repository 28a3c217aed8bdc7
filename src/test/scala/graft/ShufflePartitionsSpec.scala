package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession.{inputBytes, shufflePartitionsFor}

/** Pins the input-size-aware shuffle-partition sizing (VERDICT r6 item 4):
  * the knob must follow the data — clamp to the core count on the tiny
  * local fixtures, grow one-partition-per-128MB in the scaling region, and
  * cap at 4×cores so a 100 TB input can't drown the scheduler. No Spark
  * session needed: the function is pure and the fixture probe is a
  * filesystem walk. */
class ShufflePartitionsSpec extends AnyFunSuite {

  private val cores = 32

  test("fixture dirs: both local scales clamp to the core count") {
    val tiny = inputBytes("/root/testdata/sf0.001")
    val small = inputBytes("/root/testdata/sf0.01")
    assert(tiny > 0L && small > tiny,
      s"fixture probe broken: sf0.001=$tiny sf0.01=$small")
    assert(shufflePartitionsFor(tiny, cores) === cores)
    assert(shufflePartitionsFor(small, cores) === cores)
  }

  test("scaling region: one partition per targetBytes, ceil-divided") {
    val gb = 1024L * 1024 * 1024
    // 10 GB / 128 MB = 80 — above cores, below the 4×cores cap
    assert(shufflePartitionsFor(10 * gb, cores) === 80)
    // ceil, not floor: one byte past a boundary adds a partition
    assert(shufflePartitionsFor(128L * 1024 * 1024 * 80 + 1, cores) === 81)
  }

  test("upper clamp: huge inputs cap at 4×cores") {
    val tb = 1024L * 1024 * 1024 * 1024
    assert(shufflePartitionsFor(tb, cores) === 4 * cores)
    assert(shufflePartitionsFor(100 * tb, cores) === 4 * cores)
  }

  test("degenerate inputs: zero bytes clamps up, bad args fail loudly") {
    assert(shufflePartitionsFor(0L, cores) === cores)
    intercept[IllegalArgumentException](shufflePartitionsFor(1L, 0))
    intercept[IllegalArgumentException](shufflePartitionsFor(1L, 4, 0L))
  }

  test("target override: coarser target yields fewer partitions") {
    val gb = 1024L * 1024 * 1024
    assert(shufflePartitionsFor(10 * gb, cores, targetBytes = 512L * 1024 * 1024) === cores)
  }

  // --- fact-twin bucket sizing (r8: q44's nBuckets follows the input) ---

  test("bucketsForBytes: floor at MinBuckets on toy fixtures") {
    import graft.operators.Bucketed
    val mb = 1024L * 1024
    // sf0.1 facts are ~13.5 MB compressed → at the floor, layout unchanged
    assert(Bucketed.bucketsForBytes(0L) === Bucketed.MinBuckets)
    assert(Bucketed.bucketsForBytes(14 * mb) === Bucketed.MinBuckets)
    // sf1 facts ~96 MB → 48 buckets: above the 32-core count, so one
    // straggling bucket no longer sets the join's wall time
    assert(Bucketed.bucketsForBytes(96 * mb) === 48)
    // ceil, not floor
    assert(Bucketed.bucketsForBytes(96 * mb + 1) === 49)
    // scheduler-bound cap
    assert(Bucketed.bucketsForBytes(100L * 1024 * mb) === 4096)
  }
}

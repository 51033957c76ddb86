package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.PersistSlots

/** The bench/gate slot-release pass (round 14): after each query's
  * trials, every slot the query did NOT touch is evicted, so a
  * 200+-query run no longer accumulates all operators' caches to
  * session end (the r13 heap-pressure source: 536 hits / 133 misses,
  * zero releases, GC climbing through the alphabet).
  */
class PersistSlotsSpec extends SparkSpec {

  import spark.implicits._

  test("releaseUntouched evicts only slots untouched since the mark") {
    val a = PersistSlots.swap("spec.release.a",
      Seq(1, 2, 3).toDF("v").filter($"v" > 0))
    a.count()
    val mark = PersistSlots.advanceEpoch()
    // touched after the mark: swap the SAME plan — reuse branch, but
    // the touch stamp still updates
    val b = PersistSlots.swap("spec.release.b",
      Seq(4, 5).toDF("w").filter($"w" > 4))
    b.count()
    assert(a.storageLevel != StorageLevel.NONE)
    assert(b.storageLevel != StorageLevel.NONE)
    val released = PersistSlots.releaseUntouched(mark)
    assert(released >= 1)
    // the untouched slot lost its cache; the touched one kept it
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel != StorageLevel.NONE)
    // cleanup
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
  }

  test("a re-swap inside the window refreshes the touch stamp (cross-" +
    "trial reuse survives the release)") {
    val df = Seq(1, 2).toDF("v").filter($"v" > 1)
    val p1 = PersistSlots.swap("spec.release.c", df)
    p1.count()
    val mark = PersistSlots.advanceEpoch()
    // trial 2 of the same query re-derives the same plan -> hit path
    val p2 = PersistSlots.swap("spec.release.c", Seq(1, 2).toDF("v").filter($"v" > 1))
    assert(p2.storageLevel != StorageLevel.NONE)
    PersistSlots.releaseUntouched(mark): Unit
    assert(p2.storageLevel != StorageLevel.NONE,
      "slot touched during the window must survive the release")
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
  }

  test("releaseUntouched never unpersists a frame a touched slot aliases " +
    "(cross-slot sharing)") {
    val mk = () => Seq(1, 2, 3).toDF("v").filter($"v" > 1)
    val a = PersistSlots.swap("spec.alias.a", mk())
    a.count()
    // identical plan under a second name -> swap's sharing branch
    // stores the SAME DataFrame object under both keys
    val b = PersistSlots.swap("spec.alias.b", mk())
    assert(b eq a, "sharing branch should alias the existing frame")
    val mark = PersistSlots.advanceEpoch()
    // only slot a is touched inside the window; b's entry goes stale
    PersistSlots.swap("spec.alias.a", mk()): Unit
    val released = PersistSlots.releaseUntouched(mark)
    assert(released >= 1, "the stale alias entry should be released")
    assert(a.storageLevel != StorageLevel.NONE,
      "releasing the stale alias must not evict the touched slot's cache")
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
  }

  test("releaseUntouched spares DISTINCT objects sharing one plan-keyed " +
    "cache entry (external-unpersist aftermath)") {
    val mk = () => Seq(9, 10).toDF("v").filter($"v" > 9)
    val a = PersistSlots.swap("spec.alias2.a", mk())
    a.count()
    // external actor breaks the same-object sharing invariant
    a.unpersist()
    // the re-swap under a second name misses (occupant uncached) and
    // persists a FRESH object — CacheManager keys by canonical plan,
    // so a and b now alias one cache entry as different objects
    val b = PersistSlots.swap("spec.alias2.b", mk())
    assert(!(b eq a))
    b.count()
    assert(b.storageLevel != StorageLevel.NONE)
    val mark = PersistSlots.advanceEpoch()
    PersistSlots.swap("spec.alias2.b", mk()): Unit // touch b only
    PersistSlots.releaseUntouched(mark): Unit      // a's entry goes stale
    assert(b.storageLevel != StorageLevel.NONE,
      "releasing the stale distinct-object alias must not evict the " +
        "touched slot's plan-keyed cache entry")
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
  }

  test("released slots re-persist cleanly on the next swap (self-healing)") {
    val mk = () => Seq(7, 8).toDF("v").filter($"v" > 6)
    val p1 = PersistSlots.swap("spec.release.d", mk())
    p1.count()
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
    assert(p1.storageLevel == StorageLevel.NONE)
    val p2 = PersistSlots.swap("spec.release.d", mk())
    assert(p2.storageLevel != StorageLevel.NONE)
    assert(p2.collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
    PersistSlots.releaseUntouched(PersistSlots.advanceEpoch()): Unit
  }
}

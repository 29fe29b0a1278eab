package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the hard-link capability probe's three-valued contract
  * (see LakeIO.probeHardLinks): positives cached permanently,
  * capability-shaped negatives cached with a TTL, and indeterminate
  * probe failures NEVER cached — the advisor-flagged failure mode was
  * one transient probe error permanently routing a link-capable
  * filesystem onto the legacy rename+verify publish. */
class LakeIOSpec extends AnyFunSuite {

  test("same-filesystem dir pair probes Some(true)") {
    val a = Files.createTempDirectory("linkprobe-a")
    val b = Files.createTempDirectory("linkprobe-b")
    assert(LakeIO.probeHardLinks(a, b) === Some(true))
    // cached positive: still true, and no scratch files left behind
    assert(LakeIO.probeHardLinks(a, b) === Some(true))
    assert(!Files.list(a).iterator().hasNext)
    assert(!Files.list(b).iterator().hasNext)
  }

  test("a probe that cannot run is indeterminate and never cached") {
    val parent = Files.createTempDirectory("linkprobe-none")
    val src = parent.resolve("missing-src-dir") // does not exist yet
    val dst = Files.createTempDirectory("linkprobe-dst")
    assert(LakeIO.probeHardLinks(src, dst) === None)
    // the advisor scenario: once the transient condition clears, the
    // SAME dir pair must probe fresh and report capability — an
    // (incorrectly) cached negative would return Some(false) here
    Files.createDirectory(src)
    assert(LakeIO.probeHardLinks(src, dst) === Some(true))
  }

  test("null dirs are indeterminate, not a silent downgrade") {
    assert(LakeIO.probeHardLinks(null, Paths.get("/tmp")) === None)
    assert(LakeIO.probeHardLinks(Paths.get("/tmp"), null) === None)
  }

  test("cross-device pair probes Some(false) when distinct stores exist") {
    // EXDEV is the one capability-negative reproducible in CI: linking
    // across mount points. Only meaningful when the box actually has
    // two stores — otherwise the assumption skips the test.
    val shm = Paths.get("/dev/shm")
    val tmp = Paths.get("/tmp")
    org.scalatest.Assertions.assume(
      Files.isDirectory(shm) && Files.isWritable(shm) &&
        Files.getFileStore(shm) != Files.getFileStore(tmp))
    val a = Files.createTempDirectory(shm, "linkprobe-x")
    val b = Files.createTempDirectory(tmp, "linkprobe-y")
    // store the negative with an already-expired deadline, so the next
    // call must RE-PROBE (pins that negatives expire rather than
    // poisoning the pair forever)
    assert(LakeIO.probeHardLinks(a, b, negativeTtlNanos = -1L) === Some(false))
    assert(LakeIO.probeHardLinks(a, b) === Some(false))
    // now cached inside the default TTL window — and scratch files from
    // all three probes were cleaned up on both sides
    assert(LakeIO.probeHardLinks(a, b) === Some(false))
    assert(!Files.list(a).iterator().hasNext)
    assert(!Files.list(b).iterator().hasNext)
  }
}

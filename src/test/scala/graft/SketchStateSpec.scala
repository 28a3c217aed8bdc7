package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchState

/** The serialized-state header is a durable format (states get
  * checkpointed); these pin the version discrimination rules. */
class SketchStateSpec extends AnyFunSuite {

  test("versioned header round-trips (version, k)") {
    val bb = ByteBuffer.allocate(SketchState.HeaderBytes)
    SketchState.putHeader(bb, 1, 256)
    bb.flip()
    assert(SketchState.readHeader(bb, maxVersion = 1, "t") === ((1, 256)))
  }

  test("pre-versioning k-only header reads as version 0") {
    val bb = ByteBuffer.allocate(4)
    bb.putInt(512) // legacy layout: first int IS the builder k
    bb.flip()
    assert(SketchState.readHeader(bb, maxVersion = 1, "t") === ((0, 512)))
  }

  test("header from a NEWER build fails loudly, not as garbage") {
    val bb = ByteBuffer.allocate(SketchState.HeaderBytes)
    SketchState.putHeader(bb, 2, 256)
    bb.flip()
    val e = intercept[IllegalArgumentException] {
      SketchState.readHeader(bb, maxVersion = 1, "t")
    }
    assert(e.getMessage.contains("version 2"))
  }

  test("corrupt / foreign state fails loudly") {
    val bb = ByteBuffer.allocate(4)
    bb.putInt(0xDEADBEEF) // negative, wrong magic
    bb.flip()
    val e = intercept[IllegalArgumentException] {
      SketchState.readHeader(bb, maxVersion = 1, "t")
    }
    assert(e.getMessage.contains("unrecognized header"))
  }
}

package graft.functions

import java.nio.ByteBuffer

/** Versioned header convention for persisted sketch/aggregate state bytes
  * ([[KmvSketch]], [[TopKAgg]]). The docs encourage checkpointing state
  * (the q85/q109 cumulative pattern), so the byte layout is a durable
  * format: every layout change must bump the version here rather than
  * silently re-shaping the bytes.
  *
  * Layout: `int32 magic+version, int32 builder-k, <kernel payload>`.
  * The magic is NEGATIVE as an int32 — a builder k is always > 0 — so the
  * first int cleanly discriminates a versioned state from the
  * pre-versioning layout (`int32 k, <payload>`), which readers accept as
  * version 0. A first int that is neither positive nor a known magic is a
  * corrupt or foreign state and fails loudly instead of deserializing to
  * garbage.
  */
object SketchState {
  /** High 24 bits of the header int; low 8 bits carry the version. */
  val MagicBase: Int = 0xC0DE5100

  def magic(version: Int): Int = MagicBase | (version & 0xFF)

  /** Writes the versioned header (8 bytes). */
  def putHeader(bb: ByteBuffer, version: Int, k: Int): Unit = {
    bb.putInt(magic(version))
    bb.putInt(k)
  }

  val HeaderBytes: Int = 8

  /** Reads a header, returning `(version, stateK)`. A positive first int is
    * the pre-versioning layout (version 0, first int = k). */
  def readHeader(bb: ByteBuffer, maxVersion: Int, what: String): (Int, Int) = {
    val first = bb.getInt()
    if (first > 0) (0, first)
    else {
      require((first & 0xFFFFFF00) == MagicBase,
        s"$what state: unrecognized header 0x${first.toHexString} — " +
          "not a versioned state and not a legacy k-header")
      val v = first & 0xFF
      require(v <= maxVersion,
        s"$what state: format version $v is newer than this build reads (max $maxVersion)")
      (v, bb.getInt())
    }
  }
}

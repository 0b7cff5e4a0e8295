package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Delta-gap + variable-byte codec for posting lists.
  *
  * The reference freezes dynamic adjacency into CSR arrays
  * (`StaticAdjList(adj)`, /root/reference/src/adj/adjstatic.jl:25-46);
  * our sealed form additionally compresses: sorted doc ids are stored
  * as first-difference gaps, each gap as a little-endian base-128
  * varint (low 7 bits per byte, high bit = continuation).
  *
  * Pure JVM functions — used inside typed map/mapPartitions during
  * segment sealing and WAND traversal; never crosses an encoder
  * boundary except as `Array[Byte]` (BinaryType).
  */
object VByte {

  /** Encode a non-negative Long as varint into `out`. */
  @inline def writeVarLong(out: ArrayBuffer[Byte], value: Long): Unit = {
    require(value >= 0, s"varint requires non-negative value, got $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Decode one varint starting at `pos`; returns (value, nextPos). */
  @inline def readVarLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    var b = 0
    do {
      b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  /** Encode a strictly-increasing Long array as delta-gaps + varints.
    * First value stored absolute; subsequent values store `v[i]-v[i-1]`.
    */
  def encodeSorted(values: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](values.length * 2)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (i == 0) writeVarLong(out, v)
      else {
        require(v > prev, s"encodeSorted requires strictly increasing input ($prev then $v)")
        writeVarLong(out, v - prev)
      }
      prev = v
      i += 1
    }
    out.toArray
  }

  /** Inverse of [[encodeSorted]]; `n` = number of values. */
  def decodeSorted(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val (v, p) = readVarLong(bytes, pos)
      pos = p
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Encode arbitrary non-negative Longs (no delta), e.g. term freqs. */
  def encodePlain(values: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](values.length)
    var i = 0
    while (i < values.length) { writeVarLong(out, values(i)); i += 1 }
    out.toArray
  }

  /** Inverse of [[encodePlain]]. */
  def decodePlain(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      val (v, p) = readVarLong(bytes, pos)
      pos = p
      out(i) = v
      i += 1
    }
    out
  }
}

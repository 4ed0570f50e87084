package graft.codec

import java.io.ByteArrayOutputStream

/** Variable-byte + delta-gap posting codec.
  *
  * Engine analog of MidiTok's `encode_token_ids`/`decode_token_ids` lossless
  * codec pair (reference: midi_tokenizer.py:3008-3073) — must be exact
  * inverses, tested the way the reference tests id round-trips
  * (tests/test_train.py:140-157).
  *
  * Encoding: each non-negative Long is emitted as 7-bit groups, little-
  * endian, high bit set on the terminating byte (classic VByte, cf. the
  * greedy multi-emit decomposition X6, midi_tokenizer.py:2531-2569).
  */
object VByte {

  /** Encode one value into the stream. Requires v >= 0. */
  def put(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"VByte requires non-negative values, got $v0")
    var v = v0
    while (v >= 0x80L) {
      out.write((v & 0x7fL).toInt)
      v >>>= 7
    }
    out.write((v | 0x80L).toInt)
  }

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length + 8)
    var i = 0
    while (i < values.length) { put(out, values(i)); i += 1 }
    out.toByteArray
  }

  def encodeInts(values: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length + 8)
    var i = 0
    while (i < values.length) { put(out, values(i).toLong); i += 1 }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length)
    var i = 0
    var v = 0L
    var shift = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b & 0x80) != 0) {
        out += (v | ((b & 0x7fL) << shift))
        v = 0L
        shift = 0
      } else {
        v |= (b.toLong << shift)
        shift += 7
      }
      i += 1
    }
    require(shift == 0, "truncated VByte stream")
    out.toArray
  }

  def decodeInts(bytes: Array[Byte]): Array[Int] = decode(bytes).map(_.toInt)

  /** Strictly-increasing docIds → gaps: first value absolute, then deltas
    * (all >= 1). Inverse of [[undelta]]. */
  def deltaGaps(sorted: Array[Long]): Array[Long] = {
    if (sorted.isEmpty) return Array.empty
    val out = new Array[Long](sorted.length)
    out(0) = sorted(0)
    var i = 1
    while (i < sorted.length) {
      val g = sorted(i) - sorted(i - 1)
      require(g > 0, s"docIds must be strictly increasing, gap=$g at $i")
      out(i) = g
      i += 1
    }
    out
  }

  def undelta(gaps: Array[Long]): Array[Long] = {
    if (gaps.isEmpty) return Array.empty
    val out = new Array[Long](gaps.length)
    out(0) = gaps(0)
    var i = 1
    while (i < gaps.length) { out(i) = out(i - 1) + gaps(i); i += 1 }
    out
  }

  /** docIds → delta-gap + VByte bytes (the posting docId codec). */
  def encodeDocIds(sorted: Array[Long]): Array[Byte] = encode(deltaGaps(sorted))

  def decodeDocIds(bytes: Array[Byte]): Array[Long] = undelta(decode(bytes))

  /** Append one posting's strictly-increasing 1-based positions to the
    * block's shared position stream: first absolute, then gaps (all ≥ 1). */
  def putPositions(out: ByteArrayOutputStream, positions: Array[Int]): Unit = {
    var i = 0
    var prev = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p > prev, s"positions must be strictly increasing and >= 1, got $p after $prev")
      put(out, (p - prev).toLong)
      prev = p
      i += 1
    }
  }

  /** Inverse of [[putPositions]] over a whole block: the concatenated
    * stream holds tfs(j) values for posting j, in posting order. */
  def decodePositions(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Int]] = {
    val vals = decode(bytes)
    val out = new Array[Array[Int]](tfs.length)
    var idx = 0
    var j = 0
    while (j < tfs.length) {
      val tf = tfs(j)
      val arr = new Array[Int](tf)
      var prev = 0L
      var i = 0
      while (i < tf) {
        prev += vals(idx)
        arr(i) = prev.toInt
        idx += 1
        i += 1
      }
      out(j) = arr
      j += 1
    }
    require(idx == vals.length, s"position stream length ${vals.length} != sum(tfs) $idx")
    out
  }
}

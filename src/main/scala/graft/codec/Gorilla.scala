package graft.codec

/** Gorilla-style XOR compression for double values (Pelkonen et al., VLDB'15,
  * §4.1.2 — public algorithm). Exact round-trip for every bit pattern,
  * including NaN payloads, ±0.0 and subnormals (we operate on raw bits).
  *
  * Layout per value after the first (stored raw, 64 bits):
  *  - '0'                       : identical to the previous value
  *  - '10' + meaningful bits    : XOR fits the previous leading/length window
  *  - '11' + 5b leading + 6b (len-1) + len bits : new window
  */
object Gorilla {

  def encode(values: Array[Double], w: BitWriter): Unit = {
    if (values.isEmpty) return
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    var prevLead = -1
    var prevLen = 0
    var i = 1
    while (i < values.length) {
      val bits = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = bits ^ prev
      if (xor == 0L) {
        w.writeBit(0)
      } else {
        w.writeBit(1)
        var lead = java.lang.Long.numberOfLeadingZeros(xor)
        if (lead > 31) lead = 31 // 5-bit field
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        val len = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && (64 - prevLead - prevLen) <= trail) {
          // fits inside the previous window
          w.writeBit(0)
          w.writeBits(xor >>> (64 - prevLead - prevLen), prevLen)
        } else {
          w.writeBit(1)
          w.writeBits(lead.toLong, 5)
          w.writeBits((len - 1).toLong, 6)
          w.writeBits(xor >>> trail, len)
          prevLead = lead
          prevLen = len
        }
      }
      prev = bits
      i += 1
    }
  }

  def decode(r: BitReader, count: Int): Array[Double] = {
    val out = new Array[Double](count)
    if (count == 0) return out
    var prev = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prev)
    var prevLead = -1
    var prevLen = 0
    var i = 1
    while (i < count) {
      if (r.readBit() == 0) {
        out(i) = java.lang.Double.longBitsToDouble(prev)
      } else {
        if (r.readBit() == 1) {
          prevLead = r.readBits(5).toInt
          prevLen = r.readBits(6).toInt + 1
        }
        val meaningful = r.readBits(prevLen)
        val xor = meaningful << (64 - prevLead - prevLen)
        prev = prev ^ xor
        out(i) = java.lang.Double.longBitsToDouble(prev)
      }
      i += 1
    }
    out
  }
}

/** Delta-of-delta timestamp compression (Gorilla §4.1.1, bucket variant).
  * Timestamps are Longs (epoch millis in this engine). Exact round-trip.
  *
  * Layout: first ts raw 64b; first delta raw 64b; then per point:
  *  '0' dod=0 | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b raw dod,
  * where an n-bit bucket stores dod + 2^(n-1) - 1 (range [-(2^(n-1)-1), 2^(n-1)]).
  */
object DeltaOfDelta {

  def encode(ts: Array[Long], w: BitWriter): Unit = {
    if (ts.isEmpty) return
    w.writeBits(ts(0), 64)
    if (ts.length == 1) return
    var prevDelta = ts(1) - ts(0)
    w.writeBits(prevDelta, 64)
    var prev = ts(1)
    var i = 2
    while (i < ts.length) {
      val delta = ts(i) - prev
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(0)
      else if (dod >= -63 && dod <= 64) {
        w.writeBits(0x2L, 2); w.writeBits(dod + 63, 7)
      } else if (dod >= -255 && dod <= 256) {
        w.writeBits(0x6L, 3); w.writeBits(dod + 255, 9)
      } else if (dod >= -2047 && dod <= 2048) {
        w.writeBits(0xeL, 4); w.writeBits(dod + 2047, 12)
      } else {
        w.writeBits(0xfL, 4); w.writeBits(dod, 64)
      }
      prevDelta = delta
      prev = ts(i)
      i += 1
    }
  }

  def decode(r: BitReader, count: Int): Array[Long] = {
    val out = new Array[Long](count)
    if (count == 0) return out
    out(0) = r.readBits(64)
    if (count == 1) return out
    var prevDelta = r.readBits(64)
    out(1) = out(0) + prevDelta
    var i = 2
    while (i < count) {
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) r.readBits(7) - 63
        else if (r.readBit() == 0) r.readBits(9) - 255
        else if (r.readBit() == 0) r.readBits(12) - 2047
        else r.readBits(64)
      prevDelta += dod
      out(i) = out(i - 1) + prevDelta
      i += 1
    }
    out
  }
}

/** Chunk blob: the on-disk unit of a rollup tier — a compressed run of
  * (ts, value) points for one (key, chunk) cell. Engine-new; the reference's
  * analog is the zlib-9 netCDF chunk (/root/reference/xcorr/core/init.py:121).
  *
  * Layout: magic 'G' (8b) | version 1 (8b) | count (32b) |
  *         delta-of-delta ts stream | Gorilla value stream.
  */
object ChunkBlob {
  private val Magic = 0x47L // 'G'
  private val Version = 1L

  def encode(ts: Array[Long], values: Array[Double]): Array[Byte] = {
    require(ts.length == values.length, "ts/values length mismatch")
    val w = new BitWriter(ts.length + 8)
    w.writeBits(Magic, 8)
    w.writeBits(Version, 8)
    w.writeBits(ts.length.toLong, 32)
    DeltaOfDelta.encode(ts, w)
    Gorilla.encode(values, w)
    w.toBytes
  }

  def decode(blob: Array[Byte]): (Array[Long], Array[Double]) = {
    val r = new BitReader(blob)
    require(r.readBits(8) == Magic, "bad chunk magic")
    require(r.readBits(8) == Version, "bad chunk version")
    val count = r.readBits(32).toInt
    val ts = DeltaOfDelta.decode(r, count)
    val values = Gorilla.decode(r, count)
    (ts, values)
  }
}

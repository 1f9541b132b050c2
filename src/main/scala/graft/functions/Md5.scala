package org.apache.spark.sql.graft

/** Minimal allocation-free MD5 (RFC 1321) for the MinHash hot path.
  *
  * Why not `java.security.MessageDigest`: the JCE path costs a provider
  * indirection, an internal buffer copy per `update`, and a fresh 16-byte
  * array per `digest()` — per (token, quad) in the MinHash family that is
  * the dominant allocation. This implementation digests straight from a
  * caller-owned byte buffer into a caller-owned 16-byte output, zero
  * allocation per call; one instance per thread (64-int schedule scratch
  * is instance state). Byte-for-byte equal to `MessageDigest("MD5")` —
  * ExpressionsSpec fuzzes the parity, and every md5-family oracle
  * hash-check would catch a drift end-to-end.
  */
final class Md5 {

  private val m = new Array[Int](16) // message schedule for one 64-byte block
  private val tail = new Array[Byte](128) // padded final block(s)

  // s-rotation amounts and the binary-radian constants, RFC 1321 §3.4
  private[this] val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
  private[this] val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private var a0 = 0
  private var b0 = 0
  private var c0 = 0
  private var d0 = 0

  private def compress(buf: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 16) {
      val o = off + 4 * i
      m(i) = (buf(o) & 0xFF) | ((buf(o + 1) & 0xFF) << 8) |
        ((buf(o + 2) & 0xFF) << 16) | ((buf(o + 3) & 0xFF) << 24)
      i += 1
    }
    var a = a0; var b = b0; var c = c0; var d = d0
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      val x = a + f + K(i) + m(g)
      b = b + Integer.rotateLeft(x, S(i))
      a = tmp
      i += 1
    }
    a0 += a; b0 += b; c0 += c; d0 += d
  }

  /** MD5 of `buf[0, len)` into `out16` (16 bytes, the MessageDigest byte
    * order). `buf` beyond `len` is ignored. */
  def digest(buf: Array[Byte], len: Int, out16: Array[Byte]): Unit = {
    a0 = 0x67452301; b0 = 0xefcdab89; c0 = 0x98badcfe; d0 = 0x10325476
    var off = 0
    while (len - off >= 64) { compress(buf, off); off += 64 }
    // pad: 0x80, zeros, 64-bit little-endian bit length
    val rem = len - off
    System.arraycopy(buf, off, tail, 0, rem)
    tail(rem) = 0x80.toByte
    val padded = if (rem >= 56) 128 else 64
    java.util.Arrays.fill(tail, rem + 1, padded - 8, 0.toByte)
    val bits = len.toLong << 3
    var i = 0
    while (i < 8) { tail(padded - 8 + i) = ((bits >>> (8 * i)) & 0xFF).toByte; i += 1 }
    compress(tail, 0)
    if (padded == 128) compress(tail, 64)
    writeLe(out16, 0, a0); writeLe(out16, 4, b0)
    writeLe(out16, 8, c0); writeLe(out16, 12, d0)
  }

  private def writeLe(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xFF).toByte
    out(off + 1) = ((v >>> 8) & 0xFF).toByte
    out(off + 2) = ((v >>> 16) & 0xFF).toByte
    out(off + 3) = ((v >>> 24) & 0xFF).toByte
  }
}

package graft.abi

/** Pure-Scala Keccak-256 (the original Keccak padding 0x01, NOT SHA3's
  * 0x06) — needed for event topic0 and 4-byte call selectors
  * (`keccak256(signature)`, Ethereum contract ABI spec, public). No
  * external dependency is available offline, and the algorithm is ~70
  * lines from the published FIPS-202/Keccak reference.
  */
object Keccak256 {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r(x)(y)
  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private val Rate = 136 // bytes, for 256-bit output

  def hash(input: Array[Byte]): Array[Byte] = {
    val st = Array.ofDim[Long](5, 5)
    val padLen = Rate - (input.length % Rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = 0x01
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte

    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        var v = 0L
        var b = 7
        while (b >= 0) { v = (v << 8) | (padded(off + i * 8 + b) & 0xffL); b -= 1 }
        st(i % 5)(i / 5) ^= v
        i += 1
      }
      keccakF(st)
      off += Rate
    }

    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      val v = st(i % 5)(i / 5)
      var b = 0
      while (b < 8) { out(i * 8 + b) = ((v >>> (8 * b)) & 0xff).toByte; b += 1 }
      i += 1
    }
    out
  }

  private def keccakF(a: Array[Array[Long]]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = Array.ofDim[Long](5, 5)
    var round = 0
    while (round < 24) {
      var x = 0
      while (x < 5) {
        c(x) = a(x)(0) ^ a(x)(1) ^ a(x)(2) ^ a(x)(3) ^ a(x)(4); x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) { a(x)(y) ^= d(x); y += 1 }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y)((2 * x + 3 * y) % 5) = java.lang.Long.rotateLeft(a(x)(y), R(x)(y))
          y += 1
        }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x)(y) = b(x)(y) ^ (~b((x + 1) % 5)(y) & b((x + 2) % 5)(y))
          y += 1
        }
        x += 1
      }
      a(0)(0) ^= RC(round)
      round += 1
    }
  }

  def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def hashHex(s: String): String =
    hex(hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** `0x`-prefixed 32-byte event topic for a canonical signature. */
  def eventTopic(signature: String): String = "0x" + hashHex(signature)

  /** `0x`-prefixed 4-byte call selector for a canonical signature. */
  def selector(signature: String): String =
    "0x" + hashHex(signature).substring(0, 8)
}

package graft.functions

import com.github.luben.zstd.Zstd
import net.jpountz.lz4.LZ4Factory

/** Runtime byte-codec helpers backing the custom Catalyst expressions.
  *
  * LZ4 framing: the reference's `lz4decompress` requires the caller to pass
  * the expected decompressed size (default 8192 — an API wart,
  * /root/reference/module/internal/env/libs/crypt.hpp:400-470). We fix that
  * by prefixing the original length (4-byte big-endian), so decompression is
  * self-describing; zstd frames already carry their content size
  * (reference zstd usage: bytecode.cpp:130-155).
  */
object GraftCodec {
  private val lz4 = LZ4Factory.fastestInstance()

  def lz4Compress(input: Array[Byte]): Array[Byte] = {
    val comp = lz4.fastCompressor()
    val max = comp.maxCompressedLength(input.length)
    val buf = new Array[Byte](max + 4)
    buf(0) = (input.length >>> 24).toByte
    buf(1) = (input.length >>> 16).toByte
    buf(2) = (input.length >>> 8).toByte
    buf(3) = input.length.toByte
    val n = comp.compress(input, 0, input.length, buf, 4, max)
    java.util.Arrays.copyOf(buf, n + 4)
  }

  def lz4Decompress(input: Array[Byte]): Array[Byte] = {
    require(input.length >= 4, "lz4 payload too short: missing length header")
    val len = ((input(0) & 0xff) << 24) | ((input(1) & 0xff) << 16) |
      ((input(2) & 0xff) << 8) | (input(3) & 0xff)
    val out = new Array[Byte](len)
    lz4.fastDecompressor().decompress(input, 4, out, 0, len)
    out
  }

  def zstdCompress(input: Array[Byte], level: Int): Array[Byte] =
    Zstd.compress(input, level)

  def zstdDecompress(input: Array[Byte]): Array[Byte] = {
    val size = Zstd.getFrameContentSize(input)
    require(size >= 0 && size <= Int.MaxValue, s"bad zstd frame content size: $size")
    Zstd.decompress(input, size.toInt)
  }

  /** djb2 over the UTF-8 bytes, formatted as 16 hex digits — the exact
    * semantics of the reference's `crypt.hash`
    * (/root/reference/module/internal/env/libs/crypt.hpp:346-369). */
  def djb2Hex(input: Array[Byte]): String = {
    var h = 5381L
    var i = 0
    while (i < input.length) { h = h * 33 + (input(i) & 0xffL); i += 1 }
    f"$h%016x"
  }

  /** FNV-1a 64-bit — deterministic token hash for SimHash / LSH planes. */
  def fnv1a64(input: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < input.length) { h = (h ^ (input(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Karp-Rabin polynomial rolling hash, base 257 mod 2^31-1 — the document
    * fingerprint primitive (content-addressing analogue of the reference's
    * getscripthash, script.hpp:40-133). h < 2^31 so h*257+255 < 2^40: no
    * 64-bit overflow, no tricks needed. */
  def karpRabin(input: Array[Byte]): Long = {
    val M = 0x7fffffffL // 2^31 - 1 (Mersenne prime)
    var h = 0L
    var i = 0
    while (i < input.length) { h = (h * 257 + (input(i) & 0xffL)) % M; i += 1 }
    h
  }
}

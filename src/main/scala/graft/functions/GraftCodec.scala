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

  /** Max ingest frame size — the reference's TCP server cap
    * (/root/reference/module/internal/misc/server/server.cpp:85). */
  val MaxFrameBytes: Int = 8 * 1024 * 1024

  /** Length-prefixed wire frame: 4-byte big-endian length + payload — the
    * reference's ingest wire format (server.cpp:77-98, execute.hpp:30-36). */
  def frameEncode(payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= MaxFrameBytes, s"frame exceeds $MaxFrameBytes bytes")
    val out = new Array[Byte](payload.length + 4)
    out(0) = (payload.length >>> 24).toByte
    out(1) = (payload.length >>> 16).toByte
    out(2) = (payload.length >>> 8).toByte
    out(3) = payload.length.toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  /** Split a byte stream of concatenated frames back into payloads,
    * enforcing the 8 MiB cap like the reference server does. */
  def frameDecode(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 4 <= stream.length) {
      val len = ((stream(i) & 0xff) << 24) | ((stream(i + 1) & 0xff) << 16) |
        ((stream(i + 2) & 0xff) << 8) | (stream(i + 3) & 0xff)
      require(len >= 0 && len <= MaxFrameBytes, s"frame length $len out of bounds")
      require(i + 4 + len <= stream.length, "truncated frame")
      out += java.util.Arrays.copyOfRange(stream, i + 4, i + 4 + len)
      i += 4 + len
    }
    require(i == stream.length, "trailing garbage after last frame")
    out.result()
  }

  private val Rsb1Magic = Array[Byte]('R', 'S', 'B', '1')

  /** Encode a payload in the reference's compressed-bytecode container,
    * conformant to bytecode.cpp:130-155 (decompress_bytecode): plaintext is
    * "RSB1" magic + 4-byte little-endian size + zstd frame; every byte i
    * (header included) is XOR-masked with key[i%4] + i*41 (uint8
    * arithmetic) for a 4-byte key. The key never travels separately — the
    * decoder recovers it from the masked magic (key[i] =
    * (masked[i] ^ 'RSB1'[i]) - i*41), so any key works; we derive one from
    * the payload's FNV-1a hash for determinism. */
  def rsb1Encode(payload: Array[Byte]): Array[Byte] = {
    val comp = zstdCompress(payload, 3)
    val plain = new Array[Byte](8 + comp.length)
    System.arraycopy(Rsb1Magic, 0, plain, 0, 4)
    plain(4) = payload.length.toByte
    plain(5) = (payload.length >>> 8).toByte
    plain(6) = (payload.length >>> 16).toByte
    plain(7) = (payload.length >>> 24).toByte
    System.arraycopy(comp, 0, plain, 8, comp.length)
    val kh = fnv1a64(payload)
    val key = Array.tabulate(4)(i => ((kh >>> (8 * i)) & 0xff).toInt)
    val out = new Array[Byte](plain.length)
    var i = 0
    while (i < plain.length) {
      out(i) = ((plain(i) & 0xff) ^ ((key(i % 4) + i * 41) & 0xff)).toByte
      i += 1
    }
    out
  }

  /** Decode the reference's RSB1 container exactly as
    * bytecode.cpp:130-155 does: recover the 4-byte key from the masked
    * magic (key[i] = (input[i] ^ 'RSB1'[i]) - i*41, uint8 arithmetic),
    * unmask every byte with key[i%4] + i*41, validate the magic, read the
    * little-endian size, zstd-decompress the body to exactly that size. */
  def rsb1Decode(input: Array[Byte]): Array[Byte] = {
    require(input.length >= 8, "rsb1: too short")
    val key = Array.tabulate(4) { i =>
      (((input(i) & 0xff) ^ (Rsb1Magic(i) & 0xff)) - i * 41) & 0xff
    }
    val plain = new Array[Byte](input.length)
    var i = 0
    while (i < input.length) {
      plain(i) = ((input(i) & 0xff) ^ ((key(i % 4) + i * 41) & 0xff)).toByte
      i += 1
    }
    require(plain(0) == 'R' && plain(1) == 'S' && plain(2) == 'B' && plain(3) == '1',
      "rsb1: bad magic after unmask")
    val size = (plain(4) & 0xff) | ((plain(5) & 0xff) << 8) |
      ((plain(6) & 0xff) << 16) | ((plain(7) & 0xff) << 24)
    require(size >= 0, s"rsb1: negative declared size $size")
    val body = java.util.Arrays.copyOfRange(plain, 8, plain.length)
    val out = Zstd.decompress(body, size)
    require(out.length == size, s"rsb1: declared $size got ${out.length}")
    out
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

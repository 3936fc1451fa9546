package graft.operators

import graft.{GraftQuery, Tables => T}
import org.apache.spark.sql.functions._

/** N5 multimodal columns: opaque binary payloads + typed metadata, with a
  * batched per-partition decode/feature-extract stage.
  *
  * The payload here is the document text as bytes (the container has no
  * image/audio codecs — the DECODER IS A DETERMINISTIC STUB, clearly marked
  * below). The Spark-side plumbing is the real deliverable: binary column +
  * metadata struct schema, typed Dataset, mapPartitions batch shape (one
  * decoder init per partition, the pattern a real libjpeg/ffmpeg UDF needs),
  * and oracle-checked deterministic features.
  *
  * Reference analogue: opaque compressed bytecode payloads decoded in a
  * pipeline stage (script.hpp:135-215, bytecode.cpp:130-155).
  */
object MultimodalQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("m1_multimodal_features", (s, d) => {
      import s.implicits._
      val media = T.documents(s, d).select(
        $"doc_id",
        $"text".cast("binary").as("payload"),
        struct($"lang", $"n_chars", $"source").as("meta"))
        .as[MediaRecord]
      val feats = media.mapPartitions { it =>
        // STUB: a real pipeline would initialize an image/audio decoder here,
        // once per partition, then decode each payload batch-wise. The
        // container ships no codec libs, so features are computed directly
        // from the bytes — deterministically, so the oracle can check them.
        val decoder = StubDecoder
        it.map(m => decoder.features(m))
      }
      feats.toDF()
        .select($"doc_id", $"byte_len", $"n_frames", $"first_byte", $"last_byte", $"lang")
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(length(text) AS INT) AS byte_len,
        CAST(length(text) // 64 AS INT) AS n_frames,
        ascii(substring(text, 1, 1)) AS first_byte,
        ascii(substring(text, length(text), 1)) AS last_byte,
        lang
      FROM documents ORDER BY doc_id""")),

    // frame sampling: the payload split into fixed 64-byte frames, every
    // 2nd frame kept (the video frame-sample shape: stride over an opaque
    // buffer, per-frame feature = leading byte). Pure column expressions —
    // the generator runs inside the scan stage, no shuffle until the sort.
    GraftQuery("m4_frame_sample", (s, d) => {
      import s.implicits._
      val nFrames = floor((length($"text") - 1) / 64).cast("int") + 1
      T.documents(s, d)
        .select($"doc_id",
          posexplode(transform(sequence(lit(0), nFrames - 1),
            i => ascii(substring($"text", i * 64 + 1, lit(1))))))
        .toDF("doc_id", "frame_id", "lead_byte")
        .filter(pmod($"frame_id", lit(2)) === 0)
        .orderBy($"doc_id", $"frame_id")
    }, Some("""
      WITH f AS (SELECT doc_id, u.frame_id
                 FROM documents,
                      unnest(range(0, CAST((length(text)-1)//64 AS INT) + 1)) AS u(frame_id)),
      s AS (SELECT d.doc_id, CAST(f.frame_id AS INT) AS frame_id,
                   ascii(substring(d.text, CAST(f.frame_id*64 + 1 AS INT), 1)) AS lead_byte
            FROM f JOIN documents d ON f.doc_id = d.doc_id)
      SELECT doc_id, frame_id, lead_byte FROM s
      WHERE frame_id % 2 = 0 ORDER BY doc_id, frame_id""")),

    // resize: stride-downsample the payload to every 16th byte — the image
    // thumbnail shape over an opaque buffer (real resize would run in the
    // stubbed decoder; the stride/offset plumbing is what is verified)
    GraftQuery("m5_resize", (s, d) => {
      import s.implicits._
      val nOut = floor((length($"text") - 1) / 16).cast("int") + 1
      T.documents(s, d)
        .select($"doc_id",
          transform(sequence(lit(0), nOut - 1),
            i => ascii(substring($"text", i * 16 + 1, lit(1)))).as("thumb_arr"),
          length($"text").cast("long").as("orig_len"))
        .select($"doc_id",
          // join to a string: the driver comparator can't hash array columns
          array_join(transform($"thumb_arr", b => b.cast("string")), ",").as("thumb"),
          $"orig_len",
          size($"thumb_arr").cast("long").as("thumb_len"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        array_to_string([ascii(substring(text, CAST(i*16 + 1 AS INT), 1))
         for i in range(0, CAST((length(text)-1)//16 AS INT) + 1)], ',') AS thumb,
        length(text) AS orig_len,
        CAST((length(text)-1)//16 + 1 AS BIGINT) AS thumb_len
      FROM documents ORDER BY doc_id""")),

    // chunk manifest: split each opaque payload into fixed 128-byte chunks
    // with (offset, length, md5) per chunk — the upload/transfer plan a
    // blob store needs before moving multimodal payloads (a real pipeline
    // ships chunks to object storage and keeps this manifest as the
    // index). Generator runs inside the scan stage; at 100 TB the manifest
    // is a pure map-side explode, no shuffle until the sort.
    GraftQuery("m6_chunk_manifest", (s, d) => {
      import s.implicits._
      val chunk = 128
      val nChunks = floor((length($"text") - 1) / chunk).cast("int") + 1
      // empty payloads produce zero chunks: the when() guard yields null
      // for them and non-outer posexplode emits no rows — without it,
      // sequence(0, -1) would produce a descending [0, -1] array and two
      // spurious manifest rows (the oracle's range(0, 0) emits none)
      val chunkArr = when(length($"text") > 0,
        transform(sequence(lit(0), nChunks - 1),
          i => struct(
            (i.cast("long") * chunk).as("chunk_off"),
            length(substring($"text", i * chunk + 1, lit(chunk))).cast("long").as("chunk_len"),
            md5(substring($"text", i * chunk + 1, lit(chunk))).as("chunk_md5"))))
      T.documents(s, d)
        .select($"doc_id", posexplode(chunkArr))
        .toDF("doc_id", "chunk_id", "c")
        .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
          $"c.chunk_off", $"c.chunk_len", $"c.chunk_md5")
        .orderBy($"doc_id", $"chunk_id")
    }, Some("""
      WITH c AS (SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id
                 FROM documents,
                      unnest(range(0, CAST((length(text)-1)//128 AS INT) + 1)) AS u(i))
      SELECT c.doc_id, chunk_id,
        CAST(chunk_id * 128 AS BIGINT) AS chunk_off,
        CAST(length(substring(d.text, CAST(chunk_id*128 + 1 AS INT), 128)) AS BIGINT) AS chunk_len,
        md5(substring(d.text, CAST(chunk_id*128 + 1 AS INT), 128)) AS chunk_md5
      FROM c JOIN documents d USING (doc_id)
      ORDER BY doc_id, chunk_id"""))
  ,

    // ----- m7: chunk REASSEMBLY — the read path of m6's blob-store plan:
    // chunks arrive shuffled (simulated by exploding in reverse order),
    // are re-ordered per blob and concatenated, and the rebuilt payload
    // must be byte-identical to the original (md5 + length pinned by the
    // oracle straight from the source text). The per-blob gather is
    // array_sort over (chunk_id, data) structs then a fold — bounded by
    // one blob's chunk count, never the corpus; blobs reassemble
    // embarrassingly parallel after one shuffle on doc_id. A torn upload
    // (missing/duplicated chunk) breaks the md5, so this is also the
    // integrity audit the manifest exists for.
    GraftQuery("m7_chunk_reassembly", (s, d) => {
      import s.implicits._
      val chunk = 128
      val nChunks = floor((length($"text") - 1) / chunk).cast("int") + 1
      val chunkArr = when(length($"text") > 0,
        transform(sequence(nChunks - 1, lit(0), lit(-1)), // reversed on purpose
          i => struct(
            i.cast("long").as("chunk_id"),
            substring($"text", i * chunk + 1, lit(chunk)).as("data"))))
      T.documents(s, d)
        .select($"doc_id", explode(chunkArr).as("c"))
        .groupBy($"doc_id")
        .agg(collect_list($"c").as("cs"))
        .select($"doc_id",
          expr("aggregate(array_sort(cs), '', (acc, x) -> acc || x.data)").as("rebuilt"))
        .join(T.documents(s, d), "doc_id")
        .select($"doc_id",
          length($"rebuilt").cast("long").as("n_chars"),
          md5($"rebuilt").as("payload_md5"),
          ($"rebuilt" === $"text").as("roundtrip_ok"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        md5(text) AS payload_md5, TRUE AS roundtrip_ok
      FROM documents WHERE length(text) > 0
      ORDER BY doc_id"""))
  )
}

/** Binary payload + typed metadata — the multimodal row shape. */
final case class MediaMeta(lang: String, n_chars: Long, source: String)
final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
final case class MediaFeatures(
    doc_id: Long, byte_len: Int, n_frames: Int,
    first_byte: Int, last_byte: Int, lang: String)

/** Deterministic fake decoder — stands in for the codec stage. */
object StubDecoder extends Serializable {
  def features(m: MediaRecord): MediaFeatures = {
    val b = m.payload
    MediaFeatures(
      doc_id = m.doc_id,
      byte_len = b.length,
      n_frames = b.length / 64, // a real decoder would return sampled frames
      first_byte = if (b.nonEmpty) b(0) & 0xff else -1,
      last_byte = if (b.nonEmpty) b(b.length - 1) & 0xff else -1,
      lang = m.meta.lang)
  }
}

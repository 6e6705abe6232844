package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque BINARY
  * columns with typed metadata alongside.
  *
  * REAL byte-level paths (no codec library needed — public container
  * layouts, all codegen expressions): [[imageMeta]]/[[mediaMeta]]
  * parse headers; [[imagePHashSignatures]]/[[audioPHashSignatures]]
  * DECODE uncompressed pixels (24-bit BMP, PPM P6) and PCM samples
  * (WAV) into perceptual signatures feeding [[rowBandedPairs]]
  * near-dup banding.
  *
  * The ONLY stub left is the learned-model seam: [[StubDecoder]] /
  * [[extractEmbeddings]] run the partition-wise batch shape (the
  * Scala analogue of mapInPandas — one model instantiation per
  * partition, streaming iterator, no driver collect) with a
  * deterministic fake forward pass; swap in a real inference binding
  * in production. Compressed-codec decode (JPEG/MP3/H.264) rides the
  * same seam.
  */
object MultiModal {

  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long, format: String)

  /** STUB decoder: deterministic fake metadata derived from payload
    * length. Replace with a real codec (e.g. JNI image decode) — the
    * call shape (bytes in, metadata out, batched per partition) is
    * the production contract.
    */
  object StubDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length.toLong
      MediaMeta(id, len,
        width = len % 640L,
        height = len * 7L % 480L,
        n_frames = len % 30L + 1,
        format = (len % 3L) match {
          case 0L => "jpeg"; case 1L => "png"; case _ => "webp"
        })
    }
  }

  /** Attach a binary payload column (here: the UTF-8 text bytes — in
    * production the raw media bytes read from the lake).
    */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"))

  /** Partition-wise batch decode: binary in → typed metadata out.
    * Iterator-to-iterator so a partition never fully materializes.
    */
  def decodeMeta(withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codec handle)
        rows.map(r => StubDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
  }

  /** Frame sampling: one row per sampled frame of each media payload
    * (every `stride`-th frame of the stub-decoded n_frames). The
    * explode is columnar; the per-frame feature extraction is the
    * stubbed step — in production the frame decoder slots into the
    * same (doc_id, frame_idx) → features contract.
    */
  def sampleFrames(docs: DataFrame, idCol: String, textCol: String,
                   stride: Int): DataFrame =
    metaColumns(docs, idCol, textCol)
      .select(col("doc_id"), col("byte_len"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      // stub frame feature: deterministic hash of (payload id, frame)
      .withColumn("frame_sig", xxhash64(col("doc_id"), col("frame_idx")))

  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Batched partition-wise feature extraction: binary payloads →
    * fixed-dim embeddings, with rows grouped into `batchSize` chunks
    * inside each partition — the exact batch shape a GPU inference
    * binding needs (the mapInPandas batch contract, in Scala). One
    * "model" instantiation per partition, one forward call per chunk,
    * iterator-to-iterator throughout (grouped() is lazy, so a
    * partition never fully materializes).
    *
    * The model itself is a STUB (deterministic hash-derived vectors —
    * no inference runtime in this container); the partitioning, batch
    * assembly, and typed output schema are the production contract.
    */
  def extractEmbeddings(withPayloadDf: DataFrame, dim: Int = 16,
                        batchSize: Int = 64): Dataset[MediaEmbedding] = {
    implicit val enc = Encoders.product[MediaEmbedding]
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition model init would go here (session/handle)
        rows.grouped(batchSize).flatMap { batch =>
          // one batched "forward pass" over the chunk
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val v = new Array[Float](dim)
            var h = bytes.length.toLong * 0x9E3779B97F4A7C15L + id
            var i = 0
            while (i < dim) {
              h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 29
              v(i) = (h % 1000L) / 1000.0f
              i += 1
            }
            MediaEmbedding(id, v)
          }
        }
      }
  }

  /** REAL image metadata from binary payloads: container format and
    * pixel dimensions parsed from PNG/GIF/JPEG/BMP headers by the
    * [[graft.functions.ImageMeta]] codegen expression — no codec, no
    * decode, a bounded scan of the leading bytes inside whole-stage
    * codegen. Unrecognized or truncated payloads yield NULL
    * format/width/height (the quarantine contract, mirroring
    * [[graft.sources.Sources]]): at 100 TB a corrupt blob must
    * surface as a filterable row, never a task failure.
    *
    * Scale shape: pure projection over the scan — no shuffle, no
    * UDF; resolution gates and format-mix stats compose downstream
    * as ordinary filters/aggregates.
    */
  def imageMeta(docs: DataFrame, idCol: String, payloadCol: String)
  : DataFrame = {
    val meta = graft.functions.ImageMeta.imageMeta(col(payloadCol))
    docs.withColumn("_m", meta)
      .select(col(idCol),
        col("_m.format").as("format"),
        col("_m.width").cast("long").as("width"),
        col("_m.height").cast("long").as("height"))
  }

  // -- synthetic-but-VALID image payload construction (query fixture)

  private def hexLit(h: String) = unhex(lit(h))
  private def hex16(c: org.apache.spark.sql.Column) =
    lpad(hex(c.cast("int")), 4, "0")
  private def hex32(c: org.apache.spark.sql.Column) =
    lpad(hex(c.cast("int")), 8, "0")
  private def be16(c: org.apache.spark.sql.Column) = unhex(hex16(c))
  private def le16(c: org.apache.spark.sql.Column) = {
    val h = hex16(c)
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def be32(c: org.apache.spark.sql.Column) = unhex(hex32(c))
  private def le32(c: org.apache.spark.sql.Column) = {
    val h = hex32(c)
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Deterministic VALID image bytes per row — real headers (PNG
    * IHDR, GIF89a screen descriptor, JPEG APP0+SOF0 marker chain,
    * BMP BITMAPINFOHEADER) with dimensions derived from the id, one
    * format per id residue and one residue of non-image bytes (the
    * quarantine case). Pure codegen binary concat, so the declared
    * query's input construction adds no shuffle; the closed-form
    * dimensions give the DuckDB oracle without an image parser.
    */
  def syntheticImagePayload(idCol: String, textCol: String)
  : org.apache.spark.sql.Column = {
    val id = col(idCol)
    val w = (id % 613 + 1).cast("int")
    val h = (id % 479 + 1).cast("int")
    val png = concat(
      hexLit("89504E470D0A1A0A"), // signature
      hexLit("0000000D"), hexLit("49484452"), // IHDR len + type
      be32(w), be32(h),
      hexLit("0806000000"), hexLit("9A768B21")) // bit depth.. + crc
    val gif = concat(
      hexLit("474946383961"), // GIF89a
      le16(w), le16(h), hexLit("F70000"))
    val jpeg = concat(
      hexLit("FFD8"), // SOI
      hexLit("FFE000104A46494600010100000100010000"), // APP0 (len 16)
      hexLit("FFC00011") /* SOF0, len 17 */, hexLit("08"),
      be16(h), be16(w),
      hexLit("03012200021101031101"), // 3 components
      hexLit("FFD9")) // EOI
    val bmp = concat(
      hexLit("424D"), hexLit("3600000000000000"), hexLit("36000000"),
      hexLit("28000000"), // biSize = 40
      le32(w), le32(h), hexLit("01001800"))
    val le24 = (c: org.apache.spark.sql.Column) => {
      val hx = lpad(hex(c.cast("int")), 6, "0")
      unhex(concat(substring(hx, 5, 2), substring(hx, 3, 2),
        substring(hx, 1, 2)))
    }
    val webp = concat(
      hexLit("52494646"), hexLit("16000000"), // RIFF + size 22
      hexLit("57454250"), hexLit("56503858"), // WEBP + VP8X
      hexLit("0A000000"), hexLit("10000000"), // chunk len 10 + flags
      le24(w - 1), le24(h - 1)) // canvas minus-one, 24-bit LE
    when(id % 6 === 0, png)
      .when(id % 6 === 1, gif)
      .when(id % 6 === 2, jpeg)
      .when(id % 6 === 3, bmp)
      .when(id % 6 === 4, webp)
      .otherwise(col(textCol).cast("binary")) // not an image → NULL meta
  }

  /** REAL audio/video metadata from binary payloads: container
    * format, sample rate, channel count, and duration parsed from
    * WAV/FLAC/MP3/MP4 headers by the [[graft.functions.MediaMeta]]
    * codegen expression — the A/V twin of [[imageMeta]], same
    * quarantine contract (unrecognized/truncated → NULL columns),
    * same scale shape (pure projection in the scan stage, payloads
    * never shuffled). */
  def mediaMeta(docs: DataFrame, idCol: String, payloadCol: String)
  : DataFrame = {
    val meta = graft.functions.MediaMeta.mediaMeta(col(payloadCol))
    docs.withColumn("_m", meta)
      .select(col(idCol),
        col("_m.format").as("format"),
        col("_m.sample_rate").cast("long").as("sample_rate"),
        col("_m.channels").cast("long").as("channels"),
        col("_m.duration_ms").as("duration_ms"))
  }

  /** Time-grid frame/segment sampling PLAN over real parsed media
    * durations: one row per sampled instant — every `intervalMs`
    * from 0, capped at `maxFrames` — for each payload whose
    * container header yields a positive duration ([[mediaMeta]]'s
    * WAV/FLAC/MP3/MP4 walk). This is the planning half of video
    * frame extraction / audio chunking: downstream, a decoder
    * (mapPartitions batch contract, [[extractEmbeddings]]'s shape)
    * seeks each (doc_id, ts_ms) — the plan itself never decodes.
    *
    * Scale shape: metadata parse + sequence/posexplode in the scan
    * stage — no shuffle, no UDF, payload bytes never leave the scan;
    * the fan-out is bounded by maxFrames per row.
    */
  def frameSampleByTime(docs: DataFrame, idCol: String, payloadCol: String,
                        intervalMs: Long = 1000L, maxFrames: Int = 16)
  : DataFrame = {
    require(intervalMs > 0 && maxFrames > 0)
    val meta = mediaMeta(docs, idCol, payloadCol)
    // ceil(duration/interval) via exact double floor (durations are
    // far below 2^52), capped at maxFrames.
    val nFrames = least(
      floor((col("duration_ms") + (intervalMs - 1)) / intervalMs).cast("long"),
      lit(maxFrames.toLong))
    meta.filter(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .withColumn("n_frames", nFrames)
      .select(col(idCol), col("format"), col("n_frames"),
        posexplode(sequence(lit(0L), (col("n_frames") - 1) * intervalMs,
          lit(intervalMs))).as(Seq("frame_idx", "ts_ms")))
      .withColumn("frame_idx", col("frame_idx").cast("long"))
  }

  /** Deterministic VALID audio/video bytes per row — real headers
    * (WAV RIFF chunk chain, FLAC STREAMINFO, MPEG-1 Layer III frame
    * header, ISO-BMFF ftyp+moov/mvhd) with rates/channels/durations
    * derived from the id, one format per id residue and one residue
    * of non-media bytes (the quarantine case). Pure codegen binary
    * concat; the closed-form fields give the DuckDB oracle without a
    * media parser — the [[syntheticImagePayload]] convention.
    */
  def syntheticMediaPayload(idCol: String, textCol: String)
  : org.apache.spark.sql.Column = {
    val id = col(idCol)
    // WAV: rate 8/16/24 kHz, 1-2 channels, 16-bit PCM, header-only
    // (data chunk size declared, samples not shipped — the parser's
    // truncation-tolerant walk is part of what the query checks)
    val wRate = (id % 3 + 1) * 8000
    val wCh = (id % 2 + 1).cast("int")
    val wByteRate = wRate * wCh * 2
    val wDataLen = (id % 500 + 1) * 2 * wCh
    val wav = concat(
      hexLit("52494646"), le32(wDataLen + 36), hexLit("57415645"),
      hexLit("666D7420"), le32(lit(16)), le16(lit(1)), le16(wCh),
      le32(wRate), le32(wByteRate), le16(wCh * 2), le16(lit(16)),
      hexLit("64617461"), le32(wDataLen))
    // FLAC: 44.1 kHz stereo 16-bit constants bit-packed (0A C4 42 F0),
    // id-derived 32-bit total-sample count, zero MD5
    val fSamples = id * 441 + 100
    val flac = concat(
      hexLit("664C6143"), hexLit("80000022"),
      hexLit("10001000000000000000"),
      hexLit("0AC442F0"), be32(fSamples),
      hexLit("00000000000000000000000000000000"))
    // MP3: MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo (FF FB 90 00)
    // + id-derived filler so the CBR duration estimate varies
    val mp3 = concat(hexLit("FFFB9000"),
      expr(s"cast(repeat(' ', cast($idCol % 600 as int)) as binary)"))
    // MP4: ftyp(isom) + moov/mvhd v0, timescale 1000, id-derived
    // duration — so duration_ms is the mvhd duration verbatim
    val mp4 = concat(
      hexLit("00000010"), hexLit("66747970"), hexLit("69736F6D"),
      hexLit("00000000"),
      hexLit("00000074"), hexLit("6D6F6F76"),
      hexLit("0000006C"), hexLit("6D766864"), hexLit("00000000"),
      hexLit("00000000"), hexLit("00000000"), be32(lit(1000)),
      be32(id * 37 + 500))
    when(id % 5 === 0, wav)
      .when(id % 5 === 1, flac)
      .when(id % 5 === 2, mp3)
      .when(id % 5 === 3, mp4)
      .otherwise(col(textCol).cast("binary")) // not media → NULL meta
  }

  /** Per-image perceptual signatures from REAL pixel decode: one
    * [[graft.functions.ImagePHash]] codegen projection per payload —
    * uncompressed-container parse (24-bit BMP / binary PPM), box-mean
    * 8×8 aHash, nearest-sample 9×8 dHash — emitted as the 8
    * non-negative grid-row bytes of each signature (the banding and
    * oracle form) plus the packed 64-bit longs (the production form).
    * Unparseable/truncated/too-small payloads are DROPPED (the NULL
    * quarantine contract — filter upstream to inspect them).
    *
    * Scale shape: one O(W·H) decode per payload inside the scan
    * stage; payload bytes never shuffle — only the 16 signature
    * bytes and dimensions leave the projection.
    */
  def imagePHashSignatures(docs: DataFrame, idCol: String,
                           payloadCol: String): DataFrame = {
    val ph = graft.functions.ImagePHash.imagePHash(col(payloadCol))
    // explode(array(decode)) is a deliberate generator barrier: a
    // plain withColumn+filter lets the optimizer push the quarantine
    // predicate BELOW the projection, re-invoking the O(W·H) decode
    // in the Filter condition — a 2× decode per row. Predicates on
    // generator output are never pushed through Generate, so the
    // decode runs exactly ONCE per payload (PlanSpec pins this).
    docs.select(col(idCol).as("_id"), explode(array(ph)).as("_p"))
      .filter(col("_p").isNotNull)
      .select(col("_id").as("doc_id"),
        col("_p.format").as("format"),
        col("_p.width").cast("long").as("width"),
        col("_p.height").cast("long").as("height"),
        col("_p.arows").as("arows"), col("_p.ahash").as("ahash"),
        col("_p.drows").as("drows"), col("_p.dhash").as("dhash"))
  }

  /** IMAGE near-duplicate pairs — the multimodal member of the
    * engine's near-dup family (the [[Dedup.simhashMd5Pairs]] recipe
    * with a perceptual signature instead of a text signature): aHash
    * per image, pigeonhole banding over `maxHamming + 1` GROUPS OF
    * GRID ROWS (a pair within `maxHamming` bit flips touches at most
    * `maxHamming` row groups, so at least one group's bytes match
    * exactly — recall 1.0 by construction at the declared radius),
    * then the exact 64-bit popcount hamming filter for precision.
    * Band keys concatenate each group's row bytes (≤ 3 rows ⇒ ≤ 24
    * bits, non-negative), so candidate generation is a band-key
    * equi-join — never an all-pairs scan — and the whole chain
    * (construction → decode → hash → banding → hamming) replays in
    * portable integer SQL: q_image_neardup's oracle checks the
    * byte-level pixel decoder END-TO-END.
    *
    * `maxHamming` ∈ [1, 7]: ≥ 8 would need more groups than grid
    * rows; 0 would put all 8 row bytes in one 64-bit key (use exact
    * dedup for identity). Default 2 ≈ the classic "aHash distance
    * ≤ a few bits" near-identical threshold.
    *
    * 100 TB shape: the signature projection feeds both self-join
    * sides through ONE repartition exchange (the simhashMd5Pairs
    * reuse shape); candidates are bounded by band-key collisions.
    * Row-byte band keys are 8–24 bits — at corpus scale beyond ~10⁷
    * images, re-band the SAME signatures through
    * [[Dedup.simhashPairsWide]]-style wider keys, or pre-partition
    * by a coarse key (format, resolution bucket) first.
    */
  def imageNearDupPairs(docs: DataFrame, idCol: String,
                        payloadCol: String, maxHamming: Int = 2)
  : DataFrame =
    rowBandedPairs(imagePHashSignatures(docs, idCol, payloadCol)
      .select("doc_id", "ahash"), maxHamming)

  /** WIDE-SIGNATURE image near-dup pairs — the documented scale move
    * for corpora past ~10⁷ payloads, where [[imageNearDupPairs]]'
    * 8-24-bit band keys stop selecting: the 128-bit signature
    * aHash ‖ dHash (16 row bytes) is banded into
    * `max(maxHamming+1, 3)` row groups of ≤ 6 bytes each, so every
    * band key carries 40-48 bits at the default radius — ~10⁵× the
    * selectivity — and a pair ships when the COMBINED hamming
    * distance (aHash bits + dHash bits) is within `maxHamming`.
    * Recall 1.0 at the combined radius by the same pigeonhole
    * argument (`maxHamming` flips touch at most `maxHamming` groups;
    * the 3-group floor keeps keys ≤ 48 bits — non-negative longs,
    * the DuckDB-portable rule — while still leaving one group
    * untouched at radius ≤ 2 with nBands = 3). Combining both
    * hashes also tightens precision: brightness-plane collisions
    * that alias under aHash alone separate under the gradient dHash.
    * The whole chain replays in portable integer SQL
    * (q_image_neardup_wide's oracle). `maxHamming` ∈ [1, 15]. */
  def imageNearDupPairsWide(docs: DataFrame, idCol: String,
                            payloadCol: String, maxHamming: Int = 2)
  : DataFrame =
    rowBandedPairsWide(imagePHashSignatures(docs, idCol, payloadCol)
      .select("doc_id", "ahash", "dhash"), maxHamming)

  /** MEDIA CURATION MANIFEST — the "media in, clean media out"
    * composition as ONE plan (the q_crawl_pipeline convention on the
    * image axis): decode every payload ONCE (generator barrier;
    * quarantined rows are KEPT as NULL-signature rows so they can be
    * tagged), gate on HTTP status and resolution, near-dup the
    * survivors through the ONE [[rowBandedPairs]] pigeonhole body,
    * and tag every input doc with its FIRST failing reason —
    * `http_error` → `not_image` → `low_res` → `near_dup` → `kept`.
    * The near-dup drop rule is the keepList convention: the
    * higher-id side (`doc_b`) of every surviving pair drops, the
    * lower-id side stays kept.
    *
    * 100 TB shape: payload bytes never leave the scan stage — the
    * ONE decoded projection (id, status, dims, 8-byte signature) is
    * localCheckpoint-pinned and feeds the gate filter, the pair
    * scan, and the final tagging join; candidates are band-key
    * bounded; the output manifest is the per-doc triage artifact a
    * curation run keeps. Input: one row per fetched doc with an
    * orderable id, an HTTP status, and the raw payload bytes. */
  def imageKeepManifest(docs: DataFrame, idCol: String,
                        statusCol: String, payloadCol: String,
                        minPixels: Long = 128L, maxHamming: Int = 2)
  : DataFrame = {
    val ph = graft.functions.ImagePHash.imagePHash(col(payloadCol))
    val dec = docs.select(col(idCol).as("doc_id"),
        col(statusCol).cast("long").as("status"),
        explode(array(ph)).as("_p"))
      .select(col("doc_id"), col("status"),
        col("_p.width").cast("long").as("width"),
        col("_p.height").cast("long").as("height"),
        col("_p.ahash").as("ahash"))
      .localCheckpoint(false)
    val surv = dec.filter(col("status") === 200L &&
      col("ahash").isNotNull &&
      col("width") * col("height") >= minPixels)
    val dup = rowBandedPairs(surv.select("doc_id", "ahash"), maxHamming)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("_dup", lit(true))
    dec.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("status"), col("width"), col("height"),
        when(col("status") =!= 200L, lit("http_error"))
          .when(col("ahash").isNull, lit("not_image"))
          .when(col("width") * col("height") < minPixels, lit("low_res"))
          .when(col("_dup"), lit("near_dup"))
          .otherwise(lit("kept")).as("reason"))
  }

  /** The 128-bit twin of [[rowBandedPairs]]: `sigs` = (doc_id,
    * ahash, dhash — two packed 64-bit signature words = 16 row
    * bytes). Row groups never let a key exceed 6 bytes; group bytes
    * may span the ahash/dhash word boundary (the key stitches the
    * two words' bytes — byte j of the signature is byte j%8 of word
    * j/8). Same decode-once localCheckpoint as the narrow body. */
  private[graft] def rowBandedPairsWide(sigs: DataFrame,
                                        maxHamming: Int): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming must be in [1, 15], got $maxHamming")
    val nBands = math.max(maxHamming + 1, 3)
    val widths = (0 until nBands).map(b =>
      16 / nBands + (if (b < 16 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def byteAt(j: Int) = {
      val word = if (j < 8) col("ahash") else col("dhash")
      shiftrightunsigned(word, 8 * (j % 8)).bitwiseAND(255L)
    }
    val sig = sigs.select(col("doc_id"), col("ahash"), col("dhash"))
      .localCheckpoint(false)
    val banded = sig.select(col("doc_id"), col("ahash"), col("dhash"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            (0 until widths(b)).map(j =>
              byteAt(offsets(b) + j) * (1L << (8 * j)))
              .reduce(_ + _).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("ahash"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(col("band"), col("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))) +
         bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The ONE band-key derivation every pigeonhole consumer shares
    * ([[rowBandedPairs]]' self-join and [[phashServeNearDups]]'
    * two-table serve — a banding-scheme change lands in exactly one
    * place): `maxHamming + 1` groups of the signature's 8 row bytes
    * become (band, key) structs — keys ≤ 4 bytes ⇒ ≤ 32 bits,
    * carried as non-negative longs (the DuckDB-portable form; the
    * oracle derives the IDENTICAL keys from the row bytes, since
    * byte j of the packed hash IS signature row j). */
  private def bandedExplode(ahash: org.apache.spark.sql.Column,
                            maxHamming: Int)
  : org.apache.spark.sql.Column = {
    require(maxHamming >= 1 && maxHamming <= 7,
      s"maxHamming must be in [1, 7], got $maxHamming")
    val nBands = maxHamming + 1
    // row-group widths: 8 signature rows split as evenly as possible
    val widths = (0 until nBands).map(b =>
      8 / nBands + (if (b < 8 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    explode(array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(ahash, 8 * offsets(b))
          .bitwiseAND((1L << (8 * widths(b))) - 1).as("key"))
    }: _*))
  }

  /** The ONE row-group pigeonhole pair body both perceptual-hash
    * modalities feed (image aHash / audio energy hash): `sigs` =
    * (doc_id, ahash = the packed 64-bit signature; extra columns
    * ignored). A pair within the radius always shares an untouched
    * band-key group (recall 1.0 by construction); the exact 64-bit
    * popcount filters for precision. One repartition exchange feeds
    * both self-join sides. */
  private[graft] def rowBandedPairs(sigs: DataFrame,
                                        maxHamming: Int): DataFrame = {
    // DECODE ONCE: materialize the signature projection (16 B/doc)
    // before the fan-out. The repartition-reuse shape alone does NOT
    // survive AQE — its broadcast conversion re-plans one self-join
    // side and defeats ReuseExchange, shipping plans that re-run the
    // scan→decode subtree per side (2-5× the dominant payload-decode
    // cost at media scale). A lazy localCheckpoint pins ONE decode
    // pass; every consumer reads the tiny ExistingRDD (the
    // minhashMd5Pairs precedent). PlanSpec gates the scan count.
    val sig = sigs.select(col("doc_id"), col("ahash"))
      .localCheckpoint(false)
    val banded = sig.select(col("doc_id"), col("ahash"),
        bandedExplode(col("ahash"), maxHamming).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(col("band"), col("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: only
      .distinct()                           // survivors shuffle
  }

  /** Per-payload AUDIO perceptual signatures from REAL PCM decode:
    * one [[graft.functions.AudioPHash]] codegen projection per
    * payload — RIFF/WAVE chunk walk, 16-bit PCM samples, exact
    * integer mono mix — into the 64-frame ENERGY HASH (frame energy
    * = Σ|sample|, one bit per frame: is the frame louder than the
    * truncated mean — aHash's construction on the time axis), as 8
    * non-negative row bytes + the packed 64-bit long. Unparseable /
    * truncated / non-PCM payloads are DROPPED (the NULL quarantine
    * contract). Scale shape: one O(n_samples) decode per payload in
    * the scan stage; only the 8-byte signature leaves. */
  def audioPHashSignatures(docs: DataFrame, idCol: String,
                           payloadCol: String): DataFrame = {
    val ph = graft.functions.AudioPHash.audioPHash(col(payloadCol))
    // generator barrier — see [[imagePHashSignatures]]: keeps the
    // quarantine filter ABOVE the decode so PCM parses once per row
    docs.select(col(idCol).as("_id"), explode(array(ph)).as("_p"))
      .filter(col("_p").isNotNull)
      .select(col("_id").as("doc_id"),
        col("_p.sample_rate").cast("long").as("sample_rate"),
        col("_p.channels").cast("long").as("channels"),
        col("_p.n_samples").cast("long").as("n_samples"),
        col("_p.arows").as("arows"), col("_p.ahash").as("ahash"))
  }

  /** AUDIO near-duplicate pairs — [[imageNearDupPairs]]' A/V twin
    * through the SAME [[rowBandedPairs]] pigeonhole body: energy-hash
    * signatures from real PCM decode, maxHamming+1 row-group band
    * keys (recall 1.0 at the radius by construction), exact popcount
    * filter. The whole chain — construction → decode → frame
    * energies → threshold → banding → hamming — replays in portable
    * integer SQL (q_audio_neardup's oracle). */
  def audioNearDupPairs(docs: DataFrame, idCol: String,
                        payloadCol: String, maxHamming: Int = 2)
  : DataFrame =
    rowBandedPairs(audioPHashSignatures(docs, idCol, payloadCol)
      .select("doc_id", "ahash"), maxHamming)

  /** Per-frame fingerprints from a VIDEO frame stream (consecutive
    * uncompressed 24-bit BMP frames — compressed video rides the
    * codec seam): one [[graft.functions.ImageFrameHashes]] codegen
    * walk per payload → one row per frame with its aHash and the two
    * non-negative packed join keys (k1 = signature rows 0-3, k2 =
    * rows 4-7). Malformed/truncated/over-long streams are DROPPED
    * whole (the NULL quarantine contract — a half-hashed video must
    * never silently under-count shared frames).
    *
    * Scale shape: one O(total pixels) decode per payload inside the
    * scan; only (doc_id, frame_idx, 24 bytes of hash keys) leave —
    * the frame fan-out is bounded by `maxFrames`. */
  def videoFrameHashes(docs: DataFrame, idCol: String,
                       payloadCol: String, maxFrames: Int = 64)
  : DataFrame = {
    require(maxFrames >= 1)
    // explode the decode DIRECTLY: a generator's input evaluates once
    // per row, and explode skips NULL/empty arrays — which IS the
    // whole-stream quarantine contract. The former withColumn+filter
    // shape let the optimizer push the NULL check below the
    // projection, re-running the O(total pixels) frame walk twice.
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.ImageFrameHashes
          .imageFrameHashes(col(payloadCol), maxFrames)).as("fh"))
      .select(col("doc_id"), col("fh.frame_idx").as("frame_idx"),
        col("fh.ahash").as("ahash"), col("fh.k1").as("k1"),
        col("fh.k2").as("k2"))
  }

  /** VIDEO near-duplicate pairs — the frame-fingerprint recipe
    * (shared footage detection: a re-encode, edit, or clip of the
    * same video shares exact frame hashes): per-video DISTINCT frame
    * fingerprints, a df-capped inverted-index equi-join on the
    * fingerprint (the [[Dedup.winnowPairs]] shape — fingerprints
    * shared by more than `maxDf` videos are dropped from candidate
    * generation, bounding the hot-key blowup from boilerplate frames
    * like black/title cards), then a pair survives with the count of
    * shared distinct fingerprints ≥ `minShared`. Matching is exact
    * (hamming 0 per frame — the standard fingerprint-join recipe).
    * Near-frame matching composes through [[rowBandedPairs]] by
    * unpacking k1/k2 back into the 8 signature row bytes and keying
    * rows by FRAME (e.g. `doc_id·maxFrames + frame_idx` as the
    * banded id), then aggregating the surviving frame pairs per
    * video pair — the per-frame signature carries everything that
    * composition needs. The whole exact chain replays in integer SQL
    * (q_video_neardup's oracle).
    *
    * 100 TB shape: one decode pass in the scan, ONE exchange on the
    * fingerprint (shared by the per-doc dedup, the df-cap, and both
    * self-join sides — the [[Dedup.invertedIndexPairs]] body),
    * candidates bounded by maxDf²-ish per fingerprint — never an
    * all-pairs scan over videos. */
  def videoNearDupPairs(docs: DataFrame, idCol: String,
                        payloadCol: String, minShared: Long = 2L,
                        maxDf: Long = 100L, maxFrames: Int = 64)
  : DataFrame = {
    require(minShared >= 1)
    // ahash IS (k1, k2) bijectively — one join key; the oracle keeps
    // the k1/k2 split only for signed-SQL portability.
    // localCheckpoint: the frame-hash projection feeds FIVE plan
    // consumers downstream (per-video dedup, df-cap build, df-cap
    // semi-join, both self-join sides) and AQE's broadcast
    // conversion defeats exchange reuse — pin ONE frame-stream
    // decode pass (24 B/frame) and let every consumer read it.
    Dedup.invertedIndexPairs(
      videoFrameHashes(docs, idCol, payloadCol, maxFrames)
        .select("doc_id", "ahash").localCheckpoint(false),
      Seq("ahash"), minShared, maxDf, "shared_frames",
      dedupPerDoc = true)
  }

  /** NEAR-FRAME video matching — the banded composition
    * [[videoNearDupPairs]]'s docstring describes, as a first-class
    * operator: each frame becomes a row keyed by
    * `fid = doc_id·maxFrames + frame_idx` with its signature row
    * bytes unpacked from the packed hash, the ONE
    * [[rowBandedPairs]] pigeonhole body pairs FRAMES within
    * `maxHamming` bits (recall 1.0 at the radius — catches
    * re-encodes/brightness-curve edits exact matching misses), and
    * the surviving frame pairs aggregate per video pair: a video
    * pair ships when the SYMMETRIC shared count — the smaller of
    * the two sides' distinct near-matched frame counts, so the
    * result cannot depend on which video drew the lower id — is
    * ≥ `minShared`. Frames whose exact signature appears in more
    * than `maxDf` videos are dropped first (the boilerplate-frame
    * guard the exact recipe uses). Same-video frame pairs are
    * excluded. Ids must be non-negative and fit
    * `2⁶³/maxFrames` (raise_error-enforced); frame keys of a
    * cross-video pair always order with the video ids, so the
    * banding's doc_a < doc_b convention captures every cross pair.
    * The whole chain replays in integer SQL (q_video_fuzzy's
    * oracle). */
  def videoNearDupPairsBanded(docs: DataFrame, idCol: String,
                              payloadCol: String, maxHamming: Int = 2,
                              minShared: Long = 2L, maxDf: Long = 100L,
                              maxFrames: Int = 64)
  : DataFrame = {
    require(minShared >= 1)
    val maxId = Long.MaxValue / maxFrames
    // decode once: the frame hashes feed the df-cap build, its
    // semi-join, and (through rowBandedPairs' own checkpoint) the
    // banding — pin the single frame-stream decode pass here
    val fh = videoFrameHashes(docs, idCol, payloadCol, maxFrames)
      .withColumn("vid", when(col("doc_id") >= 0L &&
        col("doc_id") < maxId, col("doc_id")).otherwise(expr(
        s"raise_error('videoNearDupPairsBanded: doc ids must be in [0, $maxId)')")))
      .select("vid", "frame_idx", "ahash")
      .localCheckpoint(false)
    // df-cap BEFORE banding (the exact recipe's boilerplate guard,
    // applied here too): frames whose EXACT signature appears in
    // more than maxDf videos — black frames, title cards — are
    // dropped from candidate generation. The cap is on exact hashes;
    // near-identical-but-distinct boilerplate at extreme multiplicity
    // would additionally need band-key capping (not offered — at
    // that scale pre-partition by a coarse content key first).
    val capped =
      if (maxDf <= 0) fh
      else {
        val rare = fh.select("vid", "ahash").distinct()
          .groupBy("ahash").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("ahash")
        fh.join(rare, Seq("ahash"))
      }
    val frameSigs = capped.select(
      (col("vid") * maxFrames + col("frame_idx")).as("doc_id"),
      col("ahash"))
    // SYMMETRIC shared count — min of the distinct matched frames on
    // each side — so whether a pair ships cannot depend on which
    // video drew the lower id (one frame of B matching two frames of
    // A counts once, whichever side is "a")
    rowBandedPairs(frameSigs, maxHamming)
      .select(expr(s"doc_a DIV $maxFrames").as("va"),
        col("doc_a").as("fa"),
        expr(s"doc_b DIV $maxFrames").as("vb"),
        col("doc_b").as("fb"))
      .filter(col("va") < col("vb")) // cross-video pairs only
      .groupBy("va", "vb")
      .agg(least(countDistinct("fa"), countDistinct("fb"))
        .as("shared_frames"))
      .select(col("va").as("doc_a"), col("vb").as("doc_b"),
        col("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** SHARED-SEGMENT video alignment — WHERE two videos overlap, not
    * just that they do: exact frame-fingerprint matches (df-capped,
    * the [[videoNearDupPairs]] guard) become (doc_a, fa, doc_b, fb)
    * rows, and maximal runs of consecutive aligned frames — same
    * frame-index OFFSET, fa advancing by 1 — group into segments by
    * the gaps-and-islands rule (fa − row_number per (pair, offset)
    * is constant within a run, the overlapSpans shape on the frame
    * axis). Output one row per shared segment of length ≥ `minLen`:
    * (doc_a, doc_b, a_start, b_start, seg_len) — the artifact a
    * clip-detection / shot-reuse report needs (a re-broadcast with
    * an inserted ad break shows as TWO segments at different
    * offsets; a trimmed re-upload as one shorter segment at a
    * nonzero offset).
    *
    * 100 TB shape: one frame-stream decode (checkpointed), matches
    * bounded by the df-cap equi-join (never all-pairs over videos),
    * then ONE shuffle on (pair, offset) that the island window AND
    * the segment aggregate both ride (hash clustering on a subset
    * of the group keys satisfies the aggregate — no second
    * exchange). The whole chain replays in portable SQL
    * (q_video_segments' oracle). */
  def videoSharedSegments(docs: DataFrame, idCol: String,
                          payloadCol: String, minLen: Long = 2L,
                          maxDf: Long = 100L, maxFrames: Int = 64)
  : DataFrame = {
    require(minLen >= 1)
    val fh = videoFrameHashes(docs, idCol, payloadCol, maxFrames)
      .select("doc_id", "frame_idx", "ahash")
      .localCheckpoint(false)
    val capped =
      if (maxDf <= 0) fh
      else {
        val rare = fh.select("doc_id", "ahash").distinct()
          .groupBy("ahash").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("ahash")
        fh.join(rare, Seq("ahash"))
      }
    // one row per cross-video frame match; (doc_a, doc_b, off, fa) is
    // unique by construction (frame_idx is unique per doc), so no
    // dedup pass is needed before the island window
    val m = capped.as("a")
      .join(capped.as("b"),
        col("a.ahash") === col("b.ahash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"),
        col("a.frame_idx").cast("long").as("fa"),
        col("b.doc_id").as("doc_b"),
        (col("b.frame_idx") - col("a.frame_idx")).cast("long").as("off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b", "off").orderBy("fa")
    m.withColumn("isl", col("fa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "off", "isl")
      .agg(min("fa").as("a_start"), count(lit(1)).as("seg_len"))
      .filter(col("seg_len") >= minLen)
      .select(col("doc_a"), col("doc_b"), col("a_start"),
        (col("a_start") + col("off")).as("b_start"), col("seg_len"))
  }

  private def phashTable(root: String) = s"$root/phash_signatures"

  /** PERSISTED perceptual-signature store — incremental multimodal
    * dedup at 100 TB: decode each arriving shard ONCE
    * ([[imagePHashSignatures]] / [[audioPHashSignatures]] — any
    * source whose (doc_id, ahash) rows are UNIQUE per doc_id; video
    * frame sources must key by frame first, `doc_id·maxFrames +
    * frame_idx`, the [[videoNearDupPairsBanded]] convention — a
    * multi-row-per-id upsert would break the keyed invariant), fold
    * the signatures into ONE atomic [[graft.offline.VersionedStore]]
    * table keyed by doc_id (merge is idempotent — a replayed shard
    * rewrites the same rows, the seed store precedent), and serve
    * new payloads against the FROZEN store without ever re-decoding
    * the corpus. The first shard bootstraps through the ATOMIC
    * `create` — a concurrent bootstrap loses with CommitConflict and
    * falls back to merge, so no racer's rows are ever silently
    * replaced. NULL ids fail loudly in-plan. Returns the store row
    * count after the merge (manifest metadata — no table scan). */
  def phashStoreUpsert(sigs: DataFrame, root: String): Long = {
    import graft.offline.VersionedStore
    val spark = sigs.sparkSession
    val rows = sigs.select(
      when(col("doc_id").isNotNull, col("doc_id")).otherwise(expr(
        "raise_error('phash store: doc ids must be non-null')"))
        .as("doc_id"),
      col("ahash").cast("long").as("ahash"))
    if (VersionedStore.latestVersion(spark, phashTable(root)) < 0L)
      try VersionedStore.create(rows, phashTable(root))
      catch {
        // a racer claimed version 0 between the check and the commit
        // (CommitConflict from the pinned create, or the create's own
        // already-exists guard) — fold into the winner's table instead
        case _: VersionedStore.CommitConflict | _: IllegalArgumentException =>
          VersionedStore.merge(rows, phashTable(root), Seq("doc_id"))
      }
    else
      VersionedStore.merge(rows, phashTable(root), Seq("doc_id"))
    VersionedStore.rowCount(spark, phashTable(root))
  }

  /** Right-to-be-forgotten for the signature store: remove the given
    * doc ids ([[graft.offline.VersionedStore.deleteKeys]] — pruned
    * copy-on-write, earlier versions retired via vacuum). */
  def phashStoreDelete(docIds: DataFrame, root: String): Long =
    graft.offline.VersionedStore.deleteKeys(
      docIds.select(col("doc_id")), phashTable(root), Seq("doc_id"))

  /** Serve near-duplicate candidates for NEW payloads against the
    * frozen signature store: the same maxHamming+1 row-group
    * pigeonhole banding as [[rowBandedPairs]] (recall 1.0 at the
    * radius by construction), but as a TWO-TABLE equi-join — query
    * signatures × stored signatures — so AQE's skew handling applies
    * (a two-table hot key is one-side-duplicable, unlike the
    * self-join case) and a small query batch broadcasts. Output:
    * (query_id, match_id, hamming ≤ maxHamming); a stored doc
    * re-submitted as a query matches itself at hamming 0 (filter
    * upstream if unwanted). */
  def phashServeNearDups(querySigs: DataFrame, root: String,
                         maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 7,
      s"maxHamming must be in [1, 7], got $maxHamming")
    val spark = querySigs.sparkSession
    val store = graft.offline.VersionedStore
      .read(spark, phashTable(root))
    def banded(df: DataFrame, idAlias: String, hashAlias: String)
    : DataFrame =
      df.select(col("doc_id").as(idAlias),
          col("ahash").cast("long").as(hashAlias),
          bandedExplode(col("ahash").cast("long"), maxHamming).as("bk"))
        .select(col(idAlias), col(hashAlias),
          col("bk.band").as("band"), col("bk.key").as("key"))
    banded(querySigs.select("doc_id", "ahash"), "query_id", "q_hash")
      .join(banded(store, "match_id", "s_hash"), Seq("band", "key"))
      .select(col("query_id"), col("match_id"),
        bit_count(col("q_hash").bitwiseXOR(col("s_hash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  private def phashServeTable(root: String, maxHamming: Int) =
    s"$root/phash_serve_h$maxHamming"
  private def bandBucketColName(nBuckets: Int) =
    s"__graft_bandbucket_$nBuckets"

  /** Publish a BAND-KEY-BUCKETED serving layout of the signature
    * store, so small serve batches open only the files their band
    * keys collide with (the [[graft.online.OnlineStore]]
    * publishSnapshot shape applied to the pigeonhole index): each
    * stored signature explodes into its `maxHamming + 1` (band, key)
    * rows — one row PER BAND is the price of correct pruning, since
    * a within-radius match can land on any band — each row gains a
    * stable hash bucket of (band, key), and the table lays out
    * sorted by bucket (~contiguous bucket ranges per file, tight
    * footer stats). The bucket config travels in the bucket column's
    * NAME and the radius in the table path, so serving needs no
    * out-of-band config. Storage is nBands × 28 B/doc — at 10⁹ docs
    * and h=2, ~84 GB, still tiny next to the payloads. Re-publish
    * after store upserts (the compactSnapshot convention — the index
    * is a snapshot, not a log). */
  def phashPublishServeIndex(spark: SparkSession, root: String,
                             maxHamming: Int = 2, nBuckets: Int = 256,
                             numFiles: Int = 64): Long = {
    import graft.offline.VersionedStore
    require(nBuckets > 0 && numFiles > 0,
      "nBuckets/numFiles must be positive")
    val bb = bandBucketColName(nBuckets)
    val banded = VersionedStore.read(spark, phashTable(root))
      .select(col("doc_id"), col("ahash").cast("long").as("ahash"),
        bandedExplode(col("ahash").cast("long"), maxHamming).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .withColumn(bb,
        pmod(xxhash64(col("band"), col("key")), lit(nBuckets.toLong)))
      .repartitionByRange(numFiles, col(bb))
      .sortWithinPartitions(bb)
    VersionedStore.overwrite(banded, phashServeTable(root, maxHamming))
  }

  /** [[phashServeNearDups]] with FILE-LEVEL pruning against a
    * [[phashPublishServeIndex]] layout — the small-batch serve mode:
    * the query batch's distinct (band, key) buckets (computed with
    * the index's own hash config, parsed from its schema) prune the
    * index read via manifest footer stats, so files opened ∝ the
    * batch's band-key spread, not table size; then the same banded
    * equi-join + exact popcount. Result contract identical to the
    * full-scan serve (spec-held). Keep the full-scan path for large
    * batches — past ~nBuckets distinct band keys the batch touches
    * every bucket anyway and the collect-to-driver bucket set buys
    * nothing. */
  def phashServeNearDupsPruned(querySigs: DataFrame, root: String,
                               maxHamming: Int = 2): DataFrame = {
    import graft.offline.VersionedStore
    require(maxHamming >= 1 && maxHamming <= 7,
      s"maxHamming must be in [1, 7], got $maxHamming")
    val spark = querySigs.sparkSession
    val table = phashServeTable(root, maxHamming)
    val bb = VersionedStore.schemaOf(spark, table).fieldNames
      .find(_.startsWith("__graft_bandbucket_"))
      .getOrElse(throw new IllegalArgumentException(
        s"$table is not a phashPublishServeIndex layout"))
    val nBuckets = bb.stripPrefix("__graft_bandbucket_").toLong
    val q = querySigs.select(col("doc_id").as("query_id"),
        col("ahash").cast("long").as("q_hash"),
        bandedExplode(col("ahash").cast("long"), maxHamming).as("bk"))
      .select(col("query_id"), col("q_hash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint() // small batch: one decode for buckets + join
    val buckets = q.select(
        pmod(xxhash64(col("band"), col("key")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0).toDouble).toSeq
    VersionedStore.readValues(spark, table, bb, buckets)
      .select(col("doc_id").as("match_id"),
        col("ahash").as("s_hash"), col("band"), col("key"))
      .join(broadcast(q), Seq("band", "key"))
      .select(col("query_id"), col("match_id"),
        bit_count(col("q_hash").bitwiseXOR(col("s_hash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Columnar (codegen) twin of the stub decode for the oracle path:
    * identical output computed as pure SQL functions — demonstrates
    * the metadata contract and stays inside whole-stage codegen.
    */
  def metaColumns(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withPayload(docs, idCol, textCol)
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .select(
        col("doc_id"), col("byte_len"),
        (col("byte_len") % 640).as("width"),
        (col("byte_len") * 7 % 480).as("height"),
        ((col("byte_len") % 30) + 1).as("n_frames"),
        when(col("byte_len") % 3 === 0, "jpeg")
          .when(col("byte_len") % 3 === 1, "png")
          .otherwise("webp").as("format"))
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column operators (extension surface, SURVEY.md
  * §2.12): images/audio/video travel as opaque `binary` columns with
  * typed metadata, and every transformation here is either a pure
  * codegen projection (size/digest/chunk fingerprints) or a
  * partition-batched map (feature extraction) — the two shapes a 100 TB
  * media pipeline actually runs.
  *
  * The fixtures carry no real media bytes, so [[toBlob]] manufactures
  * blobs from text (the bytes are then honest UTF-8) and
  * [[extractFeaturesStub]] stands in for a codec: the container ships no
  * image/audio libraries, so decode is a clearly-marked deterministic
  * stub while the Spark-side plumbing — BinaryType in, typed struct out,
  * per-partition batched iteration, schema evolution — is the production
  * shape and is what the tests pin down.
  */
object BinaryOps {

  /** String -> UTF-8 bytes (`binary`). Real pipelines read blobs from
    * parquet/object storage directly; this exists so the text fixtures
    * can exercise the binary operators. */
  def toBlob(c: Column): Column = encode(c, "UTF-8")

  /** Byte length of a blob — metadata projection, pushdown-friendly. */
  def blobSize(c: Column): Column = octet_length(c)

  /** Content digest of the raw bytes (md5 hex). Over UTF-8 blobs this
    * equals md5 of the source string, which is how the DuckDB oracle
    * (whose md5 takes VARCHAR only) reproduces it. */
  def blobDigest(c: Column): Column = md5(c)

  /** Decode-free media metadata from header bytes — format, image
    * dimensions, audio geometry — via the native
    * [[graft.functions.MediaHeaderMeta]] kernel. See the kernel doc for
    * the per-container contract. */
  def mediaMeta(blob: Column): Column =
    graft.functions.GraftFunctions.mediaMeta(blob)

  /** Media-metadata projection over a blob column: `idField, format,
    * width, height, channels, sample_rate` — the typed-metadata half of
    * the multimodal story as a pure zero-shuffle scan (with column
    * pruning, only the blob column is read; at 100 TB this is the
    * routing/statistics pass that decides which rows ever reach a real
    * decoder). */
  def mediaMetadata(idField: String, blobField: String)(
      df: DataFrame): DataFrame =
    df.select(col(idField), mediaMeta(col(blobField)).as("__m"))
      .select(col(idField), col("__m.format").as("format"),
        col("__m.width").as("width"), col("__m.height").as("height"),
        col("__m.channels").as("channels"),
        col("__m.sample_rate").as("sample_rate"),
        col("__m.duration_ms").as("duration_ms"))

  // ------------- synthetic container builders (fixtures carry no media)

  private def be16hex(v: Column): Column = lpad(hex(v), 4, "0")
  private def be32hex(v: Column): Column = lpad(hex(v), 8, "0")
  private def le16hex(v: Column): Column = {
    val h = be16hex(v)
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le32hex(v: Column): Column = {
    val h = be32hex(v)
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Byte-exact minimal PNG header (signature + IHDR with the given
    * dimensions). The fixtures ship no media, so tests and the oracle
    * round-trip REAL container bytes through [[mediaMeta]]: the builder
    * writes big-endian dimensions at the spec offsets and the parser
    * must read them back — any offset or endianness slip breaks the
    * hash compare. */
  def syntheticPng(w: Column, h: Column): Column =
    unhex(concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32hex(w), be32hex(h), lit("0806000000")))

  /** Minimal GIF89a header: little-endian u16 logical-screen size. */
  def syntheticGif(w: Column, h: Column): Column =
    unhex(concat(lit("474946383961"), le16hex(w), le16hex(h), lit("00")))

  /** Minimal BMP (BITMAPINFOHEADER): little-endian i32 dimensions at
    * offsets 18/22. */
  def syntheticBmp(w: Column, h: Column): Column =
    unhex(concat(lit("424D" + "00000000" + "00000000" + "36000000" +
      "28000000"), le32hex(w), le32hex(h)))

  /** Minimal JPEG: SOI, a real APP0/JFIF segment, then SOF0 carrying
    * big-endian (height, width) — the parser must WALK to it. */
  def syntheticJpeg(w: Column, h: Column): Column =
    unhex(concat(
      lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
        "00010001" + "0000" + "FFC0" + "0011" + "08"),
      be16hex(h), be16hex(w),
      lit("03" + "012200" + "021101" + "031101")))

  /** Minimal MP4 (ISO BMFF): a real `ftyp` box then a `moov`
    * containing a version-0 `mvhd` at timescale 1000, so
    * `duration_ms` round-trips the given value exactly. */
  def syntheticMp4(durationMs: Column): Column =
    unhex(concat(
      // ftyp: size 16, brand isom, minor 0
      lit("00000010" + "66747970" + "69736F6D" + "00000000" +
        // moov: size 8 + 28; mvhd: size 28, v0, ctime/mtime 0
        "00000024" + "6D6F6F76" + "0000001C" + "6D766864" + "00000000" +
        "00000000" + "00000000" + "000003E8"), // timescale 1000
      be32hex(durationMs)))

  /** Minimal WAV (RIFF/WAVE with a full 16-byte `fmt ` payload):
    * little-endian channels and sample rate. */
  def syntheticWav(channels: Column, sampleRate: Column): Column =
    unhex(concat(
      lit("52494646" + "24000000" + "57415645" + "666D7420" + "10000000" +
        "0100"),
      le16hex(channels), le32hex(sampleRate),
      lit("00000000" + "0000" + "1000")))

  /** Full PCM-16 WAV with a REAL `data` chunk: `samples` is an
    * `array<int>` of signed 16-bit values (interleaved frames when
    * channels > 1), encoded little-endian two's-complement. Correct
    * RIFF/data sizes and byte-rate/block-align fields, so the result
    * round-trips through both [[mediaMeta]] and [[wavPcmStats]] —
    * the builder the sample-decode tests and oracle pin against. */
  def syntheticWavPcm(
      channels: Column, sampleRate: Column, samples: Column): Column = {
    val dataBytes = size(samples) * 2
    unhex(concat(
      lit("52494646"), le32hex(dataBytes + 36),
      lit("57415645" + "666D7420" + "10000000" + "0100"),
      le16hex(channels), le32hex(sampleRate),
      le32hex(sampleRate * channels * 2), le16hex(channels * 2),
      lit("1000"),
      lit("64617461"), le32hex(dataBytes),
      array_join(
        transform(samples, s => le16hex(s.bitwiseAND(lit(0xFFFF)))), "")))
  }

  /** Spec-exact minimal ZIP archive with `nEntries` STORED members
    * (`f<j>.txt` holding j+1 bytes of 'a'): local records, central
    * directory, EOCD — correct sizes, name lengths, and local offsets
    * (offset_j = 37j + j(j−1)/2 with these fixed-width names), so the
    * listing kernel and the oracle's closed form must agree on every
    * field. CRCs are zeroed (listing never reads them). */
  def syntheticZip(nEntries: Column): Column = {
    // The "0600" name-length field and the 37j + j(j−1)/2 offset closed
    // form both assume single-digit entry indices ("f9.txt" = 6 bytes);
    // beyond 10 entries the archive would be silently corrupt. Fail
    // loudly at build time instead.
    val n = when(nEntries > 10,
      raise_error(lit("syntheticZip supports at most 10 entries " +
        "(single-digit names assumed by the offset closed form)")))
      .otherwise(nEntries)
    def nameHex(j: Column) =
      hex(concat(lit("f"), j.cast("string"), lit(".txt")))
    def localOff(j: Column) = lit(37) * j + j * (j - 1) / 2
    val idx = when(n <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), n - 1))
    val locals = array_join(transform(idx, j => concat(
      lit("504B0304" + "1400" + "0000" + "0000" + "0000" + "0000" +
        "00000000"),
      le32hex(j + 1), le32hex(j + 1), lit("0600" + "0000"), nameHex(j),
      call_function("repeat", lit("61"), j + 1))), "")
    val centrals = array_join(transform(idx, j => concat(
      lit("504B0102" + "1400" + "1400" + "0000" + "0000" + "0000" +
        "0000" + "00000000"),
      le32hex(j + 1), le32hex(j + 1),
      lit("0600" + "0000" + "0000" + "0000" + "0000" + "00000000"),
      le32hex(localOff(j)), nameHex(j))), "")
    unhex(concat(locals, centrals,
      lit("504B0506" + "0000" + "0000"),
      le16hex(n), le16hex(n),
      le32hex(n * 52),
      le32hex(lit(37) * n + n * (n - 1) / 2),
      lit("0000")))
  }

  /** ZIP central-directory listing from archive bytes — see
    * [[graft.functions.ZipEntries]] for the contract (unreadable /
    * ZIP64 → NULL, never a throw). */
  def zipEntries(blob: Column): Column =
    graft.functions.GraftFunctions.zipEntries(blob)

  /** Spec-exact minimal USTAR tarball with `nEntries` regular-file
    * members (`f<j>.txt` holding j+1 bytes of 'a'): full 512-byte
    * headers (octal size via `conv`, "ustar" magic, spaces checksum —
    * the listing kernel never validates checksums, which is what
    * keeps this builder a pure column expression), one data block per
    * member (sizes ≤ 512 here), two-zero-block terminator. Header
    * offsets are the closed form 1024·j the oracle recomputes. */
  def syntheticTar(nEntries: Column): Column = {
    def nameHex(j: Column) =
      hex(concat(lit("f"), j.cast("string"), lit(".txt")))
    val idx = when(nEntries <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nEntries - 1))
    val members = array_join(transform(idx, j => concat(
      rpad(nameHex(j), 200, "0"),                    // name, NUL-padded
      lit("3030303036343400"),                       // mode "0000644\0"
      lit("3030303030303000"),                       // uid  "0000000\0"
      lit("3030303030303000"),                       // gid
      hex(lpad(conv((j + 1).cast("string"), 10, 8), 11, "0")),
      lit("00"),                                     // size, octal + NUL
      lit("3030303030303030303030" + "00"),          // mtime zeros + NUL
      lit("2020202020202020"),                       // chksum: 8 spaces
      lit("30"),                                     // typeflag '0'
      call_function("repeat", lit("00"), lit(100)),  // linkname
      lit("757374617200" + "3030"),                  // "ustar\0" + "00"
      call_function("repeat", lit("00"), lit(247)),  // uname..prefix+pad
      call_function("repeat", lit("61"), j + 1),     // data 'a' × (j+1)
      call_function("repeat", lit("00"), lit(512) - (j + 1)))), "")
    unhex(concat(members, call_function("repeat", lit("00"), lit(1024))))
  }

  /** USTAR member listing from tarball bytes — see
    * [[graft.functions.TarEntries]] for the contract (malformed →
    * NULL, never a throw; `.tar.gz` needs a codec first, as with
    * WARC). */
  def tarEntries(blob: Column): Column =
    graft.functions.GraftFunctions.tarEntries(blob)

  /** Spec-exact minimal WARC shard with `nRecords` response records
    * (`https://ex.com/p/<j>` carrying j+1 bytes of 'a'): with these
    * single-digit fields every record is 94+j bytes, so offsets are
    * the closed form 94j + j(j−1)/2 the oracle recomputes. */
  def syntheticWarc(nRecords: Column): Column = {
    val idx = when(nRecords <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nRecords - 1))
    encode(array_join(transform(idx, j => concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://ex.com/p/"), j.cast("string"),
      lit("\r\nContent-Length: "), (j + 1).cast("string"),
      lit("\r\n\r\n"),
      call_function("repeat", lit("a"), j + 1),
      lit("\r\n\r\n"))), ""), "UTF-8")
  }

  /** WARC record listing from uncompressed shard bytes — see
    * [[graft.functions.WarcRecords]] for the contract (malformed →
    * NULL, never a throw; `.warc.gz` needs a codec first). */
  def warcRecords(blob: Column): Column =
    graft.functions.GraftFunctions.warcRecords(blob)

  /** PCM-16 waveform statistics straight from WAV bytes — see
    * [[graft.functions.WavPcmStats]] for the full contract (PCM-16
    * only; NULL for anything unreadable). */
  def wavPcmStats(blob: Column): Column =
    graft.functions.GraftFunctions.wavStats(blob)

  /** Waveform-statistics projection over a WAV blob column:
    * `idField, n_samples, peak, sum_sq, rms` — the level/silence/
    * clipping audit pass as a pure zero-shuffle scan (the
    * [[mediaMetadata]] discipline: at 100 TB this decides which rows
    * ever reach a real resampler). */
  def wavStats(idField: String, blobField: String)(
      df: DataFrame): DataFrame =
    df.select(col(idField), wavPcmStats(col(blobField)).as("__w"))
      .select(col(idField),
        col("__w.n_samples").as("n_samples"), col("__w.peak").as("peak"),
        col("__w.sum_sq").as("sum_sq"), col("__w.rms").as("rms"))

  /** Fixed-size chunk fingerprints: md5 of each `chunkBytes` slice, in
    * order — the rsync/CDC-shaped primitive for delta dedup of large
    * blobs. Pure projection: `substring` on binary slices BYTES, so one
    * row costs O(len/chunk) digests and nothing shuffles. (True
    * content-defined chunking needs a rolling hash over bytes — a custom
    * Expression if ever needed; fixed-size chunks keep the oracle
    * expressible and the plan identical.) */
  def chunkFingerprints(blob: Column, chunkBytes: Int): Column = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    val nChunks = ceil(octet_length(blob).cast("double") / chunkBytes).cast("int")
    // explicit null guard: greatest(NULL, 1) is 1 (greatest skips nulls),
    // which would turn a NULL blob into a spurious [null] fingerprint
    when(blob.isNull, lit(null).cast("array<string>"))
      .otherwise(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => md5(substring(blob, i * chunkBytes + 1, lit(chunkBytes)))))
  }

  /** Content-defined chunk fingerprints — the rolling-hash variant of
    * [[chunkFingerprints]]: boundaries follow content, so an insert or
    * delete re-chunks only the edit's neighborhood and every other
    * chunk's fingerprint survives for delta dedup. Emits
    * `array<struct<offset,length,fp>>`; native codegen kernel
    * ([[graft.functions.CdcChunkFingerprints]]), oracle-exempt (the
    * rolling state machine is not SQL-expressible) — boundary-shift
    * invariance is spec-asserted. Expected chunk ≈ minBytes + 2^avgBits. */
  def contentChunkFingerprints(
      blob: Column, minBytes: Int = 2048, avgBits: Int = 12,
      maxBytes: Int = 65536): Column =
    graft.functions.GraftFunctions.cdcChunkFingerprints(
      blob, minBytes, avgBits, maxBytes)

  /** Byte-exact dedup: keep one row per distinct blob content,
    * deterministic min-tie-break — one hash-agg shuffle keyed on the
    * 16-byte digest, never on the blob itself (the shuffle carries
    * digests + one surviving row per group, not the media bytes twice). */
  def dedupByBytes(blobField: String, tieBreak: String)(df: DataFrame): DataFrame =
    Dedup.exact(Seq("__digest"), tieBreak)(
      df.withColumn("__digest", blobDigest(col(blobField))))
      .drop("__digest")

  /** 60-bit average-hash of a blob — PERCEPTUAL near-dup for binary
    * columns, where [[dedupByBytes]] ends at byte identity: bit k is
    * set iff the k-th of 60 stride-sampled bytes is ≥ the sample mean
    * (the aHash recipe over a decode-free "grayscale" read of the
    * byte stream — a re-encoded or locally-edited copy keeps most
    * sample/mean relations, so near-copies land within a few bits).
    * With a real codec the samples would be downscaled luma pixels;
    * the sampling/compare/pack pipeline — the part Spark executes —
    * is identical, and on the text fixtures the bytes are honest
    * UTF-8. 60 bits, not 64, for the same reason as
    * [[graft.ext.Dedup.simhash]]: the sign bit stays clear, so every
    * shift/compare is exact BIGINT arithmetic in both engines (DuckDB
    * ERRORS on `1 << 63`). The mean test is integer-exact:
    * `sample·60 ≥ Σ samples` — no division anywhere. Empty blob → 0;
    * NULL blob → NULL. Pure projection, lowered to the native
    * [[graft.functions.PerceptualHash60]] kernel (one primitive byte
    * loop in whole-stage codegen — the HOF spec form [[aHash60Hof]]
    * pays substring/hex/conv STRING machinery per sampled byte and is
    * kept only as the pinned executable specification). */
  def aHash60(blob: Column): Column =
    graft.functions.GraftFunctions.perceptualHash60(blob, dHash = false)

  /** 60-bit difference-hash — [[aHash60]]'s gradient sibling: bit k is
    * set iff sample k+1 > sample k over 61 stride-sampled bytes
    * (horizontal-gradient dHash). More robust than the mean test under
    * global brightness shifts (a constant byte offset preserves every
    * strict inequality); same 60-bit packing, contracts, and native
    * kernel ([[dHash60Hof]] is the spec form). */
  def dHash60(blob: Column): Column =
    graft.functions.GraftFunctions.perceptualHash60(blob, dHash = true)

  /** HOF spec form of [[aHash60]] — what the kernel is pinned
    * bit-identical to (HashExpressionsSpec). */
  def aHash60Hof(blob: Column): Column = pHash60(blob, aHashBits)

  /** HOF spec form of [[dHash60]]. */
  def dHash60Hof(blob: Column): Column = pHash60(blob, dHashBits)

  private def aHashBits(ss: Column, total: Column): Column = {
    import org.apache.spark.sql.functions.{aggregate => fold}
    fold(sequence(lit(0), lit(59)), lit(0L), (acc, k) =>
      acc.bitwiseOR(
        when(element_at(ss, k + 1) * 60 >= total,
          call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))))
  }

  private def dHashBits(ss: Column, total: Column): Column = {
    import org.apache.spark.sql.functions.{aggregate => fold}
    fold(sequence(lit(0), lit(59)), lit(0L), (acc, k) =>
      acc.bitwiseOR(
        when(element_at(ss, k + 2) > element_at(ss, k + 1),
          call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))))
  }

  /** Shared sample-and-pack: 61 stride-sampled byte values (both hash
    * flavors read them; aHash uses the first 60), their integer sum,
    * and the bit packer. Sample k reads byte ⌊k·n/61⌋ (0-based) — a
    * uniform decode-free downscale of the stream. */
  private def pHash60(
      blob: Column, bits: (Column, Column) => Column): Column = {
    import graft.functions.GraftFunctions.bind
    when(blob.isNull, lit(null).cast("long")).otherwise(
      bind(octet_length(blob)) { n =>
        bind(transform(sequence(lit(0), lit(60)), k =>
          conv(hex(call_function("substring", blob,
            floor(k.cast("long") * n / 61).cast("int") + 1, lit(1))),
            16, 10).cast("long"))) { ss =>
          bind(aggregate(slice(ss, 1, 60), lit(0L), (a, x) => a + x)) { total =>
            when(n === 0, lit(0L)).otherwise(bits(ss, total))
          }
        }
      })
  }

  /** Perceptual near-dup pairs over a binary column: banded LSH on the
    * 60-bit hash (4 bands × 15 bits — two hashes within Hamming
    * distance ≤ 3 agree on at least one whole band by pigeonhole, so
    * recall at the default `maxHamming = 3` is COMPLETE, not
    * probabilistic), then exact popcount-of-XOR verifies candidates.
    * `maxHamming` > 3 weakens the guarantee to best-effort (documented
    * recall trade, same as the SimHash prefix buckets).
    *
    * Same capped-bucket shape as every shipped near-dup path: one
    * hash-agg collects each (band, bucket)'s (id, hash) structs,
    * `maxBucket` drops degenerate buckets, ordered pairs generate
    * bucket-locally, pair-level dedup BEFORE the (cheap) verify.
    * Shuffle keys are 15-bit band values + the 8-byte hash — the media
    * bytes themselves never shuffle. NULL blobs produce no pairs. */
  def perceptualHashPairs(
      idField: String, blobField: String,
      maxHamming: Int = 3, maxBucket: Int = 64,
      hash: Column => Column = aHash60)(df: DataFrame): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val bands = 4
    val bandBits = 15
    val hashed = df
      .select(col(idField).as("__id"), hash(col(blobField)).as("__h"))
      .filter(col("__h").isNotNull)
    val banded = hashed.select(col("__id"), col("__h"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("__h"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    banded.groupBy("__band", "__bucket")
      .agg(collect_list(struct(col("__id"), col("__h"))).as("__docs"))
      .filter(size(col("__docs")).between(2, maxBucket))
      .select(explode(flatten(transform(col("__docs"), x =>
        transform(filter(col("__docs"), y => x("__id") < y("__id")), y =>
          struct(x("__id").as("id_a"), y("__id").as("id_b"),
            bit_count(x("__h").bitwiseXOR(y("__h"))).as("hamming"))))))
        .as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"),
        col("__p.hamming").cast("int").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** `(id, phash)` rows for persistence — the binary analog of
    * [[graft.ext.Dedup.minhashIndexRows]]: store these 8 B/blob rows
    * (parquet via the store layer) and each later crawl dedupes
    * against them with [[incrementalPerceptualDedup]], never
    * re-reading historical media bytes. */
  def phashIndexRows(
      idField: String, blobField: String,
      hash: Column => Column = aHash60)(df: DataFrame): DataFrame =
    df.select(col(idField).as("id"), hash(col(blobField)).as("phash"))

  /** Incremental PERCEPTUAL dedup against a persisted hash index — the
    * binary leg of the incremental-index triad (text:
    * [[graft.ext.Dedup.incrementalNearDup]], embeddings:
    * [[graft.ext.Dedup.incrementalEmbeddingDedup]]): a recurring
    * multimodal crawl must drop re-encoded/perturbed copies of blobs
    * it already holds, not just byte-identical re-fetches. History
    * participates as [[phashIndexRows]] only — 8 bytes per blob ever
    * seen, media bytes never re-read and never shuffled.
    *
    * A batch blob is dropped when its hash is within `maxHamming` of
    * (a) any index row sharing a band bucket, or (b) any SMALLER-id
    * batch blob sharing a band bucket (the greedy in-batch election of
    * the sibling ops — no transitive closure). Unlike the MinHash leg,
    * the verify here is EXACT: the hash IS the state, so
    * popcount-of-XOR decides, and recall at `maxHamming` ≤ 3 is
    * complete by pigeonhole (see [[perceptualHashPairs]]; larger radii
    * are best-effort). NULL-blob batch rows survive untouched — a
    * missing payload is not a duplicate of anything.
    *
    * Scale shape: the batch hash projection computes ONCE
    * (localCheckpoint, two bucket consumers); candidates come from
    * capped band-bucket equi-joins (per-side `maxBucket`, never
    * all-pairs); the hash rides inside the bucket structs so the
    * verify needs NO re-join to either side; the index side is one
    * scan of a stored table per batch. Survivors' [[phashIndexRows]]
    * append to the index for the next batch. */
  def incrementalPerceptualDedup(
      idField: String, blobField: String, index: DataFrame,
      maxHamming: Int = 3, maxBucket: Int = 64,
      hash: Column => Column = aHash60)(batch: DataFrame): DataFrame = {
    require(index.columns.length == 2,
      s"index must be (id, phash) rows, got ${index.columns.mkString(", ")}")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val bands = 4
    val bandBits = 15
    val idxH = index.select(col(index.columns(0)).as("__id"),
      col(index.columns(1)).as("__h")).filter(col("__h").isNotNull)
    val batchH = batch.select(col(idField).as("__id"),
      hash(col(blobField)).as("__h"))
      .filter(col("__h").isNotNull)
      .localCheckpoint()
    def buckets(d: DataFrame, out: String, minSize: Int) = d
      .select(col("__id"), col("__h"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("__h"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
      .groupBy("__band", "__bucket")
      .agg(collect_list(struct(col("__id"), col("__h"))).as(out))
      .filter(size(col(out)).between(minSize, maxBucket))
    // history × batch: any in-radius index neighbor sinks the batch
    // blob (disjoint id spaces expected; collisions dropped defensively)
    val crossLosers = buckets(idxH, "__la", minSize = 1)
      .join(buckets(batchH, "__lb", minSize = 1), Seq("__band", "__bucket"))
      .select(explode(flatten(transform(col("__la"), x =>
        transform(col("__lb"), y =>
          struct(x("__id").as("id_a"), y("__id").as("id_b"),
            bit_count(x("__h").bitwiseXOR(y("__h"))).as("__d")))))).as("__p"))
      .filter(col("__p.__d") <= maxHamming &&
        col("__p.id_a") =!= col("__p.id_b"))
      .select(col("__p.id_b").as("id_b"))
    // in-batch: ordered pairs, smaller id survives
    val inLosers = buckets(batchH, "__ids", minSize = 2)
      .select(explode(flatten(transform(col("__ids"), x =>
        transform(filter(col("__ids"), y => x("__id") < y("__id")), y =>
          struct(y("__id").as("id_b"),
            bit_count(x("__h").bitwiseXOR(y("__h"))).as("__d")))))).as("__p"))
      .filter(col("__p.__d") <= maxHamming)
      .select(col("__p.id_b").as("id_b"))
    val dups = crossLosers.unionByName(inLosers).distinct()
    batch.join(dups, batch(idField) === dups("id_b"), "left_anti")
  }

  /** Video frame sampling — the PLUMBING half of the frame-extract
    * pass (the decode itself is environment-stubbed, like
    * [[extractFeaturesStub]]): per video blob, the native header
    * kernel reads `duration_ms` from the container (mp4/mvhd), frame
    * timestamps lay out every `intervalMs` inside `[0, duration)`
    * capped at `maxFrames`, and one `posexplode(sequence(...))` fans
    * each video to its frame rows — a pure zero-shuffle projection:
    * media bytes never shuffle, non-video blobs (no duration: images,
    * audio, garbage) route to ZERO rows here (images go through
    * [[extractFeaturesStub]] whole). `frame_ref` is the deterministic
    * HANDLE a real ffmpeg seek-and-decode would key its output by —
    * md5(id:ts), the shared digest discipline — so downstream
    * feature/storage plumbing is testable without pixels; a production
    * deployment maps the (blob, ts_ms) pairs through a codec in
    * `mapPartitions` exactly like the stub codec documents.
    *
    * Output: `idField, frame_idx, ts_ms, frame_ref`. Frame count =
    * ceil(duration/interval) — a frame at every interval start that
    * falls inside the clip. */
  def sampleFrames(
      idField: String, blobField: String,
      intervalMs: Long = 60000L, maxFrames: Int = 5)(
      df: DataFrame): DataFrame = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val dur = mediaMeta(col(blobField)).getField("duration_ms")
    // least() SKIPS NULLs (least(5, NULL) = 5), so a durationless blob
    // must be nulled out explicitly or every image would "sample" the
    // full maxFrames of phantom frames
    val n = when(dur.isNotNull, least(lit(maxFrames.toLong),
      ceil(dur.cast("double") / lit(intervalMs.toDouble))))
    df.select(col(idField), n.as("__n"))
      .filter(col("__n").isNotNull && col("__n") > 0)
      .select(col(idField),
        posexplode(sequence(lit(0L), col("__n") - 1L)))
      .select(col(idField), col("pos").cast("int").as("frame_idx"),
        (col("col") * intervalMs).as("ts_ms"))
      .withColumn("frame_ref",
        md5(concat(col(idField).cast("string"), lit(":"),
          col("ts_ms").cast("string"))))
  }

  /** Extracted-feature schema appended by [[extractFeaturesStub]]:
    * the typed-metadata half of a multimodal column. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_count", IntegerType, nullable = false),
    StructField("header", BinaryType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = true)))

  /** Partition-batched media feature extraction.
    *
    * STUB DECODE: a production deployment replaces the body of
    * `decodeOne` with a real codec call (libjpeg/ffmpeg via JNI, or an
    * ONNX vision encoder); none of those ship in this container, so the
    * "features" are a deterministic projection of the raw bytes. Every
    * scale-relevant property is real: rows stream through
    * `mapPartitions` one partition per task (the batch-inference shape —
    * amortize model/codec init per partition, not per row), the blob
    * column is read once, and the output schema appends a typed struct.
    */
  def extractFeaturesStub(
      blobField: String, dim: Int, target: String = "media")(
      df: DataFrame): DataFrame = {
    require(dim > 0, s"feature dim must be positive, got $dim")
    val inSchema = df.schema
    val outSchema = inSchema.add(target, featureSchema, nullable = true)
    val blobIdx = inSchema.fieldIndex(blobField)
    val out = df.mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model session)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](blobIdx)
        val media = if (bytes == null) null else decodeOne(bytes, dim)
        Row.fromSeq(row.toSeq :+ media)
      }
    }(Encoders.row(outSchema))
    out
  }

  /** The stub "codec": deterministic pseudo-features from raw bytes —
    * byte count, an 8-byte header slice, and `dim` floats folded from
    * the byte stream. Replace with a real decoder in production. */
  private def decodeOne(bytes: Array[Byte], dim: Int): Row = {
    val header = bytes.take(8)
    val feature = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      feature(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    Row(bytes.length, header, feature.toSeq)
  }
}

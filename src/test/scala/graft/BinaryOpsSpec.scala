package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.BinaryOps

/** Binary/multimodal operator tests: byte semantics of chunking, exact
  * byte dedup, and the partition-batched feature-extraction plumbing
  * (schema, batch shape, null handling) around the stubbed codec. */
class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  test("blob digest and size are byte-accurate incl. multi-byte chars") {
    val df = Seq("abc", "héllo").toDF("t")
      .select(BinaryOps.toBlob($"t").as("b"))
      .select(BinaryOps.blobSize($"b").as("n"), BinaryOps.blobDigest($"b").as("d"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 3)
    assert(rows(1).getInt(0) === 6) // é is 2 bytes in UTF-8
    assert(rows(0).getString(1) === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("mediaMeta round-trips the synthetic builders at multi-byte dimensions") {
    // w=815 h=615 exercise the high bytes of every endianness path
    val df = Seq((815, 615)).toDF("w", "h").select(
      BinaryOps.mediaMeta(BinaryOps.syntheticPng($"w", $"h")).as("png"),
      BinaryOps.mediaMeta(BinaryOps.syntheticGif($"w", $"h")).as("gif"),
      BinaryOps.mediaMeta(BinaryOps.syntheticBmp($"w", $"h")).as("bmp"),
      BinaryOps.mediaMeta(BinaryOps.syntheticJpeg($"w", $"h")).as("jpeg"),
      BinaryOps.mediaMeta(BinaryOps.syntheticWav(lit(2), lit(44100))).as("wav"),
      BinaryOps.mediaMeta(BinaryOps.syntheticMp4(lit(93500))).as("mp4"))
    val r = df.head()
    val mp4 = r.getAs[Row]("mp4")
    assert(mp4.getString(0) === "mp4" && mp4.getInt(5) === 93500 &&
      mp4.isNullAt(1) && mp4.isNullAt(3))
    for (f <- Seq("png", "gif", "bmp", "jpeg")) {
      val m = r.getAs[Row](f)
      assert(m.getString(0) === f, f)
      assert(m.getInt(1) === 815, s"$f width")
      assert(m.getInt(2) === 615, s"$f height")
      assert(m.isNullAt(3) && m.isNullAt(4), s"$f audio fields")
    }
    val wav = r.getAs[Row]("wav")
    assert(wav.getString(0) === "wav" && wav.getInt(3) === 2 &&
      wav.getInt(4) === 44100 && wav.isNullAt(1) && wav.isNullAt(2))
  }

  test("mediaMeta malformed-input discipline: truncation, walks, unknowns") {
    def meta(bytes: Array[Byte]): Row =
      Seq(Tuple1(bytes)).toDF("b")
        .select(BinaryOps.mediaMeta($"b")).head().getAs[Row](0)
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // truncated PNG: magic only -> format recognized, geometry NULL
    val png = meta(hex("89504E470D0A1A0A"))
    assert(png.getString(0) === "png" && png.isNullAt(1) && png.isNullAt(2))
    // JPEG whose SOF is PROGRESSIVE (C2) and sits behind two segments
    val sof2 = meta(hex("FFD8" + "FFE00004" + "0000" + "FFDB0004" + "0000" +
      "FFC20011" + "08" + "0100" + "0200" + "03012200021101031101"))
    assert(sof2.getString(0) === "jpeg" && sof2.getInt(1) === 512 &&
      sof2.getInt(2) === 256)
    // JPEG with no SOF at all (SOI then EOI) -> jpeg, NULL dims
    val nosof = meta(hex("FFD8" + "FFD9"))
    assert(nosof.getString(0) === "jpeg" && nosof.isNullAt(1))
    // WAV with a LIST chunk (odd size, word-aligned walk) before fmt
    val wav = meta(hex("52494646" + "00000000" + "57415645" +
      "4C495354" + "03000000" + "616263" + "00" + // LIST size 3 + pad
      "666D7420" + "10000000" + "0100" + "0100" + "803E0000" +
      "00000000" + "0000" + "1000"))
    assert(wav.getString(0) === "wav" && wav.getInt(3) === 1 &&
      wav.getInt(4) === 16000)
    // BMP with negative (top-down) height reports the magnitude
    val bmp = meta(hex("424D" + "00000000" + "00000000" + "36000000" +
      "28000000" + "20000000" + "F0FFFFFF")) // w=32, h=-16
    assert(bmp.getString(0) === "bmp" && bmp.getInt(1) === 32 &&
      bmp.getInt(2) === 16)
    // MP4: mdat-style box BEFORE moov is walked over; v1 mvhd (64-bit
    // times) reads the right offsets; timescale 500 halves the ms
    val mp4 = meta(hex("00000010" + "66747970" + "69736F6D" + "00000000" +
      "00000009" + "736B6970" + "00" + // 9-byte skip box
      "00000030" + "6D6F6F76" +        // moov: 8 + 40
      "00000028" + "6D766864" + "01000000" + // mvhd v1, size 40
      "0000000000000000" + "0000000000000000" + // ctime/mtime u64
      "000001F4" + "0000000000001388"))  // timescale 500, duration 5000
    assert(mp4.getString(0) === "mp4" && mp4.getInt(5) === 10000)
    // truncated mp4 (ftyp only) -> format recognized, duration NULL
    val tr = meta(hex("00000010" + "66747970" + "69736F6D" + "00000000"))
    assert(tr.getString(0) === "mp4" && tr.isNullAt(5))
    // unknown magic -> non-NULL struct, every field NULL
    val unk = meta("plain text".getBytes("UTF-8"))
    assert((0 until 6).forall(unk.isNullAt))
    // NULL blob -> NULL struct
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(BinaryOps.mediaMeta($"b")).head()
    assert(n.isNullAt(0))
  }

  test("chunkFingerprints emits ceil(len/chunk) digests, min one") {
    val df = Seq("aaaabbbbc", "aa", "").toDF("t")
      .select(size(BinaryOps.chunkFingerprints(BinaryOps.toBlob($"t"), 4)).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 1, 1))
  }

  test("chunkFingerprints chunk boundaries are byte-exact") {
    val df = Seq("aaaabbbb").toDF("t")
      .select(BinaryOps.chunkFingerprints(BinaryOps.toBlob($"t"), 4).as("fps"))
    val fps = df.head().getSeq[String](0)
    // each chunk digest equals the digest of the standalone 4-byte string
    val expected = Seq("aaaa", "bbbb").map(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(fps === expected)
  }

  test("contentChunkFingerprints slices are contiguous, bounded, and byte-exact") {
    val rnd = new scala.util.Random(3)
    val blob = Array.fill[Byte](20000)((rnd.nextInt(256) - 128).toByte)
    val rows = Seq(Tuple1(blob)).toDF("b")
      .select(explode(BinaryOps.contentChunkFingerprints(
        $"b", minBytes = 64, avgBits = 8, maxBytes = 1024)).as("c"))
      .select("c.offset", "c.length", "c.fp")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    // contiguous cover of the whole blob
    assert(rows.head._1 === 0)
    assert(rows.sliding(2).forall { case Array(a, b) => a._1 + a._2 === b._1 })
    assert(rows.last._1 + rows.last._2 === blob.length)
    // every chunk but the last respects [min, max]
    assert(rows.init.forall(c => c._2 >= 64 && c._2 <= 1024))
    assert(rows.last._2 <= 1024)
    // fingerprints are md5 of the exact slice
    rows.take(3).foreach { case (off, len, fp) =>
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest(java.util.Arrays.copyOfRange(blob, off, off + len))
        .map("%02x".format(_)).mkString
      assert(fp === exp)
    }
  }

  test("contentChunkFingerprints boundaries survive a prefix insert (CDC property)") {
    val rnd = new scala.util.Random(9)
    val base = Array.fill[Byte](30000)((rnd.nextInt(256) - 128).toByte)
    val shifted = Array.fill[Byte](7)((rnd.nextInt(256) - 128).toByte) ++ base
    def fps(b: Array[Byte]): Set[String] =
      Seq(Tuple1(b)).toDF("b")
        .select(explode(BinaryOps.contentChunkFingerprints(
          $"b", minBytes = 64, avgBits = 8, maxBytes = 1024)).as("c"))
        .select("c.fp").as[String].collect().toSet
    val a = fps(base); val b = fps(shifted)
    // content-defined boundaries realign right after the edit: nearly
    // every chunk fingerprint survives the 7-byte prefix insert (a
    // fixed-size chunker would lose all of them)
    val survived = (a intersect b).size.toDouble / a.size
    assert(survived > 0.9, s"only ${(survived * 100).round}% of chunks survived")
    // degenerate content (never matches the mask) still terminates via
    // the max-size force cut
    val zeros = Seq(Tuple1(Array.fill[Byte](5000)(0))).toDF("b")
      .select(size(BinaryOps.contentChunkFingerprints(
        $"b", minBytes = 64, avgBits = 8, maxBytes = 1024)).as("n"))
      .as[Int].head()
    assert(zeros === 5)
  }

  test("dedupByBytes keeps one row per distinct content, min tie-break") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other"))
      .toDF("id", "t").select($"id", BinaryOps.toBlob($"t").as("blob"))
    val out = BinaryOps.dedupByBytes("blob", "id")(df)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 2L))
  }

  test("perceptual hashes pair a perturbed copy, not an unrelated blob") {
    // strongly bimodal byte pattern: every sample sits far from the
    // mean, so a one-byte local edit flips at most the directly
    // sampled bit(s) — the re-encoded/near-copy case byte dedup misses
    val a = ("aa" + "zz") * 62                    // 248 bytes
    val b = a.updated(100, 'z').updated(101, 'a') // local 2-byte edit
    val c = ("zz" + "aa") * 62                    // complementary pattern
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, a))
      .toDF("doc_id", "t")
      .select($"doc_id", BinaryOps.toBlob($"t").as("blob"))
    val pairs = BinaryOps.perceptualHashPairs("doc_id", "blob")(df)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // exact copy: distance 0; perturbed copy: within the verify budget
    assert(pairs((1L, 4L)) === 0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3)
    // the complementary pattern flips (nearly) every bit — never paired
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((3L, 4L)))
    // dHash is invariant under a constant byte shift (all strict
    // inequalities preserved); empty and NULL blobs follow the doctrine
    val shifted = a.map(ch => (ch + 1).toChar)
    val r = Seq((a, shifted)).toDF("x", "y")
      .select(
        BinaryOps.dHash60(BinaryOps.toBlob($"x")).as("hx"),
        BinaryOps.dHash60(BinaryOps.toBlob($"y")).as("hy"),
        BinaryOps.aHash60(BinaryOps.toBlob(lit(""))).as("he"),
        BinaryOps.aHash60(lit(null).cast("binary")).as("hn")).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(2) === 0L)
    assert(r.isNullAt(3))
  }

  test("incrementalPerceptualDedup drops near-copies of the index and elects in-batch") {
    val a = ("aa" + "zz") * 62                    // crawl-1 pattern
    val fresh = ("zz" + "aa") * 62                // complementary — far from a
    def blobs(rows: Seq[(Long, String)]) = rows.toDF("id", "t")
      .select($"id", BinaryOps.toBlob($"t").as("blob"))
    val index = BinaryOps.phashIndexRows("id", "blob")(
      blobs(Seq(1L -> a, 2L -> ("m" * 248))))
    // batch: 10 = perturbed copy of indexed a (drop vs history);
    // 11 = genuinely new (survive); 12 = perturbed copy of 11 (in-batch
    // loser — larger id); 13 = NULL blob (not a duplicate of anything)
    val batch = blobs(Seq(
      10L -> a.updated(100, 'z').updated(101, 'a'),
      11L -> fresh,
      12L -> fresh.updated(40, 'a').updated(41, 'z')))
      .unionByName(Seq(13L).toDF("id")
        .select($"id", lit(null).cast("binary").as("blob")))
    val out = BinaryOps.incrementalPerceptualDedup("id", "blob", index)(batch)
    assert(out.select("id").as[Long].collect().sorted === Seq(11L, 13L))
    // index-append semantics: survivors' phash rows join the index, so
    // the NEXT crawl's perturbed copy of 11 is dropped against history
    val index2 = index.unionByName(BinaryOps.phashIndexRows("id", "blob")(
      out.filter($"blob".isNotNull)))
    val out2 = BinaryOps.incrementalPerceptualDedup("id", "blob", index2)(
      blobs(Seq(20L -> fresh.updated(200, 'a').updated(201, 'z'))))
    assert(out2.count() === 0)
  }

  test("extractFeaturesStub appends typed struct via partition-batched map") {
    val df = Seq((1L, "hello world"), (2L, null))
      .toDF("id", "t")
      .select($"id", BinaryOps.toBlob($"t").as("blob"))
      .repartition(2)
    val out = BinaryOps.extractFeaturesStub("blob", dim = 4)(df)
    assert(out.schema("media").dataType === BinaryOps.featureSchema)
    val rows = out.collect().map(r => (r.getLong(0), r.getAs[Row]("media"))).toMap
    val m = rows(1L)
    assert(m.getInt(0) === 11)
    assert(m.getAs[Array[Byte]](1).length === 8)
    assert(m.getSeq[Float](2).length === 4)
    assert(rows(2L) === null) // null blob -> null media struct
    // deterministic: same bytes, same features on re-run
    val again = BinaryOps.extractFeaturesStub("blob", dim = 4)(df)
      .filter($"id" === 1L).select("media").head().getAs[Row](0)
    assert(again.getSeq[Float](2) === m.getSeq[Float](2))
  }

  test("sampleFrames: interval layout, cap, and non-video routing") {
    import org.apache.spark.sql.functions._
    // 1s clip -> 1 frame; 60.001s -> 2; 10min -> capped at maxFrames;
    // an image and a NULL blob -> zero frame rows
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("id").select($"id",
      when($"id" === 1L, BinaryOps.syntheticMp4(lit(1000)))
        .when($"id" === 2L, BinaryOps.syntheticMp4(lit(60001)))
        .when($"id" === 3L, BinaryOps.syntheticMp4(lit(600000)))
        .when($"id" === 4L, BinaryOps.syntheticPng(lit(32), lit(32)))
        .as("blob")) // id 5: NULL blob
    val out = BinaryOps.sampleFrames("id", "blob",
      intervalMs = 60000L, maxFrames = 5)(df)
      .orderBy("id", "frame_idx").collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).length == 1 && byId(2L).length == 2 &&
      byId(3L).length == 5)
    assert(!byId.contains(4L) && !byId.contains(5L))
    // timestamps lie on the interval grid inside [0, duration)
    assert(byId(2L).map(_.getAs[Long]("ts_ms")).toSeq == Seq(0L, 60000L))
    assert(byId(3L).map(_.getAs[Long]("ts_ms")).toSeq ==
      Seq(0L, 60000L, 120000L, 180000L, 240000L))
    // the frame handle is the documented md5(id:ts) digest
    val f0 = byId(1L).head
    assert(f0.getAs[String]("frame_ref") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("1:0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("warcRecords: mixed record types, header case-folding, malformed -> NULL") {
    def list(s: String) =
      Seq(Tuple1(s.getBytes("UTF-8"))).toDF("b")
        .select(BinaryOps.warcRecords($"b").as("r")).head
    // a realistic shard: warcinfo (no URI), a response with
    // case-varied header names, a request
    val shard =
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n" +
      "WARC/1.0\r\nwarc-type: response\r\nWaRc-TaRgEt-UrI: https://x.io/a\r\n" +
        "content-length: 5\r\n\r\nhello\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x.io/a\r\n" +
        "Content-Length: 0\r\n\r\n\r\n\r\n"
    val rows = list(shard).getSeq[org.apache.spark.sql.Row](0)
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "warcinfo" && rows(0).isNullAt(1) &&
      rows(0).getLong(2) === 3L && rows(0).getLong(3) === 0L)
    assert(rows(1).getString(0) === "response" &&
      rows(1).getString(1) === "https://x.io/a" && rows(1).getLong(2) === 5L)
    assert(rows(2).getString(0) === "request" && rows(2).getLong(2) === 0L)
    // offsets point at each record's magic
    assert(shard.substring(rows(1).getLong(3).toInt).startsWith("WARC/1.0"))
    // malformed forms: wrong magic, missing Content-Length, payload
    // overrun, missing separator — NULL, never a throw
    assert(list("HTTP/1.0\r\n\r\n").isNullAt(0))
    assert(list("WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n").isNullAt(0))
    assert(list("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n").isNullAt(0))
    assert(list("WARC/1.0\r\nContent-Length: 2\r\n\r\nab").isNullAt(0))
    // empty blob: a valid empty shard; NULL blob -> NULL
    assert(list("").getSeq[Any](0).isEmpty)
    assert(Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(BinaryOps.warcRecords($"b")).head.isNullAt(0))
    // SQL surface registered
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT size(graft_warc_records(encode('', 'UTF-8')))")
      .head.getInt(0) === 0)
  }

  test("tarEntries: independent-builder archives, synthetic round-trip, unreadable -> NULL") {
    // independent header builder WITH a correct checksum (the kernel
    // deliberately doesn't validate checksums, but real tars carry
    // them — the test archive must look like one)
    def header(name: String, size: Long, flag: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit =
        s.getBytes("US-ASCII").copyToArray(h, off)
      put(name, 0)
      put("0000644 ", 100); put("0000000 ", 108)
      put("0000000 ", 116)
      put(("%011o".format(size)) + " ", 124)
      put("00000000000 ", 136)
      h(156) = flag.toByte
      put("ustar 00", 257)
      put("        ", 148) // checksum as spaces while summing
      val sum = h.map(_ & 0xFF).sum
      put("%06o".format(sum) + "  ", 148)
      h
    }
    def pad512(b: Array[Byte]): Array[Byte] =
      b ++ new Array[Byte](((512 - b.length % 512) % 512))
    val data = "hello tar".getBytes("UTF-8")
    val big = new Array[Byte](700) // spans two data blocks
    val real = header("docs/a.txt", data.length, '0') ++ pad512(data) ++
      header("docs/", 0, '5') ++
      header("big.bin", big.length, 0.toChar) ++ pad512(big) ++
      new Array[Byte](1024)
    val rows = Seq(Tuple1(real)).toDF("b")
      .select(explode(BinaryOps.tarEntries($"b")).as("e"))
      .select("e.name", "e.size", "e.typeflag", "e.offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // NUL typeflag normalizes to '0'; dir entry has no data blocks;
    // offsets step by header + ceil(size/512) data blocks
    assert(rows.toSeq === Seq(("docs/a.txt", 9L, "0", 0L),
      ("docs/", 0L, "5", 1024L), ("big.bin", 700L, "0", 1536L)))
    // synthetic builder round-trips every declared field
    val syn = spark.range(1).select(explode(BinaryOps.tarEntries(
      BinaryOps.syntheticTar(lit(3)))).as("e"))
      .select("e.name", "e.size", "e.offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(syn.toSeq === Seq(("f0.txt", 1L, 0L), ("f1.txt", 2L, 1024L),
      ("f2.txt", 3L, 2048L)))
    // terminator-only archive lists empty; single zero block accepted
    assert(Seq(Tuple1(new Array[Byte](1024))).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.getSeq[Any](0).isEmpty)
    assert(Seq(Tuple1(new Array[Byte](512))).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.getSeq[Any](0).isEmpty)
    // bad magic / non-octal size / data past the end -> NULL, no throw
    assert(Seq(Tuple1("not a tar at all".getBytes("UTF-8") ++
      new Array[Byte](512))).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.isNullAt(0))
    val badSize = header("x", 1, '0'); badSize(124) = '9'
    assert(Seq(Tuple1(badSize ++ new Array[Byte](1536))).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.isNullAt(0))
    assert(Seq(Tuple1(header("x", 5000, '0'))).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.isNullAt(0))
    // NULL blob -> NULL; SQL surface registered
    assert(Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(BinaryOps.tarEntries($"b")).head.isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT size(graft_tar_entries(unhex(repeat('00', 512))))")
      .head.getInt(0) === 0)
  }

  test("zipEntries: real java.util.zip archives, synthetic round-trip, unreadable -> NULL") {
    // the strong check: a REAL archive from the JDK's writer — the
    // kernel must list what an independent implementation wrote
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.setMethod(java.util.zip.ZipOutputStream.STORED)
    Seq("docs/a.txt" -> "hello", "b.bin" -> "worlds!").foreach {
      case (name, data) =>
        val bytes = data.getBytes("UTF-8")
        val entry = new java.util.zip.ZipEntry(name)
        entry.setMethod(java.util.zip.ZipEntry.STORED)
        entry.setSize(bytes.length)
        val crc = new java.util.zip.CRC32(); crc.update(bytes)
        entry.setCrc(crc.getValue)
        zos.putNextEntry(entry); zos.write(bytes); zos.closeEntry()
    }
    zos.close()
    val real = Seq(Tuple1(bos.toByteArray)).toDF("b")
      .select(explode(BinaryOps.zipEntries($"b")).as("e"))
      .select("e.name", "e.compressed", "e.uncompressed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(real.toSeq === Seq(("docs/a.txt", 5L, 5L), ("b.bin", 7L, 7L)))
    // synthetic builder round-trips every declared field
    val syn = spark.range(1).select(explode(BinaryOps.zipEntries(
      BinaryOps.syntheticZip(lit(3)))).as("e"))
      .select("e.name", "e.uncompressed", "e.local_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(syn.toSeq === Seq(("f0.txt", 1L, 0L), ("f1.txt", 2L, 37L),
      ("f2.txt", 3L, 75L)))
    // zero entries: a valid empty archive lists as an empty array
    assert(spark.range(1).select(BinaryOps.zipEntries(
      BinaryOps.syntheticZip(lit(0)))).head.getSeq[Any](0).isEmpty)
    // r13 ADVICE: > 10 entries would silently corrupt the archive (the
    // "0600" name-length + closed-form offsets assume single-digit
    // indices) — the builder must fail loudly instead
    val boom = intercept[Exception] {
      spark.range(1).select(BinaryOps.syntheticZip(lit(11))).collect()
    }
    assert(boom.getMessage.contains("at most 10 entries") ||
      Option(boom.getCause).exists(_.getMessage.contains("at most 10")))
    // 10 entries (f0..f9) is still within the single-digit contract
    assert(spark.range(1).select(explode(BinaryOps.zipEntries(
      BinaryOps.syntheticZip(lit(10)))).as("e"))
      .select("e.name").count() === 10L)
    // not a zip / truncated central dir -> NULL, never a throw
    assert(Seq(Tuple1("plainly not a zip".getBytes("UTF-8"))).toDF("b")
      .select(BinaryOps.zipEntries($"b")).head.isNullAt(0))
    val truncated = bos.toByteArray.take(30) // local header only, no EOCD
    assert(Seq(Tuple1(truncated)).toDF("b")
      .select(BinaryOps.zipEntries($"b")).head.isNullAt(0))
    // NULL blob -> NULL; SQL surface registered
    assert(Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(BinaryOps.zipEntries($"b")).head.isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT size(graft_zip_entries(x)) FROM (SELECT unhex('504B0506' ||" +
        " '00000000' || '0000' || '0000' || '00000000' || '00000000' ||" +
        " '0000') AS x)").head.getInt(0)
    assert(viaSql === 0)
  }

  test("wavPcmStats: byte round-trip, sign extension, clamping, unreadable -> NULL") {
    def stats(blob: org.apache.spark.sql.Column) =
      spark.range(1).select(BinaryOps.wavPcmStats(blob).as("s"))
        .select("s.n_samples", "s.peak", "s.sum_sq", "s.rms").head
    def wav(samples: Int*) = BinaryOps.syntheticWavPcm(
      lit(1), lit(8000), array(samples.map(v => lit(v)): _*))
    // known waveform incl. the i16 extremes: counts/peak/energy exact,
    // rms = sqrt(sum_sq / n) to the bit
    val r = stats(wav(0, 1000, -1000, 32767, -32768))
    assert(r.getInt(0) === 5 && r.getInt(1) === 32768)
    val ss = 1000L * 1000 * 2 + 32767L * 32767 + 32768L * 32768
    assert(r.getLong(2) === ss)
    assert(r.getDouble(3) === math.sqrt(ss.toDouble / 5))
    // empty data chunk: present but silent of samples
    val e = stats(BinaryOps.syntheticWavPcm(
      lit(1), lit(8000), array().cast("array<int>")))
    assert(e.getInt(0) === 0 && e.isNullAt(1) &&
      e.getLong(2) === 0L && e.isNullAt(3))
    // header-only WAV (no data chunk) and non-PCM format: unreadable
    assert(spark.range(1).select(BinaryOps.wavPcmStats(
      BinaryOps.syntheticWav(lit(1), lit(8000)))).head.isNullAt(0))
    // flip audioFormat to 3 (IEEE float): recognized container,
    // unsupported codec -> NULL, never a misread
    val floatFmt = spark.range(1).select(wav(5, 6).as("b"))
      .select(concat(
        substring(col("b"), 1, 20), unhex(lit("0300")),
        substring(col("b"), 23, 1000)).as("b2"))
      .select(BinaryOps.wavPcmStats(col("b2"))).head
    assert(floatFmt.isNullAt(0))
    // truncated capture: declared data size larger than bytes present
    // -> stats over the bytes that ARE there (drop the last byte, so
    // the final complete sample is also gone)
    val trunc = spark.range(1).select(wav(100, 200, 300).as("b"))
      .select(BinaryOps.wavPcmStats(
        substring(col("b"), 1, 49)).as("s")) // 44-byte header + 5 bytes
      .select("s.n_samples", "s.peak").head
    assert(trunc.getInt(0) === 2 && trunc.getInt(1) === 200)
    // NULL blob -> NULL struct; SQL surface registered
    assert(Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(BinaryOps.wavPcmStats($"b")).head.isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_wav_stats(unhex(concat(
           '52494646', '2A000000', '57415645', '666D7420', '10000000',
           '0100', '0100', '401F0000', '803E0000', '0200', '1000',
           '64617461', '06000000', 'E803', '18FC', '0000'))).peak AS p
      """).head.getInt(0)
    assert(viaSql === 1000) // samples 1000, -1000, 0
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.multimodal.Multimodal
import graft.sources.Generator

/** Salted skew join equivalence + multimodal payload plumbing. */
class SkewMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on a hot-keyed workload") {
    // hotCountry=true: every left row carries the 'Peru' hot key.
    val fact = Generator.transactions(spark, 2000)
      .withColumn("country", lit("Peru"))
    val dim = Seq(("Peru", "LATAM"), ("Germany", "EMEA")).toDF("country", "region")
    val plain = fact.join(dim, Seq("country"))
    val salted = Skew.saltedJoin(fact, dim, Seq("country"),
      spreadBy = col("transaction_id"), buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salted shuffle key actually spreads the hot key
    val spread = fact.withColumn("s",
      pmod(xxhash64(col("transaction_id")), lit(8)))
      .groupBy($"s").count().count()
    assert(spread == 8)
  }

  test("multimodal payloads: bytes round-trip and metadata is typed") {
    val p = Multimodal.withPayload(spark, sf0001)
    val row = p.orderBy($"doc_id").head()
    val meta = row.getStruct(2)
    assert(Seq("image/png", "audio/wav", "video/mp4")
      .contains(meta.getAs[String]("mime")))
    assert(meta.getAs[Int]("width") >= 64 && meta.getAs[Int]("n_frames") >= 1)
    // payload is the UTF-8 text bytes
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy($"doc_id").head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8")
      == docs.getAs[String]("text"))
  }

  test("featureExtractStub: deterministic fixed-dim features per doc") {
    val feats = Multimodal.featureExtractStub(
      Multimodal.withPayload(spark, sf0001), dim = 8)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(feats.count() == n)
    val a = feats.orderBy(col("doc_id")).head()
    val b = Multimodal.featureExtractStub(
      Multimodal.withPayload(spark, sf0001), dim = 8)
      .orderBy(col("doc_id")).head()
    assert(a.getSeq[Float](1).toList == b.getSeq[Float](1).toList)
    assert(a.getSeq[Float](1).length == 8)
  }

  test("resizeImages is total over a non-decodable corpus: pass-through") {
    // Fixture payloads are text bytes — no JDK codec decodes them, so
    // every row must survive untouched with the -1 no-image marker
    // (the operator never drops or corrupts rows it cannot decode).
    val p = Multimodal.withPayload(spark, sf0001)
    val r = Multimodal.resizeImages(p, maxSide = 256)
    assert(r.count() == p.count())
    val bad = r.join(p.select($"doc_id", $"payload".as("orig")), "doc_id")
      .where($"width" =!= -1 || $"height" =!= -1 || $"resized" ||
        $"payload" =!= $"orig")
    assert(bad.isEmpty)
  }

  /** Deterministic 16x16 PNG: left half pure black, right half pure
    * white — every positional luminance bucket and channel mean has an
    * exact closed-form value, so the decode assertions are equality,
    * not tolerance. */
  private def halfWhitePng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("featureExtract decodes REAL pixels from a PNG payload") {
    val png = halfWhitePng()
    val df = Seq((1L, png)).toDF("doc_id", "payload")
    val feat = Multimodal.featureExtract(df, dim = 8)
      .head().getSeq[Float](1)
    // Row-major buckets of 32 px each: every bucket spans 2 full rows,
    // each half black (lum 0) / half white (lum exactly 1.0 — 255 *
    // (299+587+114) / 255000), so every bucket mean is exactly 0.5.
    assert(feat.toList == List.fill(8)(0.5f))
  }

  test("imageStats reports true decoded dims and channel means") {
    val png = halfWhitePng()
    val df = Seq((1L, png)).toDF("doc_id", "payload")
    val r = Multimodal.imageStats(df).head()
    assert(r.getInt(1) == 16 && r.getInt(2) == 16)
    // Half 0x00, half 0xff per channel: mean exactly 127.5.
    assert(r.getDouble(3) == 127.5 && r.getDouble(4) == 127.5 &&
      r.getDouble(5) == 127.5)
    // Text-byte payloads decode as no image and are absent here.
    assert(Multimodal.imageStats(
      Multimodal.withPayload(spark, sf0001)).isEmpty)
  }

  test("resizeImages really resamples: output re-decodes at box dims") {
    val src = new java.awt.image.BufferedImage(
      64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64)
      img2rgb(src, x, y)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val df = Seq((1L, bos.toByteArray), (2L, "not an image".getBytes("UTF-8")),
      (3L, halfWhitePng()))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, maxSide = 16)
      .orderBy($"doc_id").collect()
    // decodable payload: resampled to 16x8 and the new bytes re-decode
    assert(out(0).getInt(2) == 16 && out(0).getInt(3) == 8 &&
      out(0).getBoolean(4))
    val redecoded = Multimodal.decodeImage(out(0).getAs[Array[Byte]](1)).get
    assert(redecoded.getWidth == 16 && redecoded.getHeight == 8)
    // KNOWN-IMAGE PIXEL MEANS (VERDICT r5 ask #6): the area-average is
    // pure integer math, so the 4×4 block means of the linear gradients
    // have closed forms — r(x=k) = mean(16k + {0,4,8,12}) = 16k+6,
    // g(y=j) = mean(32j + {0,8,16,24}) = 32j+12, b = 0x40 constant.
    // Equality, not tolerance: this is what makes the resample testable
    // (Java2D interpolation output is pipeline-dependent).
    for (j <- 0 until 8; k <- 0 until 16) {
      val p = redecoded.getRGB(k, j)
      assert(((p >> 16) & 0xff) == 16 * k + 6, s"r at ($k,$j)")
      assert(((p >> 8) & 0xff) == 32 * j + 12, s"g at ($k,$j)")
      assert((p & 0xff) == 0x40, s"b at ($k,$j)")
    }
    // non-decodable payload: untouched pass-through, -1 dims marker
    assert(!out(1).getBoolean(4) && out(1).getInt(2) == -1 &&
      new String(out(1).getAs[Array[Byte]](1), "UTF-8") == "not an image")
    // decodable but already within the box: TRUE dims, original bytes,
    // resized=false (a valid image must never look like a non-image)
    assert(out(2).getInt(2) == 16 && out(2).getInt(3) == 16 &&
      !out(2).getBoolean(4) &&
      java.util.Arrays.equals(out(2).getAs[Array[Byte]](1), halfWhitePng()))
  }

  private def img2rgb(img: java.awt.image.BufferedImage, x: Int, y: Int): Unit =
    img.setRGB(x, y, ((x * 4) << 16) | ((y * 8) << 8) | 0x40)

  test("perceptual image dedup: dHash is tone-shift invariant on " +
      "different bytes; banded neighbors are radius-3 COMPLETE against " +
      "brute force") {
    // Twin mints: same visual structure, +1 global tone shift →
    // different PNG bytes, identical 56-bit dHash.
    val a = Multimodal.mintGridPng(42L)
    val b = Multimodal.mintGridPng(43L)
    assert(!java.util.Arrays.equals(a, b), "twin PNGs byte-identical")
    def hOf(bytes: Array[Byte]): Long =
      Multimodal.dhash56(Multimodal.decodeImage(bytes).get)
    assert(hOf(a) == hOf(b), "tone shift flipped a dHash comparison")
    assert(hOf(a) != hOf(Multimodal.mintGridPng(44L)),
      "structurally different images collided (degenerate fixture)")
    // Completeness over the fixture corpus: the banded pair set equals
    // the brute-force hamming<=3 join over the same signatures.
    val corpus = Multimodal.imageCorpus(spark, sf0001).localCheckpoint()
    val got = Multimodal.imageNearDup(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = Multimodal.imageSignatures(corpus)
      .select("doc_id", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (da, ha) <- hs; (db, hb) <- hs if da < db
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 3
    } yield (da, db, hd)).toSet
    assert(got == want,
      "banded image near-dup missed (or invented) a radius-3 pair")
    // Every tone-shift twin present at Hamming 0.
    val ids = hs.map(_._1).toSet
    ids.filter(d => d % 2 == 0 && ids.contains(d + 1)).foreach { d =>
      assert(got.contains((d, d + 1, 0)), s"twin pair ($d, ${d + 1}) missed")
    }
  }

  test("featureExtract falls back to the byte-fold stub off the image path") {
    val p = Multimodal.withPayload(spark, sf0001)
    val real = Multimodal.featureExtract(p, dim = 8)
    val stub = Multimodal.featureExtractStub(p, dim = 8)
    // fixture payloads are text bytes — none decode, so the real path
    // must agree with the stub bit-for-bit on every row
    val joined = real.select($"doc_id", $"feature".as("fa"))
      .join(stub.select($"doc_id", $"feature".as("fb")), "doc_id")
    assert(joined.where($"fa" =!= $"fb").isEmpty)
  }

  test("decodeWav inverts mintWav exactly: header fields and every sample") {
    val samples = Array.tabulate(300)(i =>
      (Math.floorMod(i.toLong * 104729L, 65536L) - 32768L).toShort)
    val wav = Multimodal.decodeWav(Multimodal.mintWav(samples, 8000)).get
    assert(wav.nChannels == 1 && wav.sampleRate == 8000 &&
      wav.bitDepth == 16 && wav.nFrames == 300)
    assert(wav.channels(0).sameElements(samples.map(_.toInt)))
    // stereo interleave: channel c frame f == samples(2f + c)
    val st = Multimodal.decodeWav(
      Multimodal.mintWav(samples, 16000, nChannels = 2)).get
    assert(st.nChannels == 2 && st.nFrames == 150)
    assert(st.channels(0).sameElements((0 until 150).map(f => samples(2 * f).toInt)) &&
      st.channels(1).sameElements((0 until 150).map(f => samples(2 * f + 1).toInt)))
  }

  test("decodeWav is total: junk, truncated, and non-PCM bytes yield None") {
    val good = Multimodal.mintWav(Array[Short](1, -1, 100), 8000)
    assert(Multimodal.decodeWav(good).isDefined)
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav("not a riff file at all....".getBytes).isEmpty)
    assert(Multimodal.decodeWav(good.take(30)).isEmpty) // truncated header
    val badFmt = good.clone(); badFmt(20) = 3 // IEEE-float format tag
    assert(Multimodal.decodeWav(badFmt).isEmpty)
    // a data chunk whose declared size overruns the buffer
    val overrun = good.clone(); overrun(43) = 0x7f
    assert(Multimodal.decodeWav(overrun).isEmpty)
  }

  test("audioStats closed-form: constant and alternating signals") {
    // constant 1000: rms = 1000 exactly, no crossings; alternating
    // ±20000: rms = 20000, a crossing at every step.
    val const = Array.fill[Short](80)(1000)
    val alt = Array.tabulate[Short](80)(i => if (i % 2 == 0) 20000 else -20000)
    val df = Seq(
      (1L, Multimodal.mintWav(const, 8000)),
      (2L, Multimodal.mintWav(alt, 12000))).toDF("doc_id", "payload")
    val rows = Multimodal.audioStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val c = rows(1L)
    assert(c.getAs[Long]("n_frames") == 80 && c.getAs[Int]("peak_abs") == 1000 &&
      c.getAs[Long]("zero_crossings") == 0 && c.getAs[Double]("rms") == 1000.0)
    val a = rows(2L)
    assert(a.getAs[Int]("sample_rate") == 12000 &&
      a.getAs[Long]("zero_crossings") == 79 && a.getAs[Double]("rms") == 20000.0)
  }

  test("featureExtract routes WAV payloads through the real PCM path") {
    // First half silent, second half full-scale square wave: the
    // 2-bucket RMS profile is exactly (0, 16384/32768 = 0.5) — a value
    // the byte-fold stub cannot produce from these bytes.
    val samples = Array.tabulate[Short](200)(i =>
      if (i < 100) 0 else if (i % 2 == 0) 16384 else -16384)
    val df = Seq((7L, Multimodal.mintWav(samples, 8000))).toDF("doc_id", "payload")
    val f = Multimodal.featureExtract(df, dim = 2).head().getSeq[Float](1)
    assert(f == Seq(0f, 0.5f))
  }

  test("WAV round-trip property: arbitrary PCM survives mint→decode (20 cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nCh <- Gen.chooseNum(1, 3)
      nFrames <- Gen.chooseNum(1, 400)
      rate <- Gen.chooseNum(1, 192000)
      samples <- Gen.listOfN(nCh * nFrames,
        Gen.chooseNum(Short.MinValue, Short.MaxValue))
    } yield (nCh, rate, samples.map(_.toShort).toArray)
    (1L to 20L).foreach { seed =>
      val (nCh, rate, samples) =
        gen.pureApply(Gen.Parameters.default, Seed(seed))
      val wav = Multimodal.decodeWav(
        Multimodal.mintWav(samples, rate, nCh)).get
      assert(wav.nChannels == nCh && wav.sampleRate == rate &&
        wav.bitDepth == 16 && wav.nFrames == samples.length / nCh)
      (0 until nCh).foreach { c =>
        assert(wav.channels(c).sameElements(
          (0 until wav.nFrames).map(f => samples(f * nCh + c).toInt)),
          s"channel $c mismatch at seed $seed")
      }
    }
  }

  test("decodeWav totality fuzz: random junk and mutated WAVs never throw") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val junk = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    (1L to 50L).foreach { seed =>
      val bytes = junk.pureApply(Gen.Parameters.default, Seed(seed))
        .map(_.toByte).toArray
      Multimodal.decodeWav(bytes) // must not throw, result irrelevant
    }
    // Single-byte mutations of a VALID wav: every position, three values.
    val good = Multimodal.mintWav(Array.tabulate[Short](40)(i =>
      (i * 997 - 20000).toShort), 8000)
    good.indices.foreach { i =>
      Seq(0x00, 0x7f, 0xff).foreach { v =>
        val m = good.clone(); m(i) = v.toByte
        Multimodal.decodeWav(m) // totality, not correctness
      }
    }
  }

  test("decodeWav sign extension at 8 and 24 bit depths") {
    def header(bits: Int, dataLen: Int): java.nio.ByteBuffer = {
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes); bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(8000)
      bb.putInt(8000 * bits / 8); bb.putShort((bits / 8).toShort)
      bb.putShort(bits.toShort)
      bb.put("data".getBytes); bb.putInt(dataLen)
      bb
    }
    // 8-bit WAV stores UNSIGNED bytes; decode centers to signed.
    val w8 = header(8, 3)
    Seq(0, 128, 255).foreach(v => w8.put(v.toByte))
    assert(Multimodal.decodeWav(w8.array()).get.channels(0)
      .sameElements(Array(-128, 0, 127)))
    // 24-bit little-endian signed: 1, min (0x800000), -1 (0xFFFFFF).
    val w24 = header(24, 9)
    Seq(Seq(1, 0, 0), Seq(0, 0, 0x80), Seq(0xff, 0xff, 0xff))
      .flatten.foreach(b => w24.put(b.toByte))
    assert(Multimodal.decodeWav(w24.array()).get.channels(0)
      .sameElements(Array(1, -8388608, -1)))
  }

  test("modalityStats routes a mixed corpus: PNG→image, WAV→audio, " +
      "MP4→video, text→binary") {
    val df = Seq(
      (0L, Multimodal.mintSolidPng(10, 4, (200, 100, 50))),
      (1L, Multimodal.mintWav(Array.fill[Short](60)(3000), 8000)),
      (2L, "just some text bytes".getBytes("UTF-8")),
      (3L, Multimodal.mintMp4(600L, 1500L, Seq((320, 240)),
        new Array[Byte](16)))).toDF("doc_id", "payload")
    val rows = Multimodal.modalityStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val img = rows(0L)
    assert(img.getString(1) == "image" && img.getInt(2) == 10 &&
      img.getInt(3) == 4 && img.getDouble(4) == 200.0 &&
      img.getDouble(5) == 100.0 && img.getDouble(6) == 50.0)
    val au = rows(1L)
    assert(au.getString(1) == "audio" && au.getLong(7) == 60 &&
      au.getDouble(8) == 3000.0)
    val bin = rows(2L)
    assert(bin.getString(1) == "binary" && bin.isNullAt(2) &&
      bin.isNullAt(8) && bin.isNullAt(9))
    val vid = rows(3L)
    assert(vid.getString(1) == "video" && vid.getInt(2) == 320 &&
      vid.getInt(3) == 240 && vid.getDouble(9) == 2.5 &&
      vid.isNullAt(7))
  }

  test("frame sampling: stride covers [0, n) with at most ~8 samples") {
    val df = Seq(1, 7, 8, 9, 240).toDF("n")
      .select($"n", Multimodal.frameSampleIndices($"n").as("idx"))
    df.collect().foreach { r =>
      val n = r.getInt(0)
      val idx = r.getSeq[Int](1)
      assert(idx.head == 0 && idx.last < n && idx.length <= 9)
    }
  }

  test("decodeMp4Meta inverts mintMp4 exactly: brand, clock, tracks, " +
      "dims — across the closed-form generator grid") {
    // One hand-picked case, then the generator over a modulus-covering
    // doc_id range (the exact frames q_video_meta hashes).
    val m = Multimodal.decodeMp4Meta(Multimodal.mintMp4(
      600L, 12345L, Seq((640, 360), (0, 0)), new Array[Byte](32))).get
    assert(m == Multimodal.Mp4Meta("isom", 600L, 12345L, 2, 640, 360))
    (0L until 300L).foreach { d =>
      val (w, h) = Multimodal.mp4DimsFor(d)
      val dims = (w, h) +: Seq.fill(Multimodal.mp4TracksFor(d) - 1)((0, 0))
      val bytes = Multimodal.mintMp4(Multimodal.mp4TimescaleFor(d),
        Multimodal.mp4DurationFor(d), dims,
        new Array[Byte](Multimodal.mp4MdatLenFor(d)))
      // the writer's byte-layout identity the oracle restates
      assert(bytes.length ==
        148 + 100 * Multimodal.mp4TracksFor(d) + Multimodal.mp4MdatLenFor(d))
      val got = Multimodal.decodeMp4Meta(bytes).get
      assert(got == Multimodal.Mp4Meta("isom",
        Multimodal.mp4TimescaleFor(d), Multimodal.mp4DurationFor(d),
        Multimodal.mp4TracksFor(d), w, h), s"doc $d")
    }
  }

  test("decodeMp4Meta reads version-1 mvhd and tkhd layouts") {
    // Hand-built 64-bit-field variant (the minter writes v0): moov
    // holding a v1 mvhd (8-byte creation/modification/duration) and a
    // v1 tkhd; the parser must land on the shifted offsets.
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bb = java.nio.ByteBuffer.allocate(24 + 8 + 120 + 112)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(24).put("ftyp".getBytes(ascii))
      .put("isom".getBytes(ascii)).putInt(512)
      .put("isom".getBytes(ascii)).put("mp41".getBytes(ascii))
    bb.putInt(8 + 120 + 112).put("moov".getBytes(ascii))
    bb.putInt(120).put("mvhd".getBytes(ascii))
      .putInt(0x01000000)            // version 1
      .putLong(0L).putLong(0L)       // creation, modification (64-bit)
      .putInt(90000)                 // timescale
      .putLong(5000000000L)          // duration (64-bit)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putLong(0L)
    (0 until 9).foreach(i => bb.putInt(if (i % 4 == 0) 0x00010000 else 0))
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    bb.putInt(112).put("trak".getBytes(ascii))
    bb.putInt(104).put("tkhd".getBytes(ascii))
      .putInt(0x01000007)            // version 1, enabled
      .putLong(0L).putLong(0L)       // creation, modification
      .putInt(1).putInt(0)           // track_id, reserved
      .putLong(5000000000L)          // duration (64-bit)
      .putLong(0L)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    (0 until 9).foreach(i => bb.putInt(if (i % 4 == 0) 0x00010000 else 0))
    bb.putInt(1920 << 16).putInt(1080 << 16)
    val got = Multimodal.decodeMp4Meta(bb.array()).get
    assert(got == Multimodal.Mp4Meta("isom", 90000L, 5000000000L,
      1, 1920, 1080))
  }

  test("decodeMp4Meta is total: junk, cross-format, truncated, and " +
      "size-corrupt bytes yield None") {
    val good = Multimodal.mintMp4(600L, 1000L, Seq((320, 240)),
      new Array[Byte](16))
    assert(Multimodal.decodeMp4Meta(good).isDefined)
    assert(Multimodal.decodeMp4Meta(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeMp4Meta(
      "definitely not an mp4 container".getBytes).isEmpty)
    // other REAL formats route to the fallback, never parse
    assert(Multimodal.decodeMp4Meta(
      Multimodal.mintWav(Array[Short](1, 2, 3), 8000)).isEmpty)
    assert(Multimodal.decodeMp4Meta(
      Multimodal.mintSolidPng(8, 8, (1, 2, 3))).isEmpty)
    assert(Multimodal.decodeMp4Meta(good.take(40)).isEmpty) // truncated
    // a box whose declared size overruns the buffer
    val overrun = good.clone(); overrun(27) = 0x7f
    assert(Multimodal.decodeMp4Meta(overrun).isEmpty)
    // boxes must tile exactly: trailing garbage is malformed
    assert(Multimodal.decodeMp4Meta(good ++ Array[Byte](1, 2, 3)).isEmpty)
  }
}

package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.ImageRow
import org.apache.spark.sql.functions._

/** Multimodal kernels: REAL javax.imageio decode/resize over synthetic
  * PNGs, real frame extraction from the length-prefixed video container,
  * plus the metadata-plumbing shape (asMediaTable / sampleFrames).
  */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private def docs = Seq((0L, "alpha"), (1L, "bravo"), (2L, "charlie video doc"))
    .toDF("doc_id", "text")

  test("syntheticPng is a real PNG: ImageIO round-trips dims and color") {
    val bytes = MultimodalOps.syntheticPng(seed = 5L, w = 11, h = 7)
    // PNG signature
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img.getWidth == 11 && img.getHeight == 7)
    val (r, g, b) = MultimodalOps.channels(5L)
    val rgb = img.getRGB(3, 2)
    assert(((rgb >> 16) & 0xff) == r && ((rgb >> 8) & 0xff) == g && (rgb & 0xff) == b)
  }

  test("decodeImages: dims and channel means come from the decoded raster") {
    val out = MultimodalOps.decodeImages(MultimodalOps.asImageTable(docs, "doc_id"))
      .collect().sortBy(_.mediaId)
    assert(out.length == 3)
    out.foreach { d =>
      val (w, h) = MultimodalOps.dimsFor(d.mediaId)
      val (r, g, b) = MultimodalOps.channels(d.mediaId)
      assert(d.width == w && d.height == h)
      assert(d.meanR == r.toDouble && d.meanG == g.toDouble && d.meanB == b.toDouble)
    }
  }

  test("decodeImages isolates undecodable blobs (row dropped, task survives)") {
    val mixed = Seq(
      ImageRow(1L, MultimodalOps.syntheticPng(1L, 8, 8)),
      ImageRow(2L, "definitely not a png".getBytes("UTF-8")),
      ImageRow(3L, Array[Byte]())
    ).toDS()
    val out = MultimodalOps.decodeImages(mixed).collect()
    assert(out.map(_.mediaId).toSet == Set(1L))
  }

  test("resizeImages: aspect-preserving downscale, re-encoded and re-decodable") {
    val images = MultimodalOps.asImageTable(docs, "doc_id")
    val resized = MultimodalOps.resizeImages(images, maxW = 16, maxH = 12)
    val out = MultimodalOps.decodeImages(resized).collect().sortBy(_.mediaId)
    assert(out.length == 3)
    out.foreach { d =>
      val (w0, h0) = MultimodalOps.dimsFor(d.mediaId)
      val scale = math.min(math.min(16.0 / w0, 12.0 / h0), 1.0)
      assert(d.width == math.max(1, math.floor(w0 * scale).toInt))
      assert(d.height == math.max(1, math.floor(h0 * scale).toInt))
      assert(d.width <= 16 && d.height <= 12)
      // solid fill survives interpolation exactly
      val (r, g, b) = MultimodalOps.channels(d.mediaId)
      assert(d.meanR == r.toDouble && d.meanG == g.toDouble && d.meanB == b.toDouble)
    }
  }

  test("sampleVideoFrames: real per-frame PNG decode at the given stride") {
    val videos = MultimodalOps.asVideoTable(docs, "doc_id")
    val frames = MultimodalOps.sampleVideoFrames(videos, stride = 2)
      .collect().sortBy(f => (f.mediaId, f.frameIdx))
    // doc 0 → 2 frames (idx 0), doc 1 → 3 frames (0,2), doc 2 → 4 frames (0,2)
    assert(frames.map(f => (f.mediaId, f.frameIdx)).toSeq ==
      Seq((0L, 0), (1L, 0), (1L, 2), (2L, 0), (2L, 2)))
    frames.foreach { f =>
      val (r, g, b) = MultimodalOps.channels(f.mediaId * 1000 + f.frameIdx)
      assert(f.meanR == r.toDouble && f.meanG == g.toDouble && f.meanB == b.toDouble)
    }
  }

  test("sampleVideoFrames skips corrupt containers without failing the task") {
    val mixed = Seq(
      ImageRow(7L, MultimodalOps.syntheticVideo(7L, 2)),
      ImageRow(8L, "garbage".getBytes("UTF-8"))
    ).toDS()
    val out = MultimodalOps.sampleVideoFrames(mixed, stride = 1).collect()
    assert(out.map(_.mediaId).toSet == Set(7L) && out.length == 2)
  }

  test("decodeAudio: rate/frames from the RIFF header, stats from real PCM frames") {
    val out = MultimodalOps.decodeAudio(MultimodalOps.asAudioTable(docs, "doc_id"))
      .collect().sortBy(_.mediaId)
    assert(out.length == 3)
    out.foreach { a =>
      val n = MultimodalOps.sampleCountFor(a.mediaId)
      val samples = (0 until n).map(i => math.abs(MultimodalOps.sampleAt(a.mediaId, i)))
      assert(a.sampleRateHz == 8000)
      assert(a.nSamples == n.toLong)
      assert(a.meanAbs == samples.map(_.toLong).sum.toDouble / n)
      assert(a.peak == samples.max)
    }
  }

  test("decodeAudio skips non-WAV blobs without failing the task") {
    val mixed = Seq(
      ImageRow(1L, MultimodalOps.syntheticWav(1L, 50)),
      ImageRow(2L, "not audio at all".getBytes("UTF-8"))
    ).toDS()
    val out = MultimodalOps.decodeAudio(mixed).collect()
    assert(out.map(_.mediaId).toSet == Set(1L))
  }

  test("asMediaTable: opaque binary + typed metadata struct") {
    val m = MultimodalOps.asMediaTable(docs, "doc_id", "text").collect()
    val byId = m.map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(new String(byId(0L).getAs[Array[Byte]]("content"), "UTF-8") == "alpha")
    val meta = byId(2L).getStruct(byId(2L).fieldIndex("meta"))
    assert(meta.getAs[String]("mediaType") == "video") // doc_id % 3 == 2
    assert(meta.getAs[Long]("byteLen") == "charlie video doc".length.toLong)
  }

  test("sampleFrames: video rows only, capped frame count, step spacing") {
    val m = MultimodalOps.asMediaTable(docs, "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(m, everyMs = 500L, maxFrames = 4)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_ts_ms")))
    assert(frames.forall(_._1 == 2L)) // only the video row
    val ts = frames.map(_._2).sorted
    assert(ts.length <= 4 && ts.zip(ts.drop(1)).forall { case (a, b) => b - a == 500L })
  }

  test("extractDocText: real DEFLATE round trip reproduces the page text") {
    val blobs = Seq(ImageRow(5L, MultimodalOps.syntheticDoc(5L))).toDS()
    val out = MultimodalOps.extractDocText(blobs).collect()
    assert(out.length == 1)
    val d = out.head
    // id 5: 2 pages, 8 filler words -> 12 words per page
    assert(d.nPages == 2L && d.nWords == 24L)
    val expected = (0 until 2).map(p => MultimodalOps.pageText(5L, p)).mkString("\n")
    assert(d.nChars == expected.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(d.textMd5 == hex)
  }

  test("imageDHash reads gradient directions off the DECODED raster (known-value)") {
    // id 6 -> family 2, variant 0: every row's bits are mix8(16+y); the
    // hash must equal the closed-form bands even though the kernel only
    // ever sees PNG bytes
    def mix8(v: Long): Int = {
      val p = 999983L; val w = v % p
      ((((w * w % p) * w % p) * 69069L % p) % 256L).toInt
    }
    val ids = Seq(6L, 7L, 8L) // one full family
    val hashed = MultimodalOps.imageDHash(
      ids.map(id => ImageRow(id, MultimodalOps.syntheticGradientPng(id))).toDS())
      .collect().map(h => h.mediaId -> h).toMap
    ids.foreach { id =>
      val bits = (0 until 8).map(y => mix8(id / 3 * 8 + y) ^ (if (y == 7) (id % 3).toInt else 0))
      val h = hashed(id)
      assert(Seq(h.band0, h.band1, h.band2, h.band3) ==
        (0 until 4).map(b => bits(2 * b) | (bits(2 * b + 1) << 8)),
        s"id $id decoded hash != closed form")
    }
    // the planted family structure: variants differ ONLY in band3, by
    // the variant xor (1-2 bits)
    assert(hashed(6L).band0 == hashed(7L).band0 && hashed(6L).band2 == hashed(8L).band2)
    assert(Integer.bitCount(hashed(6L).band3 ^ hashed(7L).band3) == 1)
    assert(Integer.bitCount(hashed(7L).band3 ^ hashed(8L).band3) == 2)
  }

  test("imageDHash drops undecodable and too-small blobs per-row") {
    val rows = Seq(
      ImageRow(1L, MultimodalOps.syntheticGradientPng(1L)),
      ImageRow(2L, "junk".getBytes("UTF-8")),
      ImageRow(3L, MultimodalOps.syntheticPng(3L, 4, 4)) // < 9x8 window
    ).toDS()
    assert(MultimodalOps.imageDHash(rows).collect().map(_.mediaId).toSet == Set(1L))
  }

  test("imageNearDups finds exactly the planted families; pair-band recall exact to distance 2") {
    val ids = (0L until 30L)
    val hashes = MultimodalOps.imageDHash(
      ids.map(id => ImageRow(id, MultimodalOps.syntheticGradientPng(id))).toDS())
    val pairs = MultimodalOps.imageNearDups(hashes, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every intra-family pair present with the constructed distance...
    val expected = ids.groupBy(_ / 3).values.flatMap { fam =>
      val s = fam.sorted
      Seq((s(0), s(1), 1), (s(0), s(2), 1), (s(1), s(2), 2))
    }.toSet
    assert(pairs.toSet.filter(p => p._1 / 3 == p._2 / 3) == expected)
    // ...and any cross-family survivor is a genuine hash near-collision
    pairs.filterNot(p => p._1 / 3 == p._2 / 3).foreach { case (_, _, d) =>
      assert(d <= 2)
    }
  }

  test("imageNearDupProbe: batch answers against corpus reps; never a corpus self-join") {
    val corpusIds = (0L until 30L)
    val corpus = MultimodalOps.imageDHash(
      corpusIds.map(id => ImageRow(id, MultimodalOps.syntheticGradientPng(id))).toDS())
    // re-crawl image 4 (family 1, variant 1) under a new id: the probe
    // must answer its exact match at dist 0 and its two family
    // siblings at the constructed distances — and nothing else unless
    // it is a genuine hash near-collision
    val batch = MultimodalOps.imageDHash(
      Seq(ImageRow(1000L, MultimodalOps.syntheticGradientPng(4L))).toDS())
    val out = MultimodalOps.imageNearDupProbe(corpus, batch, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val family = out.filter(p => p._2 / 3 == 1L).toSet
    assert(family == Set((1000L, 3L, 1), (1000L, 4L, 0), (1000L, 5L, 2)),
      s"expected the family answers, got $family")
    out.filterNot(p => p._2 / 3 == 1L).foreach { case (_, _, d) => assert(d <= 2) }
  }

  test("the probe core is modality-agnostic: audio and video re-ingests answer admission (q270/q271 shape)") {
    // identical-content re-ingests under fresh ids must answer at
    // dist 0 through the corpus rep for EVERY fingerprint modality —
    // the probe core never sees which kernel produced the bands
    val corpusIds = (0L until 30L)
    def check(label: String, print: Long => Array[Byte],
              fingerprint: org.apache.spark.sql.Dataset[ImageRow] => org.apache.spark.sql.Dataset[MultimodalOps.ImageHash]): Unit = {
      val corpus = fingerprint(corpusIds.map(id => ImageRow(id, print(id))).toDS())
      val batch = fingerprint(Seq(ImageRow(1000L, print(7L))).toDS())
      val out = MultimodalOps.imageNearDupProbe(corpus, batch, maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val exact = out.filter(_._3 == 0)
      assert(exact.nonEmpty && exact.forall { case (b, c, _) => b == 1000L && c <= 7L },
        s"$label: exact re-ingest must answer at dist 0 via a rep <= its id, got ${exact.toSeq}")
      out.foreach { case (_, _, dist) => assert(dist <= 2, s"$label leaked dist $dist") }
    }
    check("audio", MultimodalOps.syntheticWavFamily,
      ds => MultimodalOps.audioFingerprint(ds))
    check("video", MultimodalOps.syntheticVideoFamily,
      ds => MultimodalOps.videoFingerprint(ds))
  }

  test("audioFingerprint reads energy deltas off REAL decoded PCM (known-value vs closed form)") {
    // mirror the construction: window w's energy is exactly
    // windowAmp(family, w, variant), so bit w = amp rises w → w+1 —
    // the kernel must reproduce this from actual WAV bytes through the
    // cross-multiplied sum/count comparison
    def expected(id: Long): Seq[Int] = {
      val family = id / 3; val v = (id % 3).toInt
      val bands = new Array[Int](4)
      (0 until 64).foreach { w =>
        if (MultimodalOps.windowAmp(family, w + 1, v) > MultimodalOps.windowAmp(family, w, v))
          bands(w / 16) |= 1 << (w % 16)
      }
      bands.toSeq
    }
    val ids = Seq(9L, 10L, 11L, 30L) // one full family + a stranger
    val prints = MultimodalOps.audioFingerprint(
      ids.map(id => ImageRow(id, MultimodalOps.syntheticWavFamily(id))).toDS())
      .collect().map(h => h.mediaId -> h).toMap
    ids.foreach { id =>
      val h = prints(id)
      assert(Seq(h.band0, h.band1, h.band2, h.band3) == expected(id),
        s"id $id decoded fingerprint != closed form")
    }
    // the planted structure: family members share every window but the
    // last, so prints differ in at most bit 63 (band3's top bit)
    assert(prints(9L).band0 == prints(10L).band0 &&
      prints(10L).band1 == prints(11L).band1 && prints(9L).band2 == prints(11L).band2)
    Seq((9L, 10L), (9L, 11L), (10L, 11L)).foreach { case (a, b) =>
      val d = Integer.bitCount(prints(a).band3 ^ prints(b).band3)
      assert(d <= 1, s"family prints must differ in at most bit 63, got $d for ($a,$b)")
    }
    // sub-65-sample and undecodable blobs drop per-row
    val edge = Seq(
      ImageRow(100L, MultimodalOps.syntheticWav(1L, 30)),
      ImageRow(101L, "junk".getBytes("UTF-8")),
      ImageRow(102L, MultimodalOps.syntheticWavFamily(0L))).toDS()
    assert(MultimodalOps.audioFingerprint(edge).collect().map(_.mediaId).toSet == Set(102L))
  }

  test("WAV interop: the lock-free RIFF writer/parser and the JDK codec agree byte-for-byte") {
    // the hot fingerprint path parses WAVs without AudioSystem (whose
    // provider lookup holds a JVM-global lock — 31/32 executor threads
    // measured BLOCKED on it); the two decode paths must agree on the
    // same bytes, and the JDK reader accepting our writer's output is
    // the proof the bytes are real WAVs
    val samples = Array.tabulate(200)(i => MultimodalOps.sampleAt(7L, i))
    val wav = MultimodalOps.syntheticWav(7L, 200)
    assert(MultimodalOps.parseWavPcm16Mono(wav).toSeq == samples.toSeq)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val pcm = ais.readAllBytes()
    val viaJdk = (0 until pcm.length / 2).map(i =>
      (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
    assert(viaJdk == samples.toSeq, "JDK codec must decode the raw writer's bytes identically")
    // malformed inputs throw (callers isolate per-row): truncated data,
    // wrong channel count, missing data chunk
    intercept[Exception] { MultimodalOps.parseWavPcm16Mono(wav.take(30)) }
    intercept[Exception] { MultimodalOps.parseWavPcm16Mono("RIFFxxxxWAVE".getBytes("US-ASCII")) }
  }

  test("imageDHash streams: scan-side hashing + exactly-once per VISUAL CONTENT across micro-batches") {
    // the ingest shape for a streaming image corpus: blobs hash in the
    // narrow map stage (never buffered as state), and dropDuplicates on
    // the 4 band columns keeps one row per visual content — a re-crawled
    // byte-identical image in a later micro-batch is dropped by state,
    // not re-emitted
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[ImageRow]
    val uniq = MultimodalOps.imageDHash(input.toDS())
      .dropDuplicates("band0", "band1", "band2", "band3")
    val q = uniq.writeStream.format("memory").queryName("img_stream")
      .outputMode("append").start()
    try {
      input.addData(
        ImageRow(0L, MultimodalOps.syntheticGradientPng(0L)),
        ImageRow(1L, MultimodalOps.syntheticGradientPng(1L))) // same family, different hash
      q.processAllAvailable()
      assert(spark.table("img_stream").select("mediaId")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
      // a later batch re-ingests image 0's content and adds a new family
      input.addData(
        ImageRow(100L, MultimodalOps.syntheticGradientPng(0L)), // duplicate content, new id
        ImageRow(3L, MultimodalOps.syntheticGradientPng(3L)))
      q.processAllAvailable()
      val ids = spark.table("img_stream").select("mediaId")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 1L, 3L),
        s"the re-crawled content must be dropped by hash state, got $ids")
    } finally q.stop()
  }

  test("videoFingerprint reads per-frame dHashes off REAL decoded frames (known-value vs closed form)") {
    // mirror the construction: frame f row y's gradient directions are
    // videoFrameBits, the frame's dHash bands (rows 2b, 2b+1 → band b)
    // XOR-fold to a 16-bit signature, video band f = frame f's
    // signature — the kernel must reproduce this from actual container
    // bytes through ImageIO decodes of every frame
    def expected(id: Long): Seq[Int] = {
      val family = id / 3; val v = (id % 3).toInt
      (0 until 4).map { f =>
        val bands = new Array[Int](4)
        (0 until 8).foreach { y =>
          bands(y / 2) |= MultimodalOps.videoFrameBits(family, f, y, v) << (8 * (y % 2))
        }
        bands(0) ^ bands(1) ^ bands(2) ^ bands(3)
      }
    }
    val ids = Seq(9L, 10L, 11L, 30L) // one full family + a stranger
    val prints = MultimodalOps.videoFingerprint(
      ids.map(id => ImageRow(id, MultimodalOps.syntheticVideoFamily(id))).toDS())
      .collect().map(h => h.mediaId -> h).toMap
    ids.foreach { id =>
      val h = prints(id)
      assert(Seq(h.band0, h.band1, h.band2, h.band3) == expected(id),
        s"id $id decoded video fingerprint != closed form")
    }
    // the planted structure: family members share frames 0–2, so bands
    // 0–2 agree and band 3 differs in popcount(variant_a ^ variant_b)
    // (1–2) bits — within imageNearDups' exact-recall radius
    Seq((9L, 10L), (9L, 11L), (10L, 11L)).foreach { case (a, b) =>
      assert(prints(a).band0 == prints(b).band0 && prints(a).band1 == prints(b).band1 &&
        prints(a).band2 == prints(b).band2)
      val d = Integer.bitCount(prints(a).band3 ^ prints(b).band3)
      val want = Integer.bitCount((a % 3).toInt ^ (b % 3).toInt)
      assert(d == want, s"family prints must differ in exactly the variant bits, got $d for ($a,$b)")
    }
  }

  test("videoFingerprint is temporal-order-aware; corrupt containers drop per-row") {
    // the same frames in a different order land in different bands —
    // a shot-shuffled re-cut is NOT the same video
    val frames = (0 until 4).map(f =>
      MultimodalOps.gradientPng(y => MultimodalOps.videoFrameBits(5L, f, y, 0)))
    val fwd = MultimodalOps.videoContainer(frames)
    val rev = MultimodalOps.videoContainer(frames.reverse)
    val out = MultimodalOps.videoFingerprint(Seq(
      ImageRow(1L, fwd), ImageRow(2L, rev),
      ImageRow(3L, "not a video".getBytes("UTF-8")),
      ImageRow(4L, fwd.take(10)), // valid magic, truncated frame bytes
      ImageRow(5L, MultimodalOps.videoContainer(Seq("bad png".getBytes("UTF-8")))),
      // allocation bomb: valid magic, frame count 1, declared frame
      // length 2 GB with no bytes behind it — the length guard must
      // fail the row BEFORE allocating (an OutOfMemoryError would kill
      // the task straight through the per-row Try)
      ImageRow(6L, {
        val bos = new java.io.ByteArrayOutputStream()
        val o = new java.io.DataOutputStream(bos)
        o.writeInt(0x47564944); o.writeInt(1); o.writeInt(Int.MaxValue - 8)
        o.flush(); bos.toByteArray
      })
    ).toDS()).collect().map(h => h.mediaId -> h).toMap
    // corrupt rows 3–6 drop (row 5: container parses but no frame
    // decodes; row 6: the declared length exceeds the remaining bytes)
    assert(out.keySet == Set(1L, 2L))
    val a = out(1L); val b = out(2L)
    assert(Seq(a.band0, a.band1, a.band2, a.band3).reverse ==
      Seq(b.band0, b.band1, b.band2, b.band3), "reversal permutes the bands")
    assert((a.band0, a.band1, a.band2, a.band3) != (b.band0, b.band1, b.band2, b.band3),
      "order must change the print (fixture frames are pairwise distinct)")
    // and the guarded near-dup core treats the re-cut as FAR apart: no
    // pair within maxDist 2 (bands disagree in many bits)
    val pairs = MultimodalOps.imageNearDups(
      MultimodalOps.videoFingerprint(Seq(ImageRow(1L, fwd), ImageRow(2L, rev)).toDS()),
      maxDist = 2).collect()
    assert(pairs.isEmpty, s"re-ordered frames must not register as near-dups, got ${pairs.toSeq}")
  }

  test("cross-modal vote outvotes a single-modality coincidence (the q265 composition, non-vacuous)") {
    // the contract fixtures are engineered for hash diversity, so no
    // vote-1 pair exists at any tested SF — this plants the case the
    // HAVING clause exists for: id 100 re-uses id 0's IMAGE bytes
    // verbatim (the re-served thumbnail) while its audio and video come
    // from its own far-away family — image evidence alone must NOT make
    // it an asset-dup suspect, while a true family pair votes 3/3
    val ids = Seq(0L, 1L, 2L, 100L)
    def row(id: Long, mk: Long => Array[Byte], content: Long): ImageRow =
      ImageRow(id, mk(content))
    val images = ids.map(id => row(id, MultimodalOps.syntheticGradientPng,
      if (id == 100L) 0L else id)).toDS()
    val audio = ids.map(id => row(id, MultimodalOps.syntheticWavFamily, id)).toDS()
    val video = ids.map(id => row(id, MultimodalOps.syntheticVideoFamily, id)).toDS()
    def tagged(pairs: org.apache.spark.sql.DataFrame, tag: String) =
      pairs.select(col("id_a"), col("id_b"), lit(tag).as("m"))
    val votes = tagged(MultimodalOps.imageNearDups(MultimodalOps.imageDHash(images)), "image")
      .unionAll(tagged(MultimodalOps.imageNearDups(MultimodalOps.audioFingerprint(audio)), "audio"))
      .unionAll(tagged(MultimodalOps.imageNearDups(MultimodalOps.videoFingerprint(video)), "video"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the coincidence pair exists — in exactly one modality
    assert(votes.get((0L, 100L)).contains(1L),
      s"planted byte-identical image must pair in the image modality alone, got $votes")
    // true family pairs carry all three modalities (audio may certificate
    // via a star edge — still one row per modality)
    assert(votes((0L, 1L)) == 3L && votes((0L, 2L)) == 3L || votes((1L, 2L)) == 3L,
      s"family pairs must corroborate across modalities, got $votes")
    val suspects = votes.filter(_._2 >= 2L).keySet
    assert(!suspects.contains((0L, 100L)), "the single-modality coincidence must be outvoted")
    assert(suspects.exists(p => Set((0L, 1L), (0L, 2L), (1L, 2L)).contains(p)),
      "family pairs must survive the vote")
  }

  test("videoClipMatches catches the clipped re-upload the order-aware print misses (both directions)") {
    // ids 0/1 are a planted clip pair (frames 1-3 shared at shifted
    // positions), ids 2/3 another family's pair; no cross-family match
    val docs4 = Seq(0L, 1L, 2L, 3L).map(id => (id, s"doc$id")).toDF("doc_id", "text")
    val clips = MultimodalOps.asVideoClipTable(docs4, "doc_id")
    val matches = MultimodalOps.videoClipMatches(clips, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(matches == Map((0L, 1L) -> 2, (2L, 3L) -> 2),
      s"each clip pair shares exactly its 2 surviving consecutive-frame shingles, got $matches")
    // the order-aware fingerprint rightly misses the SAME pairs: every
    // frame position shifted, all four bands differ
    val ordered = MultimodalOps.imageNearDups(
      MultimodalOps.videoFingerprint(clips), maxDist = 2).collect()
    assert(ordered.isEmpty,
      s"the positional print must not match shifted clips, got ${ordered.toSeq}")
  }

  test("videoClipMatches pre-groups identical videos (star edges) and caps degenerate shingle buckets") {
    // 40 byte-identical re-uploads of one video + its clip partner:
    // the identical block must become 39 star edges to the min id —
    // never a 40² shingle self-join — and the clip match must still
    // surface through the representative
    val base = MultimodalOps.asVideoClipTable(
      Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text"), "doc_id").collect()
    val even = base.find(_.mediaId == 0L).get.content
    val odd = base.find(_.mediaId == 1L).get.content
    val corpus = (Seq(MultimodalOps.ImageRow(1000L, odd)) ++
      (0 until 40).map(i => MultimodalOps.ImageRow(i.toLong, even))).toDS()
    val out = MultimodalOps.videoClipMatches(corpus, minShared = 2).collect()
    val stars = out.filter(r => r.getLong(0) == 0L && r.getLong(1) != 1000L)
    assert(stars.length == 39 && stars.forall(_.getInt(2) == 3),
      s"identical videos must attach as star edges sharing all 3 shingles, got ${out.toSeq}")
    assert(out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1000L && r.getInt(2) == 2),
      "the clip match must surface through the identical block's representative")
    assert(out.length == 40, s"no other pairs expected, got ${out.toSeq}")
    // a corpus-wide title SEQUENCE (40 DISTINCT videos opening with the
    // same 3 frames — degenerate shingle buckets the pre-grouping
    // cannot collapse): uncapped they pair quadratically (C(40,2)
    // candidates through both title shingles); the cap drops the two
    // degenerate buckets by size and the output is bounded instead
    def titled(id: Long): MultimodalOps.ImageRow = MultimodalOps.ImageRow(id,
      MultimodalOps.videoContainer(
        (0 until 3).map(f => MultimodalOps.gradientPng(y =>
          MultimodalOps.clipFrameBits(900000L, f, y))) :+
          MultimodalOps.gradientPng(y =>
            MultimodalOps.clipFrameBits(900100L + id, 0, y))))
    val titledCorpus = (0 until 40).map(i => titled(i.toLong)).toDS()
    val uncapped = MultimodalOps.videoClipMatches(titledCorpus, minShared = 2)
    assert(uncapped.count() == 40L * 39 / 2,
      "distinct videos sharing the title sequence pair quadratically without the cap")
    val capped = MultimodalOps.videoClipMatches(titledCorpus, minShared = 2, maxBucketSize = 10)
    assert(capped.count() == 0L,
      "the cap must drop the degenerate title-shingle buckets instead of materializing B² pairs")
  }

  test("imageDHashCanonical unites mirror pairs that plain dHash provably separates") {
    val table = MultimodalOps.asMirrorImageTable(
      Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("doc_id", "text"), "doc_id")
    // plain dHash: every mirror pair hashes APART (the blindness the
    // canonical form exists to fix)
    val plain = MultimodalOps.imageDHash(table).collect()
      .map(h => h.mediaId -> (h.band0, h.band1, h.band2, h.band3)).toMap
    assert(plain(0L) != plain(1L) && plain(2L) != plain(3L),
      s"plain dHash must separate a flip from its original, got $plain")
    // canonical: each pair reaches the SAME hash; different pairs stay apart
    val canon = MultimodalOps.imageDHashCanonical(table).collect()
      .map(h => h.mediaId -> (h.band0, h.band1, h.band2, h.band3)).toMap
    assert(canon(0L) == canon(1L) && canon(2L) == canon(3L),
      s"canonical hash must unite mirror pairs, got $canon")
    assert(canon(0L) != canon(2L), "different pairs must not collide")
    // the canonical value is one of the two orientations (min pick), so
    // it agrees with plain dHash on whichever orientation won
    assert(canon(0L) == plain(0L) || canon(0L) == plain(1L))
    // involution sanity on REAL bytes: flipping twice restores the raster
    val base = table.collect().find(_.mediaId == 0L).get.content
    val twice = MultimodalOps.flipHorizontal(MultimodalOps.flipHorizontal(base))
    assert(MultimodalOps.dHashBands(twice).get.toSeq ==
      MultimodalOps.dHashBands(base).get.toSeq,
      "double flip must restore the original raster's hash")
  }

  test("audioClipMatches catches the cut re-upload the length-relative print misses (both directions)") {
    // ids 0/1: the odd clip is the even one with its first 8 windows cut
    // and fresh content appended; ids 2/3 a second pair
    val docs4 = Seq(0L, 1L, 2L, 3L).map(id => (id, s"doc$id")).toDF("doc_id", "text")
    val clips = MultimodalOps.asAudioClipTable(docs4, "doc_id")
    val out = MultimodalOps.audioClipMatches(clips, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // 4 of the odd clip's 5 stride-8 shingles re-align with the even's
    assert(out == Map((0L, 1L) -> 4, (2L, 3L) -> 4),
      s"each clip pair re-aligns exactly 4 shingles, got $out")
    // the length-relative fingerprint (65 windows stretched over the
    // clip) rightly misses the SAME pairs: the cut moves every window
    // boundary, so energy deltas land in different windows
    val relative = MultimodalOps.imageNearDups(
      MultimodalOps.audioFingerprint(clips), maxDist = 2).collect()
    assert(relative.isEmpty,
      s"the relative-window print must not match cut clips, got ${relative.toSeq}")
    // engine bits match the closed form (the oracle's contract): replay
    // window amplitudes for id 1 and re-derive its shingle values
    val rows = MultimodalOps.audioShingleRows(clips).collect()
      .map(r => r.mediaId -> r).toMap
    val expectedBits = (0 until 71).map { w =>
      if (MultimodalOps.clipWindowAmp(0L, w + 8 + 1) > MultimodalOps.clipWindowAmp(0L, w + 8)) 1 else 0
    }
    assert(rows(1L).sigKey == expectedBits.mkString, "bit string must replay from the amp formula")
    // identical blobs pre-group through the shared core: 10 re-uploads
    // of clip 0 become 9 star edges sharing all 5 shingles
    val block = (Seq(MultimodalOps.ImageRow(0L, MultimodalOps.syntheticWavClipFamily(0L))) ++
      (1 to 9).map(i => MultimodalOps.ImageRow(100L + i, MultimodalOps.syntheticWavClipFamily(0L)))).toDS()
    val stars = MultimodalOps.audioClipMatches(block, minShared = 3).collect()
    assert(stars.length == 9 && stars.forall(r => r.getLong(0) == 0L && r.getInt(2) == 5),
      s"identical clips must attach as star edges sharing all 5 shingles, got ${stars.toSeq}")
  }

  test("extractDocText: corrupt containers are dropped per-row, not fatal") {
    val good = MultimodalOps.syntheticDoc(1L)
    val truncated = good.take(good.length - 3) // valid magic, short page bytes
    // zip-bomb claim: 4-byte DEFLATE payload declaring a 1.5 GB inflate
    // target — the expansion-bound guard must fail the row before the
    // allocation, not OOM the task
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(0x47444F43); o.writeInt(1)
      o.writeInt(1500000000); o.writeInt(4); o.write(Array[Byte](1, 2, 3, 4))
      o.flush(); bos.toByteArray
    }
    val blobs = Seq(
      ImageRow(1L, good),
      ImageRow(2L, "not a container".getBytes("UTF-8")),
      ImageRow(3L, truncated),
      ImageRow(4L, bomb)
    ).toDS()
    val out = MultimodalOps.extractDocText(blobs).collect()
    assert(out.map(_.docId).toSet == Set(1L))
  }
}

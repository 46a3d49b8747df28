package graft.queries

import graft.Tables
import graft.functions.{Rounding => R, TextFunctions => T}
import graft.operators._
import graft.operators.ParsePipeline.PageHtml
import graft.queries.Fixtures._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary columns: image/video/audio/document metadata, decode, resize, frame sampling kernels.
  *
  * Contract queries: q31_media_meta, q32_media_resize, q33_frame_sample, q54_image_decode, q55_video_frames, q59_audio_decode, q73_doc_extract, q256_image_dhash, q257_image_neardup, q258_image_dedup_keep, q260_image_probe, q261_audio_fingerprint, q262_audio_neardup, q263_video_fingerprint, q264_video_neardup, q265_asset_dedup, q266_video_clip_match, q267_mirror_dedup, q268_audio_clip_match, q270_audio_probe, q271_video_probe.
  * Moved verbatim from the pre-split SparkEntry.scala.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal: binary column + typed metadata projection.
    "q31_media_meta" -> ((s, d) =>
      MultimodalOps.asMediaTable(Tables.documents(s, d), "doc_id", "text")
        .select(col("media_id"), col("meta.mediaType").as("media_type"),
          col("meta.byteLen").as("byte_len"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.durationMs").as("duration_ms"))),


    // Multimodal: REAL resize — synthesize PNGs, ImageIO-decode, downscale
    // via Graphics2D, re-encode, then decode AGAIN: output dims and channel
    // means come from the resized raster, not metadata.
    "q32_media_resize" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.decodeImages(
        MultimodalOps.resizeImages(
          MultimodalOps.asImageTable(Tables.documents(s, d), "doc_id"),
          maxW = 16, maxH = 12))
        .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
    }),


    // Multimodal: frame sampling (explode).
    "q33_frame_sample" -> ((s, d) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.asMediaTable(Tables.documents(s, d), "doc_id", "text"),
        everyMs = 1000L, maxFrames = 8)),


    // Multimodal: REAL image decode — per-row PNG bytes through
    // javax.imageio; dims and per-channel means read from the raster.
    "q54_image_decode" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.decodeImages(
        MultimodalOps.asImageTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
    }),


    // Multimodal: REAL video frame extraction — parse the length-prefixed
    // frame container, decode every 2nd frame's PNG, emit per-frame stats.
    "q55_video_frames" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.sampleVideoFrames(
        MultimodalOps.asVideoTable(Tables.documents(s, d), "doc_id"), stride = 2)
        .toDF("media_id", "frame_idx", "width", "height",
          "mean_r", "mean_g", "mean_b")
    }),


    // Multimodal: REAL audio decode — WAV bytes through javax.sound;
    // sample rate and frame count come from the parsed RIFF header, the
    // stats from the decoded PCM frames.
    "q59_audio_decode" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.decodeAudio(
        MultimodalOps.asAudioTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "sample_rate_hz", "n_samples", "mean_abs", "peak")
    }),


    // Document-blob text extraction (the "PDF extraction" slot): parse a
    // real compressed container, inflate every page through a genuine
    // DEFLATE codec, verify the EXTRACTED text by md5 against the
    // oracle's formula reconstruction. Narrow map over the blob scan,
    // zero exchanges; per-row corrupt isolation.
    "q73_doc_extract" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.extractDocText(
        MultimodalOps.asDocTable(Tables.documents(s, d), "doc_id"))
        .toDF("doc_id", "n_pages", "n_chars", "n_words", "text_md5")
    }),


    // IMAGE PERCEPTUAL HASH (dHash): decode a REAL gradient PNG per doc
    // and read the 64 horizontal luminance comparisons off the raster,
    // emitted as four 16-bit LSH bands. The fixture's gradient
    // directions encode a closed-form per-row pattern, so the oracle
    // reconstructs every band from doc_id arithmetic — certifying the
    // entire decode→raster→hash kernel bit-for-bit. Hash is computed
    // scan-side; blobs never shuffle.
    "q256_image_dhash" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.imageDHash(
        MultimodalOps.asGradientImageTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "band0", "band1", "band2", "band3")
    }),


    // IMAGE NEAR-DUP via banded Hamming LSH over the dHash: identical
    // hashes pre-group to one representative (star edges at dist 0 —
    // B byte-identical crawl copies are B-1 edges, never B²), then
    // DISTINCT hashes band-join on band-PAIR keys (6 x 32-bit keys;
    // explode + capped-bucket aggregation — never all pairs, degenerate
    // buckets dropped by the CappedList guard), and the true 64-bit
    // Hamming distance filters rep pairs to <= 2. Recall is exact at
    // this threshold (<= 2 damaged bits leave >= 1 intact pair), so
    // the oracle — which generates rep candidates from SINGLE bands —
    // provably produces the identical post-filter output. The output
    // is a sparse CERTIFICATE: connected components over it equal
    // components over the all-pairs relation (see the operator's
    // scaladoc). The fixtures plant 3-member families (id/3) whose
    // hashes differ only in row 7 by 1-2 bits.
    "q257_image_neardup" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.imageNearDups(
        MultimodalOps.imageDHash(
          MultimodalOps.asGradientImageTable(Tables.documents(s, d), "doc_id")),
        maxDist = 2)
    }),


    // IMAGE SEMDEDUP: the full image-dedup treatment — dHash certificate
    // pairs → star-CC clusters → keep the min-id representative per
    // cluster (the SemDeDup shape of q82, applied to the visual
    // modality). The near-dup certificate spans exactly the all-pairs
    // connectivity (identical hashes pre-grouped to a representative),
    // so the oracle's TRUE-CC over the closed-form ALL-pairs set
    // resolves the same clusters — the hash match is itself the proof.
    // Every image gets a row: singletons are their own cluster and
    // kept. The oracle resolves the SAME clusters from the closed-form
    // pair set via a recursive reachability CTE — true CC, no
    // clique-structure assumption, so a cross-family hash coincidence
    // merges clusters identically in both engines.
    "q258_image_dedup_keep" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
      val pairs = MultimodalOps.imageNearDups(
        MultimodalOps.imageDHash(
          MultimodalOps.asGradientImageTable(Tables.documents(s, d), "doc_id")),
        maxDist = 2).select("id_a", "id_b")
      // default maxIter: the loop exits at the checksum fixpoint anyway
      // (planted cliques converge in 2-3 rounds), and a lower cap would
      // only let a pathological long-chain graph return non-converged
      // labels silently
      val cc = DedupOps.connectedComponents(pairs)
      docs.join(cc, docs("media_id") === cc("id"), "left")
        .select(col("media_id"),
          coalesce(col("component"), col("media_id")).as("cluster"),
          (coalesce(col("component"), col("media_id")) === col("media_id"))
            .as("is_kept"))
    }),


    // INCREMENTAL image near-dup (the admission question): every 37th
    // document "re-crawled" under a shifted id with IDENTICAL content
    // probes the full corpus — exact-content matches answer at dist 0
    // through the band join, family siblings at dist 1-2. The corpus
    // side pre-groups identical hashes and runs through the CappedList
    // guard with singleton buckets SURVIVING (a lone corpus image must
    // answer a probe); the batch never joins itself. The oracle
    // replays the probe from the closed-form hashes with single-band
    // candidates over corpus reps — recall to dist 2 is a superset of
    // the engine's band-pair keys, post-filter outputs provably equal.
    "q260_image_probe" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables.documents(s, d)
      val corpus = MultimodalOps.imageDHash(
        MultimodalOps.asGradientImageTable(docs, "doc_id"))
      val batch = MultimodalOps.imageDHash(
        MultimodalOps.asGradientImageTable(
          docs.where(col("doc_id") % 37 === 0), "doc_id"))
        .map(h => h.copy(mediaId = h.mediaId + 1000000000L))
      MultimodalOps.imageNearDupProbe(corpus, batch, maxDist = 2)
    }),


    // AUDIO FINGERPRINT (the dHash idea on the time axis): decode a
    // REAL WAV per doc, 65 windows of mean-|sample| energy, bit w set
    // when energy rises w → w+1 — integer-exact via cross-multiplied
    // comparison, so the oracle reproduces every bit from the sample
    // formula in BIGINT arithmetic. The fixture plants 3-member
    // families sharing all windows but the last, so member prints
    // differ in at most bit 63. Computed scan-side; blobs never
    // shuffle.
    "q261_audio_fingerprint" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.audioFingerprint(
        MultimodalOps.asAudioFamilyTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "band0", "band1", "band2", "band3")
    }),


    // AUDIO NEAR-DUP: the guarded banded-Hamming join is MODALITY-
    // AGNOSTIC over (id, 4 bands) — imageNearDups is reused AS-IS on
    // the audio fingerprints, identical-hash pre-grouping and
    // CappedList bucket guard included. Family members land at
    // distance 0 (star edges) or 1 depending on whether the planted
    // last-window shift flips bit 63 — the oracle recomputes the true
    // energies and resolves the same certificate either way.
    "q262_audio_neardup" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.imageNearDups(
        MultimodalOps.audioFingerprint(
          MultimodalOps.asAudioFamilyTable(Tables.documents(s, d), "doc_id")),
        maxDist = 2)
    }),


    // VIDEO FINGERPRINT: four REAL PNG frames per container, each frame
    // dHashed off its decoded raster, XOR-folded to a 16-bit frame
    // signature placed in band frameIdx % 4 — temporal-order-aware.
    // The planted families share frames 0-2 and differ in 1-2 gradient
    // directions of frame 3, so the oracle replays every band from the
    // (family, frame, row) closed form. Computed scan-side; blobs never
    // shuffle.
    "q263_video_fingerprint" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.videoFingerprint(
        MultimodalOps.asVideoFamilyTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "band0", "band1", "band2", "band3")
    }),


    // VIDEO NEAR-DUP: the third modality through the SAME guarded
    // banded-Hamming core — imageNearDups reused AS-IS on the video
    // prints (identical-hash pre-grouping + CappedList bucket guard).
    // Family members differ in at most 2 bits of band 3, so at least
    // one band PAIR is intact and recall at maxDist 2 stays exact.
    "q264_video_neardup" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.imageNearDups(
        MultimodalOps.videoFingerprint(
          MultimodalOps.asVideoFamilyTable(Tables.documents(s, d), "doc_id")),
        maxDist = 2)
    }),


    // CROSS-MODAL ASSET DEDUP: each asset carries an image, an audio and
    // a video rendition; a pair is a duplicate-SUSPECT only when it is
    // near-dup in >= 2 of the 3 modalities — single-modality hash
    // coincidences (the false-positive mode of any 64-bit LSH at corpus
    // scale) are outvoted instead of trusted. Three guarded certificate
    // joins (one per modality, the SAME core) feed one pair-keyed
    // partial-aggregated vote; each certificate is linear in the corpus,
    // and the vote shuffles only (id_a, id_b, tag) rows. The oracle
    // replays all three closed-form fingerprint chains and the identical
    // vote.
    "q265_asset_dedup" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import org.apache.spark.sql.functions.{count, lit, max, when}
      val docs = Tables.documents(s, d)
      def tagged(pairs: org.apache.spark.sql.DataFrame, tag: String) =
        pairs.select(col("id_a"), col("id_b"), lit(tag).as("m"))
      val img = MultimodalOps.imageNearDups(
        MultimodalOps.imageDHash(
          MultimodalOps.asGradientImageTable(docs, "doc_id")), maxDist = 2)
      val aud = MultimodalOps.imageNearDups(
        MultimodalOps.audioFingerprint(
          MultimodalOps.asAudioFamilyTable(docs, "doc_id")), maxDist = 2)
      val vid = MultimodalOps.imageNearDups(
        MultimodalOps.videoFingerprint(
          MultimodalOps.asVideoFamilyTable(docs, "doc_id")), maxDist = 2)
      tagged(img, "image").unionAll(tagged(aud, "audio")).unionAll(tagged(vid, "video"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).cast("int").as("n_modalities"),
          max(when(col("m") === "image", 1).otherwise(0)).as("image_hit"),
          max(when(col("m") === "audio", 1).otherwise(0)).as("audio_hit"),
          max(when(col("m") === "video", 1).otherwise(0)).as("video_hit"))
        .where(col("n_modalities") >= 2)
    }),


    // CLIPPED-VIDEO DETECTION: consecutive frame-signature pairs as
    // LSH keys (n-gram shingling on the TIME axis). The fixture pairs
    // ids (id/2): the odd id is the even video with its first frame
    // clipped and a new end frame appended — every frame position
    // shifts, the order-aware q264 print differs in all four bands and
    // misses the pair BY DESIGN; the shingle join catches the 2 shared
    // consecutive pairs. Identical signature sequences pre-group to a
    // min-id rep (star edges share all shingles); distinct reps join
    // per shingle through the CappedList guard. The oracle replays the
    // frame signatures from the (family, content-frame, row) closed
    // form and the identical certificate.
    "q266_video_clip_match" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.videoClipMatches(
        MultimodalOps.asVideoClipTable(Tables.documents(s, d), "doc_id"),
        minShared = 2)
    }),


    // CLIPPED-AUDIO DETECTION: the audio sibling of q266 through the
    // SAME guarded shingle-match core. Absolute 50-sample energy
    // windows (a cut shifts the bit sequence whole — unlike the
    // length-relative q261 print, which a cut defeats by moving every
    // window boundary; spec pins both directions), 32-bit bit-run
    // shingles at stride 8. The fixture's odd id is the even clip with
    // its first 8 windows cut and fresh content appended: 4 of its 5
    // shingles re-align, minShared = 3. The oracle replays amplitudes,
    // bits, shingle packing and the counted certificate in closed form.
    "q268_audio_clip_match" -> ((s, d) => {
      implicit val sp: SparkSession = s
      MultimodalOps.audioClipMatches(
        MultimodalOps.asAudioClipTable(Tables.documents(s, d), "doc_id"),
        minShared = 3)
    }),


    // ORIENTATION-CANONICAL IMAGE DEDUP: the fixture pairs ids (id/2) —
    // the odd id is a REAL horizontal flip (decode → mirror raster →
    // re-encode) of its even partner. Plain dHash is blind to the flip
    // (spec-pinned); the canonical hash takes the lexicographically
    // smaller of both orientations' hashes — read off ONE raster pass
    // by index reflection — so mirror pairs group exactly. The oracle
    // replays both orientations in closed form: the mirror's row bits
    // are the reverse-complement of the original's (the ±8 gradient
    // walk has no ties), then the identical lexicographic pick and
    // min-id clustering.
    "q267_mirror_dedup" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val h = MultimodalOps.imageDHashCanonical(
        MultimodalOps.asMirrorImageTable(Tables.documents(s, d), "doc_id"))
        .toDF("media_id", "band0", "band1", "band2", "band3")
      val bands = Seq("band0", "band1", "band2", "band3")
      val g = h.groupBy(bands.map(col): _*).agg(min("media_id").as("cluster"))
      h.join(g, bands)
        .select(col("media_id"), col("cluster"),
          (col("cluster") === col("media_id")).as("is_kept"))
    }),


    // INCREMENTAL AUDIO ADMISSION: q260's probe question asked of the
    // audio modality — the guarded probe core (imageNearDupProbe) is
    // modality-agnostic over (id, 4 bands), so a fresh batch of audio
    // fingerprints (every 41st doc "re-ingested" under a shifted id
    // with identical samples) bands against capped corpus buckets over
    // pre-grouped reps, never a corpus self-join. Exact-content
    // re-ingests answer at dist 0, family siblings at dist ≤ 1. Same
    // recall proof as q260: dist ≤ 2 leaves an intact band PAIR.
    "q270_audio_probe" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables.documents(s, d)
      val corpus = MultimodalOps.audioFingerprint(
        MultimodalOps.asAudioFamilyTable(docs, "doc_id"))
      val batch = MultimodalOps.audioFingerprint(
        MultimodalOps.asAudioFamilyTable(docs.where(col("doc_id") % 41 === 0), "doc_id"))
        .map(h => h.copy(mediaId = h.mediaId + 1000000000L))
      MultimodalOps.imageNearDupProbe(corpus, batch, maxDist = 2)
    }),


    // INCREMENTAL VIDEO ADMISSION: the fourth modality closes the
    // probe family — every 43rd container re-ingested under a shifted
    // id probes the corpus prints through the same pre-grouped,
    // capped, never-self-joined core. With this, every fingerprint
    // family (image q260, audio q270, video q271) supports the
    // streaming admission question its batch dedup (q257/q262/q264)
    // answers offline.
    "q271_video_probe" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables.documents(s, d)
      val corpus = MultimodalOps.videoFingerprint(
        MultimodalOps.asVideoFamilyTable(docs, "doc_id"))
      val batch = MultimodalOps.videoFingerprint(
        MultimodalOps.asVideoFamilyTable(docs.where(col("doc_id") % 43 === 0), "doc_id"))
        .map(h => h.copy(mediaId = h.mediaId + 1000000000L))
      MultimodalOps.imageNearDupProbe(corpus, batch, maxDist = 2)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q31_media_meta" ->
      """SELECT doc_id AS media_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(doc_id % 640 + 32 AS INTEGER) AS width,
        | CAST(doc_id % 480 + 32 AS INTEGER) AS height,
        | CAST(doc_id % 30000 + 1000 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,


    // Mirrors the synthetic-PNG formulas (MultimodalOps.dimsFor/channels)
    // and the resize target-dim arithmetic; Spark derives the same values
    // by actually decoding the resized PNG bytes.
    "q32_media_resize" ->
      """WITH m AS (SELECT doc_id,
        | CAST(doc_id % 24 + 8 AS INTEGER) AS w,
        | CAST(doc_id % 16 + 8 AS INTEGER) AS h FROM documents),
        |sc AS (SELECT doc_id, w, h,
        | least(16.0 / w, 12.0 / h, 1.0) AS scale FROM m)
        |SELECT doc_id AS media_id,
        | CAST(greatest(1, floor(w * scale)) AS INTEGER) AS width,
        | CAST(greatest(1, floor(h * scale)) AS INTEGER) AS height,
        | CAST((doc_id * 3 + 7) % 256 AS DOUBLE) AS mean_r,
        | CAST((doc_id * 5 + 11) % 256 AS DOUBLE) AS mean_g,
        | CAST((doc_id * 7 + 13) % 256 AS DOUBLE) AS mean_b
        |FROM sc""".stripMargin,


    "q33_frame_sample" ->
      """SELECT doc_id AS media_id,
        | unnest(generate_series(0, least(doc_id % 30000 + 1000, 7000), 1000)) AS frame_ts_ms
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,


    // Mirrors MultimodalOps.dimsFor + channels: the Spark side derives
    // these values by ImageIO-decoding real PNG bytes.
    "q54_image_decode" ->
      """SELECT doc_id AS media_id,
        | CAST(doc_id % 24 + 8 AS INTEGER) AS width,
        | CAST(doc_id % 16 + 8 AS INTEGER) AS height,
        | CAST((doc_id * 3 + 7) % 256 AS DOUBLE) AS mean_r,
        | CAST((doc_id * 5 + 11) % 256 AS DOUBLE) AS mean_g,
        | CAST((doc_id * 7 + 13) % 256 AS DOUBLE) AS mean_b
        |FROM documents""".stripMargin,


    // Mirrors MultimodalOps.frameCountFor (doc_id % 5 + 2 frames) and the
    // per-frame seed (doc_id * 1000 + frame); stride 2 samples 0, 2, 4.
    "q55_video_frames" ->
      """WITH fr AS (
        | SELECT doc_id, unnest(generate_series(0, doc_id % 5 + 1, 2)) AS f
        | FROM documents)
        |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
        | CAST(doc_id % 24 + 8 AS INTEGER) AS width,
        | CAST(doc_id % 16 + 8 AS INTEGER) AS height,
        | CAST(((doc_id * 1000 + f) * 3 + 7) % 256 AS DOUBLE) AS mean_r,
        | CAST(((doc_id * 1000 + f) * 5 + 11) % 256 AS DOUBLE) AS mean_g,
        | CAST(((doc_id * 1000 + f) * 7 + 13) % 256 AS DOUBLE) AS mean_b
        |FROM fr""".stripMargin,


    // Mirrors MultimodalOps.sampleAt/sampleCountFor; the Spark side reads
    // these facts back out of real WAV bytes via javax.sound.
    "q59_audio_decode" ->
      """WITH idx AS (
        | SELECT doc_id, unnest(generate_series(0, doc_id % 400 + 99)) AS i
        | FROM documents),
        |s AS (SELECT doc_id,
        | abs(((doc_id * 31 + i * 17) % 20001) - 10000) AS a FROM idx)
        |SELECT doc_id AS media_id,
        | CAST(8000 AS INTEGER) AS sample_rate_hz,
        | count(*) AS n_samples,
        | CAST(sum(a) AS DOUBLE) / count(*) AS mean_abs,
        | CAST(max(a) AS INTEGER) AS peak
        |FROM s GROUP BY doc_id""".stripMargin,


    // Reconstruct each page's text by formula, join with newlines in
    // page order, and mirror the kernel's stats INCLUDING the md5 of the
    // full extracted text — if extraction (magic, lengths, inflate,
    // UTF-8) dropped or altered one byte, the hash breaks.
    "q73_doc_extract" ->
      """WITH pg AS (SELECT doc_id, doc_id % 4 + 1 AS np, doc_id % 7 + 3 AS k
        |  FROM documents),
        |pp AS (SELECT doc_id, np, k, unnest(range(0, np)) AS p FROM pg),
        |pages AS (SELECT doc_id, np, k, p,
        |  'doc ' || doc_id || ' page ' || p || ' ' || rtrim(repeat('word ', CAST(k AS INTEGER))) AS ptext
        | FROM pp),
        |agg AS (SELECT doc_id,
        |  any_value(np) AS np, any_value(k) AS k,
        |  string_agg(ptext, chr(10) ORDER BY p) AS full_text
        | FROM pages GROUP BY doc_id)
        |SELECT doc_id,
        | np AS n_pages,
        | CAST(len(full_text) AS BIGINT) AS n_chars,
        | np * (4 + k) AS n_words,
        | md5(full_text) AS text_md5
        |FROM agg""".stripMargin,


    // Mirrors MultimodalOps.mix8 (w = v % 999983; (w^3 mod p * 69069)
    // mod p mod 256 -- cubic, non-affine, wrap-free in checked BIGINT
    // arithmetic) + the gradient construction: row 7 XORs doc_id % 3;
    // band b packs rows 2b (low byte) and 2b+1 (high byte). The Spark
    // side derives the same values by ImageIO-decoding real PNGs.
    "q256_image_dhash" ->
      """WITH w AS (
        | SELECT doc_id, y, (doc_id // 3 * 8 + y) % 999983 AS w
        | FROM documents, range(8) t(y)),
        |r AS (
        | SELECT doc_id, y,
        |  CASE WHEN y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM w)
        |SELECT doc_id AS media_id,
        | CAST(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256 AS INTEGER) AS band0,
        | CAST(max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256 AS INTEGER) AS band1,
        | CAST(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256 AS INTEGER) AS band2,
        | CAST(max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256 AS INTEGER) AS band3
        |FROM r GROUP BY doc_id""".stripMargin,


    // Same certificate semantics as the Spark composition, over the
    // closed-form bands: identical hashes pre-group to a min-id
    // representative (star edges at dist 0), then single-band
    // candidates over DISTINCT hashes + the Hamming filter (recall to
    // dist 2 is a superset of the engine's band-pair candidates, and
    // the post-filter outputs are provably equal).
    "q257_image_neardup" ->
      """WITH w AS (
        | SELECT doc_id, y, (doc_id // 3 * 8 + y) % 999983 AS w
        | FROM documents, range(8) t(y)),
        |r AS (
        | SELECT doc_id, y,
        |  CASE WHEN y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM w),
        |b AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256 AS band0,
        |  max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256 AS band1,
        |  max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256 AS band2,
        |  max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256 AS band3
        | FROM r GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM b GROUP BY band0, band1, band2, band3),
        |star AS (
        | SELECT g.rep AS id_a, b.media_id AS id_b, CAST(0 AS INTEGER) AS hamming
        | FROM b JOIN g USING (band0, band1, band2, band3)
        | WHERE b.media_id <> g.rep),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |c AS (
        | SELECT DISTINCT a.rep AS id_a, bb.rep AS id_b
        | FROM e a JOIN e bb ON a.bi = bb.bi AND a.bv = bb.bv
        |  AND a.rep < bb.rep),
        |p AS (
        | SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN g x ON x.rep = c.id_a JOIN g z ON z.rep = c.id_b)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 2
        |UNION ALL
        |SELECT id_a, id_b, hamming FROM star""".stripMargin,


    // TRUE connected components over the closed-form pair set via a
    // recursive reachability CTE (min reachable id = the cluster label,
    // matching the Spark star-CC's min-id convention) — no assumption
    // that clusters are single families, so hash coincidences merge
    // identically in both engines. Singletons cluster to themselves.
    "q258_image_dedup_keep" ->
      """WITH RECURSIVE w AS (
        | SELECT doc_id, y, (doc_id // 3 * 8 + y) % 999983 AS w
        | FROM documents, range(8) t(y)),
        |r AS (
        | SELECT doc_id, y,
        |  CASE WHEN y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM w),
        |b AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256 AS band0,
        |  max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256 AS band1,
        |  max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256 AS band2,
        |  max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256 AS band3
        | FROM r GROUP BY doc_id),
        |e AS (
        | SELECT media_id, 0 AS bi, band0 AS bv FROM b
        | UNION ALL SELECT media_id, 1, band1 FROM b
        | UNION ALL SELECT media_id, 2, band2 FROM b
        | UNION ALL SELECT media_id, 3, band3 FROM b),
        |c AS (
        | SELECT DISTINCT a.media_id AS id_a, bb.media_id AS id_b
        | FROM e a JOIN e bb ON a.bi = bb.bi AND a.bv = bb.bv
        |  AND a.media_id < bb.media_id),
        |p AS (
        | SELECT id_a, id_b FROM (
        |  SELECT c.id_a, c.id_b,
        |   bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |   + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS hamming
        |  FROM c JOIN b x ON x.media_id = c.id_a JOIN b z ON z.media_id = c.id_b)
        | WHERE hamming <= 2),
        |sym AS (SELECT id_a AS a, id_b AS nbr FROM p
        |        UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        | SELECT doc_id AS id, doc_id AS root FROM documents
        | UNION
        | SELECT sym.nbr AS id, reach.root FROM reach JOIN sym ON sym.a = reach.id)
        |SELECT id AS media_id, min(root) AS cluster, min(root) = id AS is_kept
        |FROM reach GROUP BY id""".stripMargin,


    // The probe replayed from the closed-form hashes: corpus reps =
    // identical-hash groups' min ids; batch = the % 37 slice under
    // shifted ids with the SAME hash; single-band candidates
    // batch × reps, then the true Hamming filter.
    "q260_image_probe" ->
      """WITH w AS (
        | SELECT doc_id, y, (doc_id // 3 * 8 + y) % 999983 AS w
        | FROM documents, range(8) t(y)),
        |r AS (
        | SELECT doc_id, y,
        |  CASE WHEN y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM w),
        |b AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256 AS band0,
        |  max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256 AS band1,
        |  max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256 AS band2,
        |  max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256 AS band3
        | FROM r GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM b GROUP BY band0, band1, band2, band3),
        |bt AS (
        | SELECT media_id + 1000000000 AS batch_id, band0, band1, band2, band3
        | FROM b WHERE media_id % 37 = 0),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |eb AS (
        | SELECT batch_id, 0 AS bi, band0 AS bv FROM bt
        | UNION ALL SELECT batch_id, 1, band1 FROM bt
        | UNION ALL SELECT batch_id, 2, band2 FROM bt
        | UNION ALL SELECT batch_id, 3, band3 FROM bt),
        |c AS (
        | SELECT DISTINCT eb.batch_id, e.rep AS corpus_id
        | FROM eb JOIN e ON eb.bi = e.bi AND eb.bv = e.bv),
        |p AS (
        | SELECT c.batch_id, c.corpus_id,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN bt x ON x.batch_id = c.batch_id JOIN g z ON z.rep = c.corpus_id)
        |SELECT batch_id, corpus_id, hamming FROM p WHERE hamming <= 2""".stripMargin,


    // Mirrors syntheticWavFamily + audioFingerprint bit for bit: window
    // w's energy is exactly windowAmp (alternating-sign square wave),
    // reconstructed from the cubic mixer; bit w = amp rises w -> w+1.
    "q261_audio_fingerprint" ->
      """WITH d AS (
        | SELECT doc_id, doc_id // 3 AS family, doc_id % 3 AS v
        | FROM documents),
        |wv AS (SELECT doc_id, family, v, unnest(range(0, 65)) AS w FROM d),
        |m AS (SELECT doc_id, v, w, (family * 65 + w) % 999983 AS m FROM wv),
        |amp AS (
        | SELECT doc_id, w,
        |  40 * ((m * m % 999983 * m % 999983 * 69069) % 999983 % 256 + 1)
        |   + CASE WHEN w = 64 THEN 3000 * v ELSE 0 END AS a
        | FROM m),
        |bits AS (
        | SELECT lo.doc_id, lo.w AS b,
        |  CASE WHEN hi.a > lo.a THEN 1 ELSE 0 END AS bit
        | FROM amp lo JOIN amp hi ON hi.doc_id = lo.doc_id AND hi.w = lo.w + 1
        | WHERE lo.w < 64)
        |SELECT doc_id AS media_id,
        | CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band0,
        | CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band1,
        | CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band2,
        | CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band3
        |FROM bits GROUP BY doc_id""".stripMargin,


    // The q257 certificate SQL over the closed-form audio bands:
    // identical prints pre-group to a min-id rep (star edges at dist
    // 0), single-band candidates over DISTINCT prints, true Hamming
    // filter.
    "q262_audio_neardup" ->
      """WITH d AS (
        | SELECT doc_id, doc_id // 3 AS family, doc_id % 3 AS v
        | FROM documents),
        |wv AS (SELECT doc_id, family, v, unnest(range(0, 65)) AS w FROM d),
        |mm AS (SELECT doc_id, v, w, (family * 65 + w) % 999983 AS m FROM wv),
        |amp AS (
        | SELECT doc_id, w,
        |  40 * ((m * m % 999983 * m % 999983 * 69069) % 999983 % 256 + 1)
        |   + CASE WHEN w = 64 THEN 3000 * v ELSE 0 END AS a
        | FROM mm),
        |bits AS (
        | SELECT lo.doc_id, lo.w AS b,
        |  CASE WHEN hi.a > lo.a THEN 1 ELSE 0 END AS bit
        | FROM amp lo JOIN amp hi ON hi.doc_id = lo.doc_id AND hi.w = lo.w + 1
        | WHERE lo.w < 64),
        |bnd AS (
        | SELECT doc_id AS media_id,
        |  sum(CASE WHEN b // 16 = 0 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS band0,
        |  sum(CASE WHEN b // 16 = 1 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS band1,
        |  sum(CASE WHEN b // 16 = 2 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS band2,
        |  sum(CASE WHEN b // 16 = 3 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS band3
        | FROM bits GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM bnd GROUP BY band0, band1, band2, band3),
        |star AS (
        | SELECT g.rep AS id_a, bnd.media_id AS id_b, CAST(0 AS INTEGER) AS hamming
        | FROM bnd JOIN g USING (band0, band1, band2, band3)
        | WHERE bnd.media_id <> g.rep),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |c AS (
        | SELECT DISTINCT a.rep AS id_a, bb.rep AS id_b
        | FROM e a JOIN e bb ON a.bi = bb.bi AND a.bv = bb.bv
        |  AND a.rep < bb.rep),
        |p AS (
        | SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN g x ON x.rep = c.id_a JOIN g z ON z.rep = c.id_b)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 2
        |UNION ALL
        |SELECT id_a, id_b, hamming FROM star""".stripMargin,


    // Mirrors syntheticVideoFamily + videoFingerprint bit for bit: frame
    // f row y's gradient directions are videoFrameBits (the cubic mixer
    // over family*32 + f*8 + y, frame 3 row 7 XORs the variant); the
    // frame's four dHash bands (rows 2b, 2b+1 -> band b) XOR-fold to a
    // 16-bit signature; video band f = frame f's signature. The Spark
    // side derives the same values by ImageIO-decoding every real frame.
    "q263_video_fingerprint" ->
      """WITH fy AS (
        | SELECT doc_id, f, y, (doc_id // 3 * 32 + f * 8 + y) % 999983 AS w
        | FROM documents, range(4) tf(f), range(8) ty(y)),
        |r AS (
        | SELECT doc_id, f, y,
        |  CASE WHEN f = 3 AND y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM fy),
        |fb AS (
        | SELECT doc_id, f,
        |  xor(xor(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256,
        |          max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256),
        |      xor(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256,
        |          max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256)) AS sig
        | FROM r GROUP BY doc_id, f)
        |SELECT doc_id AS media_id,
        | CAST(max(CASE WHEN f=0 THEN sig END) AS INTEGER) AS band0,
        | CAST(max(CASE WHEN f=1 THEN sig END) AS INTEGER) AS band1,
        | CAST(max(CASE WHEN f=2 THEN sig END) AS INTEGER) AS band2,
        | CAST(max(CASE WHEN f=3 THEN sig END) AS INTEGER) AS band3
        |FROM fb GROUP BY doc_id""".stripMargin,


    // The q257/q262 certificate SQL over the closed-form video prints:
    // identical prints pre-group to a min-id rep (star edges at dist 0),
    // single-band candidates over DISTINCT prints (a recall superset of
    // the engine's band-pair keys; post-filter outputs provably equal),
    // true Hamming filter.
    "q264_video_neardup" ->
      """WITH fy AS (
        | SELECT doc_id, f, y, (doc_id // 3 * 32 + f * 8 + y) % 999983 AS w
        | FROM documents, range(4) tf(f), range(8) ty(y)),
        |r AS (
        | SELECT doc_id, f, y,
        |  CASE WHEN f = 3 AND y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM fy),
        |fb AS (
        | SELECT doc_id, f,
        |  xor(xor(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256,
        |          max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256),
        |      xor(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256,
        |          max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256)) AS sig
        | FROM r GROUP BY doc_id, f),
        |bnd AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN f=0 THEN sig END) AS band0,
        |  max(CASE WHEN f=1 THEN sig END) AS band1,
        |  max(CASE WHEN f=2 THEN sig END) AS band2,
        |  max(CASE WHEN f=3 THEN sig END) AS band3
        | FROM fb GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM bnd GROUP BY band0, band1, band2, band3),
        |star AS (
        | SELECT g.rep AS id_a, bnd.media_id AS id_b, CAST(0 AS INTEGER) AS hamming
        | FROM bnd JOIN g USING (band0, band1, band2, band3)
        | WHERE bnd.media_id <> g.rep),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |c AS (
        | SELECT DISTINCT a.rep AS id_a, bb.rep AS id_b
        | FROM e a JOIN e bb ON a.bi = bb.bi AND a.bv = bb.bv
        |  AND a.rep < bb.rep),
        |p AS (
        | SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN g x ON x.rep = c.id_a JOIN g z ON z.rep = c.id_b)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 2
        |UNION ALL
        |SELECT id_a, id_b, hamming FROM star""".stripMargin,


    // All three closed-form fingerprint chains (q257 image, q262 audio,
    // q264 video CTEs verbatim, prefixed), each reduced to its
    // certificate pair set, then the identical pair-keyed vote: a pair
    // survives only with near-dup evidence in >= 2 modalities.
    "q265_asset_dedup" ->
      """WITH iw AS (
        | SELECT doc_id, y, (doc_id // 3 * 8 + y) % 999983 AS w
        | FROM documents, range(8) t(y)),
        |ir AS (
        | SELECT doc_id, y,
        |  CASE WHEN y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM iw),
        |ib AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256 AS band0,
        |  max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256 AS band1,
        |  max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256 AS band2,
        |  max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256 AS band3
        | FROM ir GROUP BY doc_id),
        |ad AS (
        | SELECT doc_id, doc_id // 3 AS family, doc_id % 3 AS v
        | FROM documents),
        |awv AS (SELECT doc_id, family, v, unnest(range(0, 65)) AS w FROM ad),
        |amm AS (SELECT doc_id, v, w, (family * 65 + w) % 999983 AS m FROM awv),
        |aamp AS (
        | SELECT doc_id, w,
        |  40 * ((m * m % 999983 * m % 999983 * 69069) % 999983 % 256 + 1)
        |   + CASE WHEN w = 64 THEN 3000 * v ELSE 0 END AS a
        | FROM amm),
        |abits AS (
        | SELECT lo.doc_id, lo.w AS b,
        |  CASE WHEN hi.a > lo.a THEN 1 ELSE 0 END AS bit
        | FROM aamp lo JOIN aamp hi ON hi.doc_id = lo.doc_id AND hi.w = lo.w + 1
        | WHERE lo.w < 64),
        |ab AS (
        | SELECT doc_id AS media_id,
        |  CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS band0,
        |  CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS band1,
        |  CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS band2,
        |  CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS band3
        | FROM abits GROUP BY doc_id),
        |vfy AS (
        | SELECT doc_id, f, y, (doc_id // 3 * 32 + f * 8 + y) % 999983 AS w
        | FROM documents, range(4) tf(f), range(8) ty(y)),
        |vr AS (
        | SELECT doc_id, f, y,
        |  CASE WHEN f = 3 AND y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM vfy),
        |vfb AS (
        | SELECT doc_id, f,
        |  xor(xor(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256,
        |          max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256),
        |      xor(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256,
        |          max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256)) AS sig
        | FROM vr GROUP BY doc_id, f),
        |vb AS (
        | SELECT doc_id AS media_id,
        |  max(CASE WHEN f=0 THEN sig END) AS band0,
        |  max(CASE WHEN f=1 THEN sig END) AS band1,
        |  max(CASE WHEN f=2 THEN sig END) AS band2,
        |  max(CASE WHEN f=3 THEN sig END) AS band3
        | FROM vfb GROUP BY doc_id),
        |mb AS (
        | SELECT 'image' AS m, * FROM ib
        | UNION ALL SELECT 'audio', * FROM ab
        | UNION ALL SELECT 'video', * FROM vb),
        |g AS (
        | SELECT m, band0, band1, band2, band3, min(media_id) AS rep
        | FROM mb GROUP BY m, band0, band1, band2, band3),
        |star AS (
        | SELECT mb.m, g.rep AS id_a, mb.media_id AS id_b
        | FROM mb JOIN g USING (m, band0, band1, band2, band3)
        | WHERE mb.media_id <> g.rep),
        |e AS (
        | SELECT m, rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT m, rep, 1, band1 FROM g
        | UNION ALL SELECT m, rep, 2, band2 FROM g
        | UNION ALL SELECT m, rep, 3, band3 FROM g),
        |c AS (
        | SELECT DISTINCT a.m, a.rep AS id_a, bb.rep AS id_b
        | FROM e a JOIN e bb ON a.m = bb.m AND a.bi = bb.bi AND a.bv = bb.bv
        |  AND a.rep < bb.rep),
        |p AS (
        | SELECT c.m, c.id_a, c.id_b
        | FROM c JOIN g x ON x.m = c.m AND x.rep = c.id_a
        |        JOIN g z ON z.m = c.m AND z.rep = c.id_b
        | WHERE bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) <= 2),
        |u AS (SELECT m, id_a, id_b FROM p UNION ALL SELECT m, id_a, id_b FROM star)
        |SELECT id_a, id_b,
        | CAST(count(*) AS INTEGER) AS n_modalities,
        | CAST(max(CASE WHEN m = 'image' THEN 1 ELSE 0 END) AS INTEGER) AS image_hit,
        | CAST(max(CASE WHEN m = 'audio' THEN 1 ELSE 0 END) AS INTEGER) AS audio_hit,
        | CAST(max(CASE WHEN m = 'video' THEN 1 ELSE 0 END) AS INTEGER) AS video_hit
        |FROM u GROUP BY id_a, id_b
        |HAVING count(*) >= 2""".stripMargin,


    // Mirrors asVideoClipTable + videoClipMatches: frame f of doc d
    // shows CONTENT frame f + d%2 of family d//2 (the clip shift);
    // signatures fold as in q263; shingles are consecutive signature
    // pairs; identical signature sequences pre-group to a min-id rep
    // (star edges share all shingles), distinct reps pair per shared
    // shingle with an exact count, threshold 2.
    "q266_video_clip_match" ->
      """WITH fy AS (
        | SELECT doc_id, f, y,
        |  (doc_id // 2 * 40 + (f + doc_id % 2) * 8 + y) % 999983 AS w
        | FROM documents, range(4) tf(f), range(8) ty(y)),
        |r AS (
        | SELECT doc_id, f, y,
        |  (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 AS bits
        | FROM fy),
        |fb AS (
        | SELECT doc_id, f,
        |  xor(xor(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256,
        |          max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256),
        |      xor(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256,
        |          max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256)) AS sig
        | FROM r GROUP BY doc_id, f),
        |keyed AS (
        | SELECT doc_id, string_agg(CAST(sig AS VARCHAR), ',' ORDER BY f) AS sig_key
        | FROM fb GROUP BY doc_id),
        |sh AS (
        | SELECT DISTINCT a.doc_id, a.sig * 65536 + b.sig AS shingle
        | FROM fb a JOIN fb b ON b.doc_id = a.doc_id AND b.f = a.f + 1),
        |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |g AS (SELECT sig_key, min(doc_id) AS rep FROM keyed GROUP BY sig_key),
        |star AS (
        | SELECT g.rep AS id_a, keyed.doc_id AS id_b, CAST(nsh.n AS INTEGER) AS shared_shingles
        | FROM keyed JOIN g USING (sig_key) JOIN nsh ON nsh.doc_id = keyed.doc_id
        | WHERE keyed.doc_id <> g.rep),
        |rsh AS (
        | SELECT sh.* FROM sh JOIN g ON g.rep = sh.doc_id),
        |p AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS INTEGER) AS shared_shingles
        | FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id
        | HAVING count(*) >= 2)
        |SELECT id_a, id_b, shared_shingles FROM p
        |UNION ALL
        |SELECT id_a, id_b, shared_shingles FROM star""".stripMargin,


    // Mirrors syntheticWavClipFamily + audioShingleRows bit for bit:
    // window w of doc d holds content window w + 8*(d%2) whose energy
    // is exactly clipWindowAmp; bit w = amp rises w -> w+1 (71 bits
    // from 72 windows); 32-bit shingles pack bits [off, off+32) at
    // offsets 0/8/16/24/32; sig_key is the bit string; then the q266
    // certificate (pre-group identical bit strings, star edges share
    // all shingles, rep pairs count shared values, threshold 3).
    "q268_audio_clip_match" ->
      """WITH d AS (
        | SELECT doc_id, doc_id // 2 AS pair, doc_id % 2 * 8 AS shift
        | FROM documents),
        |wv AS (SELECT doc_id, pair, shift, unnest(range(0, 72)) AS w FROM d),
        |mm AS (SELECT doc_id, w, (pair * 80 + w + shift) % 999983 AS m FROM wv),
        |amp AS (
        | SELECT doc_id, w,
        |  40 * ((m * m % 999983 * m % 999983 * 69069) % 999983 % 256 + 1) AS a
        | FROM mm),
        |bits AS (
        | SELECT lo.doc_id, lo.w AS b,
        |  CASE WHEN hi.a > lo.a THEN 1 ELSE 0 END AS bit
        | FROM amp lo JOIN amp hi ON hi.doc_id = lo.doc_id AND hi.w = lo.w + 1
        | WHERE lo.w < 71),
        |keyed AS (
        | SELECT doc_id, string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS sig_key
        | FROM bits GROUP BY doc_id),
        |offs AS (SELECT unnest([0, 8, 16, 24, 32]) AS off),
        |shv AS (
        | SELECT doc_id, off,
        |  CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(b - off AS INTEGER))) AS BIGINT) AS shingle
        | FROM bits, offs
        | WHERE b >= off AND b <= off + 31
        | GROUP BY doc_id, off),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM shv),
        |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |g AS (SELECT sig_key, min(doc_id) AS rep FROM keyed GROUP BY sig_key),
        |star AS (
        | SELECT g.rep AS id_a, keyed.doc_id AS id_b, CAST(nsh.n AS INTEGER) AS shared_shingles
        | FROM keyed JOIN g USING (sig_key) JOIN nsh ON nsh.doc_id = keyed.doc_id
        | WHERE keyed.doc_id <> g.rep),
        |rsh AS (SELECT sh.* FROM sh JOIN g ON g.rep = sh.doc_id),
        |p AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS INTEGER) AS shared_shingles
        | FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id
        | HAVING count(*) >= 3)
        |SELECT id_a, id_b, shared_shingles FROM p
        |UNION ALL
        |SELECT id_a, id_b, shared_shingles FROM star""".stripMargin,


    // Mirrors asMirrorImageTable + imageDHashCanonical: the even id's
    // raster encodes the cubic-mixer row bits; the odd id's raster is
    // its horizontal flip, whose dHash row bits are the
    // reverse-complement (255 - rev8) of the partner's — no ties exist
    // in the +/-8 gradient walk. Both orientations' bands assemble per
    // doc, the lexicographically smaller tuple is canonical, clusters
    // are min-id groups over it.
    "q267_mirror_dedup" ->
      """WITH src AS (
        | SELECT doc_id, doc_id // 2 AS pair, doc_id % 2 AS mir FROM documents),
        |w AS (
        | SELECT doc_id, mir, y, (pair * 8 + y) % 999983 AS w
        | FROM src, range(8) t(y)),
        |eb AS (
        | SELECT doc_id, mir, y,
        |  (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 AS ebits
        | FROM w),
        |rv AS (
        | SELECT doc_id, mir, y, ebits,
        |  CAST(sum(((ebits >> (7 - x)) & 1) * (1 << x)) AS BIGINT) AS rev
        | FROM eb, range(8) rx(x)
        | GROUP BY doc_id, mir, y, ebits),
        |rb AS (
        | SELECT doc_id, y,
        |  CASE WHEN mir = 0 THEN ebits ELSE 255 - rev END AS abits,
        |  CASE WHEN mir = 0 THEN 255 - rev ELSE ebits END AS bbits
        | FROM rv),
        |ba AS (
        | SELECT doc_id,
        |  max(CASE WHEN y=0 THEN abits END) + max(CASE WHEN y=1 THEN abits END)*256 AS a0,
        |  max(CASE WHEN y=2 THEN abits END) + max(CASE WHEN y=3 THEN abits END)*256 AS a1,
        |  max(CASE WHEN y=4 THEN abits END) + max(CASE WHEN y=5 THEN abits END)*256 AS a2,
        |  max(CASE WHEN y=6 THEN abits END) + max(CASE WHEN y=7 THEN abits END)*256 AS a3,
        |  max(CASE WHEN y=0 THEN bbits END) + max(CASE WHEN y=1 THEN bbits END)*256 AS b0,
        |  max(CASE WHEN y=2 THEN bbits END) + max(CASE WHEN y=3 THEN bbits END)*256 AS b1,
        |  max(CASE WHEN y=4 THEN bbits END) + max(CASE WHEN y=5 THEN bbits END)*256 AS b2,
        |  max(CASE WHEN y=6 THEN bbits END) + max(CASE WHEN y=7 THEN bbits END)*256 AS b3
        | FROM rb GROUP BY doc_id),
        |canon AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN ale THEN a0 ELSE b0 END AS INTEGER) AS c0,
        |  CAST(CASE WHEN ale THEN a1 ELSE b1 END AS INTEGER) AS c1,
        |  CAST(CASE WHEN ale THEN a2 ELSE b2 END AS INTEGER) AS c2,
        |  CAST(CASE WHEN ale THEN a3 ELSE b3 END AS INTEGER) AS c3
        | FROM (SELECT *,
        |   a0 < b0 OR (a0 = b0 AND (a1 < b1 OR (a1 = b1 AND
        |    (a2 < b2 OR (a2 = b2 AND a3 <= b3))))) AS ale
        |  FROM ba)),
        |g AS (
        | SELECT c0, c1, c2, c3, min(doc_id) AS rep
        | FROM canon GROUP BY c0, c1, c2, c3)
        |SELECT canon.doc_id AS media_id, g.rep AS cluster,
        | g.rep = canon.doc_id AS is_kept
        |FROM canon JOIN g USING (c0, c1, c2, c3)""".stripMargin,


    // q261's closed-form audio bands + q260's probe certificate:
    // corpus reps = identical-print groups' min ids; batch = the % 41
    // slice under shifted ids; single-band candidates (a superset of
    // the engine's band-pair keys), true Hamming filter.
    "q270_audio_probe" ->
      """WITH d AS (
        | SELECT doc_id, doc_id // 3 AS family, doc_id % 3 AS v
        | FROM documents),
        |wv AS (SELECT doc_id, family, v, unnest(range(0, 65)) AS w FROM d),
        |m AS (SELECT doc_id, v, w, (family * 65 + w) % 999983 AS m FROM wv),
        |amp AS (
        | SELECT doc_id, w,
        |  40 * ((m * m % 999983 * m % 999983 * 69069) % 999983 % 256 + 1)
        |   + CASE WHEN w = 64 THEN 3000 * v ELSE 0 END AS a
        | FROM m),
        |bits AS (
        | SELECT lo.doc_id, lo.w AS b,
        |  CASE WHEN hi.a > lo.a THEN 1 ELSE 0 END AS bit
        | FROM amp lo JOIN amp hi ON hi.doc_id = lo.doc_id AND hi.w = lo.w + 1
        | WHERE lo.w < 64),
        |b AS (
        | SELECT doc_id AS media_id,
        |  CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band0,
        |  CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band1,
        |  CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band2,
        |  CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS band3
        | FROM bits GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM b GROUP BY band0, band1, band2, band3),
        |bt AS (
        | SELECT media_id + 1000000000 AS batch_id, band0, band1, band2, band3
        | FROM b WHERE media_id % 41 = 0),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |eb AS (
        | SELECT batch_id, 0 AS bi, band0 AS bv FROM bt
        | UNION ALL SELECT batch_id, 1, band1 FROM bt
        | UNION ALL SELECT batch_id, 2, band2 FROM bt
        | UNION ALL SELECT batch_id, 3, band3 FROM bt),
        |c AS (
        | SELECT DISTINCT eb.batch_id, e.rep AS corpus_id
        | FROM eb JOIN e ON eb.bi = e.bi AND eb.bv = e.bv),
        |p AS (
        | SELECT c.batch_id, c.corpus_id,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN bt x ON x.batch_id = c.batch_id JOIN g z ON z.rep = c.corpus_id)
        |SELECT batch_id, corpus_id, hamming FROM p WHERE hamming <= 2""".stripMargin,


    // q263's closed-form video prints + the same probe certificate
    // over the % 43 batch slice.
    "q271_video_probe" ->
      """WITH fy AS (
        | SELECT doc_id, f, y, (doc_id // 3 * 32 + f * 8 + y) % 999983 AS w
        | FROM documents, range(4) tf(f), range(8) ty(y)),
        |r AS (
        | SELECT doc_id, f, y,
        |  CASE WHEN f = 3 AND y = 7
        |   THEN xor((w * w % 999983 * w % 999983 * 69069) % 999983 % 256, doc_id % 3)
        |   ELSE (w * w % 999983 * w % 999983 * 69069) % 999983 % 256 END AS bits
        | FROM fy),
        |fb AS (
        | SELECT doc_id, f,
        |  xor(xor(max(CASE WHEN y=0 THEN bits END) + max(CASE WHEN y=1 THEN bits END)*256,
        |          max(CASE WHEN y=2 THEN bits END) + max(CASE WHEN y=3 THEN bits END)*256),
        |      xor(max(CASE WHEN y=4 THEN bits END) + max(CASE WHEN y=5 THEN bits END)*256,
        |          max(CASE WHEN y=6 THEN bits END) + max(CASE WHEN y=7 THEN bits END)*256)) AS sig
        | FROM r GROUP BY doc_id, f),
        |b AS (
        | SELECT doc_id AS media_id,
        |  CAST(max(CASE WHEN f=0 THEN sig END) AS INTEGER) AS band0,
        |  CAST(max(CASE WHEN f=1 THEN sig END) AS INTEGER) AS band1,
        |  CAST(max(CASE WHEN f=2 THEN sig END) AS INTEGER) AS band2,
        |  CAST(max(CASE WHEN f=3 THEN sig END) AS INTEGER) AS band3
        | FROM fb GROUP BY doc_id),
        |g AS (
        | SELECT band0, band1, band2, band3, min(media_id) AS rep
        | FROM b GROUP BY band0, band1, band2, band3),
        |bt AS (
        | SELECT media_id + 1000000000 AS batch_id, band0, band1, band2, band3
        | FROM b WHERE media_id % 43 = 0),
        |e AS (
        | SELECT rep, 0 AS bi, band0 AS bv FROM g
        | UNION ALL SELECT rep, 1, band1 FROM g
        | UNION ALL SELECT rep, 2, band2 FROM g
        | UNION ALL SELECT rep, 3, band3 FROM g),
        |eb AS (
        | SELECT batch_id, 0 AS bi, band0 AS bv FROM bt
        | UNION ALL SELECT batch_id, 1, band1 FROM bt
        | UNION ALL SELECT batch_id, 2, band2 FROM bt
        | UNION ALL SELECT batch_id, 3, band3 FROM bt),
        |c AS (
        | SELECT DISTINCT eb.batch_id, e.rep AS corpus_id
        | FROM eb JOIN e ON eb.bi = e.bi AND eb.bv = e.bv),
        |p AS (
        | SELECT c.batch_id, c.corpus_id,
        |  CAST(bit_count(xor(x.band0, z.band0)) + bit_count(xor(x.band1, z.band1))
        |     + bit_count(xor(x.band2, z.band2)) + bit_count(xor(x.band3, z.band3)) AS INTEGER) AS hamming
        | FROM c JOIN bt x ON x.batch_id = c.batch_id JOIN g z ON z.rep = c.corpus_id)
        |SELECT batch_id, corpus_id, hamming FROM p WHERE hamming <= 2""".stripMargin,
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a STUB (image/audio codecs are not in this
  * container): `decodeStub` derives deterministic fake metadata from the
  * bytes + id. Everything around it is the real production shape —
  * binary column schema, typed Dataset, per-partition decoder lifecycle
  * (one "codec init" per partition, the same pattern as loading a model
  * once per executor task), frame-sampling fan-out.
  *
  * Scale posture: decode is embarrassingly parallel mapPartitions with no
  * shuffle; payload bytes never move through a shuffle (metadata only).
  * Frame sampling explodes to (doc, frame) AFTER the narrow decode, so the
  * fan-out also stays shuffle-free.
  */
object MultimodalOps {

  final case class MediaRecord(doc_id: Long, media: Array[Byte], source: String)
  final case class MediaMeta(doc_id: Long, source: String, n_bytes: Long,
      fp: String, width: Int, height: Int, n_frames: Long)
  final case class Frame(doc_id: Long, frame_idx: Long, byte_offset: Long)

  private val FRAME_BYTES = 100L

  /** The media table: payload as a binary column (here synthesized from
    * documents.text; a real corpus reads image/audio files or blob refs). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    // balanced: every consumer runs per-row byte kernels (container walks,
    // digests) and the corpus ships as one split
    graft.Tables.balanced(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("text").cast("binary").as("media"), col("source"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for image decode / resize / feature extract.
    * Deterministic: byte length, md5 fingerprint, fake dimensions derived
    * from doc_id, frame count from payload size. */
  private def decodeStub(rec: MediaRecord, codec: java.security.MessageDigest): MediaMeta = {
    codec.reset()
    val digest = codec.digest(rec.media).map("%02x".format(_)).mkString
    val nBytes = rec.media.length.toLong
    MediaMeta(
      doc_id = rec.doc_id,
      source = rec.source,
      n_bytes = nBytes,
      fp = digest,
      width = (64 + (rec.doc_id % 64) * 16).toInt,
      height = (64 + ((rec.doc_id * 7) % 64) * 16).toInt,
      n_frames = nBytes / FRAME_BYTES + 1)
  }

  /** Decode all media: one codec instance per partition (the per-partition
    * init cost a real decoder/model amortizes the same way). */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = java.security.MessageDigest.getInstance("MD5") // per-partition "codec init"
      it.map(decodeStub(_, codec))
    }
  }

  /** Frame sampling: one row per FRAME_BYTES-sized frame of each payload. */
  def sampleFrames(meta: Dataset[MediaMeta]): Dataset[Frame] = {
    import meta.sparkSession.implicits._
    meta.flatMap(m =>
      (0L until m.n_frames).map(i => Frame(m.doc_id, i, i * FRAME_BYTES)))
  }

  /** Resize planning: aspect-preserving fit into 224x224 (the tensor-input
    * shape a training pipeline standardizes to). The arithmetic on the
    * decoded dimensions is the real operator; the pixel work would happen
    * inside the same per-partition decoder. */
  def resizePlan(meta: Dataset[MediaMeta], target: Int = 224): DataFrame = {
    val scale = least(
      lit(target.toDouble) / col("width"), lit(target.toDouble) / col("height"))
    meta.toDF().select(
      col("doc_id"), col("width"), col("height"),
      greatest(lit(1), floor(col("width") * scale)).cast("int").as("out_w"),
      greatest(lit(1), floor(col("height") * scale)).cast("int").as("out_h"))
  }

  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      mean_byte: Double, min_byte: Int, max_byte: Int, n_distinct: Long)

  /** Feature extraction over raw payload bytes: per-partition extractor
    * (the stand-in for an image/audio embedding model held once per task),
    * emitting deterministic byte statistics. The real pipeline swaps the
    * loop body for a model forward pass; the partitioning, lifecycle, and
    * schema stay exactly this. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "model load"
      val histogram = new Array[Long](256)
      it.map { rec =>
        java.util.Arrays.fill(histogram, 0L)
        var sum = 0L; var mn = 256; var mx = -1
        rec.media.foreach { b =>
          val v = b & 0xff
          histogram(v) += 1
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        val n = rec.media.length.toLong
        val distinct = histogram.count(_ > 0).toLong
        // empty payload: all-zero features (BigDecimal(NaN) would throw)
        if (n == 0L) MediaFeatures(rec.doc_id, 0L, 0.0, 0, 0, 0L)
        else MediaFeatures(rec.doc_id, n,
          BigDecimal(sum.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          mn, mx, distinct)
      }
    }
  }

  private def featuresQ(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir)).toDF().orderBy(col("doc_id"))

  private def decodeMetaQ(s: SparkSession, dir: String): DataFrame =
    decodeAll(mediaTable(s, dir)).toDF().orderBy(col("doc_id"))

  private def resizeQ(s: SparkSession, dir: String): DataFrame =
    resizePlan(decodeAll(mediaTable(s, dir))).orderBy(col("doc_id"))

  private def frameSampleQ(s: SparkSession, dir: String): DataFrame =
    sampleFrames(decodeAll(mediaTable(s, dir)))
      .toDF().orderBy(col("doc_id"), col("frame_idx"))

  /** Content-hash dedup over the binary payload column — the first pass of
    * every multimodal ingest (identical bytes from different crawls/shards).
    * Reports every content group with its keeper, multiplicity, and
    * whether copies span sources (the cross-crawl case that motivates
    * global, not per-source, dedup) — the dedup action is
    * `filter(n_copies > 1)`; the unfiltered table is emitted because the
    * small-SF corpus has its duplicates only at sf0.1 and a trivially
    * empty result would be a weak check. Payload bytes are hashed in
    * place and never shuffled — only the 16-byte fingerprint moves. */
  private def mmDedupQ(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).toDF()
      .groupBy(md5(col("media")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(col("source")).as("n_sources"))
      .withColumn("cross_source", col("n_sources") > 1)
      .orderBy(col("fp"))

  /** PERCEPTUAL near-dup over the decoded pixel grid — the pass exact
    * content-hash dedup (mm_dedup) cannot do: a re-encoded / brightness-
    * shifted / locally-retouched image has different BYTES but the same
    * perceptual structure. The operator is dHash: average-pool the
    * grayscale into an 8×9 grid, one bit per horizontal neighbor
    * comparison (row r: pooled(r,c) > pooled(r,c+1)), 63 bits kept so the
    * fingerprint stays a positive BIGINT both engines agree on (the
    * simhash64 precedent; bit 64 — the last row's last comparison — is
    * dropped). dHash is invariant to any monotone per-pixel luma scaling
    * (comparisons survive), which is exactly why re-encodes collide.
    *
    * The "decoded grayscale" here is the payload byte sequence (the raw
    * rendition of the mm_image_meta fixture family; a real pipeline
    * plugs the pixel rows of the actual decode into the SAME pooling).
    * Pooling is position-partitioned: byte i of an n-byte payload lands
    * in cell (i·72) div n; neighbor comparison uses exact integer
    * cross-multiplication (sum_a·cnt_b > sum_b·cnt_a), so both engines
    * agree bit-for-bit with no division. Payloads shorter than 72 bytes
    * leave cells empty — a bit is emitted only when the NEXT populated
    * cell is exactly cell+1, identically in both engines.
    *
    * Each doc contributes TWO renditions: the original payload and a
    * planted "re-encode" (every luma ×2 — a no-wrap brightness scale the
    * hash must survive — plus two artifact bytes at positions n/2 and
    * n−1, the local-retouch case that flips at most the few bits whose
    * cells the artifacts touch). The query must find every such pair
    * WITHOUT an all-pairs stage: candidates come only from the 3×21-bit
    * pigeonhole chunk index (any pair within Hamming distance ≤ 2 agrees
    * on at least one chunk — the dedup_simhash64_pairs contract), each
    * pair emitted once from its first agreeing chunk. The oracle is the
    * BRUTE-FORCE all-pairs Hamming join over the same fingerprints, so a
    * hash match proves both the bit-exact dHash construction AND the
    * chunk index's completeness. At 100 TB: fingerprints are 8 bytes/
    * image, candidates stay near-linear (2M distinct values per chunk);
    * only (id, fingerprint) pairs ever shuffle — never pixels. */
  private def phashNearDupQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.balanced(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("text"))
    val items = base.select((col("doc_id") * 2).as("item_id"),
        lit(0).as("rend"), col("text"))
      .unionAll(base.select((col("doc_id") * 2 + 1).as("item_id"),
        lit(1).as("rend"), col("text")))
    // r16 rework (optimization round): the fingerprint build used to
    // posexplode every CHARACTER of every rendition into a row (corpus-
    // character-sized explode → hash aggregate → per-item lead window).
    // The per-item state is 72 cell (sum, count) pairs — bounded — so the
    // dHash now computes in one scalar pass per rendition (the
    // minhash/gear-CDC typed-kernel discipline), bit-identical by
    // construction: positions are code-point indices (split(text, '')
    // splits at code-point boundaries, length() counts code points,
    // ascii() reads the code point), luma math is the same exact longs,
    // and the adjacent-populated-cell comparison s·c' > s'·c is the same
    // division-free cross-multiply walked in ascending cell order. Items
    // with NULL text contributed no pixel rows and therefore no
    // fingerprint row — the kernel skips them identically. (Empty text
    // made the old `div n` divide by zero — rejected then, absent now.)
    val fp = Staging.staged(s, dir, "mm_phash_fp") {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ph",
          org.apache.spark.sql.types.LongType, nullable = true)))
      val rows = items.select(col("item_id"), col("rend"), col("text"))
        .rdd.mapPartitions { it =>
          it.flatMap { r =>
            if (r.isNullAt(2)) Iterator.empty
            else {
              val id = r.getLong(0)
              val rend = r.getInt(1)
              val t = r.getString(2)
              val n = t.codePointCount(0, t.length).toLong
              if (n == 0L) Iterator.empty
              else {
                val sums = new Array[Long](72)
                val cnts = new Array[Long](72)
                var pos = 0L
                var ci = 0
                while (ci < t.length) {
                  val cp = t.codePointAt(ci)
                  val cell = ((pos * 72L) / n).toInt
                  val v: Long =
                    if (rend == 1) {
                      if (pos == n - 1 || pos == n / 2) 255L
                      else cp.toLong * 2
                    } else cp.toLong
                  sums(cell) += v
                  cnts(cell) += 1
                  pos += 1
                  ci += Character.charCount(cp)
                }
                var ph = 0L
                var prev = -1
                var c = 0
                while (c < 72) {
                  if (cnts(c) > 0) {
                    if (prev >= 0 && c == prev + 1 && prev % 9 < 8 &&
                        prev < 70 &&
                        sums(prev) * cnts(c) > sums(c) * cnts(prev))
                      ph |= 1L << ((prev / 9) * 8 + prev % 9)
                    prev = c
                  }
                  c += 1
                }
                Iterator.single(org.apache.spark.sql.Row(id, ph))
              }
            }
          }
        }
      s.createDataFrame(rows, schema)
    }
    // 3×21-bit pigeonhole chunk index; first-agreeing-chunk dedup is a
    // codegen'd join predicate, not a distinct shuffle
    val chunked = fp.select(col("item_id"), col("ph"),
      expr("ph % 2097152").as("c0"),
      expr("(ph div 2097152) % 2097152").as("c1"),
      expr("ph div 4398046511104").as("c2"))
    val chunks = chunked.select(col("item_id"), col("ph"),
      col("c0"), col("c1"), col("c2"),
      explode(array(
        struct(lit(0).as("ci"), col("c0").as("cv")),
        struct(lit(1).as("ci"), col("c1").as("cv")),
        struct(lit(2).as("ci"), col("c2").as("cv")))).as("c"))
      .select(col("item_id"), col("ph"), col("c0"), col("c1"), col("c2"),
        col("c.ci").as("ci"), col("c.cv").as("cv"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.item_id") < col("b.item_id") &&
          (col("a.ci") === 0 ||
            (col("a.ci") === 1 && col("a.c0") =!= col("b.c0")) ||
            (col("a.ci") === 2 && col("a.c0") =!= col("b.c0") &&
              col("a.c1") =!= col("b.c1"))))
      .select(col("a.item_id").as("d1"), col("b.item_id").as("d2"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("long")
          .as("hamming"),
        (expr("a.item_id div 2") === expr("b.item_id div 2")).as("same_doc"))
      .filter(col("hamming") <= 2)
      .orderBy(col("d1"), col("d2"))
  }

  final case class ImageMeta(doc_id: Long, format: String,
      width: Option[Int], height: Option[Int], n_bytes: Long)

  /** Mixed-container corpus with REAL headers: each document's text bytes
    * are wrapped as a spec-valid PNG (doc_id%3=0) or JPEG with a COM
    * segment before the SOF frame header (doc_id%3=1), or left raw
    * (doc_id%3=2). Dimensions baked into the headers follow the same
    * doc_id formula the stub uses — so the oracle recomputes them from
    * the formula while Spark must PARSE them back out of the actual
    * bytes; a wrong parser (endianness, offset, skipped-segment length)
    * hash-mismatches. Construction and parse both run in the narrow
    * per-partition kernel; no payload bytes shuffle. */
  private def imageMetaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = mediaTable(s, dir).mapPartitions { it =>
      it.map { rec =>
        val w = (64 + (rec.doc_id % 64) * 16).toInt
        val h = (64 + ((rec.doc_id * 7) % 64) * 16).toInt
        val payload = (rec.doc_id % 3) match {
          case 0 => ImageHeaders.pngBytes(w, h, rec.media)
          case 1 => ImageHeaders.jpegBytes(w, h, rec.media)
          case _ => rec.media
        }
        val p = ImageHeaders.parse(payload)
        ImageMeta(rec.doc_id, p.format, p.width, p.height, payload.length.toLong)
      }
    }
    parsed.toDF().orderBy(col("doc_id"))
  }

  final case class StripResult(doc_id: Long, format: String,
      n_stripped: Long, fp: String)

  /** METADATA STRIP — the governance pass run before images enter a
    * training set (EXIF location tags, serial numbers and timestamps all
    * live in the header): re-emit only the pixel payload. The md5 of the
    * stripped bytes must equal the oracle's md5 of the ORIGINAL payload
    * text — proving the strip removed exactly the header, no more, no
    * less. Per-row kernel work in the same mapPartitions codec family as
    * the other mm_* ops; map-side, nothing shuffles but 16-byte digests. */
  private def stripMetaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = mediaTable(s, dir).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val w = (64 + (rec.doc_id % 64) * 16).toInt
        val h = (64 + ((rec.doc_id * 7) % 64) * 16).toInt
        val (format, payload) = (rec.doc_id % 3) match {
          case 0 => ("png", ImageHeaders.pngBytes(w, h, rec.media))
          case 1 => ("jpeg", ImageHeaders.jpegBytes(w, h, rec.media))
          case _ => ("raw", rec.media)
        }
        val stripped = format match {
          case "png" => payload.drop(ImageHeaders.PNG_HEADER_BYTES)
          case "jpeg" => payload.drop(ImageHeaders.JPEG_HEADER_BYTES)
          case _ => payload
        }
        md.reset()
        val fp = md.digest(stripped).map("%02x".format(_)).mkString
        StripResult(rec.doc_id, format, stripped.length.toLong, fp)
      }
    }
    out.toDF().orderBy(col("doc_id"))
  }

  final case class AudioMeta(doc_id: Long, channels: Int, sample_rate: Int,
      bits: Int, n_bytes: Long, n_samples: Long)

  /** Real RIFF/WAVE headers over the corpus: each document's bytes become
    * the PCM payload of a spec-valid WAV whose format fields follow a
    * doc_id formula; every third doc also carries a LIST chunk before
    * "data" so the chunk walk is exercised on real input, not just in the
    * unit spec. Spark PARSES the header back; the oracle recomputes the
    * formula — field offsets, little-endian reads, and chunk skipping all
    * sit under the hash. */
  private def audioMetaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = mediaTable(s, dir).mapPartitions { it =>
      it.map { rec =>
        val channels = 1 + (rec.doc_id % 2).toInt
        val rate = 8000 * (1 + (rec.doc_id % 5).toInt)
        val wav = AudioHeaders.wavBytes(channels, rate, 16, rec.media,
          extraChunk = rec.doc_id % 3 == 0)
        val m = AudioHeaders.parseWav(wav).getOrElse(
          throw new IllegalStateException(s"unparseable fixture wav for ${rec.doc_id}"))
        AudioMeta(rec.doc_id, m.channels, m.sampleRate, m.bitsPerSample,
          m.dataBytes, m.nSamples)
      }
    }
    parsed.toDF().orderBy(col("doc_id"))
  }

  final case class VideoMeta(doc_id: Long, timescale: Long, duration: Long,
      mdat_bytes: Long, duration_ms: Long)

  /** Real ISO-BMFF headers: each document's bytes become the mdat payload
    * of a spec-valid MP4 (ftyp + a free box the walk must skip + moov/mvhd
    * + mdat) with timescale/duration from a doc_id formula; Spark walks
    * the boxes back out, the oracle recomputes the formula. duration_ms
    * is integer arithmetic (duration * 1000 / timescale) so both engines
    * agree exactly. */
  private def videoMetaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = mediaTable(s, dir).mapPartitions { it =>
      it.map { rec =>
        val timescale = 1000L * (1 + rec.doc_id % 3)
        val duration = 1000L + rec.doc_id % 9000
        val mp4 = VideoHeaders.mp4Bytes(timescale, duration, rec.media)
        val m = VideoHeaders.parseMp4(mp4).getOrElse(
          throw new IllegalStateException(s"unparseable fixture mp4 for ${rec.doc_id}"))
        VideoMeta(rec.doc_id, m.timescale, m.duration, m.mdatBytes,
          m.duration * 1000L / m.timescale)
      }
    }
    parsed.toDF().orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_dedup" -> mmDedupQ,
    "mm_phash_neardup" -> phashNearDupQ,
    "mm_decode_meta" -> decodeMetaQ,
    "mm_image_meta" -> imageMetaQ,
    "mm_strip_meta" -> stripMetaQ,
    "mm_audio_meta" -> audioMetaQ,
    "mm_video_meta" -> videoMetaQ,
    "mm_frame_sample" -> frameSampleQ,
    "mm_resize" -> resizeQ,
    "mm_features" -> featuresQ,
  )

  // The stub's fake metadata is pure arithmetic on (bytes, doc_id), so the
  // oracle reproduces it exactly in SQL.
  val oracles: Map[String, String] = Map(
    "mm_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies, COUNT(DISTINCT source) AS n_sources,
        |  COUNT(DISTINCT source) > 1 AS cross_source
        |FROM documents GROUP BY 1
        |ORDER BY fp""".stripMargin,
    // BRUTE-FORCE all-pairs Hamming join over the same 63-bit dHash
    // fingerprints: a hash match proves the bit-exact pooled-comparison
    // construction AND that the Spark side's 3×21 chunk index found
    // EVERY pair within distance 2 (pigeonhole completeness — the
    // quadratic scan lives only in the test-scale oracle)
    "mm_phash_neardup" ->
      """WITH src AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c)) AS cs
        |  FROM documents
        |),
        |items AS (
        |  SELECT doc_id*2 AS item_id, 0 AS rend, cs FROM src
        |  UNION ALL
        |  SELECT doc_id*2+1, 1, cs FROM src
        |),
        |pix AS (
        |  SELECT item_id, t.i - 1 AS pos, len(cs) AS n,
        |    CASE WHEN rend = 1 THEN
        |      CASE WHEN t.i - 1 = len(cs) - 1 OR t.i - 1 = len(cs) // 2
        |           THEN 255 ELSE cs[t.i] * 2 END
        |    ELSE cs[t.i] END AS v
        |  FROM items, unnest(generate_series(1, len(cs))) AS t(i)
        |),
        |cells AS (
        |  SELECT item_id, (pos * 72) // n AS cell,
        |    SUM(v)::BIGINT AS s, COUNT(*)::BIGINT AS c
        |  FROM pix GROUP BY 1, 2
        |),
        |adj AS (
        |  SELECT item_id, cell, s, c,
        |    lead(cell) OVER w AS nc, lead(s) OVER w AS ns, lead(c) OVER w AS ncnt
        |  FROM cells WINDOW w AS (PARTITION BY item_id ORDER BY cell)
        |),
        |fp AS (
        |  SELECT item_id,
        |    SUM(CASE WHEN cell % 9 < 8 AND cell < 70 AND nc = cell + 1
        |             AND s * ncnt > ns * c
        |        THEN 1::BIGINT << ((cell // 9) * 8 + cell % 9)
        |        ELSE 0::BIGINT END)::BIGINT AS ph
        |  FROM adj GROUP BY 1
        |)
        |SELECT a.item_id AS d1, b.item_id AS d2,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming,
        |  (a.item_id // 2 = b.item_id // 2) AS same_doc
        |FROM fp a JOIN fp b ON a.item_id < b.item_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 2
        |ORDER BY d1, d2""".stripMargin,
    "mm_decode_meta" ->
      s"""SELECT doc_id, source,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS fp,
         |  CAST(64 + (doc_id % 64) * 16 AS INTEGER) AS width,
         |  CAST(64 + ((doc_id * 7) % 64) * 16 AS INTEGER) AS height,
         |  CAST(octet_length(encode(text)) // $FRAME_BYTES + 1 AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,
    // stripped payload == original text bytes, so the oracle's md5(text)
    // must equal the Spark-side digest of the post-strip bytes exactly
    "mm_strip_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'raw' END AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_stripped,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Spark PARSES the dimensions out of real header bytes; the oracle
    // recomputes them from the doc_id formula they were encoded with —
    // agreement proves the parse (see imageMetaQ)
    "mm_image_meta" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'raw' END AS format,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(64 + (doc_id % 64) * 16 AS INTEGER) END AS width,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(64 + ((doc_id * 7) % 64) * 16 AS INTEGER) END AS height,
         |  CAST(octet_length(encode(text)) +
         |    CASE doc_id % 3 WHEN 0 THEN ${ImageHeaders.PNG_HEADER_BYTES}
         |                    WHEN 1 THEN ${ImageHeaders.JPEG_HEADER_BYTES}
         |                    ELSE 0 END AS BIGINT) AS n_bytes
         |FROM documents ORDER BY doc_id""".stripMargin,
    // timescale/duration recomputed from the encoding formula; duration_ms
    // is exact integer arithmetic in both engines
    "mm_video_meta" ->
      """SELECT doc_id,
        |  CAST(1000 * (1 + doc_id % 3) AS BIGINT) AS timescale,
        |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS mdat_bytes,
        |  CAST((1000 + doc_id % 9000) * 1000 // (1000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // format fields recomputed from the doc_id formula they were encoded
    // with; n_samples = payload bytes / block align (integer division)
    "mm_audio_meta" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  CAST(8000 * (1 + doc_id % 5) AS INTEGER) AS sample_rate,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) // ((1 + doc_id % 2) * 2) AS BIGINT) AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""SELECT doc_id, frame_idx, frame_idx * $FRAME_BYTES AS byte_offset FROM (
         |  SELECT doc_id,
         |    unnest(generate_series(0, CAST(octet_length(encode(text)) // $FRAME_BYTES AS BIGINT))) AS frame_idx
         |  FROM documents
         |) ORDER BY doc_id, frame_idx""".stripMargin,
    // the corpus text is pure ASCII (codepoints 32..121, checked), so byte
    // values equal codepoints and the char-level SQL reproduces the byte
    // kernel exactly
    "mm_features" ->
      """WITH chars AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c)) AS cs
        |  FROM documents
        |)
        |SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_bytes,
        |  round(CAST(list_reduce(cs, (a, x) -> a + x) AS DOUBLE) / len(cs), 6) AS mean_byte,
        |  CAST(list_min(cs) AS INTEGER) AS min_byte,
        |  CAST(list_max(cs) AS INTEGER) AS max_byte,
        |  CAST(len(list_distinct(cs)) AS BIGINT) AS n_distinct
        |FROM chars ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(64 + (doc_id % 64) * 16 AS INTEGER) AS width,
        |    CAST(64 + ((doc_id * 7) % 64) * 16 AS INTEGER) AS height
        |  FROM documents
        |), scaled AS (
        |  SELECT *, least(CAST(224.0 AS DOUBLE) / width, CAST(224.0 AS DOUBLE) / height) AS s
        |  FROM dims
        |)
        |SELECT doc_id, width, height,
        |  CAST(greatest(1, floor(width * s)) AS INTEGER) AS out_w,
        |  CAST(greatest(1, floor(height * s)) AS INTEGER) AS out_h
        |FROM scaled ORDER BY doc_id""".stripMargin,
  )
}

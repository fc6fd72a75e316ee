package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-parallel transforms.
  *
  * The testdata has no real media, so the payload is the UTF-8 encoding
  * of `documents.text` — which exercises the identical Spark plumbing
  * (binary column, per-row metadata extraction, chunked feature
  * extraction, stride sampling). All three media paths run REAL codecs
  * inside executors ([[MultimodalCodec]]), each hash-gated via its
  * lossless round trip: [[pngDecode]] synthesizes per-doc PNGs and
  * decodes them with `javax.imageio` (image), [[wavDecode]] synthesizes
  * 16-bit PCM WAVs and decodes them with `javax.sound.sampled` (audio),
  * and [[y4mFrames]] synthesizes multi-frame YUV4MPEG2 streams and parses
  * them back frame by frame (video — the uncompressed interchange
  * container; no compressed-video decoder exists in this JVM, and the
  * container layer is exactly what a JNI ffmpeg hookup would replace).
  *
  * Scale notes: all ops are per-row / per-partition maps — no shuffle at
  * any size; binary payloads stream through the scan without being
  * assembled on the driver. For 100 TB of media the only knobs are input
  * split size and `spark.sql.files.maxPartitionBytes` (large blobs →
  * fewer rows per task, same plan).
  */
object Multimodal extends QueryModule {

  /** Typed metadata over a binary column: length, digest, magic-bytes
    * prefix — the catalog row a media lake keeps per blob. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select(
        $"doc_id",
        octet_length($"payload").as("byte_len"),
        md5($"payload").as("digest"),
        hex(substring($"payload", 1, 8)).as("head_hex"))
      .orderBy($"doc_id")
  }

  /** Stride sampling ("every Nth frame"): one output row per sampled
    * offset — the frame-extraction shape for video/audio, here with a
    * 16-byte stride over the payload. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text")
      .withColumn("i", explode(expr("sequence(1, length(text), 16)")))
      .select(
        $"doc_id",
        (($"i" - 1) / 16).cast("int").as("frame_no"),
        expr("ascii(substring(text, i, 1))").as("frame_val"))
      .orderBy($"doc_id", $"frame_no")
  }

  /** Feature extraction through the [[ByteFeatures]] kernel: binary
    * payload → fixed-width float vector, via `mapPartitions` (the batch-
    * per-partition shape a real vectorized extractor wants). Output is
    * exploded to one `(doc_id, feature_idx, feature)` row per feature —
    * scalar rows, so the driver's row-hash compare (which can't sort on
    * array cells) applies, and the kernel's integer-sum/double-divide/
    * float-round arithmetic is reproduced exactly by the DuckDB oracle. */
  def featureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // one decoder instance per partition — where a real decoder would
      // allocate its native context once and reuse it across rows
      val decoder = ByteFeatures
      it.map { case (id, bytes) => (id, decoder.normalizedFeatures(bytes)) }
    }.toDF("doc_id", "features")
      .select($"doc_id", posexplode($"features").as(Seq("feature_idx", "feature")))
      .orderBy($"doc_id", $"feature_idx")
  }

  /** Resize through the [[ByteFeatures]] kernel: payload downsampled to a
    * fixed 32-bucket thumbnail (floor of the mean byte per bucket) — the
    * image-resize shape over opaque binary, pure integer math so the
    * oracle matches exactly. Same mapPartitions batching as
    * [[featureExtract]]. */
  def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      val decoder = ByteFeatures
      it.map { case (id, bytes) => (id, decoder.meanBuckets(bytes, 32)) }
    }.toDF("doc_id", "pixels")
      .select($"doc_id", posexplode($"pixels").as(Seq("pixel_idx", "pixel")))
      .orderBy($"doc_id", $"pixel_idx")
  }

  /** REAL image decode: each doc gets a deterministic 8×8 grayscale PNG
    * payload (pixels = the 64-bucket downsample of its text bytes),
    * encoded AND decoded with `javax.imageio` inside executors — a
    * genuine codec in the loop, not the stub. PNG is lossless, so the
    * decoded pixels must equal the bucket means, which DuckDB recomputes
    * from `text` directly: the oracle hash-checks that a real
    * encoder→binary column→real decoder round trip is bit-exact. Two
    * mapPartitions stages on purpose — payload generation and decode are
    * separate passes, so the decode consumes an opaque binary media
    * column exactly as it would from a parquet blob column. */
  def pngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pngs = Tables.fanOutScan(Tables.documents(s, dir))
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, MultimodalCodec.encodePng(ByteFeatures.meanBuckets(bytes, 64), 8, 8))
        }
      }.toDF("doc_id", "png")
    pngs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO reader instantiated per partition via the codec object —
        // the same batch shape featureExtract documents
        it.map { case (id, png) => (id, MultimodalCodec.decodePng(png)) }
      }.toDF("doc_id", "pixels")
      .select($"doc_id", posexplode($"pixels").as(Seq("pixel_idx", "pixel")))
      .orderBy($"doc_id", $"pixel_idx")
  }

  /** REAL audio decode: each doc gets a deterministic 48-sample 16-bit PCM
    * mono WAV payload (samples = the 48-bucket byte means of its text,
    * mapped losslessly 0..255 → -32768..32767 via ×257−32768), encoded AND
    * decoded with `javax.sound.sampled` inside executors — the second real
    * codec beside [[pngDecode]], proving the binary-column pattern
    * generalizes across media types. PCM WAV is lossless, so the decoded
    * samples must equal the mapped bucket means, which DuckDB recomputes
    * from `text` directly (the oracle never sees a WAV). Two mapPartitions
    * stages on purpose, as in [[pngDecode]]: payload generation and decode
    * are separate passes, so the decode consumes an opaque binary audio
    * column exactly as it would from a parquet blob column. */
  def wavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wavs = Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ×257 maps the full byte range exactly onto the 16-bit signed
          // range (255·257 = 65535), keeping the round trip integer-exact
          val pcm = ByteFeatures.meanBuckets(bytes, 48).map(m => m * 257 - 32768)
          (id, MultimodalCodec.encodeWav(pcm, 8000f))
        }
      }.toDF("doc_id", "wav")
    wavs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, wav) => (id, MultimodalCodec.decodeWav(wav)) }
      }.toDF("doc_id", "samples")
      .select($"doc_id", posexplode($"samples").as(Seq("sample_idx", "sample")))
      .orderBy($"doc_id", $"sample_idx")
  }

  /** REAL video decode: each doc gets a deterministic 3-frame 4×4
    * grayscale YUV4MPEG2 stream (frame f's 16 luma samples = buckets
    * 16f..16f+15 of the 48-bucket byte means of its text), encoded AND
    * parsed back with [[MultimodalCodec.encodeY4m]]/[[MultimodalCodec.decodeY4m]]
    * inside executors — the third real container codec beside
    * [[pngDecode]] and [[wavDecode]], closing the image/audio/video set.
    * y4m stores raw planes, so the parsed frames must equal the bucket
    * means, which DuckDB recomputes from `text` directly (the oracle never
    * sees a y4m stream). Two mapPartitions stages on purpose, as in the
    * other codecs: the parse consumes an opaque binary video column
    * exactly as it would from a parquet blob column. */
  def y4mFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streams = Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val frames = ByteFeatures.meanBuckets(bytes, 48).grouped(16).toArray
          (id, MultimodalCodec.encodeY4m(frames, 4, 4))
        }
      }.toDF("doc_id", "y4m")
    streams.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, y4m) =>
          val (_, _, frames) = MultimodalCodec.decodeY4m(y4m)
          frames.iterator.zipWithIndex.flatMap { case (f, fno) =>
            f.iterator.zipWithIndex.map { case (luma, px) => (id, fno, px, luma) }
          }
        }
      }.toDF("doc_id", "frame_no", "pixel_idx", "luma")
      .orderBy($"doc_id", $"frame_no", $"pixel_idx")
  }

  private val SceneCutMad = 15.0 // mean-abs-diff cut threshold (p90 ≈ 19.5)

  /** Scene-cut detection over the decoded Y4M streams — the video
    * curation primitive that decides where to frame-sample (cut
    * boundaries are the diverse frames; mid-scene frames are near-dups):
    * for every consecutive frame pair of each stream, the mean absolute
    * luma difference over the 16 pixels, flagged as a cut when it
    * exceeds [[SceneCutMad]]. The frames come from the REAL Y4M parse
    * ([[y4mFrames]] — header, plane geometry, frame markers), so the
    * codec stays in the loop exactly as a production video pipeline
    * would run ffprobe-style decode before scene scoring.
    *
    * Scale: the frame relation is per-(doc, frame, pixel) rows; the
    * consecutive-pair join keys on (doc, pixel) with a +1 frame
    * equi-condition — co-partitioned by doc, never cross-doc; the MAD
    * is one exact-integer partial agg. At 100 TB of video the unit of
    * parallelism is the stream, the same mapPartitions decode. */
  def sceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val px = y4mFrames(s, dir)
    val a = px.select($"doc_id", $"frame_no", $"pixel_idx", $"luma".as("la"))
    val b = px.select($"doc_id", ($"frame_no" - 1).as("frame_no"),
      $"pixel_idx", $"luma".as("lb"))
    a.join(b, Seq("doc_id", "frame_no", "pixel_idx"))
      .groupBy($"doc_id", $"frame_no")
      .agg(sum(abs($"la" - $"lb")).as("sad"))
      // /16.0: the decoded frame geometry is fixed 4×4 (encodeY4m 4,4)
      .withColumn("mad", round($"sad" / 16.0, 6))
      .withColumn("is_cut", ($"mad" > SceneCutMad).cast("int"))
      .select($"doc_id", ($"frame_no" + 1).as("to_frame"), $"sad", $"mad", $"is_cut")
      .orderBy($"doc_id", $"to_frame")
  }

  /** Perceptual image near-dup: each doc's 8×8 grayscale PNG (the same
    * synthesis as [[pngDecode]]) is decoded with the REAL `javax.imageio`
    * codec inside executors, reduced to a 64-bit average-hash (bit i set
    * iff pixel i exceeds the integer mean of the 64 pixels), and near-dup
    * pairs are found by banded LSH blocking on the hash's four 16-bit
    * bands plus an exact Hamming verify — [[graft.operators.Dedup.simhash]]'s
    * pair machinery with a real media decode in the loop, i.e. image
    * dedup as a training-data pipeline runs it (pHash-family fingerprint
    * → bucket join → distance cut). The oracle never sees a PNG: it
    * recomputes the bucket means from `text`, rebuilds the same hash
    * bands in integer arithmetic, and re-derives the pairs.
    *
    * Scale: signature extraction is a per-partition map (decode + 64-bit
    * fold, no shuffle); blocking shuffles 4 small (band, value) rows per
    * image instead of the image itself, and a band match requires 16
    * exactly-equal bits, so candidates stay ~3 orders of magnitude below
    * all-pairs (measured sf0.1: 8,450 candidates vs 12.5 M pairs). The
    * Hamming verify reads only the two 8-byte signatures carried on the
    * block rows — no second scan of the corpus. */
  def ahashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val png = MultimodalCodec.encodePng(ByteFeatures.meanBuckets(bytes, 64), 8, 8)
          val px = MultimodalCodec.decodePng(png)
          var sum = 0L
          var i = 0
          while (i < 64) { sum += px(i); i += 1 }
          val avg = sum / 64
          var hash = 0L
          i = 0
          while (i < 64) { if (px(i) > avg) hash |= 1L << i; i += 1 }
          (id, hash)
        }
      }.toDF("doc_id", "ahash")
    // persist: self-joined below — without it the codec round trip runs
    // once per join side
    val blocks = sigs.select($"doc_id", $"ahash", explode(array(
        (0 until 4).map(blk =>
          struct(lit(blk).as("blk"),
                 shiftright($"ahash", 16 * blk).bitwiseAND(lit(0xffffL)).as("bv"))): _*)).as("bb"))
      .select($"doc_id", $"ahash", $"bb.blk".as("blk"), $"bb.bv".as("bv"))
      .persist()
    blocks.as("a").join(blocks.as("b"),
        $"a.blk" === $"b.blk" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
              bit_count($"a.ahash".bitwiseXOR($"b.ahash")).as("hamming"))
      .distinct()
      .where($"hamming" <= 16)
      .orderBy($"doc_a", $"doc_b")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"     -> (binaryMeta _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_feature_extract" -> (featureExtract _),
    "mm_resize"          -> (resize _),
    "mm_png_decode"      -> (pngDecode _),
    "mm_wav_decode"      -> (wavDecode _),
    "mm_y4m_frames"      -> (y4mFrames _),
    "mm_scene_cuts"      -> (sceneCuts _),
    "mm_ahash_pairs"     -> (ahashPairs _),
  )

  // ORACLE CONVENTION for the payload-bucket oracles (mm_feature_extract,
  // mm_resize, mm_png_decode, mm_wav_decode): the SQL buckets CHARACTERS
  // (length/substring/ascii) while the Scala path buckets UTF-8 BYTES.
  // The two agree only because the documents corpus is all-ASCII —
  // MultimodalSpec asserts that invariant, so a non-ASCII regeneration
  // fails loudly in the suite instead of silently hash-mismatching here.
  // If the corpus ever legitimately grows past ASCII, switch these oracles
  // to byte semantics (encode(text) + octet-based indexing).
  override def oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        |       octet_length(encode(text)) AS byte_len,
        |       md5(text) AS digest,
        |       upper(to_hex(encode(substring(text, 1, 8)))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id,
        |       CAST((i - 1) // 16 AS INT) AS frame_no,
        |       ascii(substring(text, CAST(i AS INT), 1)) AS frame_val
        |FROM documents, unnest(generate_series(1, length(text), 16)) AS t(i)
        |ORDER BY doc_id, frame_no""".stripMargin,
    // The stub decoder, re-expressed: payload bytes are the ASCII codes of
    // `text` (all-ASCII corpus); feature f = float32 of
    // sum(bytes[lo, hi)) / (hi - lo) / 255.0 with lo = n*f/8, hi = n*(f+1)/8.
    // Integer sums + two double divides + one final float round — the
    // exact IEEE sequence of ByteFeatures.normalizedFeatures, so values match bitwise.
    // The (doc_id, feature_idx) grid is built with an explicit cross join
    // and the byte sums LEFT JOINed onto it: an empty bucket (doc shorter
    // than 8 chars → hi <= lo) then still yields a grid row with COALESCEd
    // 0, exactly like the stub's explicit 0f branch — a bare generate_series
    // over bucket offsets would silently drop that group instead.
    "mm_feature_extract" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, f FROM d, unnest(generate_series(0, 7)) AS g0(f)),
        |fb AS (
        |  SELECT doc_id, f,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 7)) AS g1(f),
        |       unnest(generate_series((n * f) // 8 + 1, (n * (f + 1)) // 8)) AS g2(i)
        |  GROUP BY doc_id, f
        |)
        |SELECT g.doc_id, CAST(g.f AS INT) AS feature_idx,
        |       COALESCE(CAST(CAST(fb.s AS DOUBLE) / fb.cnt / 255.0 AS REAL),
        |                CAST(0 AS REAL)) AS feature
        |FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.f = fb.f
        |ORDER BY g.doc_id, feature_idx""".stripMargin,
    "mm_resize" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 31)) AS g0(b)),
        |fb AS (
        |  SELECT doc_id, b,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 31)) AS g1(b),
        |       unnest(generate_series((n * b) // 32 + 1, (n * (b + 1)) // 32)) AS g2(i)
        |  GROUP BY doc_id, b
        |)
        |SELECT g.doc_id, CAST(g.b AS INT) AS pixel_idx,
        |       COALESCE(CAST(fb.s // fb.cnt AS INT), 0) AS pixel
        |FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
        |ORDER BY g.doc_id, pixel_idx""".stripMargin,
    // Lossless-codec round trip: the decoded PNG pixels must equal the
    // 64-bucket byte means the image was encoded from — same shape as
    // mm_resize, 64 buckets. DuckDB never sees a PNG; it recomputes what
    // the real decoder must return.
    "mm_png_decode" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 63)) AS g0(b)),
        |fb AS (
        |  SELECT doc_id, b,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 63)) AS g1(b),
        |       unnest(generate_series((n * b) // 64 + 1, (n * (b + 1)) // 64)) AS g2(i)
        |  GROUP BY doc_id, b
        |)
        |SELECT g.doc_id, CAST(g.b AS INT) AS pixel_idx,
        |       COALESCE(CAST(fb.s // fb.cnt AS INT), 0) AS pixel
        |FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
        |ORDER BY g.doc_id, pixel_idx""".stripMargin,
    // Same pixel recomputation as mm_png_decode, then the average-hash in
    // pure integer arithmetic: 16-bit bands (never a full 64-bit value —
    // bit 63 would overflow DuckDB's checked BIGINT sum), band-equality
    // blocking, and Hamming as the sum of per-band bit_count(xor).
    "mm_ahash_pairs" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 63)) AS g0(b)),
        |fb AS (
        |  SELECT doc_id, b,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 63)) AS g1(b),
        |       unnest(generate_series((n * b) // 64 + 1, (n * (b + 1)) // 64)) AS g2(i)
        |  GROUP BY doc_id, b
        |),
        |px AS (
        |  SELECT g.doc_id, g.b AS pixel_idx, COALESCE(fb.s // fb.cnt, 0) AS pixel
        |  FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
        |),
        |mu AS (SELECT doc_id, sum(pixel) // 64 AS avg_px FROM px GROUP BY 1),
        |bits AS (
        |  SELECT px.doc_id, px.pixel_idx // 16 AS band,
        |         CAST(sum(CASE WHEN px.pixel > mu.avg_px
        |             THEN CAST(1 AS BIGINT) << CAST(px.pixel_idx % 16 AS INT)
        |             ELSE 0 END) AS BIGINT) AS bv
        |  FROM px JOIN mu USING (doc_id) GROUP BY 1, 2
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bits a JOIN bits b
        |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        |),
        |ham AS (
        |  SELECT c.doc_a, c.doc_b,
        |         CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
        |  FROM cand c
        |  JOIN bits x ON x.doc_id = c.doc_a
        |  JOIN bits y ON y.doc_id = c.doc_b AND y.band = x.band
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, hamming FROM ham
        |WHERE hamming <= 16
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Lossless-audio round trip: decoded 16-bit PCM samples must equal the
    // 48-bucket byte means mapped to the signed range. DuckDB never sees a
    // WAV; it recomputes what the real decoder must return.
    "mm_wav_decode" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 47)) AS g0(b)),
        |fb AS (
        |  SELECT doc_id, b,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 47)) AS g1(b),
        |       unnest(generate_series((n * b) // 48 + 1, (n * (b + 1)) // 48)) AS g2(i)
        |  GROUP BY doc_id, b
        |)
        |SELECT g.doc_id, CAST(g.b AS INT) AS sample_idx,
        |       CAST(COALESCE(fb.s // fb.cnt, 0) * 257 - 32768 AS INT) AS sample
        |FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
        |ORDER BY g.doc_id, sample_idx""".stripMargin,
    // Lossless-video round trip: the parsed y4m luma planes must equal the
    // 48-bucket byte means the stream was encoded from, split 3 frames ×
    // 16 pixels. DuckDB never sees a y4m stream; it recomputes what the
    // real container parse must return.
    "mm_y4m_frames" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 47)) AS g0(b)),
        |fb AS (
        |  SELECT doc_id, b,
        |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
        |         count(*) AS cnt
        |  FROM d,
        |       unnest(generate_series(0, 47)) AS g1(b),
        |       unnest(generate_series((n * b) // 48 + 1, (n * (b + 1)) // 48)) AS g2(i)
        |  GROUP BY doc_id, b
        |)
        |SELECT g.doc_id,
        |       CAST(g.b // 16 AS INT) AS frame_no,
        |       CAST(g.b % 16 AS INT) AS pixel_idx,
        |       COALESCE(CAST(fb.s // fb.cnt AS INT), 0) AS luma
        |FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
        |ORDER BY g.doc_id, frame_no, pixel_idx""".stripMargin,
    // Same luma synthesis as mm_y4m_frames, then per-(doc, pixel)
    // consecutive-frame abs diffs: exact integer SAD, one pinned /16.0
    // division for the MAD, threshold flag re-derived identically.
    "mm_scene_cuts" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |fb AS (
         |  SELECT doc_id, b,
         |         sum(ascii(substring(text, CAST(i AS INT), 1))) AS s,
         |         count(*) AS cnt
         |  FROM d,
         |       unnest(generate_series(0, 47)) AS g1(b),
         |       unnest(generate_series((n * b) // 48 + 1, (n * (b + 1)) // 48)) AS g2(i)
         |  GROUP BY doc_id, b
         |), grid AS (SELECT doc_id, b FROM d, unnest(generate_series(0, 47)) AS g0(b)),
         |px AS (
         |  SELECT g.doc_id, CAST(g.b // 16 AS INT) AS frame_no,
         |         CAST(g.b % 16 AS INT) AS pixel_idx,
         |         COALESCE(CAST(fb.s // fb.cnt AS INT), 0) AS luma
         |  FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.b = fb.b
         |)
         |SELECT a.doc_id, CAST(b.frame_no AS INT) AS to_frame,
         |       CAST(sum(abs(a.luma - b.luma)) AS BIGINT) AS sad,
         |       round(sum(abs(a.luma - b.luma)) / 16.0, 6) AS mad,
         |       CAST(round(sum(abs(a.luma - b.luma)) / 16.0, 6) > $SceneCutMad AS INT)
         |         AS is_cut
         |FROM px a JOIN px b
         |  ON a.doc_id = b.doc_id AND a.pixel_idx = b.pixel_idx
         | AND b.frame_no = a.frame_no + 1
         |GROUP BY a.doc_id, b.frame_no
         |ORDER BY a.doc_id, to_frame""".stripMargin,
  )
}

/** REAL codecs for the PNG and WAV paths — pure-JVM `javax.imageio` and
  * `javax.sound.sampled`, the image and audio decoders this environment
  * genuinely has. Both formats are lossless, so encode→decode is an exact
  * identity on the sample values, which is what lets the driver hash-check
  * [[Multimodal.pngDecode]] and [[Multimodal.wavDecode]] end-to-end.
  * The video path parses YUV4MPEG2 ([[encodeY4m]]/[[decodeY4m]]) — raw
  * planes in a plain-text-marked container, also lossless. */
object MultimodalCodec {
  javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors

  /** `pixels` (0..255, row-major, length w*h) → PNG bytes. */
  def encodePng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < pixels.length) {
      raster.setSample(i % w, i / w, 0, pixels(i))
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** PNG bytes → row-major gray samples. */
  def decodePng(png: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "undecodable payload")
    val raster = img.getRaster
    val w = img.getWidth
    Array.tabulate(w * img.getHeight)(i => raster.getSample(i % w, i / w, 0))
  }

  // `AudioSystem.getAudioInputStream`/`AudioSystem.write` go through the
  // JVM-global synchronized SPI registry on EVERY call; 32 executor
  // threads convoy on that lock and the per-row cost dominates the whole
  // query at scale (measured: mm_wav_decode 22.4 s at sf1 vs 1.5 s for
  // the same-shaped ImageIO query). The WAVE provider is therefore
  // resolved ONCE per executor JVM via the same `ServiceLoader` contract
  // the registry uses, and rows call the (stateless) provider directly —
  // still the real platform codec, no registry in the row loop.
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter provider"))
  }

  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(Array(0), 8000f)
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileReader provider"))
  }

  /** 16-bit signed samples → mono PCM WAV bytes (`javax.sound.sampled`,
    * little-endian). Lossless container: the sample words are stored
    * verbatim, so encode→decode is an exact identity. */
  def encodeWav(samples: Array[Int], sampleRate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      require(v >= Short.MinValue && v <= Short.MaxValue, s"sample $v out of 16-bit range")
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** WAV bytes → 16-bit signed samples, via a real provider decode of
    * the container (header parse + frame stream), not a hand-rolled
    * header skip. */
  def decodeWav(wav: Array[Byte]): Array[Int] = {
    val ais = wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected audio format: $fmt")
    val raw = ais.readAllBytes()
    Array.tabulate(raw.length / 2) { i =>
      ((raw(2 * i) & 0xff) | (raw(2 * i + 1).toInt << 8)).toShort.toInt
    }
  }

  // ---- YUV4MPEG2 (y4m) — the VIDEO container (mjpegtools/ffmpeg's
  // uncompressed interchange format; `ffmpeg -f yuv4mpeg`). Plain-text
  // stream header `YUV4MPEG2 W.. H.. F.. ..\n`, then per frame a
  // `FRAME[ params]\n` marker followed by the raw planes. `Cmono` streams
  // carry the luma plane only (w*h bytes per frame) — the grayscale case.
  // Raw planes are stored verbatim, so encode→decode is an exact identity,
  // which is what lets the driver hash-check the round trip.

  /** `frames` (each w*h luma samples 0..255, row-major) → y4m bytes. */
  def encodeY4m(frames: Array[Array[Int]], w: Int, h: Int, fpsNum: Int = 25,
                fpsDen: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n".getBytes(ascii))
    frames.foreach { f =>
      require(f.length == w * h, s"${f.length} samples for ${w}x$h")
      out.write("FRAME\n".getBytes(ascii))
      f.foreach { v =>
        require(v >= 0 && v <= 255, s"luma $v out of byte range")
        out.write(v)
      }
    }
    out.toByteArray
  }

  /** y4m bytes → (width, height, frames). Real container parse: magic
    * check, parameter-tagged header scan (W/H/C honored, F/I/A tolerated),
    * then FRAME-marker iteration over the raw luma planes. */
  def decodeY4m(y4m: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var pos = y4m.indexOf('\n'.toByte)
    require(pos > 0, "missing y4m stream header")
    val header = new String(y4m, 0, pos, ascii)
    val fields = header.split(' ')
    require(fields.head == "YUV4MPEG2", s"not a y4m stream: ${fields.head}")
    val params = fields.tail.map(p => p.head -> p.tail).toMap
    val w = params.getOrElse('W', sys.error("y4m header missing width")).toInt
    val h = params.getOrElse('H', sys.error("y4m header missing height")).toInt
    // default colorspace per spec is 4:2:0; we only handle the luma-only
    // stream we emit — reject anything with chroma planes rather than
    // silently misparse frame boundaries
    require(params.get('C').contains("mono"), s"unsupported colorspace in: $header")
    pos += 1
    val frames = Array.newBuilder[Array[Int]]
    while (pos < y4m.length) {
      val nl = y4m.indexOf('\n'.toByte, pos)
      require(nl > 0, "truncated FRAME marker")
      val marker = new String(y4m, pos, nl - pos, ascii)
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker, got: $marker")
      pos = nl + 1
      require(pos + w * h <= y4m.length, "truncated frame plane")
      frames += Array.tabulate(w * h)(i => y4m(pos + i) & 0xff)
      pos += w * h
    }
    (w, h, frames.result())
  }
}

/** Deterministic byte-level feature kernels — real arithmetic, not a
  * stub: [[meanBuckets]] is the equal-width downsample used to synthesize
  * every media payload (and the values each lossless codec round trip must
  * reproduce), [[normalizedFeatures]] the fixed-width normalized feature
  * fold standing where an embedding model would plug in. Both are
  * per-row, allocation-light, and recomputed exactly by the DuckDB
  * oracles. (Until round 7 this object was `MultimodalStub`, when the
  * video-shaped decode was still fake; with [[MultimodalCodec.decodeY4m]]
  * all three media paths run genuine container codecs and the only thing
  * left here is the arithmetic itself.) */
object ByteFeatures {
  val FEATURES = 8

  /** Fixed-width normalized features: mean byte value of each of 8 equal
    * slices, scaled to [0, 1]. The signature (bytes in, fixed float vector
    * out) is the one a learned feature extractor would keep. */
  def normalizedFeatures(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length
    Array.tabulate(FEATURES) { f =>
      val lo = (n.toLong * f / FEATURES).toInt
      val hi = (n.toLong * (f + 1) / FEATURES).toInt
      if (hi <= lo) 0f
      else {
        var s = 0L
        var i = lo
        while (i < hi) { s += bytes(i) & 0xff; i += 1 }
        (s.toDouble / (hi - lo) / 255.0).toFloat
      }
    }
  }

  /** Downsample to `width` buckets: floor of the mean byte per bucket.
    * Pure integer math (sum / count) → engine-exact. */
  def meanBuckets(bytes: Array[Byte], width: Int): Array[Int] = {
    val n = bytes.length
    Array.tabulate(width) { b =>
      val lo = (n.toLong * b / width).toInt
      val hi = (n.toLong * (b + 1) / width).toInt
      if (hi <= lo) 0
      else {
        var s = 0L
        var i = lo
        while (i < hi) { s += bytes(i) & 0xff; i += 1 }
        (s / (hi - lo)).toInt
      }
    }
  }
}

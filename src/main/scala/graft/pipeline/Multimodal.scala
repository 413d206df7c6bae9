package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schema, batch shape, partitioning,
  * per-partition decode loop — is real; the codec itself is a clearly
  * marked STUB (image/audio libraries are not in this container): decode
  * produces deterministic fake features derived from the bytes, with the
  * same shape a real decoder would emit. Swap `stubDecode*` for a JNI/FFmpeg
  * call and nothing else changes.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("bytes", BinaryType, nullable = true),     // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Wrap any (id, string payload) source as a media table. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast(BinaryType).as("bytes"),
      struct(
        (length(col(payloadCol)) % 1920).cast(IntegerType).as("width"),
        (length(col(payloadCol)) % 1080).cast(IntegerType).as("height"),
        (length(col(payloadCol)) * 10L).cast(LongType).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** STUB feature extraction — deterministic `dim` pseudo-floats per payload
    * from md5(bytes); shape matches a real image/audio embedding. Pure
    * Column pipeline: at scale this is scan-side, no shuffle. */
  def stubDecodeFeatures(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      round((conv(substring(md5(bytes), 1, 8), 16, 10).cast(DoubleType)
        + i.cast(DoubleType) * 31.0) % 1000.0 / 1000.0, 6))

  /** STUB frame sampling — n evenly spaced "frames"; each row carries the
    * byte offset a real demuxer would seek to plus a frame checksum. */
  def stubFrameSample(media: DataFrame, nFrames: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("byte_offset",
        (col("frame_idx") * greatest(length(col("bytes")), lit(1)) / nFrames)
          .cast(LongType))
      .withColumn("frame_md5",
        md5(concat(col("bytes"), col("frame_idx").cast(StringType))))
      .select("media_id", "kind", "frame_idx", "byte_offset", "frame_md5")

  /** STUB 64-bit perceptual hash: 60 bits from md5(bytes) (15 hex chars —
    * fits a signed long without overflow). A real pHash — DCT over
    * downsampled luma, sign-quantized — plugs in here; everything
    * downstream (pigeonhole bucketing, hamming verify, skew cap) is the
    * REAL near-dup machinery shared with SimHash ([[Dedup.fingerprintNearDups]]).
    * With the stub, only byte-identical media collide (an md5 prefix has
    * no locality); a real pHash makes visually-near media land within
    * small hamming distance and the same pipeline finds them. */
  def stubPerceptualHash64(bytes: Column): Column =
    conv(substring(md5(bytes), 1, 15), 16, 10).cast(LongType)

  /** Near-duplicate media pairs by perceptual hash: (id_a, id_b, hamming),
    * id_a < id_b, via the 16-bit-chunk pigeonhole join. One skinny shuffle
    * of (id, 8-byte hash) — media bytes never move. */
  def phashNearDups(media: DataFrame, maxDist: Int = 3,
      maxBucketPairing: Int = 64): DataFrame =
    Dedup.fingerprintNearDups(
      media.select(col("media_id").as("id"),
        stubPerceptualHash64(col("bytes")).as("sim")),
      maxDist, maxBucketPairing)

  /** Scene-change detection over sampled frames: consecutive frames whose
    * 64-bit perceptual hashes differ by more than `hammingThreshold` bits
    * mark a boundary — the shot-segmentation primitive for video corpora
    * (sample frames per shot, dedup per shot, caption per shot). One lag
    * window per media over frame-count-bounded partitions; with a real
    * pHash the threshold is a visual-difference knob, with the stub it
    * splits the ~30-bit random-hash median. Returns (media_id, frame_idx,
    * hamming, is_scene_change) for every consecutive pair. */
  def sceneChanges(frames: DataFrame, hammingThreshold: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames
      .withColumn("__h",
        conv(substring(col("frame_md5"), 1, 15), 16, 10).cast(LongType))
      .withColumn("__ph", lag(col("__h"), 1).over(w))
      .where(col("__ph").isNotNull)
      .withColumn("hamming",
        expr("bit_count(__h ^ __ph)").cast(LongType))
      .withColumn("is_scene_change", col("hamming") > hammingThreshold)
      .select("media_id", "frame_idx", "hamming", "is_scene_change")
  }

  /** Voice-activity segmentation over sampled frames — the audio twin of
    * [[sceneChanges]]: runs of consecutive "speech" frames collapse to
    * segments (media_id, seg_start, seg_end, n_frames), the
    * speech-extraction primitive for audio corpora (segment, then
    * transcribe/caption per segment). Frame energy is the STUB: a frame is
    * speech when its md5 hex is lexically >= `speechThresholdHex` (a real
    * VAD replaces the predicate with an RMS/model score; everything
    * downstream — the run-length grouping, the per-media bounded window —
    * is the real machinery). Gaps-and-islands: island id = frame_idx −
    * rank-within-speech-frames, one window over the frame-count-bounded
    * media partition, so no corpus-cardinality window key exists. */
  def vadSegments(frames: DataFrame,
      speechThresholdHex: String = "c"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames
      .where(col("frame_md5") >= speechThresholdHex)
      .withColumn("__island",
        col("frame_idx") - row_number().over(w))
      .groupBy("media_id", "__island")
      .agg(
        min(col("frame_idx")).as("seg_start"),
        max(col("frame_idx")).as("seg_end"),
        count(lit(1)).as("n_frames"))
      .select("media_id", "seg_start", "seg_end", "n_frames")
  }

  /** STUB resize — metadata-only transform (a real implementation rewrites
    * bytes; the engine contract is the meta update + passthrough schema). */
  def stubResize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      lit(w).cast(IntegerType).as("width"),
      lit(h).cast(IntegerType).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.codec").as("codec")))

  /** Image dimension probe over opaque binary columns WITHOUT a codec —
    * real byte parsing, not a stub: container formats put dimensions at
    * spec-fixed offsets, so a corpus triage pass (drop icons, bucket by
    * aspect ratio, route oversized scans) never needs to decode pixels.
    *
    *  - PNG (every standards-conformant file): width/height are the
    *    big-endian u32 pairs at bytes 17–24, right after the 8-byte
    *    magic and the IHDR chunk header — exact.
    *  - JPEG: the first ALIGNED SOF0/SOF2 marker's height/width u16s.
    *    Alignment rides the hex encoding: `^(?:..)*?FFC[02]` forces the
    *    marker onto a byte boundary and lazy-scans to the first hit
    *    (identical leftmost semantics in java.util.regex and RE2), so a
    *    stray odd-offset FFC0 byte-pair in metadata never misparses.
    *    Documented leniency: a crafted ALIGNED FFC0 inside an APPn
    *    segment would win — a real parser walks segment lengths; this
    *    stays one scan-side expression.
    *  - GIF (87a/89a): logical-screen width/height u16 LITTLE-endian at
    *    bytes 6/8 — exact for every conformant file.
    *  - BMP ("BM" + BITMAPINFOHEADER): width i32 LE at byte 18, height
    *    i32 LE at byte 22; a NEGATIVE height is the legal top-down
    *    layout, reported as its magnitude (row order is irrelevant to
    *    triage).
    *  - WebP (RIFF/WEBP, all three container flavors): `VP8 ` lossy —
    *    14-bit width/height u16s after the 9D012A start code (the
    *    start code is validated, not assumed); `VP8L` lossless — the
    *    0x2F-signature 28-bit packed width-1/height-1 bitfield decoded
    *    from its little-endian bytes; `VP8X` extended — 24-bit LE
    *    canvas width-1/height-1 at payload +4/+7.
    *
    * Bytes parse via their hex encoding (conv(hex, 16, 10) here, the
    * `'0x' || hex` cast in DuckDB — the mm_scene_changes precedent), so
    * the binary plumbing is real end to end while the arithmetic stays
    * cross-engine exact. Truncated magics yield null dims (valid =
    * false), unrecognized blobs format 'unknown'. Returns (media_id,
    * format, n_bytes, width, height, valid). */
  def imageDims(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hx = upper(hex(col(binCol)))
    // 1-based HEX position of 0-based BYTE offset b: b*2+1
    def u16le(bytePos: Int): Column = conv(concat(
      substring(hx, bytePos * 2 + 3, 2), substring(hx, bytePos * 2 + 1, 2)),
      16, 10).cast(LongType)
    def u24le(bytePos: Int): Column = conv(concat(
      substring(hx, bytePos * 2 + 5, 2), substring(hx, bytePos * 2 + 3, 2),
      substring(hx, bytePos * 2 + 1, 2)), 16, 10).cast(LongType)
    def u32le(bytePos: Int): Column = conv(concat(
      substring(hx, bytePos * 2 + 7, 2), substring(hx, bytePos * 2 + 5, 2),
      substring(hx, bytePos * 2 + 3, 2), substring(hx, bytePos * 2 + 1, 2)),
      16, 10).cast(LongType)
    def i32le(bytePos: Int): Column = {
      val u = u32le(bytePos)
      when(u >= 2147483648L, u - 4294967296L).otherwise(u)
    }
    val isPng = hx.startsWith("89504E470D0A1A0A")
    val isJpg = hx.startsWith("FFD8FF")
    val pngOk = isPng && length(hx) >= 48
    // after the aligned FFC0/FFC2: length u16 (4 hex) + precision u8
    // (2 hex), then height u16, width u16
    val jh = regexp_extract(hx, "^(?:..)*?FFC[02]......(....)", 1)
    val jw = regexp_extract(hx, "^(?:..)*?FFC[02]..........(....)", 1)
    val isGif = hx.startsWith("474946383761") || hx.startsWith("474946383961")
    val gifOk = isGif && length(hx) >= 20
    val isBmp = hx.startsWith("424D")
    val bmpOk = isBmp && length(hx) >= 52
    val isWebp = hx.startsWith("52494646") &&
      substring(hx, 17, 8) === "57454250"
    val chunk = substring(hx, 25, 8) // fourcc at byte 12
    // VP8 lossy: 3-byte frame tag at payload(20), start code 9D012A at
    // 23, width/height u16 LE at 26/28 (high 2 bits are scale factors)
    val vp8Ok = isWebp && chunk === "56503820" && length(hx) >= 60 &&
      substring(hx, 47, 6) === "9D012A"
    // VP8L lossless: 0x2F signature at payload, then width-1/height-1 as
    // 14-bit fields of the LE u32 at 21
    val vp8lOk = isWebp && chunk === "5650384C" && length(hx) >= 50 &&
      substring(hx, 41, 2) === "2F"
    val vp8lBits = u32le(21)
    // VP8X extended: canvas width-1/height-1 u24 LE at payload +4/+7
    val vp8xOk = isWebp && chunk === "56503858" && length(hx) >= 60
    val width = when(pngOk, conv(substring(hx, 33, 8), 16, 10).cast(LongType))
      .when(isJpg && jw =!= "", conv(jw, 16, 10).cast(LongType))
      .when(gifOk, u16le(6))
      .when(bmpOk, abs(i32le(18)))
      .when(vp8Ok, u16le(26) % 16384L)
      .when(vp8lOk, vp8lBits % 16384L + 1L)
      .when(vp8xOk, u24le(24) + 1L)
    val height = when(pngOk, conv(substring(hx, 41, 8), 16, 10).cast(LongType))
      .when(isJpg && jh =!= "", conv(jh, 16, 10).cast(LongType))
      .when(gifOk, u16le(8))
      .when(bmpOk, abs(i32le(22)))
      .when(vp8Ok, u16le(28) % 16384L)
      .when(vp8lOk, floor(vp8lBits / 16384L) % 16384L + 1L)
      .when(vp8xOk, u24le(27) + 1L)
    df.select(col(idCol).as("media_id"),
      when(isPng, "png").when(isJpg, "jpeg").when(isGif, "gif")
        .when(isBmp, "bmp").when(isWebp, "webp").otherwise("unknown")
        .as("format"),
      length(col(binCol)).cast(LongType).as("n_bytes"),
      width.as("width"), height.as("height"))
      .withColumn("valid", col("width").isNotNull && col("height").isNotNull)
  }

  /** Audio duration/shape probe over opaque binary columns WITHOUT a
    * codec — the audio sibling of [[imageDims]]: a canonical PCM WAV
    * header puts everything a corpus triage needs at spec-fixed
    * little-endian offsets (RIFF/WAVE/fmt/data magics; channels u16 @22,
    * sample rate u32 @24, byte rate u32 @28, data size u32 @40), so
    * duration = data_size / byte_rate without touching samples. Bytes
    * parse via hex (the imageDims plumbing); little-endian u32s read as
    * four swapped hex pairs — identical arithmetic in both engines.
    * Non-RIFF / truncated / zero-byte-rate blobs yield valid=false with
    * null fields, never an error. duration_ms floors from exact double
    * math (ds·1000/br + 0.5 — both engines IEEE-identical). Returns
    * (media_id, valid, channels, sample_rate, byte_rate, duration_ms). */
  def audioDuration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hx = upper(hex(col(binCol)))
    def u16le(at1: Int): Column = conv(
      concat(substring(hx, at1 + 2, 2), substring(hx, at1, 2)), 16, 10)
      .cast(LongType)
    def u32le(at1: Int): Column = conv(
      concat(substring(hx, at1 + 6, 2), substring(hx, at1 + 4, 2),
        substring(hx, at1 + 2, 2), substring(hx, at1, 2)), 16, 10)
      .cast(LongType)
    val shape = substring(hx, 1, 8) === "52494646" && // 'RIFF'
      substring(hx, 17, 8) === "57415645" &&          // 'WAVE'
      substring(hx, 25, 8) === "666D7420" &&          // 'fmt '
      substring(hx, 73, 8) === "64617461" &&          // 'data'
      length(hx) >= 88
    val byteRate = u32le(57)
    // null bytes column -> null hx -> null comparisons; valid must stay
    // two-valued (the docstring contract, and imageDims parity) or
    // filter(!valid) silently drops null-blob rows
    val valid = coalesce(shape && byteRate > 0, lit(false))
    val dataSize = u32le(81)
    df.select(col(idCol).as("media_id"), valid.as("valid"),
      when(valid, u16le(45)).as("channels"),
      when(valid, u32le(49)).as("sample_rate"),
      when(valid, byteRate).as("byte_rate"),
      when(valid, floor(dataSize.cast("double") * 1000.0 /
        byteRate.cast("double") + 0.5).cast(LongType)).as("duration_ms"))
  }

  /** EXIF metadata probe over opaque JPEG binary columns WITHOUT a codec
    * — a real APP1/TIFF IFD walk (JEITA CP-3451 / TIFF 6.0, both public),
    * the provenance/PII-triage pass a corpus ingest needs before any
    * pixel work: orientation (tag 0x0112), DateTimeOriginal (tag 0x9003
    * in the Exif sub-IFD via pointer tag 0x8769), and GPS-data PRESENCE
    * (pointer tag 0x8825 — the PII signal; the coordinates themselves
    * never need decoding to quarantine the image).
    *
    * Bytes parse via their hex encoding (the [[imageDims]] plumbing):
    *  - the APP1 segment is found with the aligned lazy scan
    *    `^FFD8(?:..)*?FFE1....457869660000` — an odd-offset FFE1+magic
    *    decoy in an earlier segment cannot match (fixture plants one);
    *  - the TIFF header picks the endianness ('II'→little, 'MM'→big);
    *    every u16/u32 read goes through one endian-aware reader, so both
    *    byte orders share the walk;
    *  - each IFD's 12-byte-entry table is sliced out once (entry count
    *    capped at 64) and tags are found with a stride-ALIGNED lazy regex
    *    over it (`^(?:.{24})*?<tag>` — the hex stride keeps entry
    *    alignment exactly like the APP1 scan), so the walk stays inside
    *    codegen'd string expressions: no higher-order functions, whose
    *    per-element interpreted evaluation measured ~10 ms/row;
    *  - DateTimeOriginal is ASCII count-20, so its value field is an
    *    OFFSET; the 19 chars decode from hex (trailing NUL dropped).
    *
    * Truncated/garbage/EXIF-less blobs yield valid=false with null
    * fields; `valid` and `has_gps` stay two-valued (filter-safe).
    * Returns (media_id, valid, byte_order, orientation,
    * datetime_original, has_gps). */
  def exifProbe(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val w = new TiffWalk(col("__tiff"), col("__le"))
    import w._

    val s4 = keep(ifd0Stage(df, binCol, idCol, w),
      hasTag(col("__table0"), 0x8825).as("__has_gps"),
      hexPos(entryU32(col("__table0"), 0x8769)).as("__subifd"))
    val s5 = keep(s4, u16(col("__subifd")).as("__n1"))
    val s6 = keep(s5, ifdTable(col("__subifd"), col("__n1")).as("__table1"))
    // ASCII(20) → the DateTimeOriginal value field is an OFFSET
    val s7 = keep(s6,
      hexPos(entryU32(col("__table1"), 0x9003)).as("__dtopos"))

    val dtoPos = col("__dtopos")
    val dtoInBounds = dtoPos.isNotNull && (dtoPos + 37) <= length(tiff)
    val dto = when(dtoInBounds,
      decode(unhex(tiff.substr(dtoPos, lit(38))), "UTF-8"))

    val valid = exifValid(tiff, le, col("__ifd0"), col("__n0"))
    s7.select(col("media_id"), valid.as("valid"),
      when(valid, when(le, "II").otherwise("MM")).as("byte_order"),
      when(valid, col("__orient")).as("orientation"),
      when(valid, dto).as("datetime_original"),
      coalesce(valid && col("__has_gps"), lit(false)).as("has_gps"))
  }

  /** GPS coordinates + orientation from the EXIF GPS IFD — the fields a
    * media-corpus curation actually filters on (geo-fencing, PII
    * quarantine with coordinates, rotation-aware pipelines), still with
    * NO codec: the [[exifProbe]] walk followed through pointer tag 0x8825
    * into the GPS IFD (JEITA CP-3451 §4.6.6), decoding GPSLatitudeRef/
    * GPSLongitudeRef (ASCII, inline value field) and GPSLatitude/
    * GPSLongitude (RATIONAL×3 — deg/min/sec numerator+denominator u32
    * pairs at the value-field offset). Coordinates surface as SIGNED
    * integer micro-degrees (S/W negative):
    * `sign · floor((dn/dd + (mn/md)/60 + (sn/sd)/3600) · 1e6 + 0.5)` —
    * a fixed-shape double expression over exact u32s, so a DuckDB oracle
    * replays it bit-identically. Zero denominators or out-of-bounds
    * rational blocks null the coordinate (has_gps stays true — presence
    * is the PII signal, decodability is the bonus). Returns (media_id,
    * valid, has_gps, orientation, lat_ref, lon_ref, lat_udeg, lon_udeg).
    * Scan-side, zero shuffle, staged projections (the exifProbe
    * codegen-tree rule). */
  def exifGps(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val w = new TiffWalk(col("__tiff"), col("__le"))
    import w._

    val s4 = keep(ifd0Stage(df, binCol, idCol, w),
      hexPos(entryU32(col("__table0"), 0x8825)).as("__gps"))
    val s5 = keep(s4, u16(col("__gps")).as("__ng"))
    val s6 = keep(s5, ifdTable(col("__gps"), col("__ng")).as("__tg"))
    // refs are ASCII count-2: the char sits INLINE in the value field;
    // the rational triples sit at their value-field OFFSETS
    val s7 = keep(s6,
      entryCapture(col("__tg"), 0x0001, "(..)").as("__latRefHex"),
      hexPos(entryU32(col("__tg"), 0x0002)).as("__latPos"),
      entryCapture(col("__tg"), 0x0003, "(..)").as("__lonRefHex"),
      hexPos(entryU32(col("__tg"), 0x0004)).as("__lonPos"))
    // deg/min/sec (numerator, denominator) u32 pairs — 6 reads per coord,
    // each staged off the SAME __latPos/__lonPos attribute
    def rational3(posCol: Column): Seq[Column] =
      (0 until 6).map(i => u32(posCol + i * 8))
    val s8 = keep(s7,
      rational3(col("__latPos")).zipWithIndex.map { case (c, i) =>
        c.as(s"__la$i") } ++
      rational3(col("__lonPos")).zipWithIndex.map { case (c, i) =>
        c.as(s"__lo$i") }: _*)

    def refChar(hexCol: Column): Column =
      when(hexCol =!= "", decode(unhex(hexCol), "UTF-8"))
    def inBounds(posCol: Column): Column =
      posCol.isNotNull && (posCol + 47) <= length(tiff)
    // the EXACT double shape the oracle replays: left-associated sum of
    // three IEEE divisions, scaled and floor-rounded to micro-degrees
    def udeg(p: String): Column = {
      val Seq(dn, dd, mn, md, sn, sd) =
        (0 until 6).map(i => col(s"__$p$i").cast("double"))
      floor((dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0)
        * 1000000.0 + 0.5).cast(LongType)
    }
    def coordOk(p: String, posCol: Column): Column =
      inBounds(posCol) &&
        col(s"__${p}1") > 0 && col(s"__${p}3") > 0 && col(s"__${p}5") > 0
    def signed(refCol: Column, neg: String, u: Column): Column =
      when(refCol === neg, -u).otherwise(u)

    val valid = exifValid(tiff, le, col("__ifd0"), col("__n0"))
    val hasGps = valid && col("__ng").isNotNull && col("__ng") >= 1
    val latRef = refChar(col("__latRefHex"))
    val lonRef = refChar(col("__lonRefHex"))
    s8.select(col("media_id"), valid.as("valid"),
      coalesce(hasGps, lit(false)).as("has_gps"),
      when(valid, col("__orient")).as("orientation"),
      when(hasGps, latRef).as("lat_ref"),
      when(hasGps, lonRef).as("lon_ref"),
      when(hasGps && coordOk("la", col("__latPos")),
        signed(latRef, "S", udeg("la"))).as("lat_udeg"),
      when(hasGps && coordOk("lo", col("__lonPos")),
        signed(lonRef, "W", udeg("lo"))).as("lon_udeg"))
  }

  /** Video duration probe over opaque ISO-BMFF (MP4/MOV) binary columns
    * WITHOUT a codec — the video sibling of [[audioDuration]], closing
    * the biggest byte mass of a real multimodal corpus (r18 verdict ask
    * #8): `moov/mvhd` puts timescale and duration at spec-fixed offsets
    * (ISO/IEC 14496-12, public), so corpus triage (drop clips, bucket by
    * length, price transcode) never demuxes a frame.
    *
    * A REAL bounded box walk, not an offset guess: top-level boxes are
    * length-framed `[u32 size]["fourcc"]` (the [[graft.functions.WarcSplit]]
    * framing pattern, big-endian) — the walk follows up to 6 of them
    * (`ftyp`/`free`/`mdat`/... before `moov`, the non-faststart layout),
    * honoring the 64-bit `size==1` largesize escape, then up to 4 `moov`
    * children to find `mvhd` (files commonly put `udta`/`iods` first).
    * Version 0 reads timescale u32 @ box+20 / duration u32 @ box+24;
    * version 1 (64-bit times) timescale u32 @ box+28 / duration u64
    * @ box+32. A box size < 8, an out-of-bounds read, a missing
    * moov/mvhd, an unknown version, or timescale 0 → valid=false with
    * null fields, never an error. duration_ms floors from the exact
    * double shape both engines replay (`dur·1000/ts + 0.5`). Staged
    * projections (the [[exifProbe]] codegen-tree rule); scan-side, zero
    * shuffle. Returns (media_id, valid, version, timescale, duration,
    * duration_ms). */
  def videoDuration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    def keep(d: DataFrame, cols: Column*): DataFrame =
      d.select(d.columns.map(col) ++ cols: _*)
    val hx = col("__hx")
    def u32(pos: Column): Column =
      conv(hx.substr(pos, lit(8)), 16, 10).cast(LongType)
    // toBase -10 = SIGNED read: a garbage largesize with its high bit
    // set would render an unsigned decimal > Long.MaxValue and ANSI cast
    // would THROW; the negative value instead fails the size guards
    // (real files cannot carry >= 2^63 boxes)
    def u64(pos: Column): Column =
      conv(hx.substr(pos, lit(16)), 16, -10).cast(LongType)
    def fourcc(pos: Column): Column = hx.substr(pos + 8, lit(8))
    // one top-level step: (pos) -> (type, nextPos); size==1 reads the
    // largesize u64 at +16 (header then 16 bytes). size<8 poisons the
    // walk, and so does a next position past end-of-blob+1 — garbage
    // size fields would otherwise walk positions beyond substr's INT
    // range (a real 4 GB u32 size is legal framing, but any box past the
    // blob's end is unreadable anyway)
    def step(pos: Column): (Column, Column) = {
      val sz = u32(pos)
      val real = when(sz === 1L, u64(pos + 16)).otherwise(sz)
      val minSz = when(sz === 1L, lit(16L)).otherwise(lit(8L))
      val next = pos + real * 2
      // real <= hex length first: a garbage u64 size could overflow
      // real*2 to negative and sneak under the end-of-blob bound
      (fourcc(pos),
        when(real >= minSz && real <= length(hx).cast(LongType) &&
          next <= length(hx).cast(LongType) + 1, next))
    }
    val TopBoxes = 6
    val MoovChildren = 4
    val base = df.select(col(idCol).as("media_id"),
      upper(hex(col(binCol))).as("__hx"))
    // top-level walk: __tp_i / __tt_i staged so each position is computed
    // once (inlining would double the subtree per level)
    var d = keep(base, lit(1L).as("__tp0"))
    for (i <- 0 until TopBoxes) {
      val (t, next) = step(col(s"__tp$i"))
      d = keep(d, t.as(s"__tt$i"), next.as(s"__tp${i + 1}"))
    }
    val moovPos = coalesce((0 until TopBoxes).map(i =>
      when(col(s"__tt$i") === "6D6F6F76", col(s"__tp$i"))): _*)
    d = keep(d, (moovPos + 16).as("__cp0"))
    for (j <- 0 until MoovChildren) {
      val (t, next) = step(col(s"__cp$j"))
      d = keep(d, t.as(s"__ct$j"), next.as(s"__cp${j + 1}"))
    }
    val mvhdPos = coalesce((0 until MoovChildren).map(j =>
      when(col(s"__ct$j") === "6D766864", col(s"__cp$j"))): _*)
    d = keep(d, mvhdPos.as("__mv"))
    val mv = col("__mv")
    d = keep(d,
      conv(hx.substr(mv + 16, lit(2)), 16, 10).cast(LongType).as("__ver"))
    val ver = col("__ver")
    val tsPos = when(ver === 0L, mv + 40).when(ver === 1L, mv + 56)
    val durPos = when(ver === 0L, mv + 48).when(ver === 1L, mv + 64)
    val durHexLen = when(ver === 0L, lit(8L)).otherwise(lit(16L))
    d = keep(d,
      u32(tsPos).as("__ts"),
      when(ver === 0L, u32(durPos)).when(ver === 1L, u64(durPos)).as("__dur"),
      (durPos + durHexLen - 1 <= length(hx)).as("__inb"))
    val valid = coalesce(
      mv.isNotNull && (ver === 0L || ver === 1L) &&
        col("__ts") > 0 && col("__dur") >= 0L && col("__inb"),
      lit(false))
    d.select(col("media_id"), valid.as("valid"),
      when(valid, ver).as("version"),
      when(valid, col("__ts")).as("timescale"),
      when(valid, col("__dur")).as("duration"),
      when(valid, floor(col("__dur").cast("double") * 1000.0 /
        col("__ts").cast("double") + 0.5).cast(LongType)).as("duration_ms"))
  }

  /** Codec-free MP3/MPEG-audio duration probe — the compressed-audio
    * sibling of [[videoDuration]] ([[audioDuration]] covers PCM WAV):
    * the MPEG frame header packs version/layer/bitrate/sample-rate into
    * 4 spec-fixed bytes (ISO/IEC 11172-3, public), so audio-corpus
    * triage (drop jingles, bucket by length, price transcode) never
    * decodes a frame.
    *
    * The walk, all scan-side Columns over the hex encoding:
    *  1. an ID3v2 tag (`"ID3"` magic) is skipped via its SYNCSAFE u28
    *     size (4 bytes of 7 significant bits each — the top bit is
    *     banned precisely so broken parsers never see a false 0xFF
    *     sync);
    *  2. the first frame header is validated: 11-bit sync, non-reserved
    *     version (MPEG1/2/2.5), Layer III, bitrate index 1–14, sample
    *     rate index 0–2 — each decoded against the published tables
    *     (`element_at` over in-plan literal arrays, not a UDF);
    *  3. a `Xing`/`Info` metadata block — located at the spec offset
    *     that depends on version and channel mode (MPEG1: mono 21 /
    *     stereo 36; MPEG2/2.5: mono 13 / stereo 21, = 4-byte header +
    *     side-info size) — supplies the EXACT frame count when its
    *     flags bit 0 is set: duration = frames · samplesPerFrame
    *     (1152 MPEG1 / 576 MPEG2) / sampleRate. `Xing` marks VBR
    *     (`vbr = true`); `Info` is the same block written by CBR
    *     encoders.
    *  4. no metadata block → the CBR estimate from the first frame's
    *     bitrate: duration = audioBytes · 8 / bitrate — the honest
    *     fallback every tag-less CBR file supports (WRONG for
    *     headerless VBR, as it is in every triage tool; the Xing path
    *     exists because encoders write it for exactly that reason).
    *
    * Truncated ID3, missing sync, reserved version/layer, bad table
    * indices, or any out-of-bounds read → valid=false with null fields,
    * never an error. duration_ms floors from exact-integer numerators
    * over IEEE double division, replayed identically by the oracle.
    * Returns (media_id, valid, version, bitrate_kbps, sample_rate, vbr,
    * n_frames, duration_ms). */
  def mp3Duration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    def keep(d: DataFrame, cols: Column*): DataFrame =
      d.select(d.columns.map(col) ++ cols: _*)
    val hx = col("__hx")
    val hxLen = length(hx).cast(LongType)
    def u8(pos: Column): Column =
      conv(hx.substr(pos, lit(2)), 16, 10).cast(LongType)
    def u32(pos: Column): Column =
      conv(hx.substr(pos, lit(8)), 16, 10).cast(LongType)
    val base = df.select(col(idCol).as("media_id"),
      length(col(binCol)).cast(LongType).as("__nb"),
      upper(hex(col(binCol))).as("__hx"))
    // ID3v2 skip: syncsafe size bytes live at byte offsets 6..9 (hex
    // positions 13/15/17/19); a blob claiming ID3 but too short for the
    // 10-byte tag header poisons the probe
    val hasId3 = hx.startsWith("494433")
    val id3Size = u8(lit(13)) * 2097152L + u8(lit(15)) * 16384L +
      u8(lit(17)) * 128L + u8(lit(19))
    var d = keep(base,
      when(!hasId3, lit(0L))
        .when(hasId3 && hxLen >= 20L, lit(10L) + id3Size).as("__off"))
    // frame header at byte __off: hex position (1-based) and the 3 bytes
    // after the 0xFF sync byte
    d = keep(d, (col("__off") * 2 + 1).as("__hp"))
    val hp = col("__hp")
    d = keep(d, (hp + 7 <= hxLen).as("__hok"))
    d = keep(d,
      when(col("__hok"), u8(hp + 2)).as("__b1"),
      when(col("__hok"), u8(hp + 4)).as("__b2"),
      when(col("__hok"), u8(hp + 6)).as("__b3"))
    val (b1, b2, b3) = (col("__b1"), col("__b2"), col("__b3"))
    d = keep(d,
      (floor(b1 / 8) % 4).as("__verBits"),   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      (floor(b1 / 2) % 4).as("__layer"),     // 1 = Layer III
      floor(b2 / 16).as("__brIdx"),
      (floor(b2 / 4) % 4).as("__srIdx"),
      ((floor(b3 / 64) % 4) === 3L).as("__mono"))
    val verBits = col("__verBits")
    val isV1 = verBits === 3L
    val headerOk = coalesce(col("__hok") &&
      hx.substr(hp, lit(2)) === "FF" && (b1 >= 224L) &&
      col("__layer") === 1L && verBits =!= 1L &&
      col("__brIdx").between(1L, 14L) && col("__srIdx") <= 2L, lit(false))
    // published Layer III tables (kbps / Hz); MPEG2 and 2.5 share the
    // bitrate column, sample rates differ by version. Indices clamp to
    // in-bounds when the header is invalid — ANSI element_at would
    // otherwise ERROR on a garbage row the probe must map to
    // valid=false (the final projection nulls the clamped lookups out)
    val brIdxI = when(headerOk, col("__brIdx")).otherwise(1L).cast("int")
    val srIdxI = when(headerOk, col("__srIdx") + 1).otherwise(1L).cast("int")
    d = keep(d, headerOk.as("__headok"),
      when(isV1, element_at(array(Seq(32, 40, 48, 56, 64, 80, 96, 112, 128,
          160, 192, 224, 256, 320).map(lit): _*), brIdxI))
        .otherwise(element_at(array(Seq(8, 16, 24, 32, 40, 48, 56, 64, 80,
          96, 112, 128, 144, 160).map(lit): _*), brIdxI))
        .cast(LongType).as("__br"),
      when(verBits === 3L, element_at(array(Seq(44100, 48000, 32000)
          .map(lit): _*), srIdxI))
        .when(verBits === 2L, element_at(array(Seq(22050, 24000, 16000)
          .map(lit): _*), srIdxI))
        .otherwise(element_at(array(Seq(11025, 12000, 8000)
          .map(lit): _*), srIdxI))
        .cast(LongType).as("__sr"),
      when(isV1, 1152L).otherwise(576L).as("__spf"),
      // Xing/Info block position: header + side info, mode-dependent
      (hp + when(isV1, when(col("__mono"), 21L).otherwise(36L))
        .otherwise(when(col("__mono"), 13L).otherwise(21L)) * 2)
        .as("__xp"))
    val xp = col("__xp")
    d = keep(d, hx.substr(xp, lit(8)).as("__magic"))
    val hasBlock = col("__headok") &&
      col("__magic").isin("58696E67", "496E666F") // "Xing" / "Info"
    d = keep(d,
      (hasBlock && xp + 23 <= hxLen && u32(xp + 8) % 2 === 1L)
        .as("__framed"),
      when(hasBlock, u32(xp + 16)).as("__frames"))
    val framed = coalesce(col("__framed"), lit(false))
    val valid = col("__headok")
    val durMs = when(framed,
      floor((col("__frames") * col("__spf") * 1000L).cast("double") /
        col("__sr").cast("double") + 0.5))
      .otherwise(floor(((col("__nb") - col("__off")) * 8000L).cast("double") /
        (col("__br") * 1000L).cast("double") + 0.5))
    d.select(col("media_id"), valid.as("valid"),
      when(valid, when(verBits === 3L, "1").when(verBits === 2L, "2")
        .otherwise("2.5")).as("version"),
      when(valid, col("__br")).as("bitrate_kbps"),
      when(valid, col("__sr")).as("sample_rate"),
      when(valid, col("__magic") === "58696E67").as("vbr"),
      when(valid && framed, col("__frames")).as("n_frames"),
      when(valid, durMs).cast(LongType).as("duration_ms"))
  }

  /** Codec-free WebM/Matroska duration probe — the EBML sibling of
    * [[videoDuration]]'s ISO-BMFF walk (together they cover the two
    * dominant video containers): Segment → Info carries Duration (a
    * FLOAT, in TimestampScale units) at no fixed offset, so the probe
    * is a REAL bounded EBML walk (RFC 8794, public), not an offset
    * guess.
    *
    * EBML elements are `[varint ID][varint size][payload]`: the leading
    * byte's high bits give each varint's length (IDs keep their marker
    * bit per the spec's quoted form, sizes strip it — subtracting
    * 2^(7·len)). The walk: up to 2 top-level elements to find Segment
    * (`18538067`, its UNKNOWN-size `01FF…` streaming form accepted —
    * only the payload position is needed), up to 6 Segment children
    * (SeekHead/Void commonly precede) to find Info (`1549A966`), up to
    * 6 Info children for TimestampScale (`2AD7B1`, uint, default
    * 1 000 000 ns absent) and Duration (`4489`, float64 or float32).
    * Floats decode bit-exactly in-plan: (2^52+mantissa)·2^(exp−1075)
    * via shiftright/% field extraction and a power-of-two multiply —
    * IEEE-exact, no string round-trip (denormals render 0, ±Inf/NaN
    * land on the guard). duration_ms floors from
    * duration·scale_ns/10^6 + 0.5. Any malformed varint, out-of-bounds
    * jump, or missing element → valid=false, null fields. Returns
    * (media_id, valid, timescale_ns, duration_ms). */
  def webmDuration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    def keep(d: DataFrame, cols: Column*): DataFrame =
      d.select(d.columns.map(col) ++ cols: _*)
    val hx = col("__hx")
    val hxLen = length(hx).cast(LongType)
    def u8at(pos: Column): Column =
      conv(hx.substr(pos, lit(2)), 16, 10).cast(LongType)
    def idLen(b: Column): Column = when(b >= 128L, 1L).when(b >= 64L, 2L)
      .when(b >= 32L, 3L).when(b >= 16L, 4L)
    def szLen(b: Column): Column = when(b >= 128L, 1L).when(b >= 64L, 2L)
      .when(b >= 32L, 3L).when(b >= 16L, 4L).when(b >= 8L, 5L)
      .when(b >= 4L, 6L).when(b >= 2L, 7L).when(b >= 1L, 8L)
    def markerOf(l: Column): Column = when(l === 1L, 128L)
      .when(l === 2L, 16384L).when(l === 3L, 2097152L)
      .when(l === 4L, 268435456L).when(l === 5L, 34359738368L)
      .when(l === 6L, 4398046511104L).when(l === 7L, 562949953421312L)
      .when(l === 8L, 72057594037927936L)
    // one element step at byte-hex position p, emitting ${pre}id/sz/pay
    // and the next-sibling position as ${pre}nx. EVERY intermediate (the
    // two varint lengths, then id/size/payload) lands as a NAMED COLUMN
    // in its own projection before anything reads it — the TiffWalk
    // staging rule taken one level deeper: the first cut staged only the
    // POSITIONS and let il/sl inline ~6x into each step's outputs, which
    // compounded across 14 steps into a 1.6 MB plan and ~10 s of
    // analyzer/codegen per run (measured; 0.15 s after staging).
    def stepStaged(d0: DataFrame, p: Column, pre: String): DataFrame = {
      var d = keep(d0, idLen(u8at(p)).as(pre + "il"))
      val il = col(pre + "il")
      d = keep(d, szLen(u8at(p + il * 2)).as(pre + "sl"))
      val sl = col(pre + "sl")
      d = keep(d,
        hx.substr(p, (il * 2).cast("int")).as(pre + "id"),
        (conv(hx.substr(p + il * 2, (sl * 2).cast("int")), 16, 10)
          .cast(LongType) - markerOf(sl)).as(pre + "sz"),
        (p + (il + sl) * 2).as(pre + "pay"))
      val size = col(pre + "sz")
      val payload = col(pre + "pay")
      keep(d, when(size >= 0L && payload + size * 2 <= hxLen + 1,
        payload + size * 2).as(pre + "nx"))
    }
    val base = df.select(col(idCol).as("media_id"),
      upper(hex(col(binCol))).as("__hx"))
    // top-level: find Segment within 2 elements
    var d = keep(base, lit(1L).as("__g0nx"))
    for (i <- 0 until 2)
      d = stepStaged(d, col(s"__g${i}nx"), s"__g${i + 1}")
    val segPay = coalesce((1 to 2).map(i =>
      when(col(s"__g${i}id") === "18538067", col(s"__g${i}pay"))): _*)
    // Segment children: find Info within 6
    d = keep(d, segPay.as("__s0nx"))
    for (i <- 0 until 6)
      d = stepStaged(d, col(s"__s${i}nx"), s"__s${i + 1}")
    val infoPay = coalesce((1 to 6).map(i =>
      when(col(s"__s${i}id") === "1549A966", col(s"__s${i}pay"))): _*)
    // Info children: TimestampScale (uint) + Duration (float)
    d = keep(d, infoPay.as("__c0nx"))
    for (i <- 0 until 6)
      d = stepStaged(d, col(s"__c${i}nx"), s"__c${i + 1}")
    def firstChild(wanted: String, f: (Column, Column) => Column): Column =
      coalesce((1 to 6).map(i => when(col(s"__c${i}id") === wanted,
        f(col(s"__c${i}sz"), col(s"__c${i}pay")))): _*)
    // toBase -10: SIGNED two's-complement read — conv's unsigned string
    // for a high-bit-set 8-byte field would THROW under ANSI cast; the
    // negative result instead fails the bits>0 / scale>0 guards cleanly
    val tsRead = firstChild("2AD7B1", (sz, pay) =>
      when(sz.between(1L, 8L) && pay + sz * 2 <= hxLen + 1,
        conv(hx.substr(pay, (sz * 2).cast("int")), 16, -10).cast(LongType)))
    val durBits = firstChild("4489", (sz, pay) =>
      when(sz.isin(4L, 8L) && pay + sz * 2 <= hxLen + 1,
        conv(hx.substr(pay, (sz * 2).cast("int")), 16, -10).cast(LongType)))
    val durSz = firstChild("4489", (sz, _) => sz)
    d = keep(d, tsRead.as("__ts"), durBits.as("__db"), durSz.as("__dsz"))
    val bits = col("__db")
    // IEEE decode: exponent/mantissa by shift and modulus, value =
    // (2^p + mant) * 2^(exp - bias - p); zero bits -> 0.0; a negative
    // raw (sign bit set) or all-ones exponent (Inf/NaN) fails the guard
    val f64 = (col("__db") % 4503599627370496L + 4503599627370496L)
      .cast("double") * pow(lit(2.0), shiftright(bits, 52) % 2048L - 1075L)
    val f32 = (col("__db") % 8388608L + 8388608L).cast("double") *
      pow(lit(2.0), shiftright(bits, 23) % 256L - 150L)
    val exp64 = shiftright(bits, 52) % 2048L
    val exp32 = shiftright(bits, 23) % 256L
    val durVal = when(bits === 0L, lit(0.0))
      .when(col("__dsz") === 8L && bits > 0L && exp64 === 0L, lit(0.0))
      .when(col("__dsz") === 8L && bits > 0L && exp64 =!= 2047L, f64)
      .when(col("__dsz") === 4L && bits > 0L && exp32 === 0L, lit(0.0))
      .when(col("__dsz") === 4L && bits > 0L && exp32 =!= 255L, f32)
    val scale = coalesce(col("__ts"), lit(1000000L))
    val valid = coalesce(durVal.isNotNull && durVal >= 0.0 && scale > 0L,
      lit(false))
    d.select(col("media_id"), valid.as("valid"),
      when(valid, scale).as("timescale_ns"),
      when(valid, floor(durVal * scale.cast("double") / 1.0e6 + 0.5))
        .cast(LongType).as("duration_ms"))
  }

  /** Codec-free Ogg/Opus duration probe — the streaming-audio sibling
    * of [[flacDuration]] (together with WAV/MP3 the audio container
    * tier is complete): an Ogg stream's duration lives in its LAST
    * page's granule position (RFC 3533 §6 — for Opus, RFC 7845 §4:
    * 48 kHz sample count, minus the OpusHead pre-skip).
    *
    *  - the FIRST page's payload (at byte 27+nsegs, past the segment
    *    table) is probed for the `OpusHead` magic; channels u8 and
    *    pre-skip u16 LE read at +9/+10. Non-Opus Ogg (Vorbis, ...) →
    *    valid=false: no other codec's granule→time mapping is known
    *    without its own head parse.
    *  - the LAST page is located with ONE greedy aligned scan over the
    *    hex encoding — `^(?:..)*4F676753(.{20})` captures the 10 bytes
    *    after the final byte-aligned `OggS` (version, header type,
    *    granule u64 LE); the greedy prefix forces the LAST occurrence
    *    the way the JPEG SOF scan forces the FIRST. O(blob) once per
    *    row, the documented cost class of [[imageDims]]'s SOF scan.
    *    The EOS flag (0x04) is reported, not required — a truncated
    *    live stream still has a best-known duration.
    *
    * duration_ms floors from (granule − preskip)·1000/48000; a granule
    * below pre-skip (pathological) or a signed-overflow granule fails
    * the guard. Truncated/garbage → valid=false, null fields. Returns
    * (media_id, valid, channels, pre_skip, eos, granule, duration_ms). */
  def oggDuration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    def keep(d: DataFrame, cols: Column*): DataFrame =
      d.select(d.columns.map(col) ++ cols: _*)
    val hx = col("__hx")
    def u8(bytePos: Int): Column =
      conv(substring(hx, bytePos * 2 + 1, 2), 16, 10).cast(LongType)
    val base = df.select(col(idCol).as("media_id"),
      upper(hex(col(binCol))).as("__hx"))
    val isOgg = hx.startsWith("4F676753")
    // first-page payload position: 27 header bytes + nsegs(@26) table
    var d = keep(base, when(isOgg && length(hx) >= 54,
      (lit(27L) + u8(26)) * 2 + 1).as("__pp"))
    val pp = col("__pp")
    d = keep(d,
      (hx.substr(pp, lit(16)) === "4F70757348656164").as("__opus"),
      // channels u8 @ payload+9; pre-skip u16 LE @ payload+10
      conv(hx.substr(pp + 18, lit(2)), 16, 10).cast(LongType).as("__ch"),
      conv(concat(hx.substr(pp + 22, lit(2)), hx.substr(pp + 20, lit(2))),
        16, 10).cast(LongType).as("__skip"),
      regexp_extract(hx, "^(?:..)*4F676753(.{20})", 1).as("__last"))
    val last = col("__last")
    val granule = conv(concat((0 until 8).reverse.map(i =>
      substring(last, 5 + i * 2, 2)): _*), 16, -10).cast(LongType)
    d = keep(d,
      (conv(substring(last, 3, 2), 16, 10).cast(LongType) % 8 >= 4)
        .as("__eos"),
      granule.as("__gr"))
    val valid = coalesce(col("__opus") && col("__gr") >= col("__skip"),
      lit(false))
    d.select(col("media_id"), valid.as("valid"),
      when(valid, col("__ch")).as("channels"),
      when(valid, col("__skip")).as("pre_skip"),
      when(valid, col("__eos")).as("eos"),
      when(valid, col("__gr")).as("granule"),
      when(valid, floor(((col("__gr") - col("__skip")) * 1000L)
        .cast("double") / 48000.0 + 0.5)).cast(LongType).as("duration_ms"))
  }

  /** Codec-free FLAC duration probe — completes the audio triage tier
    * ([[audioDuration]] PCM WAV, [[mp3Duration]] MPEG): the STREAMINFO
    * metadata block is REQUIRED to be the first block after the `fLaC`
    * magic (FLAC spec §"METADATA_BLOCK"), so every field sits at a
    * fixed offset — no walk needed. Its packed 8 bytes at offsets
    * 18–25 carry sample rate (20 bits), channels−1 (3), bits-per-
    * sample−1 (5), and total samples (36), decoded PIECEWISE from u8
    * reads (a single u64 conv could exceed signed-long range for
    * in-spec sample rates ≥ 2^19). The block header is validated:
    * type bits 0 (STREAMINFO; the is-last flag bit is legitimately
    * either) and length 34. Sample rate 0 (non-audio stream), a
    * truncated block, or a wrong magic/type/length → valid=false,
    * null fields. duration_ms floors from the exact integer numerator
    * over IEEE double division (the [[mp3Duration]] shape). Returns
    * (media_id, valid, sample_rate, channels, bits_per_sample,
    * n_samples, duration_ms). */
  def flacDuration(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hx = upper(hex(col(binCol)))
    def u8(bytePos: Int): Column =
      conv(substring(hx, bytePos * 2 + 1, 2), 16, 10).cast(LongType)
    def u32be(bytePos: Int): Column =
      conv(substring(hx, bytePos * 2 + 1, 8), 16, 10).cast(LongType)
    val isFlac = hx.startsWith("664C6143")
    // block header at byte 4: 1 bit is-last + 7 bits type (0 =
    // STREAMINFO), u24 BE length (= 34); STREAMINFO spans bytes 8..41
    val headOk = isFlac && length(hx) >= 84 &&
      (u8(4) % 128) === 0L &&
      conv(substring(hx, 11, 6), 16, 10).cast(LongType) === 34L
    val rate = u8(18) * 4096L + u8(19) * 16L + floor(u8(20) / 16)
    val channels = floor(u8(20) / 2) % 8 + 1
    val bps = (u8(20) % 2) * 16L + floor(u8(21) / 16) + 1
    val nSamples = (u8(21) % 16) * 4294967296L + u32be(22)
    val valid = coalesce(headOk && rate > 0L, lit(false))
    df.select(col(idCol).as("media_id"), valid.as("valid"),
      when(valid, rate).as("sample_rate"),
      when(valid, channels).cast(LongType).as("channels"),
      when(valid, bps).cast(LongType).as("bits_per_sample"),
      when(valid, nSamples).as("n_samples"),
      when(valid, floor((nSamples * 1000L).cast("double") /
        rate.cast("double") + 0.5)).cast(LongType).as("duration_ms"))
  }

  /** The APP1 regex over the whole blob runs ONCE per row: it lands in
    * its own projection and every downstream read references the
    * attribute — inlining it would re-run the O(blob) scan inside each
    * downstream expression (no CSE across projections' lambda bodies). */
  private def exifTiff(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      regexp_extract(upper(hex(col(binCol))),
        "^FFD8(?:..)*?FFE1....457869660000(.*)$", 1).as("__tiff"))

  /** The staged IFD0 walk shared by [[exifProbe]] and [[exifGps]] —
    * APP1 extraction, endianness, IFD0 offset/entry-count/table slice,
    * and the orientation read, each landing as a NAMED column in its own
    * projection (the staging rule both probes depend on). Output columns:
    * media_id, __tiff, __le, __ifd0, __n0, __table0, __orient. */
  private def ifd0Stage(df: DataFrame, binCol: String, idCol: String,
      w: TiffWalk): DataFrame = {
    import w._
    val s1 = keep(
      exifTiff(df, binCol, idCol).withColumn("__le", tiff.startsWith("4949")),
      hexPos(u32(lit(9))).as("__ifd0")) // IFD0 offset u32 at TIFF byte 4
    val s2 = keep(s1, u16(col("__ifd0")).as("__n0"))
    val s3 = keep(s2, ifdTable(col("__ifd0"), col("__n0")).as("__table0"))
    keep(s3, entryU16(col("__table0"), 0x0112).as("__orient")) // SHORT inline
  }

  /** structural validity shared by the EXIF probes: right magic+order,
    * sane in-bounds IFD0 entry count */
  private def exifValid(tiff: Column, le: Column, ifd0: Column,
      n0: Column): Column = {
    val orderOk = (tiff.startsWith("49492A00") && le) ||
      tiff.startsWith("4D4D002A")
    coalesce(tiff =!= "" && orderOk && n0.isNotNull && n0.between(1, 64) &&
      (ifd0 + 4 + n0 * 24 - 1) <= length(tiff), lit(false))
  }

  /** Endian-aware TIFF readers over the hex-encoded APP1 payload —
    * shared by [[exifProbe]] and [[exifGps]]. `pos` is a 1-based HEX
    * position Column. STAGED EVALUATION, deliberately: every
    * intermediate (ifd0, n0, table0, subIfd, ...) lands as a NAMED
    * COLUMN in its own projection (the `keep` helper) before anything
    * reads it — inlining them instead multiplies the whole lower subtree
    * into every reader (each level duplicates 2-4x, six levels deep),
    * and the resulting combinatorial expression tree cost ~30 s of
    * analyzer/codegen time per query, independent of rows (r17
    * post-mortem, SCALE.md). */
  private final class TiffWalk(val tiff: Column, val le: Column) {
    def rd(pos: Column, nPairs: Int): Column = {
      val pairs = (0 until nPairs).map(i => tiff.substr(pos + i * 2, lit(2)))
      val beHex = concat(pairs: _*)
      val leHex = concat(pairs.reverse: _*)
      conv(when(le, leHex).otherwise(beHex), 16, 10).cast(LongType)
    }
    def u16(pos: Column): Column = rd(pos, 2)
    def u32(pos: Column): Column = rd(pos, 4)
    def hexPos(byteOff: Column): Column = byteOff * 2 + 1
    // endian-swap a CAPTURED value-field string
    def swap16(c: Column): Column = concat(substring(c, 3, 2), substring(c, 1, 2))
    def swap32(c: Column): Column = concat(substring(c, 7, 2),
      substring(c, 5, 2), substring(c, 3, 2), substring(c, 1, 2))
    def tagHexBE(t: Int): String = f"$t%04X"
    def tagHexLE(t: Int): String =
      tagHexBE(t).substring(2) + tagHexBE(t).substring(0, 2)
    // entry layout: tag(4) type(4) count(8) value(8) = 24 hex chars; the
    // stride-aligned lazy scan finds the tag's entry and captures from its
    // value field. Absent tag → regexp_extract '' → conv null.
    def entryCapture(table: Column, tag: Int, capture: String): Column = {
      def pat(tagHex: String) = s"^(?:.{24})*?$tagHex.{12}$capture"
      when(le, regexp_extract(table, pat(tagHexLE(tag)), 1))
        .otherwise(regexp_extract(table, pat(tagHexBE(tag)), 1))
    }
    def entryU16(table: Column, tag: Int): Column = {
      val c = entryCapture(table, tag, "(....)")
      conv(when(le, swap16(c)).otherwise(c), 16, 10).cast(LongType)
    }
    def entryU32(table: Column, tag: Int): Column = {
      val c = entryCapture(table, tag, "(.{8})")
      conv(when(le, swap32(c)).otherwise(c), 16, 10).cast(LongType)
    }
    def hasTag(table: Column, tag: Int): Column =
      when(le, table.rlike(s"^(?:.{24})*?${tagHexLE(tag)}"))
        .otherwise(table.rlike(s"^(?:.{24})*?${tagHexBE(tag)}"))
    def ifdTable(ifdPos: Column, n: Column): Column =
      tiff.substr(ifdPos + 4,
        (coalesce(least(greatest(n, lit(0L)), lit(64L)), lit(0L)) * 24)
          .cast("int"))
    def keep(df: DataFrame, cols: Column*): DataFrame =
      df.select(df.columns.map(col) ++ cols: _*)
  }

  /** The mapPartitions decode loop a real codec would use (the Scala
    * analogue of mapInPandas batches): demonstrates the per-partition
    * batching shape with the STUB codec. */
  def decodePartitioned(media: DataFrame, dim: Int): DataFrame = {
    val session = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      // real impl: initialize the codec ONCE per partition here  // ??? codec
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val base = java.lang.Long.parseLong(
          h.take(4).map("%02x".format(_)).mkString, 16).toDouble
        org.apache.spark.sql.Row(id,
          (0 until dim).map(i => math.rint(((base + i * 31.0) % 1000.0) / 1000.0 * 1e6) / 1e6))
      }
    }
    session.createDataFrame(rdd, outSchema)
  }
}

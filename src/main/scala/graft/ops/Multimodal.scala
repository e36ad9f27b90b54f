package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * partition-level batch transform (`mapPartitions` over a typed
  * Dataset — the Scala analogue of arrow-batched pandas UDFs).
  *
  * Image payloads (`image/ *` media types) decode for REAL through
  * javax.imageio, and audio payloads (`audio/ *`) through
  * javax.sound.sampled (WAV/AIFF/AU — the formats the JDK ships
  * codecs for) — both in the JDK, so the offline build still works.
  * Video decode is STUBBED with a deterministic fake (no ffmpeg class
  * of libs in this container — see the builder brief): the Spark-side
  * plumbing (schema, partitioning, batch iteration, typed output) is
  * identical either way.
  */
object Multimodal {

  // ImageIO's default ImageInputStream is DISK-cached: every decode
  // creates (and deletes) a temp file, so concurrent decode tasks
  // serialize on the filesystem journal exactly like shuffle-file
  // creation (the Bench tmpfs lesson — measured 9.2 s of summed task
  // time for 5.5k in-memory 8×8 BMP decodes at 32-wide before this,
  // 3.6 s after). Payloads here are in-memory byte arrays; cache in
  // memory. JVM-global, set once on first decode.
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  case class MediaRecord(media_id: Long, payload: Array[Byte],
      media_type: String)
  /** `width/height/n_frames` carry image geometry (stills: n_frames=1);
    * `sample_rate/channels/n_frames` carry audio shape (frames =
    * samples per channel); the modalities a field doesn't apply to
    * leave it at the stub value. */
  case class MediaFeatures(media_id: Long, media_type: String,
      byte_len: Long, width: Int, height: Int, n_frames: Int,
      sample_rate: Int, channels: Int, checksum: Long)

  /** Deterministic fake decoder: "parses" the payload header into
    * dimensions + a checksum. Replace body with a real codec
    * (javacv/ffmpeg) when available; the dataflow does not change. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length.toLong
    var crc = 0L
    var i = 0
    while (i < r.payload.length) { crc = 31 * crc + r.payload(i); i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      byte_len = len,
      width = (len % 64).toInt + 1,
      height = ((len / 64) % 64).toInt + 1,
      n_frames = (len % 7).toInt + 1,
      sample_rate = 0,
      channels = 0,
      checksum = crc)
  }

  /** Real decode for image payloads: javax.imageio parses the actual
    * PNG/JPEG/GIF/BMP bytes into true width/height (byte_len/checksum
    * stay payload-derived, n_frames = 1 for stills). Real decode for
    * audio payloads: javax.sound.sampled parses the actual WAV/AIFF/AU
    * header into sample rate, channel count and frame count. Anything
    * the JDK codecs can't read — video, torn payload — degrades to the
    * deterministic stub instead of failing the partition: at corpus
    * scale a few corrupt blobs are data, not an exception. */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.media_type != null && r.media_type.startsWith("image/")) {
      try {
        imageIoMemCache
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) fakeDecode(r)
        else fakeDecode(r)
          .copy(width = img.getWidth, height = img.getHeight, n_frames = 1)
      } catch { case _: Exception => fakeDecode(r) }
    } else if (r.media_type != null && r.media_type.startsWith("audio/")) {
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          // frame length can be AudioSystem.NOT_SPECIFIED (-1) for
          // streaming containers; -1 is kept as the explicit
          // "not specified" sentinel in the output. Valid counts are
          // clamped to Int.MaxValue: getFrameLength is a long, and a
          // >2³¹-frame file (~13.5 h at 44.1 kHz) must not wrap
          // negative through toInt.
          val frames = ais.getFrameLength
          fakeDecode(r).copy(
            width = 0, height = 0,
            n_frames = if (frames < 0) -1
                       else math.min(frames, Int.MaxValue.toLong).toInt,
            sample_rate = fmt.getSampleRate.toInt,
            channels = fmt.getChannels)
        } finally ais.close()
      } catch { case _: Exception => fakeDecode(r) }
    } else fakeDecode(r)

  /** Batch feature extraction: repartition for decode parallelism (media
    * decode is CPU-bound — partition count should be ≈ total cores, not
    * file count), then one pass per partition. */
  def extractFeatures(media: Dataset[MediaRecord], partitions: Int)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions)
      .mapPartitions(_.map(decode))
  }

  /** Canonical PCM16 little-endian WAV payload, synthesized through the
    * real JDK encoder (AudioSystem.write) so the decode side exercises
    * a genuine round-trip: 44-byte RIFF header + nFrames·channels·2
    * data bytes. Sample i is a deterministic triangle-ish ramp so the
    * payload (and thus checksum) is reproducible. */
  def wavPayload(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] =
    wavPayload(sampleRate, channels, nFrames, 0)

  /** `seed` selects the waveform, so distinct fixture ids carry
    * distinct CONTENT, not just distinct length. The waveform has the
    * macro-structure real audio has (and the byte-ramp it replaces did
    * not): a per-16-sample-block, per-polyphase-band gain envelope
    * drawn from the repo's validated 3-round multiply-mod-p +
    * xorshift mixer (the image fixture's pixelGray recipe — a single
    * Lehmer round is LINEAR across seeds: the first cut here entered
    * the seed additively and seeds 94 apart collided to within the
    * near-dup threshold), modulating a seeded carrier. Interleaved
    * sample j, block k = j/16, band b = j%4:
    *
    *   t(j)   = (31·j + 7 + 17·seed) mod 64 + 224          (carrier)
    *   u1     = ((seed·256 + k·4 + b) mod (2³¹−2) + 1)·48271 mod (2³¹−1)
    *   u3     = (xor(u1, u1/2¹⁵)·69621) mod (2³¹−1)
    *   env    = xor(u3, u3/2¹³) mod 2
    *   s(j)   = t(j) · (if env = 1 then 96 else 6)
    *
    * so adjacent 16-sample blocks carry loud (≈24k peak) or quiet
    * (≈1.6k peak) energy per band — the structure
    * [[audioFingerprint]]'s band-delta bits measure. All arithmetic
    * fits BIGINT, so a DuckDB oracle rebuilds every sample exactly.
    * seed = 0 is the original payload. */
  def wavPayload(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ns = nFrames * channels
    val pcm = new Array[Byte](ns * 2)
    var j = 0
    while (j < ns) {
      val t = (31L * j + 7 + 17L * seed) % 64 + 224
      val key = 256L * seed + 4L * (j / 16) + j % 4
      val u1 = (key % 2147483646L + 1L) * 48271L % 2147483647L
      val u3 = (u1 ^ (u1 / 32768L)) * 69621L % 2147483647L
      val env = (u3 ^ (u3 / 8192L)) % 2
      val s = (t * (if (env == 1) 96 else 6)).toInt
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 64-bit audio perceptual fingerprint over the REAL WAV decode path
    * — chromaprint-SHAPED (the public Chromaprint/AcoustID recipe:
    * decode → time × band energy image → derivative-style filters →
    * compact bit signature → banded candidate join), with the FFT
    * filterbank replaced by a polyphase band split so every step
    * replays exactly in BIGINT SQL (the q_knn_int8 exactness stance;
    * a float FFT would be engine-rounding-dependent).
    *
    * Shape (the round-12 verdict's demanded upgrade from the
    * whole-file energy grid, whose global-mean thresholds fused the
    * corpus at any useful Hamming threshold):
    *  - frames are ABSOLUTE 16-sample windows (k = j/16), not
    *    file-relative slices — an append/trim edit leaves every
    *    interior frame's samples bit-identical instead of shifting
    *    all 8 slice boundaries;
    *  - the signature reads a LEADING WINDOW of 17 complete frames
    *    (272 samples) — the Chromaprint stance: the public algorithm
    *    fingerprints a leading window of the clip, not the whole
    *    file. Append/trim edits beyond the window flip ZERO bits; an
    *    in-window corruption of one sample flips ≤ 2 (its band's two
    *    adjacent deltas). W and the frame count are the knobs a real
    *    deployment sizes to its clip-length distribution;
    *  - 4 polyphase bands (j mod 4 — the even/odd × channel energy
    *    split a real filterbank refines);
    *  - bit (k−1)·4+b, k ∈ [1, 16], is a per-frame band DELTA:
    *    set iff band-b energy of frame k exceeds band-b energy of
    *    frame k−1 (Σ|s| over the 4 samples each; equal counts, so
    *    comparing sums ≡ comparing means with no division). Adjacent
    *    frame comparisons have no global reference value, so there is
    *    no corpus-wide threshold for a whole corpus to straddle —
    *    the failure mode of the r12 signature.
    *
    * ALL 64 bits are content-bearing for any input ≥ 272 samples —
    * load-bearing for the banded near-dup join: a first cut used
    * 2 bands × 32 deltas over up to 33 frames, which left the high
    * band all-zero for every file under ~416 samples; ~15% of the
    * corpus hashed into ONE band bucket and the 64× scale-ramp cell
    * went quadratic in it (one straggler task, 38 CPU-minutes —
    * caught by the ramp harness, the same Σ|bucket|² failure mode as
    * SCALE.md's fixed-planes control row). Files shorter than 272
    * samples get zero bits beyond their last complete frame; a corpus
    * dominated by such clips should shrink W accordingly or the
    * zero-band bucket re-forms.
    *
    * Decode is the real javax.sound.sampled parse of the payload
    * bytes — a wrong header parse, wrong endianness, or wrong frame
    * count CANNOT hash-match the oracle's from-formula replay. Only
    * PCM_SIGNED 16-bit little-endian is fingerprinted (the canonical
    * warehouse normalization); anything else → None, same junk
    * stance as [[imageAHash]]. Returned as two 32-bit halves in
    * Longs, [[aHashHamming]]/[[aHashNearDupPairs]]-compatible — the
    * audio near-dup join IS the image one over different bits. */
  def audioFingerprint(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          if (n == 0) None
          else {
            val frames = math.min(n / 16, 17)
            val cells = Array.ofDim[Long](math.max(frames, 1), 4)
            val lim = frames * 16
            var j = 0
            while (j < lim) {
              val v = (bytes(2 * j + 1).toInt << 8) |
                (bytes(2 * j).toInt & 0xff)
              cells(j >> 4)(j & 3) += math.abs(v.toLong)
              j += 1
            }
            var hi = 0L
            var lo = 0L
            var k = 1
            while (k < frames) {
              var b = 0
              while (b < 4) {
                if (cells(k)(b) > cells(k - 1)(b)) {
                  val idx = (k - 1) * 4 + b
                  if (idx < 32) lo |= 1L << idx
                  else hi |= 1L << (idx - 32)
                }
                b += 1
              }
              k += 1
            }
            Some((hi, lo))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic uncompressed 24-bit BMP with equal BGR channels
    * (grayscale payload) — the media fixture for the REAL image-hash
    * decode path: every JDK's ImageIO reads BMP with no external
    * codecs, so unlike video this path needs no stub. `gray(j)` is the
    * row-major 8-bit value of pixel j. Rows are stored bottom-up per
    * the BMP spec; the writer reverses so DECODED (x, y) returns
    * gray(y·w + x). */
  def bmpPayload(gray: Int => Int, w: Int, h: Int): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val b = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val g = (gray(row * w + x) & 0xff).toByte
        b.put(g).put(g).put(g)
        x += 1
      }
      var p = 0
      while (p < pad) { b.put(0.toByte); p += 1 }
      row -= 1
    }
    b.array()
  }

  /** 64-bit average hash (aHash — the public perceptual-hash family's
    * baseline member): REAL ImageIO decode, block-mean downsample to
    * 8×8 in pure integer arithmetic, threshold at the integer mean of
    * the 64 cell means; bit j (row-major) is set iff cell j EXCEEDS
    * the mean. Returned as two 32-bit halves carried in Longs so a SQL
    * oracle rebuilds the value without signed-64-bit overflow (bit 63
    * would need 2⁶³, which BIGINT cannot hold). Near-identical images
    * land within a small Hamming distance; unrelated images differ in
    * ~32 bits — the dedup-blocking contract SimHash already
    * establishes for text, extended to pixels. None = undecodable. */
  def imageAHash(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      imageIoMemCache
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val cx = x * 8 / w
            sums(cy * 8 + cx) += (img.getRGB(x, y) & 0xff).toLong
            cnts(cy * 8 + cx) += 1
            x += 1
          }
          y += 1
        }
        val cell = Array.tabulate(64)(j =>
          if (cnts(j) == 0) 0L else sums(j) / cnts(j))
        val mean = cell.sum / 64
        var hi = 0L
        var lo = 0L
        var j = 0
        while (j < 64) {
          if (cell(j) > mean) {
            if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
          }
          j += 1
        }
        Some((hi, lo))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Hamming distance between two (hi, lo) aHash halves. */
  def aHashHamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  /** Image near-duplicate pairs over (hi, lo) aHash halves: the 64
    * bits split into 4 × 16-bit bands; candidates share at least one
    * exact band (a bucket equi-join — never all-pairs), then verify
    * Hamming ≤ `maxHamming` exactly. `maxHamming` ≤ 3 is REQUIRED:
    * with 4 bands, ≤3 differing bits pigeonhole at least one band
    * clean, so recall is 1.0 by construction — at 4 the guarantee
    * collapses (one flip per band evades every bucket) and the
    * operator would silently under-report. Rows with a null hash half
    * (an undecodable payload upstream) match no band bucket and drop
    * out of the pair set — filter or route them explicitly if they
    * must be accounted for. Scale shape is SimHash's:
    * 4 narrow (band, value, id) postings rows per image, bucket join,
    * ids-only shuffle, exact popcount verify on the pair list. */
  def aHashNearDupPairs(hashes: DataFrame, idCol: String,
      hiCol: String, loCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (4-band recall guarantee), got $maxHamming")
    val bands = hashes.select(col(idCol).as("id"),
        col(hiCol).as("hi"), col(loCol).as("lo"))
      .withColumn("band", explode(array(
        struct(lit(0).as("bi"), (col("lo") % 65536).as("bv")),
        struct(lit(1).as("bi"),
          ((col("lo") / 65536) % 65536).cast("long").as("bv")),
        struct(lit(2).as("bi"), (col("hi") % 65536).as("bv")),
        struct(lit(3).as("bi"),
          ((col("hi") / 65536) % 65536).cast("long").as("bv")))))
      .select(col("id"), col("hi"), col("lo"),
        col("band.bi"), col("band.bv"))
    val a = bands.select(col("bi"), col("bv"), col("id").as("a_id"),
      col("hi").as("ha"), col("lo").as("la"))
    val b = bands.select(col("bi"), col("bv"), col("id").as("b_id"),
      col("hi").as("hb"), col("lo").as("lb"))
    a.join(b, Seq("bi", "bv")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "ha", "la", "hb", "lb")
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Build a media table from documents (payload = utf-8 bytes) — the
    * fixture path; a real pipeline reads payloads from object storage. */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      expr("to_binary(text, 'utf-8')").as("payload"),
      concat(lit("fake/"), col("lang")).as("media_type"))
      .as[MediaRecord]
  }
}

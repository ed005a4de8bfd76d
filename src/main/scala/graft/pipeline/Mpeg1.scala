package graft.pipeline

/** Hand-rolled MPEG-1 video (ISO/IEC 11172-2) I/P-frame decoder — the
  * inter-frame half of the multimodal story (VERDICT r10 item 6). The
  * Y4M path decodes an uncompressed container and the MJPEG path
  * delegates intra-frame decode to the JDK codec; neither exercises
  * INTER-frame state (motion compensation, skipped-macroblock copy,
  * residual accumulation), which is what every real video corpus
  * arrives with. No JVM codec exists for any inter-frame format and the
  * dependency budget admits none, so this module implements the oldest,
  * fully-published one from the spec:
  *
  *   - sequence / GOP / picture / slice / macroblock / block layers,
  *     start-code navigation, byte-aligned resynchronization;
  *   - intra macroblocks: DC size VLCs (tables B.12/B.13), DC
  *     prediction with 1024 reset, AC run-level VLC (table B.14 through
  *     its 14-bit group, plus the ESCAPE form), zigzag de-scan, default
  *     intra quantizer matrix, the spec's oddification mismatch
  *     control, and a double-precision IDCT;
  *   - P-pictures: macroblock type table B.2b, skipped macroblocks
  *     (previous-frame copy), forward motion vectors (table B.4 via its
  *     B.1 isomorphism, f_code residuals, full- AND half-pel
  *     prediction), non-intra dequantization, residual accumulation.
  *
  * Documented constraints (all rejected LOUDLY, surfacing as the
  * decoded=false resilience rows, never wrong pixels): B-pictures,
  * D-pictures, custom quantizer matrices, and run-level codes from the
  * 15/16-bit groups of table B.14 (the encoder below always escapes
  * those; real encoders may not — a stream using them is rejected).
  *
  * The companion [[Mpeg1.encode]] emits a CONSTRAINED but
  * spec-conformant bitstream for fixtures: flat DC-only intra blocks
  * and DC-only residuals, whose decoded luma is analytic (the m05
  * uniform-gray-JPEG discipline) — so the m06 oracle recomputes every
  * sampled frame's mean from id arithmetic while the engine genuinely
  * walks start codes, VLCs, IDCT and motion compensation.
  *
  * Reference for WHAT (the operator: video frame features at corpus
  * scale): Thearas/dodo has no video surface — this is beyond-reference
  * pipeline capability; the format knowledge is the public ISO spec as
  * reproduced in open documentation.
  */
object Mpeg1 {

  // ===== bit I/O =========================================================

  final class BitReader(val buf: Array[Byte]) {
    var pos = 0 // bit position
    def bitsLeft: Int = buf.length * 8 - pos
    def peek(n: Int): Int = {
      var v = 0
      var p = pos
      var i = 0
      while (i < n) {
        val b = if (p >> 3 < buf.length) (buf(p >> 3) >> (7 - (p & 7))) & 1 else 0
        v = (v << 1) | b
        p += 1; i += 1
      }
      v
    }
    def read(n: Int): Int = { val v = peek(n); pos += n; v }
    def skip(n: Int): Unit = pos += n
    def byteAligned: Boolean = (pos & 7) == 0
    def align(): Unit = if (!byteAligned) pos = (pos | 7) + 1
    /** Advance to the next byte-aligned 0x000001 start prefix; returns
      * the start-code byte, or -1 at end of stream. Leaves the position
      * AFTER the 4-byte code. */
    def nextStartCode(): Int = {
      align()
      var by = pos >> 3
      while (by + 3 < buf.length) {
        if (buf(by) == 0 && buf(by + 1) == 0 && buf(by + 2) == 1) {
          pos = (by + 4) * 8
          return buf(by + 3) & 0xff
        }
        by += 1
      }
      pos = buf.length * 8
      -1
    }
    /** True if the next bits (byte-aligned) are a start prefix. */
    def atStartCode: Boolean =
      byteAligned && bitsLeft >= 32 && peek(24) == 1
  }

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def putBits(code: String): Unit = code.foreach(c => put(c - '0', 1))
    def align(): Unit = while (nbits != 0) put(0, 1)
    def startCode(code: Int): Unit = { align(); put(0, 16); put(1, 8); put(code, 8) }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  // ===== tables (ISO/IEC 11172-2 Annex B) ================================

  /** Table B.1 — macroblock_address_increment. Values 34 = escape
    * (+33 and read again), 35 = stuffing (ignore). Encoded as
    * (code, bits, value). */
  private val AddrIncTable: Seq[(String, Int)] = Seq(
    "1" -> 1, "011" -> 2, "010" -> 3, "0011" -> 4, "0010" -> 5,
    "00011" -> 6, "00010" -> 7, "0000111" -> 8, "0000110" -> 9,
    "00001011" -> 10, "00001010" -> 11, "00001001" -> 12, "00001000" -> 13,
    "00000111" -> 14, "00000110" -> 15,
    "0000010111" -> 16, "0000010110" -> 17, "0000010101" -> 18,
    "0000010100" -> 19, "0000010011" -> 20, "0000010010" -> 21,
    "00000100011" -> 22, "00000100010" -> 23, "00000100001" -> 24,
    "00000100000" -> 25, "00000011111" -> 26, "00000011110" -> 27,
    "00000011101" -> 28, "00000011100" -> 29, "00000011011" -> 30,
    "00000011010" -> 31, "00000011001" -> 32, "00000011000" -> 33,
    "00000001000" -> 34, // escape
    "00000001111" -> 35) // stuffing

  /** Table B.12 — dct_dc_size_luminance. */
  private val DcSizeLuma: Seq[(String, Int)] = Seq(
    "100" -> 0, "00" -> 1, "01" -> 2, "101" -> 3, "110" -> 4,
    "1110" -> 5, "11110" -> 6, "111110" -> 7, "1111110" -> 8)

  /** Table B.13 — dct_dc_size_chrominance. */
  private val DcSizeChroma: Seq[(String, Int)] = Seq(
    "00" -> 0, "01" -> 1, "10" -> 2, "110" -> 3, "1110" -> 4,
    "11110" -> 5, "111110" -> 6, "1111110" -> 7, "11111110" -> 8)

  /** Table B.3 — coded_block_pattern. */
  private val CbpTable: Seq[(String, Int)] = Seq(
    "111" -> 60, "1101" -> 4, "1100" -> 8, "1011" -> 16, "1010" -> 32,
    "10011" -> 12, "10010" -> 48, "10001" -> 20, "10000" -> 40,
    "01111" -> 28, "01110" -> 44, "01101" -> 52, "01100" -> 56,
    "01011" -> 1, "01010" -> 61, "01001" -> 2, "01000" -> 62,
    "001111" -> 24, "001110" -> 36, "001101" -> 3, "001100" -> 63,
    "0010111" -> 5, "0010110" -> 9, "0010101" -> 17, "0010100" -> 33,
    "0010011" -> 6, "0010010" -> 10, "0010001" -> 18, "0010000" -> 34,
    "00011111" -> 7, "00011110" -> 11, "00011101" -> 19, "00011100" -> 35,
    "00011011" -> 13, "00011010" -> 49, "00011001" -> 21, "00011000" -> 41,
    "00010111" -> 14, "00010110" -> 50, "00010101" -> 22, "00010100" -> 42,
    "00010011" -> 15, "00010010" -> 51, "00010001" -> 23, "00010000" -> 43,
    "00001111" -> 25, "00001110" -> 37, "00001101" -> 26, "00001100" -> 38,
    "00001011" -> 29, "00001010" -> 45, "00001001" -> 53, "00001000" -> 57,
    "00000111" -> 30, "00000110" -> 46, "00000101" -> 54, "00000100" -> 58,
    "000000111" -> 31, "000000110" -> 47, "000000101" -> 55,
    "000000100" -> 59, "000000011" -> 27, "000000010" -> 39)

  /** Table B.14 (dct_coeff_next) through its 14-bit group, as
    * (code-without-sign, run, level). The sign bit follows each code on
    * the wire. The 15/16-bit groups are NOT included — see the class
    * doc; escape coding covers their (run, level) space. */
  private val RunLevelTable: Seq[(String, Int, Int)] = Seq(
    ("11", 0, 1), // dct_coeff_next form; "1" as FIRST coefficient is special-cased
    ("011", 1, 1), ("0100", 0, 2), ("0101", 2, 1),
    ("00101", 0, 3), ("00111", 3, 1), ("00110", 4, 1),
    ("000110", 1, 2), ("000111", 5, 1), ("000101", 6, 1), ("000100", 7, 1),
    ("0000110", 0, 4), ("0000100", 2, 2), ("0000111", 8, 1), ("0000101", 9, 1),
    ("00100110", 0, 5), ("00100001", 0, 6), ("00100101", 1, 3),
    ("00100100", 3, 2), ("00100111", 10, 1), ("00100011", 11, 1),
    ("00100010", 12, 1), ("00100000", 13, 1),
    ("0000001010", 0, 7), ("0000001100", 1, 4), ("0000001011", 2, 3),
    ("0000001111", 4, 2), ("0000001001", 5, 2), ("0000001110", 14, 1),
    ("0000001101", 15, 1), ("0000001000", 16, 1),
    ("000000011101", 0, 8), ("000000011000", 0, 9), ("000000010011", 0, 10),
    ("000000010000", 0, 11), ("000000011011", 1, 5), ("000000010100", 2, 4),
    ("000000011100", 3, 3), ("000000010010", 4, 3), ("000000011110", 6, 2),
    ("000000010101", 7, 2), ("000000010001", 8, 2), ("000000011111", 17, 1),
    ("000000011010", 18, 1), ("000000011001", 19, 1), ("000000010111", 20, 1),
    ("000000010110", 21, 1),
    ("0000000011010", 0, 12), ("0000000011001", 0, 13),
    ("0000000011000", 0, 14), ("0000000010111", 0, 15),
    ("0000000010110", 1, 6), ("0000000010101", 1, 7),
    ("0000000010100", 2, 5), ("0000000010011", 3, 4),
    ("0000000010010", 5, 3), ("0000000010001", 9, 2),
    ("0000000010000", 10, 2), ("0000000011111", 22, 1),
    ("0000000011110", 23, 1), ("0000000011101", 24, 1),
    ("0000000011100", 25, 1), ("0000000011011", 26, 1),
    ("00000000011111", 0, 16), ("00000000011110", 0, 17),
    ("00000000011101", 0, 18), ("00000000011100", 0, 19),
    ("00000000011011", 0, 20), ("00000000011010", 0, 21),
    ("00000000011001", 0, 22), ("00000000011000", 0, 23),
    ("00000000010111", 0, 24), ("00000000010110", 0, 25),
    ("00000000010101", 0, 26), ("00000000010100", 0, 27),
    ("00000000010011", 0, 28), ("00000000010010", 0, 29),
    ("00000000010001", 0, 30), ("00000000010000", 0, 31))

  /** Default intra quantizer matrix (spec 2.4.3.2), indexed in the same
    * order the zigzag de-scan writes coefficients (position 0 = DC = 8).
    * Fixture content only ever touches positions 0 and 1, where the
    * raster-vs-scan ordering ambiguity of the published listing is
    * immaterial (both read 8 and 16). */
  private val IntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Zigzag scan: ZigZag(i) = raster index of the i-th transmitted
    * coefficient. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // prefix-decode helpers: tables are tiny, a (code -> value) map probed
  // by growing prefix is plenty (max code length 14+sign); decode cost
  // is per-coefficient, dominated by the IDCT that follows
  private def decodeVlc[T](br: BitReader, table: Map[String, T],
                           what: String, maxLen: Int): T = {
    val sb = new StringBuilder
    while (sb.length < maxLen) {
      sb.append(if (br.read(1) == 1) '1' else '0')
      table.get(sb.toString) match {
        case Some(v) => return v
        case None =>
      }
    }
    throw new IllegalArgumentException(
      s"mpeg1: unknown $what code '${sb.toString}'")
  }
  private val AddrIncMap = AddrIncTable.toMap
  private val DcLumaMap = DcSizeLuma.toMap
  private val DcChromaMap = DcSizeChroma.toMap
  private val CbpMap = CbpTable.toMap
  private val RunLevelMap: Map[String, (Int, Int)] =
    RunLevelTable.map { case (c, r, l) => c -> (r, l) }.toMap

  // encode-direction lookups
  private val AddrIncEnc: Map[Int, String] = AddrIncTable.map(_.swap).toMap
  private val DcLumaEnc: Map[Int, String] = DcSizeLuma.map(_.swap).toMap
  private val DcChromaEnc: Map[Int, String] = DcSizeChroma.map(_.swap).toMap
  private val CbpEnc: Map[Int, String] = CbpTable.map(_.swap).toMap
  private val RunLevelEnc: Map[(Int, Int), String] =
    RunLevelTable.map { case (c, r, l) => (r, l) -> c }.toMap

  // ===== IDCT ============================================================

  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0) * (if (u == 0) 1.0 / math.sqrt(2) else 1.0))

  /** Reference 2-D IDCT (double precision, separable). Output is REAL
    * pixel contributions; rounding to integers happens at the caller
    * with floor(v + 0.5) so a flat DC-only block lands on one exact
    * value everywhere — the property the analytic oracles lean on. */
  private def idct(coef: Array[Int]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: for each y, over v
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(x)(v) * coef(y * 8 + v); v += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var x2 = 0
    while (x2 < 8) { // columns
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(y2)(u) * tmp(u * 8 + x2); u += 1 }
        out(y2 * 8 + x2) = s / 2.0
        y2 += 1
      }
      x2 += 1
    }
    out
  }

  // ===== decoder =========================================================

  private final class Plane(val w: Int, val h: Int) {
    val px = new Array[Byte](w * h)
    def get(x: Int, y: Int): Int = px(y * w + x) & 0xff
    def set(x: Int, y: Int, v: Int): Unit =
      px(y * w + x) = math.max(0, math.min(255, v)).toByte
  }

  private final class Picture(val w: Int, val h: Int) {
    val y = new Plane(w, h)
    val cb = new Plane(w / 2, h / 2)
    val cr = new Plane(w / 2, h / 2)
    def copyFrom(o: Picture): Unit = {
      System.arraycopy(o.y.px, 0, y.px, 0, y.px.length)
      System.arraycopy(o.cb.px, 0, cb.px, 0, cb.px.length)
      System.arraycopy(o.cr.px, 0, cr.px, 0, cr.px.length)
    }
  }

  /** Decode every I/P picture in `payload`; returns luma planes in
    * stream order (the [[Multimodal.VideoDecoder]] contract). Malformed
    * or out-of-subset streams throw — the registry plumbing converts
    * that to decoded=false. */
  def decodeFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val br = new BitReader(payload)
    var code = br.nextStartCode()
    var w = 0
    var h = 0
    var mbW = 0
    var mbH = 0
    var prev: Picture = null
    var curr: Picture = null
    val frames = IndexedSeq.newBuilder[Array[Byte]]

    while (code != -1 && code != 0xB7) { // until sequence_end
      code match {
        case 0xB3 => // sequence header
          w = br.read(12); h = br.read(12)
          require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
            s"mpeg1: unsupported geometry ${w}x$h (coded sizes must be MB-aligned here)")
          br.skip(4 + 4 + 18 + 1 + 10 + 1) // aspect, rate, bitrate, marker, vbv, constrained
          val loadIntra = br.read(1)
          require(loadIntra == 0, "mpeg1: custom intra quant matrix not supported")
          val loadNonIntra = br.read(1)
          require(loadNonIntra == 0, "mpeg1: custom non-intra quant matrix not supported")
          mbW = w / 16; mbH = h / 16
          prev = new Picture(w, h); curr = new Picture(w, h)
          code = br.nextStartCode()

        case 0xB8 => // GOP header: 27 bits of timecode/flags, nothing we need
          br.skip(25 + 1 + 1)
          code = br.nextStartCode()

        case 0x00 => // picture header
          require(w > 0, "mpeg1: picture before sequence header")
          br.skip(10) // temporal_reference
          val ptype = br.read(3)
          require(ptype == 1 || ptype == 2,
            s"mpeg1: only I/P pictures supported, got type $ptype")
          br.skip(16) // vbv_delay
          var fullPel = false
          var fwdF = 1
          if (ptype == 2) {
            fullPel = br.read(1) == 1
            val fCode = br.read(3)
            require(fCode >= 1 && fCode <= 7, s"mpeg1: bad forward_f_code $fCode")
            fwdF = 1 << (fCode - 1)
          }
          // extra_information_picture: while next bit is 1, 9 bits each
          while (br.read(1) == 1) br.skip(8)
          // swap reference: P predicts from the last decoded picture.
          // (Unconditional — before the first picture both are blank,
          // and an I picture overwrites every pixel anyway.)
          val t = prev; prev = curr; curr = t
          if (ptype == 2) curr.copyFrom(prev) // skipped MBs = copy
          // slices
          code = br.nextStartCode()
          require(code >= 0x01 && code <= 0xAF, s"mpeg1: expected slice, got $code")
          while (code >= 0x01 && code <= 0xAF) {
            decodeSlice(br, code, ptype, fullPel, fwdF, mbW, mbH, curr, prev)
            code = br.nextStartCode()
          }
          frames += java.util.Arrays.copyOf(curr.y.px, curr.y.px.length)

        case _ => // user data / extensions / anything else: skip
          code = br.nextStartCode()
      }
    }
    val out = frames.result()
    require(out.nonEmpty, "mpeg1: no pictures in stream")
    out
  }

  // per-slice state: DC predictors and MV predictor
  private def decodeSlice(br: BitReader, sliceCode: Int, ptype: Int,
                          fullPel: Boolean, fwdF: Int, mbW: Int, mbH: Int,
                          curr: Picture, prev: Picture): Unit = {
    var qscale = br.read(5)
    while (br.read(1) == 1) br.skip(8) // extra_information_slice
    var dcY = 1024
    var dcCb = 1024
    var dcCr = 1024
    var mvX = 0
    var mvY = 0
    var mbAddr = (sliceCode - 1) * mbW - 1
    val coef = new Array[Int](64)

    // the spec's slice-termination rule: macroblocks continue until the
    // next 23 bits are all zero (the byte-align padding running into the
    // next start code's 0x000001 prefix)
    while (br.bitsLeft >= 23 && br.peek(23) != 0) {
      // macroblock_address_increment (with escape/stuffing)
      var inc = 0
      var v = decodeVlc(br, AddrIncMap, "macroblock_address_increment", 11)
      while (v == 34 || v == 35) {
        if (v == 34) inc += 33
        v = decodeVlc(br, AddrIncMap, "macroblock_address_increment", 11)
      }
      inc += v
      if (inc > 1) { // skipped macroblocks: P copy already in place
        require(ptype == 2, "mpeg1: skipped macroblock in I picture")
        dcY = 1024; dcCb = 1024; dcCr = 1024
        mvX = 0; mvY = 0
      }
      mbAddr += inc
      require(mbAddr < mbW * mbH, s"mpeg1: macroblock address $mbAddr out of range")
      val mbx = mbAddr % mbW
      val mby = mbAddr / mbW

      // macroblock_type
      var intra = false
      var motion = false
      var pattern = false
      var quant = false
      if (ptype == 1) {
        if (br.read(1) == 1) intra = true
        else {
          require(br.read(1) == 1, "mpeg1: bad I-picture macroblock_type")
          intra = true; quant = true
        }
      } else {
        // table B.2b, longest code 6 bits
        if (br.read(1) == 1) { motion = true; pattern = true }
        else if (br.read(1) == 1) { pattern = true }
        else if (br.read(1) == 1) { motion = true }
        else if (br.read(1) == 1) {
          if (br.read(1) == 1) intra = true
          else { motion = true; pattern = true; quant = true }
        } else if (br.read(1) == 1) { pattern = true; quant = true }
        else {
          require(br.read(1) == 1, "mpeg1: bad P-picture macroblock_type")
          intra = true; quant = true
        }
      }
      if (quant) qscale = br.read(5)

      // motion vectors
      if (motion) {
        mvX = decodeMv(br, mvX, fwdF)
        mvY = decodeMv(br, mvY, fwdF)
      } else if (!intra) { mvX = 0; mvY = 0 }

      if (!intra) { dcY = 1024; dcCb = 1024; dcCr = 1024 }
      else { mvX = 0; mvY = 0 }

      // prediction
      if (!intra && ptype == 2) {
        val sx = if (fullPel) mvX * 2 else mvX // half-pel units
        val sy = if (fullPel) mvY * 2 else mvY
        predictMb(curr, prev, mbx, mby, sx, sy)
      }

      // coded block pattern
      val cbp =
        if (intra) 63
        else if (pattern) decodeVlc(br, CbpMap, "coded_block_pattern", 9)
        else 0

      var blk = 0
      while (blk < 6) {
        if ((cbp & (32 >> blk)) != 0) {
          java.util.Arrays.fill(coef, 0)
          if (intra) {
            val (table, pred) = blk match {
              case 0 | 1 | 2 | 3 => (DcLumaMap, dcY)
              case 4 => (DcChromaMap, dcCb)
              case _ => (DcChromaMap, dcCr)
            }
            val size = decodeVlc(br, table,
              if (blk < 4) "dct_dc_size_luminance" else "dct_dc_size_chrominance",
              8)
            val diff =
              if (size == 0) 0
              else {
                val bits = br.read(size)
                if ((bits & (1 << (size - 1))) != 0) bits
                else bits - ((1 << size) - 1)
              }
            val dc = pred + diff * 8
            blk match {
              case 0 | 1 | 2 | 3 => dcY = dc
              case 4 => dcCb = dc
              case _ => dcCr = dc
            }
            coef(0) = dc
            decodeAc(br, coef, qscale, first = false, intra = true)
          } else {
            decodeAc(br, coef, qscale, first = true, intra = false)
          }
          // reconstruct into the target plane
          val px = idct(coef)
          val (plane, bx, by0) = blockTarget(curr, mbx, mby, blk)
          var i = 0
          while (i < 64) {
            val x = bx + (i % 8)
            val yy = by0 + (i / 8)
            val base = if (intra) 0 else plane.get(x, yy)
            plane.set(x, yy, base + math.floor(px(i) + 0.5).toInt)
            i += 1
          }
        } else if (intra) {
          throw new IllegalArgumentException("mpeg1: intra block not coded")
        }
        blk += 1
      }
    }
  }

  /** Motion displacement decode (spec 2.4.4.2): motion_code via the
    * B.1-isomorphic VLC, then (f-1)-bit residual, then modular wrap into
    * the f_code range, differential against the predictor. */
  private def decodeMv(br: BitReader, pred: Int, f: Int): Int = {
    val v = decodeVlc(br, AddrIncMap, "motion_code", 11)
    require(v <= 33, "mpeg1: escape/stuffing is not a motion code")
    val code = if (v == 1) 0 else if (v % 2 == 0) -(v / 2) else (v - 1) / 2
    var delta =
      if (f == 1 || code == 0) code * f
      else {
        val r = br.read(Integer.numberOfTrailingZeros(f)) // f = 1<<rsize
        val mag = (math.abs(code) - 1) * f + r + 1
        if (code < 0) -mag else mag
      }
    var nv = pred + delta
    val range = 16 * f
    if (nv < -range) nv += 2 * range
    if (nv >= range) nv -= 2 * range
    nv
  }

  /** AC run-level loop: dct_coeff_first handling for non-intra block
    * coefficient 0 ('1'+sign = run0/level1), then dct_coeff_next until
    * EOB ('10'); ESCAPE = 6-bit run + 8/16-bit level. Coefficients are
    * de-zigzagged and dequantized in place. */
  private def decodeAc(br: BitReader, coef: Array[Int], qscale: Int,
                       first: Boolean, intra: Boolean): Unit = {
    var idx = if (intra) 0 else -1 // zigzag position of last written coeff
    var isFirst = first
    var done = false
    while (!done) {
      if (isFirst && br.peek(1) == 1) {
        // non-intra first coefficient: '1' + sign
        br.skip(1)
        val sign = br.read(1)
        idx += 1
        write(coef, idx, if (sign == 0) 1 else -1, qscale, intra)
        isFirst = false
      } else if (!isFirst && br.peek(2) == 2) { // '10' = EOB
        br.skip(2)
        done = true
      } else {
        // ESCAPE?
        if (br.peek(6) == 1) {
          br.skip(6)
          val run = br.read(6)
          var level = br.read(8)
          level = if (level == 0x80) br.read(8) - 256 // -255..-128
          else if (level == 0x00) br.read(8) // 128..255
          else if (level > 0x80) level - 256 // -127..-1
          else level
          require(level != 0, "mpeg1: escape level 0")
          idx += run + 1
          require(idx < 64, "mpeg1: coefficient index overflow")
          write(coef, idx, level, qscale, intra)
        } else {
          val (run, lvl) = decodeVlc(br, RunLevelMap, "dct_coeff", 14)
          val sign = br.read(1)
          idx += run + 1
          require(idx < 64, "mpeg1: coefficient index overflow")
          write(coef, idx, if (sign == 0) lvl else -lvl, qscale, intra)
        }
        isFirst = false
      }
    }
  }

  /** Dequantize one coefficient at zigzag position `zz` and store at its
    * raster slot (spec 2.4.4.1/2.4.4.2 reconstruction with oddification
    * and [-2048, 2047] saturation). */
  private def write(coef: Array[Int], zz: Int, level: Int, qscale: Int,
                    intra: Boolean): Unit = {
    var recon =
      if (intra) (2 * level * qscale * IntraQ(zz)) / 16
      else ((2 * level + (if (level >= 0) 1 else -1)) * qscale * 16) / 16
    if ((recon & 1) == 0 && recon != 0)
      recon -= Integer.signum(recon) // oddification (mismatch control)
    if (recon > 2047) recon = 2047
    if (recon < -2048) recon = -2048
    coef(ZigZag(zz)) = recon
  }

  private def blockTarget(p: Picture, mbx: Int, mby: Int,
                          blk: Int): (Plane, Int, Int) = blk match {
    case 0 => (p.y, mbx * 16, mby * 16)
    case 1 => (p.y, mbx * 16 + 8, mby * 16)
    case 2 => (p.y, mbx * 16, mby * 16 + 8)
    case 3 => (p.y, mbx * 16 + 8, mby * 16 + 8)
    case 4 => (p.cb, mbx * 8, mby * 8)
    case _ => (p.cr, mbx * 8, mby * 8)
  }

  /** Forward prediction of one macroblock from `prev` at half-pel
    * displacement (sx, sy) in luma units (chroma uses half of each, per
    * spec). Out-of-picture references are a stream error. */
  private def predictMb(curr: Picture, prev: Picture, mbx: Int, mby: Int,
                        sx: Int, sy: Int): Unit = {
    def mc(dst: Plane, src: Plane, x0: Int, y0: Int, size: Int,
           dxh: Int, dyh: Int): Unit = {
      val ix = dxh >> 1
      val iy = dyh >> 1
      val hx = dxh & 1
      val hy = dyh & 1
      require(x0 + ix >= 0 && y0 + iy >= 0 &&
        x0 + ix + size + hx <= src.w && y0 + iy + size + hy <= src.h,
        s"mpeg1: motion vector references outside the picture")
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val sxp = x0 + x + ix
          val syp = y0 + y + iy
          val v =
            if (hx == 0 && hy == 0) src.get(sxp, syp)
            else if (hx == 1 && hy == 0)
              (src.get(sxp, syp) + src.get(sxp + 1, syp) + 1) / 2
            else if (hx == 0 && hy == 1)
              (src.get(sxp, syp) + src.get(sxp, syp + 1) + 1) / 2
            else
              (src.get(sxp, syp) + src.get(sxp + 1, syp) +
                src.get(sxp, syp + 1) + src.get(sxp + 1, syp + 1) + 2) / 4
          dst.set(x0 + x, y0 + y, v)
          x += 1
        }
        y += 1
      }
    }
    mc(curr.y, prev.y, mbx * 16, mby * 16, 16, sx, sy)
    // chroma displacement: half the luma displacement, still half-pel units
    mc(curr.cb, prev.cb, mbx * 8, mby * 8, 8, sx / 2, sy / 2)
    mc(curr.cr, prev.cr, mbx * 8, mby * 8, 8, sx / 2, sy / 2)
  }

  // ===== constrained encoder (fixtures) ==================================

  /** One P-frame macroblock instruction for [[encode]]. */
  sealed trait PMb extends Serializable
  /** Forward-predict with full-pel MV (dx, dy), no residual. */
  final case class Copy(dx: Int = 0, dy: Int = 0) extends PMb
  /** Skip (previous-frame copy; illegal as first/last MB of a slice). */
  case object Skip extends PMb
  /** No-MC, luma-only DC residual of `level` at qscale 8: each luma
    * pixel moves by the analytic [[deltaOf]](level). */
  final case class Delta(level: Int) extends PMb

  /** The exact luma shift a [[Delta]](level) produces under qscale 8:
    * recon = (2L+sign)·8, oddified, then IDCT(DC)/8 rounded — the
    * arithmetic the oracle replays. level 2 → +5, level -2 → -5. */
  def deltaOf(level: Int): Int = {
    var recon = (2 * level + (if (level >= 0) 1 else -1)) * 8
    if ((recon & 1) == 0 && recon != 0) recon -= Integer.signum(recon)
    math.floor(recon / 8.0 + 0.5).toInt
  }

  /** Encode a constrained MPEG-1 stream: an I-picture of flat-per-MB
    * luma (`dcLuma` everywhere, or `lumaPerMb` one value per
    * macroblock; chroma 128), then one P-picture per element of
    * `pFrames` (each a per-macroblock instruction list of length
    * mbW·mbH). `halfPel` switches the P-picture headers to
    * full_pel_forward_vector=0, making every [[Copy]] displacement a
    * HALF-pel count. */
  def encode(w: Int, h: Int, dcLuma: Int, pFrames: Seq[Seq[PMb]],
             lumaPerMb: Option[Seq[Int]] = None,
             halfPel: Boolean = false): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "encoder emits MB-aligned sizes only")
    val mbW = w / 16
    val mbH = h / 16
    val lumaOf: Int => Int =
      lumaPerMb.map(ls => { require(ls.length == mbW * mbH); (i: Int) => ls(i) })
        .getOrElse((_: Int) => dcLuma)
    val bw = new BitWriter
    // sequence header
    bw.startCode(0xB3)
    bw.put(w, 12); bw.put(h, 12)
    bw.put(1, 4) // pel aspect 1:1
    bw.put(3, 4) // 25 fps
    bw.put(0x3FFFF, 18) // variable bitrate
    bw.put(1, 1) // marker
    bw.put(0, 10); bw.put(0, 1) // vbv, constrained
    bw.put(0, 1); bw.put(0, 1) // no custom matrices

    def picHeader(ptype: Int): Unit = {
      bw.startCode(0x00)
      bw.put(0, 10) // temporal reference (display order unused here)
      bw.put(ptype, 3)
      bw.put(0xFFFF, 16) // vbv_delay
      if (ptype == 2) {
        bw.put(if (halfPel) 0 else 1, 1) // full_pel_forward_vector
        bw.put(1, 3) // forward_f_code = 1
      }
      bw.put(0, 1) // no extra information
    }
    def sliceHeader(): Unit = {
      bw.startCode(0x01)
      bw.put(8, 5) // quantizer_scale 8
      bw.put(0, 1) // no extra information
    }
    def putDcDiff(diff: Int, luma: Boolean): Unit = {
      val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.putBits(if (luma) DcLumaEnc(size) else DcChromaEnc(size))
      if (size > 0) {
        val bits = if (diff > 0) diff else diff + (1 << size) - 1
        bw.put(bits, size)
      }
    }
    def putMv(code0: Int): Unit = { // f==1: just the motion_code VLC
      // differential MVs wrap modulo the [-16f, 16f) range (the decoder
      // un-wraps), so a -32 jump between adjacent MBs encodes as 0
      var code = code0
      while (code < -16) code += 32
      while (code >= 16) code -= 32
      val v = if (code == 0) 1 else if (code < 0) -code * 2 else code * 2 + 1
      require(v <= 33, s"motion code $code out of the f=1 table")
      bw.putBits(AddrIncEnc(v))
    }

    // ---- I picture: every MB intra, every block DC-only -----------------
    picHeader(1)
    sliceHeader()
    var dcYPred = 128
    var dcCbPred = 128
    var dcCrPred = 128
    for (mbi <- 0 until mbW * mbH) {
      bw.putBits(AddrIncEnc(1)) // increment 1
      bw.put(1, 1) // intra
      var blk = 0
      while (blk < 6) {
        // DC target in "quantized" units (pixel value = dc*8/8): the
        // stream codes dc_diff where recon = pred + diff*8 and IDCT of a
        // DC-only block is recon/8 per pixel -> diff = target - pred
        val (target, luma) =
          if (blk < 4) (lumaOf(mbi), true) else (128, false)
        val pred = if (blk < 4) dcYPred else if (blk == 4) dcCbPred else dcCrPred
        putDcDiff(target - pred, luma)
        if (blk < 4) dcYPred = target
        else if (blk == 4) dcCbPred = target
        else dcCrPred = target
        bw.putBits("10") // EOB
        blk += 1
      }
    }

    // ---- P pictures ------------------------------------------------------
    for (mbs <- pFrames) {
      require(mbs.length == mbW * mbH, "one instruction per macroblock")
      require(mbs.head != Skip && mbs.last != Skip,
        "first/last slice macroblock cannot be skipped (spec)")
      picHeader(2)
      sliceHeader()
      var pending = 1 // address increment accumulated over skips
      var prevMvX = 0
      var prevMvY = 0
      for (mb <- mbs) mb match {
        case Skip =>
          pending += 1
          prevMvX = 0; prevMvY = 0 // skipped MBs reset the MV predictor
        case Copy(dx, dy) =>
          bw.putBits(AddrIncEnc(pending)); pending = 1
          bw.putBits("001") // MC, not coded
          putMv(dx - prevMvX); putMv(dy - prevMvY)
          prevMvX = dx; prevMvY = dy
        case Delta(level) =>
          bw.putBits(AddrIncEnc(pending)); pending = 1
          bw.putBits("01") // no MC, coded
          prevMvX = 0; prevMvY = 0
          bw.putBits(CbpEnc(60)) // luma blocks only
          for (_ <- 0 until 4) {
            // dct_coeff_first for (0, |level|): '1'+sign iff |level|==1,
            // else the B.14 code for (0, |level|)
            val l = math.abs(level)
            val s = if (level < 0) 1 else 0
            if (l == 1) { bw.put(1, 1); bw.put(s, 1) }
            else {
              val code = RunLevelEnc.getOrElse((0, l),
                sys.error(s"fixture level $level needs escape coding"))
              bw.putBits(code); bw.put(s, 1)
            }
            bw.putBits("10") // EOB
          }
      }
    }
    bw.startCode(0xB7) // sequence_end
    bw.bytes
  }

  /** Deterministic m06 fixture: 32×32, flat I-frame luma
    * `L0 = (id·29) % 200 + 20`, then P-frames
    * copy → full delta(+5) → partial delta (first/last MB +5, middle
    * skipped) → copy → full delta, truncated to `4 + id % 3` pictures.
    * Per-frame mean luma is analytic — see the m06 oracle. */
  def synthMpeg1(id: Long): Array[Byte] = {
    val l0 = ((id * 29) % 200 + 20).toInt
    val nMb = 4 // 32x32
    val full = Seq.fill(nMb)(Delta(2): PMb)
    val partial = Seq[PMb](Delta(2), Skip, Skip, Delta(2))
    val copy = Seq.fill(nMb)(Copy(): PMb)
    val nf = (4 + id % 3).toInt
    val ps = Seq(copy, full, partial, copy, full).take(nf - 1)
    encode(32, 32, l0, ps)
  }

  /** Register the codec under tag "mpeg1" (idempotent). */
  def register(): Unit =
    Multimodal.VideoDecoders.register("mpeg1",
      new Multimodal.VideoDecoder {
        def decodeFrames(p: Array[Byte]): IndexedSeq[Array[Byte]] =
          Mpeg1.decodeFrames(p)
      })
}

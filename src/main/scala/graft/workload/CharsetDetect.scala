package graft.workload

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

/** Statistical charset detection over a head sample — the breadth half of
  * S2 (reference: src/misc.go:116-131 runs a chardet library over the
  * first 4 KB and keeps UTF-8 whenever it is plausible; src/misc.go:151-163
  * promotes GBK to GB18030 before decoding). r10 probed UTF-8 vs GB18030
  * only, which mis-decodes Shift_JIS / Big5 / EUC-KR / Latin-1 audit
  * logs; this detector covers the charsets an audit log plausibly
  * arrives in, from first principles (no detection library in the
  * dependency budget):
  *
  *   1. BOM short-circuit (UTF-8/16 byte-order marks are definitive).
  *   2. Strict UTF-8 probe, retrying with up to 3 trailing bytes dropped
  *      (the 4 KB window may cut a multi-byte char) — UTF-8 wins
  *      whenever it validates, same preference as the reference.
  *   3. Every remaining candidate must STRICTLY decode the sample
  *      (structure eliminates most cross-charset confusions: GBK lead
  *      bytes 0xFD/0xFE are no Shift_JIS lead, EUC-KR trails exclude
  *      0x40-0x7E, ...).
  *   4. Survivors are scored on the DECODED text: characters land in the
  *      script blocks the charset exists to carry (kana for Shift_JIS,
  *      hangul for EUC-KR, CJK ideographs for the Chinese pair, Latin-1
  *      supplement for the western family), with a small embedded table
  *      of everyday simplified-vs-traditional ideographs separating
  *      GB18030 from Big5 (the two decode most of each other's byte
  *      streams structurally, so block membership alone cannot).
  *   5. A raw-byte shape prior separates the Latin family from all
  *      double-byte candidates: European text carries SPARSE, ISOLATED
  *      high bytes (an accent inside an ASCII word), CJK text carries
  *      high bytes in even runs — a Latin-1 'é'+letter pair is a valid
  *      GBK sequence, so without this prior French logs detect as GBK.
  *
  * Ties and no-signal samples fall back to GB18030 — the r10 behavior,
  * and the reference's own bias (its GBK promotion exists because CJK
  * deployments are where non-UTF-8 logs actually come from). */
object CharsetDetect {

  /** Candidate JVM charset names. Order is the TIE-BREAK (sortBy is
    * stable): a sample scoring equal under GB18030 and Big5 — markerless
    * short CJK text does — resolves to GB18030, the reference's bias. */
  private val DoubleByte = Seq("Shift_JIS", "EUC-KR", "GB18030", "Big5")

  // Everyday ideographs that exist in exactly one of the two scripts —
  // enough that any real sentence hits several. (Simplified left,
  // traditional right; sourced from the standard jianhua pairs.)
  private val Simplified =
    "这们说对会国为学时业东经车门马龙华实现发记话读体万亿与专丢两严".toSet
  private val Traditional =
    "這們說對會國為學時業東經車門馬龍華實現發記話讀體萬億與專丟兩嚴".toSet

  private def strictDecode(bytes: Array[Byte], cs: String): Option[String] = {
    def tryOnce(b: Array[Byte]): Option[String] =
      try Some(Charset.forName(cs).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(b)).toString)
      catch { case _: CharacterCodingException => None }
    // the sample window may cut a multi-byte char: GB18030 sequences run
    // to 4 bytes, so up to 3 trailing bytes may be a partial char
    (0 to 3).iterator.flatMap(d =>
      if (bytes.length >= d) tryOnce(bytes.dropRight(d)) else None)
      .nextOption()
  }

  /** Raw-byte shape: (fraction of bytes ≥ 0x80, fraction of maximal
    * high-byte runs of length exactly 1). */
  private def highByteShape(bytes: Array[Byte]): (Double, Double) = {
    var high = 0; var runs = 0; var isolated = 0; var run = 0
    for (b <- bytes) {
      if ((b & 0x80) != 0) { high += 1; run += 1 }
      else if (run > 0) { runs += 1; if (run == 1) isolated += 1; run = 0 }
    }
    if (run > 0) { runs += 1; if (run == 1) isolated += 1 }
    (if (bytes.isEmpty) 0.0 else high.toDouble / bytes.length,
      if (runs == 0) 0.0 else isolated.toDouble / runs)
  }

  private def score(cs: String, txt: String): Double = {
    var kana, halfKana, hangul, cjk, latin, cjkPunct, bad, simp, trad = 0
    var nonAscii = 0
    txt.foreach { c =>
      if (c >= 0x80) {
        nonAscii += 1
        if (c >= 0x3040 && c <= 0x30FF) kana += 1
        else if (c >= 0xFF61 && c <= 0xFF9F) halfKana += 1
        else if (c >= 0xAC00 && c <= 0xD7A3) hangul += 1
        else if (c >= 0x4E00 && c <= 0x9FFF) {
          cjk += 1
          if (Simplified(c)) simp += 1
          if (Traditional(c)) trad += 1
        }
        else if (c >= 0xA0 && c <= 0x17F) latin += 1
        else if ((c >= 0x3000 && c <= 0x303F) || (c >= 0xFF00 && c <= 0xFF60))
          cjkPunct += 1
        else if (c == 0xFFFD || (c >= 0xE000 && c <= 0xF8FF) ||
          (c >= 0x80 && c <= 0x9F)) bad += 1
      }
    }
    if (nonAscii == 0) return 0.0
    val raw = cs match {
      // halfwidth katakana is WEAK evidence (0.4, below the 1.0 CJK
      // weight): every GBK/Big5 pair whose bytes both land in 0xA1-0xDF
      // decodes as two "valid" halfwidth kana, so a short Chinese sample
      // would otherwise detect as Shift_JIS; genuine Japanese text
      // carries fullwidth kana, which keeps its decisive 3.0
      case "Shift_JIS" => 3.0 * kana + 0.4 * halfKana + 1.0 * cjk +
        0.5 * cjkPunct - 2.0 * hangul - 1.0 * latin
      case "EUC-KR" => 3.0 * hangul + 1.0 * cjk + 0.5 * cjkPunct -
        2.0 * kana - 1.0 * latin
      case "GB18030" => 1.0 * cjk + 5.0 * simp - 5.0 * trad + 0.8 * kana +
        0.5 * cjkPunct - 1.0 * latin
      case "Big5" => 1.0 * cjk + 5.0 * trad - 5.0 * simp + 0.5 * cjkPunct -
        1.0 * kana - 1.0 * latin
      case _ => 2.0 * latin - 1.0 * (cjk + kana + hangul)
    }
    (raw - 5.0 * bad) / nonAscii
  }

  /** Detect the charset of `head` (typically the first 4 KB of a file).
    * Returns a JVM/IANA charset name; UTF-8 whenever the sample validates
    * as UTF-8, GB18030 when nothing else is clearly better. */
  def detect(head: Array[Byte]): String = {
    if (head.length >= 3 && head(0) == 0xEF.toByte && head(1) == 0xBB.toByte &&
      head(2) == 0xBF.toByte) return "UTF-8"
    // "UTF-16", not "UTF-16LE"/"UTF-16BE": the endian-specific JVM
    // decoders KEEP the BOM as a leading U+FEFF character (which would
    // break the first record's timestamp regex downstream), while plain
    // "UTF-16" consumes the BOM and infers endianness from it.
    if (head.length >= 2 &&
      ((head(0) == 0xFF.toByte && head(1) == 0xFE.toByte) ||
        (head(0) == 0xFE.toByte && head(1) == 0xFF.toByte)))
      return "UTF-16"
    if (strictDecode(head, "UTF-8").isDefined) return "UTF-8"

    val (highFrac, isolation) = highByteShape(head)
    // the Latin family decodes EVERYTHING (ISO-8859-1 maps all 256 byte
    // values), so it competes purely on the shape prior + text score;
    // windows-1252 is the reported name only when its 0x80-0x9F
    // smart-punctuation range is actually used
    val latinName =
      if (head.exists(b => (b & 0xFF) >= 0x80 && (b & 0xFF) <= 0x9F))
        "windows-1252"
      else "ISO-8859-1"
    val latinShape = if (highFrac < 0.25 && isolation > 0.6) 2.0
                     else if (isolation > 0.6) 1.0 else 0.2
    val cjkShape = if (isolation > 0.6) 0.3 else 1.0

    val scored =
      DoubleByte.flatMap { cs =>
        strictDecode(head, cs).map(txt => cs -> cjkShape * score(cs, txt))
      } ++
        strictDecode(head, latinName).map(txt =>
          latinName -> latinShape * score(latinName, txt)).toSeq

    scored.filter(_._2 > 0.0).sortBy(-_._2).headOption
      .map(_._1).getOrElse("GB18030")
  }
}

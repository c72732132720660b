package graft.functions

/**
 * The HBase-shell printable binary-string codec (SURVEY.md C1/C2).
 *
 * Reimplements, from its documented behavior, the codec the reference uses to
 * accept row keys on the CLI and to print corrupted keys:
 *   - decode: reference `CopyRow.java:104` (`Bytes.toBytesBinary`)
 *   - encode: reference `CorruptRowsMR.java:138,142,163` (`Bytes.toStringBinary`)
 *
 * Contract: printable ASCII (0x20..0x7E) except backslash is emitted verbatim;
 * every other byte becomes `\xHH` with uppercase hex. Decode accepts exactly
 * that dialect (uppercase hex digits); a malformed `\x` escape falls back to
 * emitting the characters literally rather than throwing — CLI-friendly, and
 * round-trip (`decode(encode(b)) == b`) always holds because encode only emits
 * well-formed escapes.
 */
object BytesBinaryCodec {
  private final val HEX = "0123456789ABCDEF".toCharArray

  /** byte[] -> printable HBase-shell notation. */
  def encode(b: Array[Byte]): String = {
    if (b == null) return null
    val sb = new java.lang.StringBuilder(b.length + 8)
    var i = 0
    while (i < b.length) {
      val ch = b(i) & 0xff
      if (ch >= 0x20 && ch <= 0x7e && ch != '\\') sb.append(ch.toChar)
      else {
        sb.append("\\x")
        sb.append(HEX(ch >>> 4))
        sb.append(HEX(ch & 0x0f))
      }
      i += 1
    }
    sb.toString
  }

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else 10 + (c - 'A')

  /** printable HBase-shell notation -> byte[]. */
  def decode(s: String): Array[Byte] = {
    if (s == null) return null
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 3 < n && s.charAt(i + 1) == 'x' &&
          isHexDigit(s.charAt(i + 2)) && isHexDigit(s.charAt(i + 3))) {
        out.write((hexVal(s.charAt(i + 2)) << 4) | hexVal(s.charAt(i + 3)))
        i += 4
      } else {
        out.write(c.toByte & 0xff)
        i += 1
      }
    }
    out.toByteArray
  }
}

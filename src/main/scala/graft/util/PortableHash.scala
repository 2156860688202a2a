package graft.util

/** Tag-keyed md5 draws — the engine-portable derandomization idiom
  * (SURVEY §7.4, proven on the SmurfGen fold grid in round 9): every
  * "random" choice is an INDEPENDENT pure function of a tag string, so any
  * SQL engine regenerates the identical draw from the same md5 arithmetic.
  *
  * Hex-prefix layout (1-indexed as SQL `substr` sees it):
  *   - chars 1..7  (28 bits) — `h28`, the draw
  *     `CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT)`;
  *   - chars 9..23 (60 bits) — `h60`, an INDEPENDENT second draw from the
  *     same digest, `CAST(('0x' || substr(md5(t), 9, 15)) AS BIGINT)` —
  *     used where one tag must yield two uncorrelated choices (isolation-
  *     forest node: split dimension from h28, split fraction from h60)
  *     without paying a second digest.
  */
object PortableHash {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def md5Hex(s: String): String = {
    val d = md.get()
    d.reset()
    val bs = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bs.length) {
      sb.append(Character.forDigit((bs(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bs(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** 28-bit uniform draw from hex chars 1..7. */
  def h28(tag: String): Long =
    java.lang.Long.parseLong(md5Hex(tag).substring(0, 7), 16)

  /** 60-bit uniform draw from hex chars 9..23 of the SAME digest. */
  def h60(tag: String): Long =
    java.lang.Long.parseLong(md5Hex(tag).substring(8, 23), 16)
}

package riotspark

/* JVM-side LocsIndex tokenizer — the zero-transfer twin of
 * riot_spark/tokenizer.py::tokenize_locs (itself riot's
 * makeTokensMap semantics, segment.go:210-246: one entry per DISTINCT
 * term, locations = byte offsets of every occurrence in the UTF-8
 * encoding of the lowercased text, types/doc_index_data.go:45-51).
 *
 * The pandas tokenizer ships (doc_id, text) JVM -> Python over Arrow
 * and loops per doc; at 1M docs that loop is the LocsIndex build's
 * dominant stage.  This kernel tokenizes inside the executor —
 * posting rows never exist Python-side at all.
 *
 * Parity notes (differential-tested in tests/test_jvm_packer.py):
 *  - split on a single space keeping empty segments, the empty-word
 *    separator still advancing the byte cursor by 1 — identical to
 *    text.split(" ") in Python;
 *  - lowercasing uses toLowerCase(Locale.ROOT) — locale-independent
 *    (a tr/az/lt default JVM locale would map 'I' to dotless 'ı' and
 *    silently diverge from Python str.lower / F.lower), the SAME
 *    mapping the freq-mode path already uses via F.lower
 *    (Python str.lower agrees on the test corpora; the repo's
 *    canonical contract is tokenize_text, which the pandas fallback
 *    keeps bit-exact for non-ASCII edge cases);
 *  - stopwords are dropped at insert (equivalent to the pandas
 *    post-filter: the surviving term set and the distinct-terms
 *    doc length are identical);
 *  - token_len = #distinct surviving terms (distinctLen) or the
 *    occurrence count (sum of positions lengths).
 */

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

object Tokenize {

  private val tokensSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("term", StringType, nullable = false),
    StructField("tf", FloatType, nullable = false),
    StructField("positions", ArrayType(IntegerType), nullable = true),
    StructField("token_len", FloatType, nullable = false)
  ))

  /** UTF-8 byte length without materializing the byte array. */
  private def utf8Len(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
               Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }

  /** (doc_id, text) -> (doc_id, term, tf, positions, token_len). */
  def locs(
      df: DataFrame,
      stopwords: java.util.List[String],
      distinctLen: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    val stop: Set[String] = stopwords.asScala.toSet

    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val text = r.getString(1)
        val lower =
          if (text == null) ""
          else text.toLowerCase(java.util.Locale.ROOT)
        val map = new java.util.LinkedHashMap[String, ArrayBuffer[Int]]()
        val parts = lower.split(" ", -1)
        var pos = 0
        var occ = 0
        var i = 0
        while (i < parts.length) {
          val w = parts(i)
          val nb = utf8Len(w)
          if (w.nonEmpty && !stop.contains(w)) {
            var buf = map.get(w)
            if (buf == null) { buf = new ArrayBuffer[Int](4); map.put(w, buf) }
            buf += pos
            occ += 1
          }
          pos += nb + 1 // the single-space separator is 1 byte
          i += 1
        }
        val dl = (if (distinctLen) map.size else occ).toFloat
        val out = new ArrayBuffer[Row](map.size)
        val it = map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val buf = e.getValue
          out += Row(docId, e.getKey, buf.length.toFloat, buf.toSeq, dl)
        }
        out
      }
    }(Encoders.row(tokensSchema))
  }
}

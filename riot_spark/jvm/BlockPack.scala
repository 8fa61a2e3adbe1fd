package riotspark

/* JVM-side posting-block packer — the zero-transfer twin of
 * riot_spark/blocks.py::build_blocks_arrow.
 *
 * The Python packers (mapInPandas, then mapInArrow) are bound by the
 * JVM -> Python -> JVM Arrow round-trip: at 30M posting entries the
 * no-op transfer alone costs ~9s of a 10.8s pack (BENCH.md).  This
 * object runs the identical pack as a Dataset.mapPartitions inside
 * the executor JVM — no serialization boundary at all.  Output is
 * byte-identical to the Python codec (differential-tested in
 * tests/test_jvm_packer.py), so either packer can read the other's
 * blocks.
 *
 * Codec layout (mirrors riot_spark/codec.py, which documents it):
 *   tagged ints = 0x00 + LEB128 varints | 0x01 + patched FOR
 *   patched FOR = [n u32][width u8][n_exc u32][packed low bits LSB-
 *                 first][varint(exception pos deltas ++ high bits)]
 *   doc_ids     = tagged(delta: first absolute, then gaps)
 *   tfs/lens    = tagged(values truncated to uint64)
 *   positions   = tagged(concatenated per-doc lists, delta within a
 *                 list, list-first values absolute); offsets implied
 *                 by tf (LocsIndex: tf == len(positions),
 *                 segment.go:290-296)
 */

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

object BlockPack {

  // ------------------------------------------------------------ codec

  /** LEB128 varint of unsigned 64-bit values, appended to `out`. */
  def varintInto(values: Array[Long], out: ArrayBuffer[Byte]): Unit = {
    var i = 0
    while (i < values.length) {
      var v = values(i)
      var more = true
      while (more) {
        val b = (v & 0x7fL).toInt
        v = v >>> 7
        if (v != 0L) out += (b | 0x80).toByte
        else { out += b.toByte; more = false }
      }
      i += 1
    }
  }

  def varintEncode(values: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](values.length * 2)
    varintInto(values, out)
    out.toArray
  }

  private def bitWidth(v: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(v)

  /** numpy np.quantile(widths, 0.95) with the 'linear' method,
   *  including numpy's _lerp branch (t >= 0.5 computes from the upper
   *  point) — required for byte-identity with the Python encoder. */
  private def quantile95(widths: Array[Int]): Double = {
    val n = widths.length
    val s = widths.clone()
    java.util.Arrays.sort(s)
    val h = 0.95 * (n - 1).toDouble
    val lo = math.floor(h).toInt
    val t = h - lo
    val a = s(lo).toDouble
    val b = s(math.min(lo + 1, n - 1)).toDouble
    if (t >= 0.5) b - (b - a) * (1.0 - t) else a + (b - a) * t
  }

  def pforEncode(values: Array[Long]): Array[Byte] = {
    val n = values.length
    if (n == 0) {
      // struct.pack("<IBI", 0, 0, 0)
      return new Array[Byte](9)
    }
    val widths = new Array[Int](n)
    var i = 0
    while (i < n) { widths(i) = bitWidth(values(i)); i += 1 }
    var width = quantile95(widths).toInt // toward-zero truncation, q >= 0
    if (width < 1) width = 1
    var nExc = 0
    i = 0
    while (i < n) { if (widths(i) > width) nExc += 1; i += 1 }
    val mask = if (width >= 64) -1L else (1L << width) - 1L
    // Long arithmetic: n*width overflows Int above ~33M values at
    // width 64 (decode side has the matching guard)
    val nbytesL = (n.toLong * width + 7) / 8
    require(nbytesL <= Int.MaxValue - 16, s"pfor block too large: $nbytesL bytes")
    val nbytes = nbytesL.toInt
    val packed = new Array[Byte](nbytes)
    var bit = 0L
    i = 0
    while (i < n) {
      val low = values(i) & mask
      var j = 0
      while (j < width) {
        if (((low >>> j) & 1L) != 0L) {
          val b = bit + j
          packed((b >> 3).toInt) = (packed((b >> 3).toInt) | (1 << (b & 7L).toInt)).toByte
        }
        j += 1
      }
      bit += width
      i += 1
    }
    val patchVals = new Array[Long](2 * nExc)
    if (nExc > 0) {
      var k = 0
      var prev = 0L
      i = 0
      while (i < n) {
        if (widths(i) > width) {
          patchVals(k) = i.toLong - prev
          if (k == 0) patchVals(k) = i.toLong
          prev = i.toLong
          patchVals(nExc + k) = values(i) >>> width
          k += 1
        }
        i += 1
      }
    }
    val out = new ArrayBuffer[Byte](9 + nbytes + nExc * 4)
    // little-endian <IBI>
    out += (n & 0xff).toByte += ((n >> 8) & 0xff).toByte +=
      ((n >> 16) & 0xff).toByte += ((n >> 24) & 0xff).toByte
    out += (width & 0xff).toByte
    out += (nExc & 0xff).toByte += ((nExc >> 8) & 0xff).toByte +=
      ((nExc >> 16) & 0xff).toByte += ((nExc >> 24) & 0xff).toByte
    out ++= packed
    varintInto(patchVals, out)
    out.toArray
  }

  val TAG_VARINT: Byte = 0
  val TAG_PFOR: Byte = 1

  /** Tagged best-of(varint, patched FOR); arrays of <= 64 values go
   *  straight to varint (same encoder policy as the Python codec). */
  def encodeIntsBest(values: Array[Long]): Array[Byte] = {
    val v = varintEncode(values)
    if (values.length <= 64) {
      val out = new Array[Byte](v.length + 1)
      out(0) = TAG_VARINT
      System.arraycopy(v, 0, out, 1, v.length)
      return out
    }
    val p = pforEncode(values)
    val (tag, body) = if (p.length < v.length) (TAG_PFOR, p) else (TAG_VARINT, v)
    val out = new Array[Byte](body.length + 1)
    out(0) = tag
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  /** tagged(first absolute, then gaps) of a strictly ascending array. */
  def deltaEncode(docIds: Array[Long]): Array[Byte] = {
    if (docIds.length == 0) return Array.emptyByteArray
    val d = new Array[Long](docIds.length)
    d(0) = docIds(0)
    var i = 1
    while (i < docIds.length) { d(i) = docIds(i) - docIds(i - 1); i += 1 }
    encodeIntsBest(d)
  }

  /** tf / token_len floats hold small positive integers — pack as
   *  tagged ints (float -> double -> toward-zero truncation). */
  def packFloatsAsInts(values: Array[Float], from: Int, until: Int): Array[Byte] = {
    val d = new Array[Long](until - from)
    var i = from
    while (i < until) { d(i - from) = values(i).toDouble.toLong; i += 1 }
    encodeIntsBest(d)
  }

  /** Concatenated per-doc position lists: within-list delta encoding,
   *  list-first values absolute; empty total -> empty bytes. */
  def packPositionsFlat(flat: Array[Long], counts: Array[Int]): Array[Byte] = {
    var total = 0
    var i = 0
    while (i < counts.length) { total += counts(i); i += 1 }
    if (total == 0) return Array.emptyByteArray
    val d = new Array[Long](total)
    d(0) = flat(0)
    i = 1
    while (i < total) { d(i) = flat(i) - flat(i - 1); i += 1 }
    var start = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0) { d(start) = flat(start); start += counts(i) }
      i += 1
    }
    encodeIntsBest(d)
  }

  // ------------------------------------------------------- block pack

  private val outSchema = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("block_id", LongType, nullable = false),
    StructField("is_label", BooleanType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("first_doc_id", LongType, nullable = false),
    StructField("last_doc_id", LongType, nullable = false),
    StructField("doc_ids", BinaryType, nullable = false),
    StructField("tfs", BinaryType, nullable = false),
    StructField("token_lens", BinaryType, nullable = false),
    StructField("positions", BinaryType, nullable = true),
    StructField("norm_max", FloatType, nullable = false)
  ))

  /** One (term, block, is_label) group accumulated from the sorted
   *  partition stream. */
  private final class Group {
    val docIds = new ArrayBuffer[Long](64)
    val tfs = new ArrayBuffer[Float](64)
    val lens = new ArrayBuffer[Float](64)
    val posFlat = new ArrayBuffer[Long](64)
    val posCounts = new ArrayBuffer[Int](64)
    def nonEmpty: Boolean = docIds.nonEmpty
    def clear(): Unit = {
      docIds.clear(); tfs.clear(); lens.clear()
      posFlat.clear(); posCounts.clear()
    }
  }

  private def emit(
      term: String, blockId: Long, isLabel: Boolean, g: Group,
      locs: Boolean, k1: Double, b: Double, avgdl: Double,
      out: ArrayBuffer[Row]): Unit = {
    if (!g.nonEmpty) return
    val n = g.docIds.length
    val ids = g.docIds.toArray
    val tf = g.tfs.toArray
    val dl = g.lens.toArray
    var normMax = 0.0
    if (avgdl != 0.0) {
      var i = 0
      while (i < n) {
        val tfd = tf(i).toDouble
        val dld = dl(i).toDouble
        val norm = tfd * (k1 + 1.0) / (tfd + k1 * (1.0 - b + b * dld / avgdl))
        if (norm > normMax) normMax = norm
        i += 1
      }
    }
    val positions: Array[Byte] =
      if (locs && !isLabel) packPositionsFlat(g.posFlat.toArray, g.posCounts.toArray)
      else null
    out += Row(
      term, blockId, isLabel, n, ids(0), ids(n - 1),
      deltaEncode(ids),
      packFloatsAsInts(tf, 0, n),
      packFloatsAsInts(dl, 0, n),
      positions,
      normMax.toFloat
    )
    g.clear()
  }

  /** Pack flat postings (term, doc_id)-sorted within partitions into
   *  per-(term, doc-range, is_label) compressed blocks.  Runs fully
   *  JVM-side; input column order must be
   *  (doc_id, term, tf, token_len, is_label[, positions]). */
  def pack(df: DataFrame, docBlockBits: Int, k1: Double, b: Double,
           avgdl: Double, locs: Boolean): DataFrame = {
    df.mapPartitions { rows =>
      val out = new ArrayBuffer[Row]()
      val content = new Group
      val labels = new Group
      var curTerm: String = null
      var curBlock = 0L
      for (row <- rows) {
        val docId = row.getLong(0)
        val term = row.getString(1)
        val blockId = docId >> docBlockBits
        if (curTerm == null) { curTerm = term; curBlock = blockId }
        else if (term != curTerm || blockId != curBlock) {
          emit(curTerm, curBlock, isLabel = false, content, locs, k1, b, avgdl, out)
          emit(curTerm, curBlock, isLabel = true, labels, locs, k1, b, avgdl, out)
          curTerm = term; curBlock = blockId
        }
        val isLabel = row.getBoolean(4)
        val g = if (isLabel) labels else content
        g.docIds += docId
        g.tfs += row.getFloat(2)
        g.lens += row.getFloat(3)
        if (locs && !isLabel) {
          if (row.isNullAt(5)) g.posCounts += 0
          else {
            val seq = row.getSeq[Int](5)
            g.posCounts += seq.length
            val it = seq.iterator
            while (it.hasNext) g.posFlat += it.next().toLong
          }
        }
      }
      if (curTerm != null) {
        emit(curTerm, curBlock, isLabel = false, content, locs, k1, b, avgdl, out)
        emit(curTerm, curBlock, isLabel = true, labels, locs, k1, b, avgdl, out)
      }
      out.iterator
    }(Encoders.row(outSchema))
  }
}

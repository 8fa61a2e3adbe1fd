package riotspark

/* JVM-side AND/BM25 block kernel — the zero-transfer twin of the
 * pandas kernel built by riot_spark/blocks.py::_make_and_kernel for
 * the non-proximity path (full scans and both WAND scoring passes).
 *
 * The Python kernel ships every candidate block's packed bytes
 * JVM -> Python over Arrow and decodes them in numpy; for hot terms
 * at the 1M-doc soak that decode dominates query wall time.  This
 * kernel decodes, intersects and scores inside the executor JVM.
 *
 * Score parity contract: float32, bit-identical to
 * riot_spark/oracle.py::bm25_score_f32_vec (which is itself
 * step-for-step riot's scorer, core/indexer.go:523-547) — per query
 * token in order, contrib = idf * tf * (k1+1) / (tf + k1*(1 - b +
 * b*dl/avgdl)) evaluated in float32, accumulated only where tf > 0.
 * idf values are computed driver-side with numpy's float64 log2 and
 * passed in as float32, so no JVM log enters the fixed-point path.
 * Differential-tested against the pandas kernel and the flat engine
 * in tests/test_jvm_packer.py.
 */

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

object BlockQuery {

  // ---------------------------------------------------------- decode

  /** LEB128 varint decode (inverse of BlockPack.varintInto). */
  def varintDecode(data: Array[Byte], from: Int): Array[Long] = {
    val out = new ArrayBuffer[Long](math.max(8, (data.length - from) / 2))
    var v = 0L
    var shift = 0
    var i = from
    while (i < data.length) {
      val b = data(i) & 0xff
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) { out += v; v = 0L; shift = 0 }
      else shift += 7
      i += 1
    }
    out.toArray
  }

  /** Patched-FOR decode (inverse of BlockPack.pforEncode). */
  def pforDecode(data: Array[Byte], from: Int): Array[Long] = {
    def u32(off: Int): Int =
      (data(off) & 0xff) | ((data(off + 1) & 0xff) << 8) |
        ((data(off + 2) & 0xff) << 16) | ((data(off + 3) & 0xff) << 24)
    val n = u32(from)
    if (n == 0) return Array.emptyLongArray
    val width = data(from + 4) & 0xff
    val nExc = u32(from + 5)
    val off = from + 9
    val vals = new Array[Long](n)
    var bit = 0L
    var i = 0
    while (i < n) {
      var v = 0L
      var j = 0
      while (j < width) {
        val bj = bit + j
        if (((data(off + (bj >> 3).toInt) >>> (bj & 7L).toInt) & 1) != 0)
          v |= 1L << j
        j += 1
      }
      vals(i) = v
      bit += width
      i += 1
    }
    if (nExc > 0) {
      // 64-bit: n*width overflows Int above ~33M values at width 64,
      // which would mis-offset the exception patch and silently
      // corrupt values — compute in Long and fail loudly if the block
      // claims more packed bytes than the buffer holds
      val nbytesL = (n.toLong * width + 7) / 8
      require(
        off + nbytesL <= data.length,
        s"pfor block claims $nbytesL packed bytes past buffer end")
      val nbytes = nbytesL.toInt
      val patch = varintDecode(data, off + nbytes)
      var pos = 0L
      var k = 0
      while (k < nExc) {
        pos += patch(k)
        vals(pos.toInt) |= patch(nExc + k) << width
        k += 1
      }
    }
    vals
  }

  /** Tag dispatch (inverse of BlockPack.encodeIntsBest). */
  def decodeIntsBest(data: Array[Byte]): Array[Long] = {
    if (data == null || data.length == 0) return Array.emptyLongArray
    if (data(0) == BlockPack.TAG_PFOR) pforDecode(data, 1)
    else varintDecode(data, 1)
  }

  /** Inverse of BlockPack.deltaEncode: cumulative sum of the gaps. */
  def deltaDecode(data: Array[Byte]): Array[Long] = {
    val d = decodeIntsBest(data)
    var i = 1
    while (i < d.length) { d(i) += d(i - 1); i += 1 }
    d
  }

  def decodeFloats(data: Array[Byte]): Array[Float] = {
    val d = decodeIntsBest(data)
    val out = new Array[Float](d.length)
    var i = 0
    while (i < d.length) { out(i) = d(i).toFloat; i += 1 }
    out
  }

  // ---------------------------------------------------------- kernel

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("score", FloatType, nullable = false)
  ))

  /** Merge two sorted distinct arrays (numpy union1d). */
  private def unionSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new ArrayBuffer[Long](a.length + b.length)
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out += a(i); i += 1 }
      else if (a(i) > b(j)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out.toArray
  }

  /** Intersection of two sorted distinct arrays. */
  private def intersectSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new ArrayBuffer[Long](math.min(a.length, b.length))
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { out += a(i); i += 1; j += 1 }
    }
    out.toArray
  }

  /** For each c in cur (sorted), whether it is in ids (sorted) and at
   *  what index — the two-pointer form of the kernel's _member. */
  private def member(ids: Array[Long], cur: Array[Long]): (Array[Boolean], Array[Int]) = {
    val found = new Array[Boolean](cur.length)
    val idx = new Array[Int](cur.length)
    var i = 0; var j = 0
    while (i < cur.length && j < ids.length) {
      if (ids(j) < cur(i)) j += 1
      else {
        if (ids(j) == cur(i)) { found(i) = true; idx(i) = j }
        i += 1
      }
    }
    (found, idx)
  }

  private final class TermBlock(
      val docIdsRaw: Array[Byte], val tfsRaw: Array[Byte],
      val lensRaw: Array[Byte], val posRaw: Array[Byte] = null) {
    lazy val ids: Array[Long] = deltaDecode(docIdsRaw)
    lazy val tfs: Array[Float] = decodeFloats(tfsRaw)
    lazy val lens: Array[Float] = decodeFloats(lensRaw)
    /** tf values as ints — the per-doc position counts (LocsIndex:
     *  tf == len(positions), the codec stores no separate offsets). */
    lazy val tfInts: Array[Long] = decodeIntsBest(tfsRaw)
    /** Packed per-doc position lists decoded to (flat values, start
     *  offset per doc) — the JVM twin of codec.unpack_position_lists:
     *  within a list the first value is absolute, the rest gaps. */
    lazy val posDecoded: (Array[Long], Array[Int]) = {
      val counts = tfInts
      val offs = new Array[Int](counts.length)
      var acc = 0
      var i = 0
      while (i < counts.length) { offs(i) = acc; acc += counts(i).toInt; i += 1 }
      if (posRaw == null || posRaw.isEmpty) (Array.emptyLongArray, offs)
      else {
        val d = decodeIntsBest(posRaw)
        val flat = new Array[Long](d.length)
        var idx = 0
        var li = 0
        while (li < counts.length) {
          val c = counts(li).toInt
          var a = 0L
          var j = 0
          while (j < c && idx < d.length) {
            a += d(idx); flat(idx) = a; idx += 1; j += 1
          }
          li += 1
        }
        (flat, offs)
      }
    }
  }

  /** One block group's decoded state: (term, is_label) -> TermBlock
   *  plus the per-term candidate-id cache.  In the batch kernel ONE
   *  BlockMaps serves every query of the batch, so a term's packed
   *  bytes decode once per block per batch — the JVM twin of the
   *  Python dispatcher's `shared` dict (blocks.py search_batch). */
  private final class BlockMaps {
    val content = new java.util.HashMap[String, TermBlock]()
    val labels = new java.util.HashMap[String, TermBlock]()
    val seen = new java.util.HashSet[String]()
    private val kwIds = new java.util.HashMap[String, Array[Long]]()

    def idsOf(t: String): Array[Long] = {
      var v = kwIds.get(t)
      if (v == null) {
        val c = content.get(t)
        val l = labels.get(t)
        v =
          if (c != null && l != null) unionSorted(c.ids, l.ids)
          else if (c != null) c.ids
          else l.ids
        kwIds.put(t, v)
      }
      v
    }
  }

  /** Load one block group's rows.  Projection convention: columns 0-3
   *  are always (term, block_id, is_label, doc_ids); `nCols` says how
   *  many more follow in order (tfs, token_lens, positions) — the
   *  logic path ships 4 columns, AND/BM25 ships 6, proximity 7. */
  private def readBlockN(rows: Iterator[Row], nCols: Int): BlockMaps = {
    val bm = new BlockMaps
    for (r <- rows) {
      val tb = new TermBlock(
        r.getAs[Array[Byte]](3),
        if (nCols > 4) r.getAs[Array[Byte]](4) else null,
        if (nCols > 5) r.getAs[Array[Byte]](5) else null,
        if (nCols > 6) r.getAs[Array[Byte]](6) else null)
      val term = r.getString(0)
      bm.seen.add(term)
      if (r.getBoolean(2)) bm.labels.put(term, tb) else bm.content.put(term, tb)
    }
    bm
  }

  /** (term, block_id, is_label, doc_ids, tfs, token_lens). */
  private def readBlock(rows: Iterator[Row]): BlockMaps = readBlockN(rows, 6)

  /** Candidate gather shared by the float32 and float64 scoring
   *  tails: k-way sorted intersection (+ whitelist), per-token tf
   *  columns, doc lengths with the label backfill, and the LocsIndex
   *  unscorable mask.  Pure decode/copy — no floating arithmetic —
   *  so both tails stay bit-identical to their Python twins.
   *  Returns null when the intersection (or whitelist) prunes to
   *  nothing. */
  private def andGather(
      bm: BlockMaps,
      toks: Array[String],
      kws: Array[String], wl: Array[Long],
      locsMode: Boolean)
      : (Array[Long], Array[Array[Float]], Array[Float], Array[Boolean]) = {
    // smallest candidate set first, stable for equal sizes
    val ordered = kws.distinct.sortBy(t => bm.idsOf(t).length)
    var cur = bm.idsOf(ordered(0))
    var oi = 1
    while (oi < ordered.length && cur.length > 0) {
      cur = intersectSorted(cur, bm.idsOf(ordered(oi)))
      oi += 1
    }
    if (wl != null && cur.length > 0) cur = intersectSorted(cur, wl)
    if (cur.length == 0) null
    else {
      val nC = cur.length
      val dl = new Array[Float](nC)
      val unscor = new Array[Boolean](nC)
      val tfCols = new Array[Array[Float]](toks.length)
      var ti = 0
      while (ti < toks.length) {
        val t = toks(ti)
        val c = bm.content.get(t)
        val col = new Array[Float](nC)
        if (c != null) {
          val (found, idx) = member(c.ids, cur)
          val tfs = c.tfs
          val lens = c.lens
          var j = 0
          while (j < nC) {
            if (found(j)) { col(j) = tfs(idx(j)); dl(j) = lens(idx(j)) }
            if (locsMode && !found(j)) unscor(j) = true
            j += 1
          }
        } else if (locsMode) {
          java.util.Arrays.fill(unscor, true)
        }
        tfCols(ti) = col
        ti += 1
      }
      // docs matched purely via labels still need a token_len —
      // backfill from any keyword row, labels first (same order
      // as the Python kernel)
      var needFill = false
      var j = 0
      while (j < nC && !needFill) { needFill = dl(j) == 0.0f; j += 1 }
      if (needFill) {
        var ki = 0
        while (ki < kws.length) {
          val t = kws(ki)
          var side = 0
          while (side < 2) {
            val tb = if (side == 0) bm.labels.get(t) else bm.content.get(t)
            if (tb != null) {
              val (found, idx) = member(tb.ids, cur)
              val lens = tb.lens
              var m = 0
              while (m < nC) {
                if (dl(m) == 0.0f && found(m)) dl(m) = lens(idx(m))
                m += 1
              }
            }
            side += 1
          }
          ki += 1
        }
      }
      (cur, tfCols, dl, unscor)
    }
  }

  /** Per-query AND + float32 BM25 body over one decoded block group —
   *  shared verbatim by searchAnd and searchAndBatch so the two stay
   *  bit-identical by construction (oracle.py::bm25_score_f32_vec).
   *  Returns (doc ids, scores), both empty when the intersection
   *  (or whitelist) prunes to nothing.  The caller has already
   *  verified every distinct keyword is present in the group. */
  private def andScore(
      bm: BlockMaps,
      toks: Array[String], idf: Array[Float], dfList: Array[Long],
      kws: Array[String], wl: Array[Long],
      k1: Float, b: Float, avg: Float,
      locsMode: Boolean): (Array[Long], Array[Float]) = {
    val g = andGather(bm, toks, kws, wl, locsMode)
    if (g == null) (Array.emptyLongArray, Array.emptyFloatArray)
    else {
      val (cur, tfCols, dl, unscor) = g
      val nC = cur.length
      val scores = new Array[Float](nC)
      var j = 0
      while (j < nC) {
        var score = 0.0f
        if (avg != 0.0f && !(locsMode && unscor(j))) {
          val d = dl(j)
          var i = 0
          while (i < toks.length) {
            val f = tfCols(i)(j)
            if (dfList(i) > 0 && f > 0.0f) {
              val contrib =
                idf(i) * f * (k1 + 1.0f) /
                  (f + k1 * ((1.0f - b) + (b * d) / avg))
              score = score + contrib
            }
            i += 1
          }
        }
        scores(j) = score
        j += 1
      }
      (cur, scores)
    }
  }

  /** Float64 twin of andScore — elementwise double arithmetic in
   *  query-token order, bit-identical to the pandas f64 kernel
   *  (oracle.py::bm25_score_f64_vec: contrib = idf*f*(k1+1) /
   *  (f + k1*((1-b) + b*d/avgdl)), accumulated only where tf > 0;
   *  idf arrives driver-side full-precision so no JVM log enters).
   *  Serves double_scores (oracle-parity) batches. */
  private def andScoreD(
      bm: BlockMaps,
      toks: Array[String], idfD: Array[Double], dfList: Array[Long],
      kws: Array[String], wl: Array[Long],
      k1: Double, b: Double, avg: Double,
      locsMode: Boolean): (Array[Long], Array[Double]) = {
    val g = andGather(bm, toks, kws, wl, locsMode)
    if (g == null) (Array.emptyLongArray, Array.emptyDoubleArray)
    else {
      val (cur, tfCols, dl, unscor) = g
      val nC = cur.length
      val scores = new Array[Double](nC)
      var j = 0
      while (j < nC) {
        var score = 0.0
        if (avg != 0.0 && !(locsMode && unscor(j))) {
          val d = dl(j).toDouble
          var i = 0
          while (i < toks.length) {
            val f = tfCols(i)(j).toDouble
            if (dfList(i) > 0 && f > 0.0) {
              val contrib =
                idfD(i) * f * (k1 + 1.0) /
                  (f + k1 * ((1.0 - b) + (b * d) / avg))
              score = score + contrib
            }
            i += 1
          }
        }
        scores(j) = score
        j += 1
      }
      (cur, scores)
    }
  }

  /** AND + float32 BM25 over the candidate blocks of one query.
   *
   *  `df` holds block rows of the query's keywords only, selected as
   *  exactly (term, block_id, is_label, doc_ids, tfs, token_lens) —
   *  positional access, the Python wrapper owns the projection; rows
   *  group by block_id (aligned doc-range groups — each group is an
   *  independent intersection).
   *  tokTerms/tokIdf/tokDf describe scoring tokens in query order;
   *  kwTerms is the full keyword list (tokens ++ extra labels) in the
   *  same order as the Python kernel's `keywords` (the doc-length
   *  backfill order is semantics).  whitelist (sorted, may be null)
   *  keeps only those doc ids after the intersection. */
  def searchAnd(
      df: DataFrame,
      tokTerms: java.util.List[String],
      tokIdf: java.util.List[java.lang.Number],
      tokDf: java.util.List[java.lang.Number],
      kwTerms: java.util.List[String],
      k1d: Double, bd: Double, avgdld: Double,
      locsMode: Boolean,
      whitelist: java.util.List[java.lang.Number]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val toks: Array[String] = tokTerms.asScala.toArray
    val idf: Array[Float] = tokIdf.asScala.map(_.doubleValue.toFloat).toArray
    val dfList: Array[Long] = tokDf.asScala.map(_.longValue).toArray
    val kws: Array[String] = kwTerms.asScala.toArray
    val wl: Array[Long] =
      if (whitelist == null) null
      else whitelist.asScala.map(_.longValue).toArray
    val k1 = k1d.toFloat
    val b = bd.toFloat
    val avg = avgdld.toFloat
    val nKw = kws.toSet.size

    df.groupByKey(r => r.getLong(1))(Encoders.scalaLong).flatMapGroups {
      (_: Long, rows: Iterator[Row]) =>
        val bm = readBlock(rows)
        if (bm.seen.size != nKw) Iterator.empty // AND prune
        else {
          val (ids, scores) =
            andScore(bm, toks, idf, dfList, kws, wl, k1, b, avg, locsMode)
          Iterator.tabulate(ids.length)(j => Row(ids(j), scores(j)))
        }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------- batch

  private val batchSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("score", FloatType, nullable = false)
  ))

  private val batchSchemaD = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)
  ))

  /** Batched AND/BM25: every query of the batch served from ONE
   *  decode of each block (the JVM twin of the Python dispatcher in
   *  blocks.py::BlockSearchEngine.search_batch, whose per-block
   *  `shared` dict plays the same role).  Parallel per-query lists:
   *  qids / tokTermsB / tokIdfB / tokDfB / kwTermsB / whitelists
   *  (a whitelist entry may be null = no whitelist).  `df` holds the
   *  block rows of the UNION of all queries' keywords, projected as
   *  (term, block_id, is_label, doc_ids, tfs, token_lens); a query
   *  missing any distinct keyword in a block group is AND-pruned
   *  there without decoding anything.
   *
   *  `doubleScores` switches the scoring tail to the float64 twin
   *  (andScoreD, oracle-parity mode): idf values arrive
   *  full-precision and the score column is DOUBLE. */
  def searchAndBatch(
      df: DataFrame,
      qids: java.util.List[String],
      tokTermsB: java.util.List[java.util.List[String]],
      tokIdfB: java.util.List[java.util.List[java.lang.Number]],
      tokDfB: java.util.List[java.util.List[java.lang.Number]],
      kwTermsB: java.util.List[java.util.List[String]],
      k1d: Double, bd: Double, avgdld: Double,
      locsMode: Boolean,
      whitelists: java.util.List[java.util.List[java.lang.Number]],
      doubleScores: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nQ = qids.size
    val qid = qids.asScala.toArray
    val toksB = new Array[Array[String]](nQ)
    val idfB = new Array[Array[Float]](nQ)
    val idfDB = new Array[Array[Double]](nQ)
    val dfB = new Array[Array[Long]](nQ)
    val kwsB = new Array[Array[String]](nQ)
    val kwsDistinctB = new Array[Array[String]](nQ)
    val wlB = new Array[Array[Long]](nQ)
    var q = 0
    while (q < nQ) {
      toksB(q) = tokTermsB.get(q).asScala.toArray
      idfDB(q) = tokIdfB.get(q).asScala.map(_.doubleValue).toArray
      idfB(q) = idfDB(q).map(_.toFloat)
      dfB(q) = tokDfB.get(q).asScala.map(_.longValue).toArray
      kwsB(q) = kwTermsB.get(q).asScala.toArray
      kwsDistinctB(q) = kwsB(q).distinct
      val w = whitelists.get(q)
      wlB(q) = if (w == null) null else w.asScala.map(_.longValue).toArray
      q += 1
    }
    val k1 = k1d.toFloat
    val b = bd.toFloat
    val avg = avgdld.toFloat

    df.groupByKey(r => r.getLong(1))(Encoders.scalaLong).flatMapGroups {
      (_: Long, rows: Iterator[Row]) =>
        val bm = readBlock(rows)
        val outs = new ArrayBuffer[Row]()
        var qi = 0
        while (qi < nQ) {
          // AND prune before any decode: all keywords present here?
          if (kwsDistinctB(qi).forall(bm.seen.contains)) {
            // box the mode's score type once; Row boxes regardless
            val (ids, sBox): (Array[Long], Array[Any]) =
              if (doubleScores) {
                val (i, s) = andScoreD(
                  bm, toksB(qi), idfDB(qi), dfB(qi), kwsB(qi), wlB(qi),
                  k1d, bd, avgdld, locsMode)
                (i, s.map(x => x: Any))
              } else {
                val (i, s) = andScore(
                  bm, toksB(qi), idfB(qi), dfB(qi), kwsB(qi), wlB(qi),
                  k1, b, avg, locsMode)
                (i, s.map(x => x: Any))
              }
            var j = 0
            while (j < ids.length) {
              outs += Row(qid(qi), ids(j), sBox(j))
              j += 1
            }
          }
          qi += 1
        }
        outs.iterator
    }(Encoders.row(if (doubleScores) batchSchemaD else batchSchema))
  }

  // ------------------------------------------- one-pass pruned batch

  /** One top-m candidate: the raw score (a widened float32, or a
   *  native double in double_scores mode) plus the ranking key the
   *  caller's final slice will use (round-half-up to 4 decimals in
   *  double_scores mode, the raw score widened otherwise). */
  private final class Cand(val docId: Long, val score: Double, val key: Double)

  /** min-heap order = WORST candidate first under the caller's final
   *  total order (key desc, doc_id asc) — so peek() is the row the
   *  next better candidate evicts. */
  private val candOrd: java.util.Comparator[Cand] =
    new java.util.Comparator[Cand] {
      def compare(a: Cand, b: Cand): Int = {
        val c = java.lang.Double.compare(a.key, b.key)
        if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
      }
    }

  /** Spark's F.round(col, 4) on a double: HALF_UP over the shortest
   *  decimal representation — reproduced exactly so the kernel's
   *  top-m selection uses the SAME total order as the caller's final
   *  rank slice. */
  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Single-pass batched block-max WAND: τ-threshold pruning INSIDE
   *  the kernel (riot's early-exit at core/indexer.go:468-471, lifted
   *  to block granularity) instead of the Python-orchestrated
   *  two-phase walk (score top-C ranges -> collect per-query τ ->
   *  second kernel pass).  One kernel pass, no driver round-trips.
   *
   *  `df` ships (term, block_id, is_label, doc_ids, tfs, token_lens,
   *  norm_max), block-colocated in any within-partition order: the
   *  kernel buffers its partition, computes each block's best bound
   *  from the same metadata columns, and walks block groups bound-
   *  descending — so each task sees its most-promising ranges first
   *  and its per-query τ tightens as early as a sequential WAND walk
   *  would, with no pre-shuffle bounds agg, broadcast join, or sort.
   *
   *  Per task, per query: a bounded top-m selector ordered by the
   *  caller's FINAL total order (round-half-up 4-decimal key in
   *  double_scores mode).  A block is skipped for query q when its
   *  metadata bound Σ idf·norm_max < (τ_q − slack − eps)/(1 + eps),
   *  where τ_q is the minimum RAW score in q's full selector — a
   *  lower bound on anything the selector holds, so no global
   *  top-(offset+k) row is ever pruned (the union of task-local top-m
   *  sets contains the global top-m).  A block every query skips is
   *  never decoded at all.  slack (1e-4 in double_scores mode) keeps
   *  docs that could round into a tie at the caller's 4-decimal
   *  granularity; eps absorbs float32-vs-double bound arithmetic. */
  def searchAndBatchPruned(
      df: DataFrame,
      qids: java.util.List[String],
      tokTermsB: java.util.List[java.util.List[String]],
      tokIdfB: java.util.List[java.util.List[java.lang.Number]],
      tokDfB: java.util.List[java.util.List[java.lang.Number]],
      kwTermsB: java.util.List[java.util.List[String]],
      k1d: Double, bd: Double, avgdld: Double,
      locsMode: Boolean,
      whitelists: java.util.List[java.util.List[java.lang.Number]],
      ms: java.util.List[java.lang.Number],
      roundKeys: Boolean,
      slackD: Double,
      epsB: java.util.List[java.lang.Number],
      doubleScores: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nQ = qids.size
    val qid = qids.asScala.toArray
    val toksB = new Array[Array[String]](nQ)
    val idfB = new Array[Array[Float]](nQ)
    val idfDB = new Array[Array[Double]](nQ)
    val dfB = new Array[Array[Long]](nQ)
    val kwsB = new Array[Array[String]](nQ)
    val kwsDistinctB = new Array[Array[String]](nQ)
    val wlB = new Array[Array[Long]](nQ)
    val mB = new Array[Int](nQ)
    val epsA = new Array[Double](nQ)
    var q = 0
    while (q < nQ) {
      toksB(q) = tokTermsB.get(q).asScala.toArray
      idfDB(q) = tokIdfB.get(q).asScala.map(_.doubleValue).toArray
      idfB(q) = idfDB(q).map(_.toFloat)
      dfB(q) = tokDfB.get(q).asScala.map(_.longValue).toArray
      kwsB(q) = kwTermsB.get(q).asScala.toArray
      kwsDistinctB(q) = kwsB(q).distinct
      val w = whitelists.get(q)
      wlB(q) = if (w == null) null else w.asScala.map(_.longValue).toArray
      mB(q) = ms.get(q).intValue
      epsA(q) = epsB.get(q).doubleValue
      q += 1
    }
    val k1 = k1d.toFloat
    val b = bd.toFloat
    val avg = avgdld.toFloat

    df.mapPartitions { rows =>
      val heaps = Array.fill(nQ)(
        new java.util.PriorityQueue[Cand](candOrd))
      val buf = new ArrayBuffer[Row]()

      def offer(qi: Int, docId: Long, score: Double): Unit = {
        val key = if (roundKeys) round4(score) else score
        val h = heaps(qi)
        if (h.size < mB(qi)) h.add(new Cand(docId, score, key))
        else {
          val worst = h.peek()
          if (key > worst.key || (key == worst.key && docId < worst.docId)) {
            h.poll(); h.add(new Cand(docId, score, key))
          }
        }
      }

      def tauRaw(qi: Int): Double = {
        // minimum RAW score in the full selector: a lower bound on
        // every held row, so pruning against it is exact even though
        // the heap ORDER is by (possibly rounded) key
        var t = java.lang.Double.MAX_VALUE
        val it = heaps(qi).iterator()
        while (it.hasNext) { val c = it.next(); if (c.score < t) t = c.score }
        t
      }

      def flush(): Unit = {
        if (buf.isEmpty) return
        // metadata pass: terms present + content norm_max, no decode
        val seen = new java.util.HashSet[String]()
        val nm = new java.util.HashMap[String, java.lang.Float]()
        var i = 0
        while (i < buf.length) {
          val r = buf(i)
          val t = r.getString(0)
          seen.add(t)
          if (!r.getBoolean(2)) nm.put(t, r.getFloat(6))
          i += 1
        }
        var anyActive = false
        val active = new Array[Boolean](nQ)
        var qi = 0
        while (qi < nQ) {
          if (kwsDistinctB(qi).forall(seen.contains)) {
            var keep = true
            if (heaps(qi).size >= mB(qi)) {
              var bound = 0.0
              val toks = toksB(qi)
              // full-precision idf: in f32 mode the incoming values
              // are float32-exact, so this matches idfB(ti).toDouble
              val idf = idfDB(qi)
              var ti = 0
              while (ti < toks.length) {
                val v = nm.get(toks(ti))
                if (v != null) bound += idf(ti) * v.toDouble
                ti += 1
              }
              val cutoff =
                (tauRaw(qi) - slackD - epsA(qi)) / (1.0 + epsA(qi))
              keep = bound >= cutoff
            }
            if (keep) { active(qi) = true; anyActive = true }
          }
          qi += 1
        }
        if (anyActive) {
          val bm = readBlockN(buf.iterator, 6)
          qi = 0
          while (qi < nQ) {
            if (active(qi)) {
              // both arms offer DOUBLE raw scores (float widening is
              // exact, and the f32 emit narrows back losslessly)
              val (ids, scoresD) =
                if (doubleScores)
                  andScoreD(
                    bm, toksB(qi), idfDB(qi), dfB(qi), kwsB(qi), wlB(qi),
                    k1d, bd, avgdld, locsMode)
                else {
                  val (i, s) = andScore(
                    bm, toksB(qi), idfB(qi), dfB(qi), kwsB(qi), wlB(qi),
                    k1, b, avg, locsMode)
                  (i, s.map(_.toDouble))
                }
              var j = 0
              while (j < ids.length) { offer(qi, ids(j), scoresD(j)); j += 1 }
            }
            qi += 1
          }
        }
        buf.clear()
      }

      // best bound any query holds on this block (queries missing a
      // keyword contribute nothing) — the task-local visit order.
      // Computing it here, from the same metadata flush() reads,
      // replaces the driver-side bounds-table agg + broadcast bkey
      // join + sortWithinPartitions the one-pass plan used to need:
      // the final top-m selector content is visit-order independent
      // (total order, no ties), so results are identical — order only
      // affects how fast each task's tau tightens.
      def blockKey(g: ArrayBuffer[Row]): Double = {
        val seen = new java.util.HashSet[String]()
        val nm = new java.util.HashMap[String, java.lang.Float]()
        var i = 0
        while (i < g.length) {
          val r = g(i)
          val t = r.getString(0)
          seen.add(t)
          if (!r.getBoolean(2)) nm.put(t, r.getFloat(6))
          i += 1
        }
        var best = java.lang.Double.NEGATIVE_INFINITY
        var qi = 0
        while (qi < nQ) {
          if (kwsDistinctB(qi).forall(seen.contains)) {
            var bound = 0.0
            val toks = toksB(qi)
            val idf = idfDB(qi)
            var ti = 0
            while (ti < toks.length) {
              val v = nm.get(toks(ti))
              if (v != null) bound += idf(ti) * v.toDouble
              ti += 1
            }
            if (bound > best) best = bound
          }
          qi += 1
        }
        best
      }

      new Iterator[Row] {
        private var out: Iterator[Row] = null
        private def drain(): Unit = {
          // buffer the partition grouped by block, order blocks by
          // their best bound descending, then walk — a sequential
          // WAND visit order with NO pre-shuffle sort or join
          val groups = new java.util.HashMap[Long, ArrayBuffer[Row]]()
          while (rows.hasNext) {
            val r = rows.next()
            val blk = r.getLong(1)
            var g = groups.get(blk)
            if (g == null) { g = new ArrayBuffer[Row](); groups.put(blk, g) }
            g += r
          }
          val ordered = new ArrayBuffer[(Double, Long, ArrayBuffer[Row])]()
          val git = groups.entrySet().iterator()
          while (git.hasNext) {
            val e = git.next()
            ordered += ((blockKey(e.getValue), e.getKey.longValue, e.getValue))
          }
          val sorted = ordered.sortBy { case (key, blk, _) => (-key, blk) }
          var gi = 0
          while (gi < sorted.length) {
            buf ++= sorted(gi)._3
            flush()
            gi += 1
          }
          val emitted = new ArrayBuffer[Row]()
          var qi = 0
          while (qi < nQ) {
            val it = heaps(qi).iterator()
            while (it.hasNext) {
              val c = it.next()
              // f32 mode stores the float widened, so the narrowing
              // round-trip is exact
              emitted += Row(
                qid(qi), c.docId,
                if (doubleScores) c.score else c.score.toFloat)
            }
            qi += 1
          }
          out = emitted.iterator
        }
        def hasNext: Boolean = { if (out == null) drain(); out.hasNext }
        def next(): Row = { if (out == null) drain(); out.next() }
      }
    }(Encoders.row(if (doubleScores) batchSchemaD else batchSchema))
  }

  // ----------------------------------------------------- proximity

  private val proxBatchSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("proximity", IntegerType, nullable = false)
  ))

  /** min over position choices of sum |P_{i+1} - P_i - len(token_i)|,
   *  len in BYTES — the DP of riot's computeTokenProximity
   *  (core/indexer.go:723-813), step-identical to the Python port
   *  riot_spark/oracle.py::token_proximity (minus path reconstruction,
   *  which only snippets need).  -1 = some token has no positions. */
  def tokenProximity(poss: Array[Array[Long]], tokBytes: Array[Int]): Int = {
    val n = poss.length
    if (n == 0) return -1
    var i = 0
    while (i < n) { if (poss(i).length == 0) return -1; i += 1 }
    if (n == 1) return 0
    var curLocs = poss(0)
    var curMin = new Array[Long](curLocs.length) // zeros
    i = 1
    while (i < n) {
      val nxt = poss(i)
      val nxtMin = Array.fill[Long](nxt.length)(-1L)
      var iNext = 0
      var iCur = 0
      while (iCur < curLocs.length) {
        if (curMin(iCur) != -1L) {
          val curLoc = curLocs(iCur)
          while (iNext + 1 < nxt.length && nxt(iNext + 1) < curLoc) iNext += 1
          var t = 0
          while (t < 2) {
            val to = iNext + t
            if (to < nxt.length) {
              val v = curMin(iCur) + math.abs(nxt(to) - curLoc - tokBytes(i - 1))
              if (nxtMin(to) == -1L || v < nxtMin(to)) nxtMin(to) = v
            }
            t += 1
          }
        }
        iCur += 1
      }
      curLocs = nxt
      curMin = nxtMin
      i += 1
    }
    var best = -1L
    i = 0
    while (i < curMin.length) {
      val v = curMin(i)
      if (v != -1L && (best == -1L || v < best)) best = v
      i += 1
    }
    best.toInt
  }

  private val proxFullSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("score", FloatType, nullable = false),
    StructField("proximity", IntegerType, nullable = false),
    StructField("snippet_locs", ArrayType(IntegerType), nullable = false)
  ))

  /** Single-query AND + float32 BM25 + proximity DP + snippet path
   *  over packed blocks — the JVM twin of the pandas kernel built by
   *  blocks.py::_make_and_kernel with do_prox=True (the
   *  search_and(proximity=True) path).  Scores come from the shared
   *  andScore body (bit-identical to searchAnd); the DP runs
   *  FlatQuery.tokenProximityPath over the packed positions, emitting
   *  the chosen snippet locations exactly like oracle.token_proximity.
   *  Unscorable docs (a query token matched only via a label posting)
   *  keep score 0, proximity -1, empty snippet.  `df` is projected as
   *  (term, block_id, is_label, doc_ids, tfs, token_lens, positions). */
  def searchProx(
      df: DataFrame,
      tokTerms: java.util.List[String],
      tokIdf: java.util.List[java.lang.Number],
      tokDf: java.util.List[java.lang.Number],
      kwTerms: java.util.List[String],
      k1d: Double, bd: Double, avgdld: Double,
      whitelist: java.util.List[java.lang.Number]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val toks: Array[String] = tokTerms.asScala.toArray
    val idf: Array[Float] = tokIdf.asScala.map(_.doubleValue.toFloat).toArray
    val dfList: Array[Long] = tokDf.asScala.map(_.longValue).toArray
    val kws: Array[String] = kwTerms.asScala.toArray
    val tokBytes: Array[Int] = toks.map(_.getBytes("UTF-8").length)
    val k1 = k1d.toFloat
    val b = bd.toFloat
    val avg = avgdld.toFloat
    val nKw = kws.toSet.size
    val nTok = toks.length
    val wl: Array[Long] =
      if (whitelist == null) null
      else whitelist.asScala.map(_.longValue).toArray

    df.groupByKey(r => r.getLong(1))(Encoders.scalaLong).flatMapGroups {
      (_: Long, rows: Iterator[Row]) =>
        val bm = readBlockN(rows, 7)
        if (bm.seen.size != nKw) Iterator.empty // AND prune
        else {
          val (ids, scores) =
            andScore(bm, toks, idf, dfList, kws, wl, k1, b, avg, true)
          if (ids.isEmpty) Iterator.empty
          else {
            val nC = ids.length
            val unscor = new Array[Boolean](nC)
            val foundT = new Array[Array[Boolean]](nTok)
            val idxT = new Array[Array[Int]](nTok)
            var ti = 0
            while (ti < nTok) {
              val c = bm.content.get(toks(ti))
              if (c == null) {
                java.util.Arrays.fill(unscor, true)
                foundT(ti) = new Array[Boolean](nC)
                idxT(ti) = new Array[Int](nC)
              } else {
                val (found, idx) = member(c.ids, ids)
                var j = 0
                while (j < nC) {
                  if (!found(j)) unscor(j) = true
                  j += 1
                }
                foundT(ti) = found
                idxT(ti) = idx
              }
              ti += 1
            }
            val prox = Array.fill(nC)(-1)
            val snips = Array.fill[Array[Int]](nC)(Array.emptyIntArray)
            if (nTok > 0) {
              var j = 0
              while (j < nC) {
                if (!unscor(j)) {
                  val poss = new Array[Array[Int]](nTok)
                  var i = 0
                  while (i < nTok) {
                    val c = bm.content.get(toks(i))
                    val (flat, offs) = c.posDecoded
                    val ix = idxT(i)(j)
                    val cnt = c.tfInts(ix).toInt
                    val off = offs(ix)
                    poss(i) =
                      if (off + cnt <= flat.length) {
                        val a = new Array[Int](cnt)
                        var m = 0
                        while (m < cnt) { a(m) = flat(off + m).toInt; m += 1 }
                        a
                      } else Array.emptyIntArray
                    i += 1
                  }
                  val (p, s) = FlatQuery.tokenProximityPath(poss, tokBytes)
                  prox(j) = p
                  snips(j) = s
                }
                j += 1
              }
            }
            Iterator.tabulate(nC)(j =>
              Row(ids(j), scores(j), prox(j), snips(j).toSeq))
          }
        }
    }(Encoders.row(proxFullSchema))
  }

  /** Batched proximity-criteria kernel: AND-intersect each query's
   *  keywords, then run the proximity DP over the packed positions —
   *  all queries of the batch served from ONE executor-side decode of
   *  each block (same dispatch shape as searchAndBatch).  Emits every
   *  candidate; proximity -1 marks unscorable docs (a query token
   *  matched only via a label posting, indexer.go:489-507) and the
   *  caller maps it to score 0 — the contract of the pandas kernel
   *  (blocks.py::_make_and_kernel with do_prox=True).
   *
   *  `df` is projected as (term, block_id, is_label, doc_ids, tfs,
   *  token_lens, positions); position counts come from the tf ints. */
  def searchProxBatch(
      df: DataFrame,
      qids: java.util.List[String],
      tokTermsB: java.util.List[java.util.List[String]],
      kwTermsB: java.util.List[java.util.List[String]],
      whitelists: java.util.List[java.util.List[java.lang.Number]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nQ = qids.size
    val qid = qids.asScala.toArray
    val toksB = new Array[Array[String]](nQ)
    val tokBytesB = new Array[Array[Int]](nQ)
    val kwsDistinctB = new Array[Array[String]](nQ)
    val wlB = new Array[Array[Long]](nQ)
    var q = 0
    while (q < nQ) {
      toksB(q) = tokTermsB.get(q).asScala.toArray
      tokBytesB(q) = toksB(q).map(_.getBytes("UTF-8").length)
      kwsDistinctB(q) = kwTermsB.get(q).asScala.toArray.distinct
      val w = whitelists.get(q)
      wlB(q) = if (w == null) null else w.asScala.map(_.longValue).toArray
      q += 1
    }

    df.groupByKey(r => r.getLong(1))(Encoders.scalaLong).flatMapGroups {
      (_: Long, rows: Iterator[Row]) =>
        val bm = readBlockN(rows, 7)
        val outs = new ArrayBuffer[Row]()
        var qi = 0
        while (qi < nQ) {
          if (kwsDistinctB(qi).forall(bm.seen.contains)) {
            val ordered = kwsDistinctB(qi).sortBy(t => bm.idsOf(t).length)
            var cur = bm.idsOf(ordered(0))
            var oi = 1
            while (oi < ordered.length && cur.length > 0) {
              cur = intersectSorted(cur, bm.idsOf(ordered(oi)))
              oi += 1
            }
            if (wlB(qi) != null && cur.length > 0)
              cur = intersectSorted(cur, wlB(qi))
            if (cur.length > 0) {
              val toks = toksB(qi)
              val nTok = toks.length
              val nC = cur.length
              val unscor = new Array[Boolean](nC)
              val foundT = new Array[Array[Boolean]](nTok)
              val idxT = new Array[Array[Int]](nTok)
              var ti = 0
              while (ti < nTok) {
                val c = bm.content.get(toks(ti))
                if (c == null) {
                  java.util.Arrays.fill(unscor, true)
                  foundT(ti) = new Array[Boolean](nC)
                  idxT(ti) = new Array[Int](nC)
                } else {
                  val (found, idx) = member(c.ids, cur)
                  var j = 0
                  while (j < nC) {
                    if (!found(j)) unscor(j) = true
                    j += 1
                  }
                  foundT(ti) = found
                  idxT(ti) = idx
                }
                ti += 1
              }
              val prox = Array.fill(nC)(-1)
              if (nTok > 0) {
                var j = 0
                while (j < nC) {
                  if (!unscor(j)) {
                    val poss = new Array[Array[Long]](nTok)
                    var i = 0
                    while (i < nTok) {
                      val c = bm.content.get(toks(i))
                      val (flat, offs) = c.posDecoded
                      val ix = idxT(i)(j)
                      val cnt = c.tfInts(ix).toInt
                      val off = offs(ix)
                      poss(i) =
                        if (off + cnt <= flat.length)
                          java.util.Arrays.copyOfRange(flat, off, off + cnt)
                        else Array.emptyLongArray
                      i += 1
                    }
                    prox(j) = tokenProximity(poss, tokBytesB(qi))
                  }
                  j += 1
                }
              }
              var j = 0
              while (j < nC) {
                outs += Row(qid(qi), cur(j), prox(j))
                j += 1
              }
            }
          }
          qi += 1
        }
        outs.iterator
    }(Encoders.row(proxBatchSchema))
  }

  // --------------------------------------------------------- logic

  private val logicBatchSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false)
  ))

  private val countBatchSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)
  ))

  /** Batched CountDocsOnly: the must-intersection SIZE summed
   *  in-kernel per block (blocks partition the doc space, so
   *  per-block counts sum exactly), one (query_id, partial-count) row
   *  per query per task — a hot-term count no longer ships O(df)
   *  candidate rows through a shuffle, it ships O(queries x tasks)
   *  longs.  Whitelists intersect before counting (LogicLookup,
   *  core/indexer.go:632-637).  `df` is (term, block_id, is_label,
   *  doc_ids), block-colocated. */
  def countLogicBatch(
      df: DataFrame,
      qids: java.util.List[String],
      mustB: java.util.List[java.util.List[String]],
      whitelists: java.util.List[java.util.List[java.lang.Number]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nQ = qids.size
    val qid = qids.asScala.toArray
    val mB = new Array[Array[String]](nQ)
    val wlB = new Array[Array[Long]](nQ)
    var q = 0
    while (q < nQ) {
      mB(q) = mustB.get(q).asScala.toArray.distinct
      val w = whitelists.get(q)
      wlB(q) = if (w == null) null else w.asScala.map(_.longValue).toArray
      q += 1
    }
    df.mapPartitions { rows =>
      val groups = new java.util.HashMap[Long, ArrayBuffer[Row]]()
      while (rows.hasNext) {
        val r = rows.next()
        val blk = r.getLong(1)
        var g = groups.get(blk)
        if (g == null) { g = new ArrayBuffer[Row](); groups.put(blk, g) }
        g += r
      }
      val cnt = new Array[Long](nQ)
      val git = groups.values().iterator()
      while (git.hasNext) {
        val bm = readBlockN(git.next().iterator, 4)
        var qi = 0
        while (qi < nQ) {
          val must = mB(qi)
          if (must.forall(bm.seen.contains)) {
            val ordered = must.sortBy(t => bm.idsOf(t).length)
            var cur = bm.idsOf(ordered(0))
            var oi = 1
            while (oi < ordered.length && cur.length > 0) {
              cur = intersectSorted(cur, bm.idsOf(ordered(oi)))
              oi += 1
            }
            if (wlB(qi) != null && cur.length > 0)
              cur = intersectSorted(cur, wlB(qi))
            cnt(qi) += cur.length
          }
          qi += 1
        }
      }
      val outs = new ArrayBuffer[Row](nQ)
      var qi = 0
      while (qi < nQ) {
        if (cnt(qi) > 0) outs += Row(qid(qi), cnt(qi))
        qi += 1
      }
      outs.iterator
    }(Encoders.row(countBatchSchema))
  }

  /** Union of k sorted distinct arrays (np.unique(concatenate)). */
  private def unionAll(arrs: Seq[Array[Long]]): Array[Long] =
    arrs.reduce(unionSorted)

  /** a \ b over sorted distinct arrays. */
  private def diffSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new ArrayBuffer[Long](a.length)
    var i = 0; var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.toArray
  }

  /** Batched must/should/notIn set algebra on the packed layout — the
   *  JVM twin of blocks.py::_make_logic_kernel under the decode-once
   *  batch dispatch (LogicLookup, core/indexer.go:561-685, incl. the
   *  notIn-only quirk of returning the notIn docs themselves).  The
   *  caller passes per-query must/should/notIn already filtered to
   *  globally-present terms exactly as the pandas path does; block-
   *  level absence is handled here.  CountDocsOnly batches route
   *  through this too (count = must-only candidates, counted by the
   *  caller, with every cap 0 = unlimited).  `df` is projected as
   *  (term, block_id, is_label, doc_ids), block-colocated — the
   *  logic path never decodes tf/len/position bytes.
   *
   *  `ms` caps each query's emission per task (<= 0 = unlimited).
   *  Logic results rank by doc_id ascending (all scores 0), and a
   *  block's doc range is an ascending function of block_id, so each
   *  task walks ITS blocks block_id-ascending and stops a query once
   *  it emitted m candidates: the task's first m candidates ARE its
   *  m smallest doc ids, so the union over tasks contains the global
   *  top-m — the doc-id-ordered analogue of the score-ordered WAND
   *  early exit (riot's early-exit, core/indexer.go:437-478).  A
   *  task whose every capped query is satisfied (and that serves no
   *  unlimited query) skips its remaining blocks without decoding
   *  them. */
  def searchLogicBatch(
      df: DataFrame,
      qids: java.util.List[String],
      mustB: java.util.List[java.util.List[String]],
      shouldB: java.util.List[java.util.List[String]],
      notinB: java.util.List[java.util.List[String]],
      whitelists: java.util.List[java.util.List[java.lang.Number]],
      ms: java.util.List[java.lang.Number]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nQ = qids.size
    val qid = qids.asScala.toArray
    val mB = new Array[Array[String]](nQ)
    val sB = new Array[Array[String]](nQ)
    val nB = new Array[Array[String]](nQ)
    val wlB = new Array[Array[Long]](nQ)
    val capB = new Array[Int](nQ)
    var q = 0
    while (q < nQ) {
      mB(q) = mustB.get(q).asScala.toArray
      sB(q) = shouldB.get(q).asScala.toArray
      nB(q) = notinB.get(q).asScala.toArray
      val w = whitelists.get(q)
      wlB(q) = if (w == null) null else w.asScala.map(_.longValue).toArray
      capB(q) = if (ms == null) 0 else ms.get(q).intValue
      q += 1
    }

    df.mapPartitions { rows =>
      // group the task's rows by block, then walk blocks ascending
      val groups = new java.util.HashMap[Long, ArrayBuffer[Row]]()
      while (rows.hasNext) {
        val r = rows.next()
        val blk = r.getLong(1)
        var g = groups.get(blk)
        if (g == null) { g = new ArrayBuffer[Row](); groups.put(blk, g) }
        g += r
      }
      val order = {
        val ks = new ArrayBuffer[Long](groups.size)
        val it = groups.keySet().iterator()
        while (it.hasNext) ks += it.next().longValue
        ks.sorted
      }
      val remaining = capB.map(c => if (c > 0) c else Int.MaxValue)
      val capped = capB.map(_ > 0)
      val nUnlimited = capped.count(!_)
      var nActive = capped.count(identity) // capped queries still unfilled
      val outs = new ArrayBuffer[Row]()

      def emit(qi: Int, cur: Array[Long]): Unit = {
        val take =
          if (capped(qi)) math.min(remaining(qi), cur.length) else cur.length
        var j = 0
        while (j < take) { outs += Row(qid(qi), cur(j)); j += 1 }
        if (capped(qi)) {
          remaining(qi) -= take
          if (remaining(qi) == 0) nActive -= 1
        }
      }

      var bi = 0
      while (bi < order.length && (nUnlimited > 0 || nActive > 0)) {
        val bm = readBlockN(groups.get(order(bi)).iterator, 4)
        var qi = 0
        while (qi < nQ) {
          if (!capped(qi) || remaining(qi) > 0) {
            val must = mB(qi); val should = sB(qi); val notin = nB(qi)
            var cur: Array[Long] = null
            var skip = false
            var done = false
            if (must.nonEmpty) {
              if (!must.forall(bm.seen.contains)) skip = true
              else {
                val ordered = must.sortBy(t => bm.idsOf(t).length)
                cur = bm.idsOf(ordered(0))
                var oi = 1
                while (oi < ordered.length && cur.length > 0) {
                  cur = intersectSorted(cur, bm.idsOf(ordered(oi)))
                  oi += 1
                }
                if (cur.length == 0) skip = true
                else if (should.nonEmpty) {
                  val sh = should.filter(bm.seen.contains).map(bm.idsOf)
                  if (sh.isEmpty) skip = true
                  else cur = intersectSorted(cur, unionAll(sh.toSeq))
                }
              }
            } else if (should.nonEmpty) {
              val sh = should.filter(bm.seen.contains).map(bm.idsOf)
              if (sh.isEmpty) skip = true
              else cur = unionAll(sh.toSeq)
            } else {
              // notIn-only quirk: the notIn docs themselves, whitelist
              // applied, NO subtraction (indexer.go:660-682)
              val ni = notin.filter(bm.seen.contains).map(bm.idsOf)
              if (ni.isEmpty) skip = true
              else {
                cur = unionAll(ni.toSeq)
                if (wlB(qi) != null) cur = intersectSorted(cur, wlB(qi))
                emit(qi, cur)
                done = true
              }
            }
            if (!skip && !done) {
              if (notin.nonEmpty) {
                val ni = notin.filter(bm.seen.contains).map(bm.idsOf)
                if (ni.nonEmpty) cur = diffSorted(cur, unionAll(ni.toSeq))
              }
              if (wlB(qi) != null) cur = intersectSorted(cur, wlB(qi))
              emit(qi, cur)
            }
          }
          qi += 1
        }
        bi += 1
      }
      outs.iterator
    }(Encoders.row(logicBatchSchema))
  }
}

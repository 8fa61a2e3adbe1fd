package riotspark

/* JVM-side float32 scorer for the FLAT postings layout — the
 * zero-transfer twin of riot_spark/query.py::_f32_score_pdf under the
 * batched dispatch of SearchEngine._f32_batch_exec (and the
 * single-query _score_float32, which calls it with one query id).
 *
 * The pandas kernel ships every matched posting row JVM -> Python
 * over Arrow and scores in numpy; at sf0.1 that transfer plus the
 * per-candidate Python proximity loop is the mixed-batch floor
 * (~3.2 s).  This kernel walks the same (query_id, doc_id)-sorted
 * partitions inside the executor: each group is one candidate doc of
 * one query, scored as it streams past — nothing crosses into Python.
 *
 * Parity contract (differential-tested in tests/test_jvm_flat.py):
 *  - float32 BM25 bit-identical to oracle.bm25_score_f32_vec
 *    (core/indexer.go:523-547): per query token in order,
 *    contrib = idf * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
 *    in float32, accumulated only where df > 0 and tf > 0; idf is
 *    fixed driver-side (numpy float64 log2 -> float32) so no JVM log
 *    enters the fixed-point path.
 *  - locs mode: tf = len(positions); a query-token row that is a
 *    label posting or has no positions marks the doc unscorable
 *    (score 0, the partial-locations guard, indexer.go:489-507).
 *  - proximity DP with path reconstruction, step-identical to
 *    oracle.token_proximity (computeTokenProximity,
 *    core/indexer.go:723-813) including snippet locations.
 *  - docs matched only via label keywords (no query-token row) are
 *    dropped, and a doc must carry ALL n_kw distinct keywords (AND).
 */

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

object FlatQuery {

  private val outSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("score", FloatType, nullable = false),
    StructField("proximity", IntegerType, nullable = false),
    StructField("snippet_locs", ArrayType(IntegerType), nullable = false)
  ))

  /** Token-proximity DP with backpointers — returns (proximity,
   *  chosen positions); (-1, empty) when any token has no positions.
   *  Mirrors oracle.token_proximity exactly: candidate transitions
   *  are the two positions straddling the current one, ties keep the
   *  first minimal index. */
  def tokenProximityPath(
      poss: Array[Array[Int]], tokBytes: Array[Int]): (Int, Array[Int]) = {
    val n = poss.length
    val empty = Array.emptyIntArray
    if (n == 0) return (-1, empty)
    var i = 0
    while (i < n) { if (poss(i).length == 0) return (-1, empty); i += 1 }
    if (n == 1) return (0, Array(poss(0)(0)))
    val paths = new Array[Array[Int]](n)
    var curLocs = poss(0)
    var curMin = new Array[Long](curLocs.length) // zeros
    i = 1
    while (i < n) {
      val nxt = poss(i)
      val nxtMin = Array.fill[Long](nxt.length)(-1L)
      val bp = new Array[Int](nxt.length)
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
              val v =
                curMin(iCur) + math.abs(nxt(to).toLong - curLoc - tokBytes(i - 1))
              if (nxtMin(to) == -1L || v < nxtMin(to)) {
                nxtMin(to) = v
                bp(to) = iCur
              }
            }
            t += 1
          }
        }
        iCur += 1
      }
      paths(i) = bp
      curLocs = nxt
      curMin = nxtMin
      i += 1
    }
    var best = -1L
    var cursor = 0
    i = 0
    while (i < curMin.length) {
      val v = curMin(i)
      if (v != -1L && (best == -1L || v < best)) { best = v; cursor = i }
      i += 1
    }
    val locs = new Array[Int](n)
    i = n - 1
    while (i >= 0) {
      if (i != n - 1) cursor = paths(i + 1)(cursor)
      locs(i) = poss(i)(cursor)
      i -= 1
    }
    (best.toInt, locs)
  }

  /** Skew-proof partial top-k — the JVM twin of
   *  SearchEngine._partial_topk's pandas cap (itself riot's per-shard
   *  [0, offset+max) slice, ranker_worker.go:60-73, reproduced for
   *  the batch path).  Per partition, per query: a bounded heap keeps
   *  the best (offset+k) rows by (score*dir desc, doc_id*dir asc)
   *  (byScore) or (doc_id asc) (orderless/count ranking); k == 0 rows
   *  stream through uncapped.  Exact by the same argument as the
   *  pandas cap: every global top-(offset+k) row survives its
   *  partition's cut, and the downstream per-query window re-ranks.
   *  Column positions are resolved by name driver-side and passed in;
   *  dirIdx < 0 means no dir column (direction fixed at +1).  The
   *  output schema is the input schema — rows pass through intact. */
  def partialTopK(
      df: DataFrame,
      qidIdx: Int, docIdx: Int, scoreIdx: Int,
      kIdx: Int, qoffIdx: Int, dirIdx: Int,
      byScore: Boolean): DataFrame = {
    val schema = df.schema
    df.mapPartitions { rows =>
      new Iterator[Row] {
        // head = WORST kept row (min-heap under the reversed order)
        private val ord = new java.util.Comparator[(Double, Double, Row)] {
          def compare(
              a: (Double, Double, Row), b: (Double, Double, Row)): Int = {
            val c = java.lang.Double.compare(b._1, a._1)
            if (c != 0) c else java.lang.Double.compare(b._2, a._2)
          }
        }
        private val heaps = new java.util.HashMap[
          String, java.util.PriorityQueue[(Double, Double, Row)]]()
        private val caps = new java.util.HashMap[String, Int]()
        private var drain: java.util.Iterator[Row] = null
        private var outRow: Row = null

        private def keyOf(r: Row): (Double, Double) = {
          val doc = r.get(docIdx).asInstanceOf[Number].doubleValue
          if (!byScore) (0.0, doc)
          else {
            val d =
              if (dirIdx < 0) 1.0
              else r.get(dirIdx).asInstanceOf[Number].doubleValue
            val s = r.get(scoreIdx).asInstanceOf[Number].doubleValue
            (-(s * d), doc * d)
          }
        }

        private def advance(): Unit = {
          while (outRow == null) {
            if (rows.hasNext) {
              val r = rows.next()
              val k = r.get(kIdx).asInstanceOf[Number].intValue
              if (k == 0) { outRow = r } // unlimited: no cap possible
              else {
                val qid = r.getString(qidIdx)
                var h = heaps.get(qid)
                if (h == null) {
                  h = new java.util.PriorityQueue(ord)
                  heaps.put(qid, h)
                  caps.put(
                    qid, k + r.get(qoffIdx).asInstanceOf[Number].intValue)
                }
                val (k1, k2) = keyOf(r)
                if (h.size < caps.get(qid)) h.offer((k1, k2, r))
                else if (ord.compare((k1, k2, r), h.peek()) > 0) {
                  h.poll(); h.offer((k1, k2, r))
                }
              }
            } else {
              if (drain == null) {
                val all = new java.util.ArrayList[Row]()
                val it = heaps.values().iterator()
                while (it.hasNext) {
                  val hi = it.next().iterator()
                  while (hi.hasNext) all.add(hi.next()._3)
                }
                drain = all.iterator()
              }
              if (drain.hasNext) outRow = drain.next() else return
            }
          }
        }

        override def hasNext: Boolean = { advance(); outRow != null }
        override def next(): Row = {
          advance()
          val r = outRow
          outRow = null
          r
        }
      }
    }(Encoders.row(schema))
  }

  /** Per-query compiled metadata. */
  private final class QInfo(
      val nTok: Int,
      val tokIndex: java.util.HashMap[String, Integer], // term -> LAST index
      val tokBytes: Array[Int],
      val idf: Array[Float],
      val dfList: Array[Long],
      val nKw: Int) extends Serializable

  /** Batched float32 BM25 + proximity over flat postings.
   *
   *  `df` is projected as exactly (query_id, doc_id, term, tf,
   *  positions, token_len, is_label), hash-partitioned on
   *  (query_id, doc_id) and sorted within partitions on the same keys
   *  (the Python caller owns that shape) — every (query, doc) group
   *  is contiguous, so one forward pass scores each candidate with
   *  O(group) state.  Each group emits at most one output row. */
  def searchF32Batch(
      df: DataFrame,
      qids: java.util.List[String],
      tokTermsB: java.util.List[java.util.List[String]],
      tokIdfB: java.util.List[java.util.List[java.lang.Number]],
      tokDfB: java.util.List[java.util.List[java.lang.Number]],
      nKwB: java.util.List[java.lang.Number],
      k1d: Double, bd: Double, avgdld: Double,
      locsMode: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    val qinfo = new java.util.HashMap[String, QInfo]()
    var q = 0
    while (q < qids.size) {
      val toks = tokTermsB.get(q).asScala.toArray
      val tokIndex = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < toks.length) { tokIndex.put(toks(i), i); i += 1 } // last wins
      qinfo.put(qids.get(q), new QInfo(
        toks.length,
        tokIndex,
        toks.map(_.getBytes("UTF-8").length),
        tokIdfB.get(q).asScala.map(_.doubleValue.toFloat).toArray,
        tokDfB.get(q).asScala.map(_.longValue).toArray,
        nKwB.get(q).intValue))
      q += 1
    }
    val k1 = k1d.toFloat
    val b = bd.toFloat
    val avg = avgdld.toFloat

    df.mapPartitions { rows =>
      new Iterator[Row] {
        private var pending: Row = if (rows.hasNext) rows.next() else null
        private var outRow: Row = null

        /** Consume one (query_id, doc_id) group and score it.
         *  Returns null when the group is not a full AND match. */
        private def flushGroup(): Row = {
          val first = pending
          val qid = first.getString(0)
          val did = first.getLong(1)
          val info = qinfo.get(qid)
          val nTok = if (info == null) 0 else info.nTok
          val tfCols = new Array[Float](nTok)
          val posCols = new Array[Array[Int]](nTok)
          val seen = new java.util.HashSet[String]()
          var dl = 0.0f
          var anyTok = false
          var unscor = false
          var r = first
          while (r != null) {
            val term = r.getString(2)
            seen.add(term)
            if (info != null) {
              val tiBox = info.tokIndex.get(term)
              if (tiBox != null) {
                val ti = tiBox.intValue
                anyTok = true
                dl = r.getFloat(5)
                val isLabel = r.getBoolean(6)
                var f = 0.0f
                if (locsMode) {
                  val p: Seq[Int] =
                    if (r.isNullAt(4)) null else r.getSeq[Int](4)
                  f = if (p == null) 0.0f else p.length.toFloat
                  if (isLabel || f == 0.0f) unscor = true
                  posCols(ti) =
                    if (p == null) Array.emptyIntArray else p.toArray
                } else {
                  f = if (isLabel) 0.0f else r.getFloat(3)
                }
                tfCols(ti) = f
              }
            }
            pending =
              if (rows.hasNext) rows.next() else null
            r =
              if (pending != null && pending.getString(0) == qid &&
                  pending.getLong(1) == did) pending
              else null
          }
          if (info == null || seen.size != info.nKw || !anyTok) return null
          var score = 0.0f
          if (avg != 0.0f && !(locsMode && unscor)) {
            var i = 0
            while (i < nTok) {
              val f = tfCols(i)
              if (info.dfList(i) > 0 && f > 0.0f) {
                val contrib =
                  info.idf(i) * f * (k1 + 1.0f) /
                    (f + k1 * ((1.0f - b) + (b * dl) / avg))
                score = score + contrib
              }
              i += 1
            }
          }
          if (locsMode && unscor) score = 0.0f
          var prox = -1
          var snips: Array[Int] = Array.emptyIntArray
          if (locsMode && !unscor) {
            var i = 0
            while (i < nTok) {
              if (posCols(i) == null) posCols(i) = Array.emptyIntArray
              i += 1
            }
            val (p, s) = tokenProximityPath(posCols, info.tokBytes)
            prox = p
            snips = s
          }
          Row(qid, did, score, prox, snips.toSeq)
        }

        private def advance(): Unit =
          while (outRow == null && pending != null) outRow = flushGroup()

        override def hasNext: Boolean = { advance(); outRow != null }
        override def next(): Row = {
          advance()
          val r = outRow
          outRow = null
          r
        }
      }
    }(Encoders.row(outSchema))
  }
}

package graft.ground

import scala.collection.mutable

/**
 * Aho–Corasick multi-pattern matcher over normalized text, used for batched
 * dictionary mention detection per transcript turn (SURVEY G4 / north_star
 * "dictionary/trie-based batched mention detection per turn").
 *
 * Built once on the driver from the lexicon (ssslm.make_grounder analogue,
 * reference contract at ner.py:47-64), broadcast, and run inside
 * `mapPartitions` so the automaton is per-partition state, not per-row.
 *
 * Matching semantics (gilda-family, documented in SURVEY F5):
 *  - patterns are matched on casefolded, whitespace-folded text;
 *  - only matches at word boundaries count (a non-letter/digit on both sides);
 *  - overlapping matches of DIFFERENT patterns are all emitted; the
 *    scoring/top-1 window downstream resolves them.
 *
 * Construction is the textbook BFS failure-link build; lookup is O(|text| +
 * #matches). The automaton is immutable after `build` and Serializable
 * (array-backed, no closures) so broadcasting is cheap.
 */
final class AhoCorasick private (
    // compiled automaton: per node a SORTED char array + parallel target
    // array (binary search per step — no boxing, cache-friendly), plus a
    // direct-indexed table for the root's ASCII transitions (the root is by
    // far the most-visited state on natural text).
    nodeChars: Array[Array[Char]],
    nodeTargets: Array[Array[Int]],
    rootAscii: Array[Int], // 128 entries, -1 = no transition
    fail: Array[Int],
    // per node: ids of patterns ending here (via output links already merged)
    out: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  @inline private def lookup(s: Int, c: Char): Int = {
    if (s == 0 && c < 128) return rootAscii(c)
    val chars = nodeChars(s)
    var lo = 0
    var hi = chars.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = chars(mid)
      if (mc == c) return nodeTargets(s)(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val nxt = lookup(s, c)
      if (nxt >= 0) return nxt
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  @inline private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** Allocation-free scan: invokes `f(start, endExclusive, patternId)` per match. */
  def findAllInto(text: String, f: (Int, Int, Int) => Unit): Unit = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      val o = out(state)
      if (o.length > 0) {
        var j = 0
        while (j < o.length) {
          val pid = o(j)
          val plen = patterns(pid).length
          val start = i + 1 - plen
          val boundaryLeft = start == 0 || !isWordChar(text.charAt(start - 1))
          val boundaryRight = i + 1 == n || !isWordChar(text.charAt(i + 1))
          if (boundaryLeft && boundaryRight) f(start, i + 1, pid)
          j += 1
        }
      }
      i += 1
    }
  }

  /** Find all word-boundary matches. Returns (start, end-exclusive, patternId). */
  def findAll(text: String): IndexedSeq[(Int, Int, Int)] = {
    val res = new mutable.ArrayBuffer[(Int, Int, Int)]
    findAllInto(text, (s, e, p) => res += ((s, e, p)))
    res.toIndexedSeq
  }

  /** Longest pattern, in chars (bounds the left-boundary look-back). */
  val maxPatternLen: Int = if (patterns.isEmpty) 1 else patterns.map(_.length).max

  /** Ring-buffer size for [[scanUtf8Into]] scratch (power of two > maxPatternLen+1). */
  val scanRingSize: Int = Integer.highestOneBit(math.max(maxPatternLen + 2, 8)) * 2

  /**
   * Per-task fused normalize+scan kernel over raw UTF-8 bytes — semantically
   * identical to `findAllInto(AhoCorasick.normalize(text), f)` (match
   * coordinates are in normalized space) but with ZERO per-turn allocation:
   * no java.lang.String, no StringBuilder, no normalized copy. This is the
   * 10^12-turn hot loop — at 32 threads the per-turn char[] churn of the
   * materializing path is an allocation/GC wall (BASELINE.md round 2).
   *
   * The byte stream is decoded to UTF-16 units incrementally (property-tested
   * equivalent to String.charAt order, incl. surrogate pairs), each unit runs
   * through the same per-unit casefold/separator-fold as [[normalize]], and a
   * one-unit lookahead resolves the right word boundary while a small ring
   * buffer resolves the left one. A class with fields (not a nested def) so
   * the state lives unboxed — scalac would box captured vars into IntRefs.
   *
   * NOT thread-safe: allocate one per task (e.g. per mapPartitions iterator).
   */
  final class Scanner {
    private val ring = new Array[Char](scanRingSize)
    private val mask = ring.length - 1
    private var s: org.apache.spark.unsafe.types.UTF8String = _
    private var nBytes = 0
    private var j = 0            // byte cursor
    private var pend1 = -1       // pending units (deferred space / surrogate low)
    private var pend2 = -1
    private var pendingSpace = false
    private var produced = false

    // next normalized UTF-16 unit, or -1 at end — streaming equivalent of
    // normalize(): per-unit lowercase, [-_\s]+ runs fold to one ' ', leading
    // and trailing runs dropped (the deferred-space trick).
    private def nextNorm(): Int = {
      if (pend1 >= 0) { val r = pend1; pend1 = pend2; pend2 = -1; return r }
      while (j < nBytes) {
        val b0 = s.getByte(j) & 0xFF
        var u = 0      // decoded UTF-16 unit
        var low = -1   // low surrogate for supplementary code points
        if (b0 < 0x80) { u = b0; j += 1 }
        else if (b0 < 0xE0) { // 2-byte sequence
          u = ((b0 & 0x1F) << 6) | (s.getByte(j + 1) & 0x3F); j += 2
        } else if (b0 < 0xF0) { // 3-byte sequence
          u = ((b0 & 0x0F) << 12) | ((s.getByte(j + 1) & 0x3F) << 6) |
            (s.getByte(j + 2) & 0x3F); j += 3
        } else { // 4-byte sequence → surrogate pair
          val cp = ((b0 & 0x07) << 18) | ((s.getByte(j + 1) & 0x3F) << 12) |
            ((s.getByte(j + 2) & 0x3F) << 6) | (s.getByte(j + 3) & 0x3F)
          j += 4
          u = 0xD800 + ((cp - 0x10000) >> 10)
          low = 0xDC00 + ((cp - 0x10000) & 0x3FF)
        }
        val c = u.toChar
        if (Character.isWhitespace(c) || c == '-' || c == '_') {
          pendingSpace = true // (separators are BMP; low is always -1 here)
        } else {
          val lc = Character.toLowerCase(c)
          if (pendingSpace && produced) {
            pendingSpace = false
            pend1 = lc; pend2 = low
            return ' '
          }
          pendingSpace = false; produced = true
          if (low >= 0) pend1 = low
          return lc
        }
      }
      -1
    }

    /** f(start, endExclusive, patternId), coordinates in normalized space. */
    def scan(text: org.apache.spark.unsafe.types.UTF8String, f: (Int, Int, Int) => Unit): Unit = {
      s = text; nBytes = text.numBytes; j = 0
      pend1 = -1; pend2 = -1; pendingSpace = false; produced = false
      var state = 0
      var i = 0 // normalized-space index of `cur`
      var cur = nextNorm()
      while (cur >= 0) {
        val la = nextNorm() // lookahead resolves the right boundary at emission
        val c = cur.toChar
        ring(i & mask) = c
        state = step(state, c)
        val o = out(state)
        if (o.length > 0 && (la < 0 || !isWordChar(la.toChar))) {
          var k = 0
          while (k < o.length) {
            val pid = o(k)
            val start = i + 1 - patterns(pid).length
            if (start == 0 || !isWordChar(ring((start - 1) & mask))) f(start, i + 1, pid)
            k += 1
          }
        }
        i += 1
        cur = la
      }
      s = null
    }
  }

  def newScanner(): Scanner = new Scanner
}

object AhoCorasick {

  /** Casefold + collapse whitespace/dash runs to single spaces (F5 normalization). */
  def normalize(s: String): String = {
    if (s == null) return ""
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastSpace = true // also trims leading separators
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '-' || c == '_') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else {
        sb.append(Character.toLowerCase(c)); lastSpace = false
      }
      i += 1
    }
    // trim trailing space
    val len = sb.length()
    if (len > 0 && sb.charAt(len - 1) == ' ') sb.setLength(len - 1)
    sb.toString
  }

  def build(rawPatterns: Seq[String]): AhoCorasick = {
    val patterns = rawPatterns.toArray
    val gotoMaps = mutable.ArrayBuffer[java.util.HashMap[Character, Integer]](new java.util.HashMap)
    val outSets = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]](new mutable.ArrayBuffer)

    // trie insert
    var pid = 0
    while (pid < patterns.length) {
      val p = patterns(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val nxt: Integer = gotoMaps(node).get(c)
        if (nxt == null) {
          gotoMaps += new java.util.HashMap
          outSets += new mutable.ArrayBuffer
          gotoMaps(node).put(c, Integer.valueOf(gotoMaps.length - 1))
          node = gotoMaps.length - 1
        } else node = nxt.intValue()
        i += 1
      }
      if (p.nonEmpty) outSets(node) += pid
      pid += 1
    }

    // BFS failure links + output merge
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val queue = new mutable.Queue[Int]
    gotoMaps(0).forEach((_, child) => { fail(child.intValue()) = 0; queue.enqueue(child.intValue()) })
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).forEach { (c: Character, vBoxed: Integer) =>
        val v = vBoxed.intValue()
        // find failure state for v: deepest proper suffix state with a c-edge
        var f = fail(u)
        var resolved = -1
        while (resolved < 0) {
          val nxt: Integer = gotoMaps(f).get(c)
          if (nxt != null && nxt.intValue() != v) resolved = nxt.intValue()
          else if (f == 0) resolved = 0
          else f = fail(f)
        }
        fail(v) = resolved
        outSets(v) ++= outSets(resolved)
        queue.enqueue(v)
      }
    }

    // compile the HashMap trie (build-friendly) into flat sorted arrays
    // (scan-friendly): boxing-free binary-search transitions + a direct
    // root table. Build keeps Character/Integer deliberately —
    // java.util.Map[Char, Int] in Scala silently unboxes missing-key null
    // to 0, which corrupts the trie.
    val nNodes = gotoMaps.length
    val nodeChars = new Array[Array[Char]](nNodes)
    val nodeTargets = new Array[Array[Int]](nNodes)
    var s = 0
    while (s < nNodes) {
      val entries = new mutable.ArrayBuffer[(Char, Int)](gotoMaps(s).size)
      gotoMaps(s).forEach((c: Character, t: Integer) => entries += ((c.charValue(), t.intValue())))
      val sorted = entries.sortBy(_._1)
      nodeChars(s) = sorted.map(_._1).toArray
      nodeTargets(s) = sorted.map(_._2).toArray
      s += 1
    }
    val rootAscii = Array.fill(128)(-1)
    var i = 0
    while (i < nodeChars(0).length) {
      val c = nodeChars(0)(i)
      if (c < 128) rootAscii(c) = nodeTargets(0)(i)
      i += 1
    }

    new AhoCorasick(nodeChars, nodeTargets, rootAscii, fail,
      outSets.map(_.toArray).toArray, patterns)
  }
}

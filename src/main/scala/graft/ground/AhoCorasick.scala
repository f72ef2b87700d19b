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
 * #matches). The compiled automaton is CSR-FLAT: one chars array + one
 * targets array indexed by per-node offsets (`base`), outputs likewise —
 * zero per-node objects. A Bioregistry-scale automaton (10^5-10^6 patterns)
 * compacts to tens of MB, so at 32 scan threads the hot states live in the
 * shared LLC instead of a million pointer-chased heap arrays in DRAM — this
 * is what the 10^12-turn scan is bound by (BASELINE.md). Immutable after
 * `build` and Serializable (primitive arrays only) so broadcasting is cheap.
 */
final class AhoCorasick private (
    base: Array[Int],          // node → offset into transChars/transTargets (len nNodes+1)
    transChars: Array[Char],   // per node: SORTED transition chars
    transTargets: Array[Int],  // parallel targets
    rootAscii: Array[Int],     // direct table for the root's ASCII transitions (-1 = none)
    fail: Array[Int],
    outOff: Array[Int],        // node → offset into outPids (len nNodes+1)
    outPids: Array[Int],       // pattern ids ending at the node (output links merged)
    patLen: Array[Int],        // pattern lengths (avoids String deref in the hot loop)
    val patterns: Array[String]) extends Serializable {

  @inline private def lookup(s: Int, c: Char): Int = {
    if (s == 0 && c < 128) return rootAscii(c)
    var lo = base(s)
    var hi = base(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = transChars(mid)
      if (mc == c) return transTargets(mid)
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
      var j = outOff(state)
      val jEnd = outOff(state + 1)
      if (j < jEnd) {
        val boundaryRight = i + 1 == n || !isWordChar(text.charAt(i + 1))
        if (boundaryRight) {
          while (j < jEnd) {
            val pid = outPids(j)
            val start = i + 1 - patLen(pid)
            if (start == 0 || !isWordChar(text.charAt(start - 1))) f(start, i + 1, pid)
            j += 1
          }
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

  /** Ring-buffer size for [[Scanner]] scratch (power of two > maxPatternLen+1). */
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
        // a multi-byte sequence truncated at the buffer end degrades to
        // U+FFFD (like java.lang.String's decoder) instead of reading past
        // numBytes into adjacent row memory — Spark-written data is always
        // valid UTF-8, but the kernel must never depend on that
        if (b0 < 0x80) { u = b0; j += 1 }
        else if (b0 < 0xE0) { // 2-byte sequence
          if (j + 1 < nBytes) { u = ((b0 & 0x1F) << 6) | (s.getByte(j + 1) & 0x3F); j += 2 }
          else { u = 0xFFFD; j = nBytes }
        } else if (b0 < 0xF0) { // 3-byte sequence
          if (j + 2 < nBytes) {
            u = ((b0 & 0x0F) << 12) | ((s.getByte(j + 1) & 0x3F) << 6) |
              (s.getByte(j + 2) & 0x3F); j += 3
          } else { u = 0xFFFD; j = nBytes }
        } else { // 4-byte sequence → surrogate pair
          if (j + 3 < nBytes) {
            val cp = ((b0 & 0x07) << 18) | ((s.getByte(j + 1) & 0x3F) << 12) |
              ((s.getByte(j + 2) & 0x3F) << 6) | (s.getByte(j + 3) & 0x3F)
            j += 4
            u = 0xD800 + ((cp - 0x10000) >> 10)
            low = 0xDC00 + ((cp - 0x10000) & 0x3FF)
          } else { u = 0xFFFD; j = nBytes }
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
        var k = outOff(state)
        val kEnd = outOff(state + 1)
        if (k < kEnd && (la < 0 || !isWordChar(la.toChar))) {
          while (k < kEnd) {
            val pid = outPids(k)
            val start = i + 1 - patLen(pid)
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

    // compile the HashMap trie (build-friendly) into CSR-FLAT arrays
    // (scan-friendly): one chars array + one targets array with per-node
    // offsets — zero per-node objects, boxing-free binary-search transitions,
    // plus a direct root table. Build keeps Character/Integer deliberately —
    // java.util.Map[Char, Int] in Scala silently unboxes missing-key null
    // to 0, which corrupts the trie.
    val nNodes = gotoMaps.length
    val base = new Array[Int](nNodes + 1)
    var s = 0
    while (s < nNodes) { base(s + 1) = base(s) + gotoMaps(s).size; s += 1 }
    val transChars = new Array[Char](base(nNodes))
    val transTargets = new Array[Int](base(nNodes))
    s = 0
    while (s < nNodes) {
      val entries = new mutable.ArrayBuffer[(Char, Int)](gotoMaps(s).size)
      gotoMaps(s).forEach((c: Character, t: Integer) => entries += ((c.charValue(), t.intValue())))
      val sorted = entries.sortBy(_._1)
      var k = 0
      while (k < sorted.length) {
        transChars(base(s) + k) = sorted(k)._1
        transTargets(base(s) + k) = sorted(k)._2
        k += 1
      }
      s += 1
    }
    val rootAscii = Array.fill(128)(-1)
    var i = base(0)
    while (i < base(1)) {
      val c = transChars(i)
      if (c < 128) rootAscii(c) = transTargets(i)
      i += 1
    }
    val outOff = new Array[Int](nNodes + 1)
    s = 0
    while (s < nNodes) { outOff(s + 1) = outOff(s) + outSets(s).length; s += 1 }
    val outPids = new Array[Int](outOff(nNodes))
    s = 0
    while (s < nNodes) {
      var k = 0
      val set = outSets(s)
      while (k < set.length) { outPids(outOff(s) + k) = set(k); k += 1 }
      s += 1
    }
    val patLen = patterns.map(_.length)

    new AhoCorasick(base, transChars, transTargets, rootAscii, fail,
      outOff, outPids, patLen, patterns)
  }
}

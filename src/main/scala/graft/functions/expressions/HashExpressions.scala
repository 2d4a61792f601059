package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Generator, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations behind the native expressions. Called from
  * both interpreted eval and generated Java (via the object's static
  * forwarders), so interpreted and codegen paths share one body.
  *
  * ALGORITHM CONTRACT: these must stay bit-identical to the SQL
  * higher-order-function formulations in [[graft.functions.XFormulas]] —
  * the DuckDB oracle runs those. Poly hash folds over CODE POINTS
  * (= `ascii()` / `ord()` semantics; equal to bytes on the ASCII corpus),
  * MinHash/SimHash use the same (a_i, b_i, P) family, cosine folds
  * element products left-to-right in doubles.
  */
object HashImpl {
  final val P = 1000000007L

  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    var ascii = true
    while (i < bytes.length && ascii) {
      if (bytes(i) < 0) ascii = false
      else { acc = (acc * 31 + bytes(i)) % P; i += 1 }
    }
    if (ascii) acc
    else { // non-ASCII fallback: code-point fold, matching ascii()/ord()
      acc = 0L
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      acc
    }
  }

  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var w = 0
    while (w < n) {
      val h = polyHash(arr.getUTF8String(w))
      var i = 0
      while (i < k) {
        val a = (1103515245L * i + 12345L) % P
        val b = (1299709L * i + 7919L) % P
        val v = (a * h + b) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L) // empty doc: degenerate sig
    new GenericArrayData(mins)
  }

  /** Distinct word n-gram shingles of a raw text: lowercase, split on
    * runs of spaces, drop empties, join each n consecutive tokens with a
    * single space, dedupe keeping first occurrence. Identical element SET
    * and order to the XFormulas HOF chain
    * `array_distinct(sparkShingles(sparkTokens(text), n))` (split on
    * ' +' keeps no empty tokens; array_distinct keeps first occurrence). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        toks.add(s.substring(start, i))
      }
    }
    val out = new java.util.LinkedHashSet[String]()
    val m = toks.size - n + 1
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder(toks.get(j))
      var o = 1
      while (o < n) { sb.append(' ').append(toks.get(j + o)); o += 1 }
      out.add(sb.toString)
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** POSITIONAL shingle hashes: the polyHash of every word n-gram of
    * the text, in position order, duplicates KEPT — the stream
    * position-sensitive operators (winnowing, contamination spans)
    * consume; [[shingles]] dedupes and is wrong for them. Element i
    * (0-based) is exactly
    * `polyHash(concat_ws(' ', toks[i..i+n-1]))` — bit-identical to the
    * XFormulas HOF chain `transform(sparkShingles(sparkTokens(t), n),
    * sg -> sparkStrHash(sg))` and to duckShingles + duckStrHash. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        toks.add(s.substring(start, i))
      }
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      sb.append(toks.get(j))
      var o = 1
      while (o < n) { sb.append(' ').append(toks.get(j + o)); o += 1 }
      out(j) = polyHash(UTF8String.fromString(sb.toString))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over PRECOMPUTED long hashes (the
    * [[charShingleHashes]] stream, or any graft hash column): the same
    * k-permutation fold as [[minhash]] minus the string re-hash.
    * Empty-array convention matches: all-zeros signature. */
  def minhashLongs(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var w = 0
    while (w < n) {
      val h = arr.getLong(w)
      var i = 0
      while (i < k) {
        val a = (1103515245L * i + 12345L) % P
        val b = (1299709L * i + 7919L) % P
        val v = (a * h + b) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L)
    new GenericArrayData(mins)
  }

  /** CHARACTER n-gram hashes: the polyHash of every n-char window of the
    * lowercased text, in position order, duplicates kept — the shingle
    * stream for scripts WITHOUT whitespace (CJK, Thai), where the word
    * tokenizer collapses a document to one giant token and word-level
    * MinHash goes blind. Element i (0-based) is exactly
    * `polyHash(substr(lower(text), i+1, n))` over CHARACTERS, matching
    * DuckDB's character-indexed `substr` + the ord() string-hash fold
    * for ASCII and BMP text alike (supplementary-plane text would split
    * surrogate pairs differently than codepoint-indexed substr — same
    * documented caveat as the rest of the hash family). */
  def charShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = s.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * 31 + s.charAt(i + j)) % P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowed anchors behind [[WinnowedAnchorRows]]: XXH64 each
    * L-codepoint gram's UTF-8 bytes (seed 42, Spark's own hasher), then
    * an O(n) monotonic-deque pass selects each complete w-window's
    * minimal hash (rightmost on ties: the deque pops `>=` tails, so
    * among equals the newest survives). Selected positions are
    * non-decreasing as the window slides, so de-dup is one last-emitted
    * check. Returns (1-based codepoint pos, hash) rows; a doc with
    * fewer than L + w - 1 codepoints has no complete window and yields
    * nothing (it cannot contain a span at the reporting bound). */
  def winnowedAnchorRows(text: UTF8String, minLen: Int,
      w: Int): Array[InternalRow] = {
    val bytes = text.getBytes
    val nChars = text.numChars()
    if (nChars < minLen + w - 1) return Array.empty
    // byte offset of each codepoint (UTF-8 lead byte dispatch)
    val offs = new Array[Int](nChars + 1)
    var b = 0; var c = 0
    while (b < bytes.length) {
      offs(c) = b
      val lead = bytes(b) & 0xff
      b += (if (lead < 0x80) 1 else if (lead < 0xe0) 2
            else if (lead < 0xf0) 3 else 4)
      c += 1
    }
    offs(nChars) = bytes.length
    val m = nChars - minLen + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(i),
          offs(i + minLen) - offs(i), 42L)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
      2 * m / (w + 1) + 1)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    var last = -1
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val ws = i - w + 1 // window [ws, i]
      if (ws >= 0) {
        while (deque(head) < ws) head += 1
        val sel = deque(head)
        if (sel != last) {
          out += InternalRow((sel + 1).toLong, hs(sel))
          last = sel
        }
      }
      i += 1
    }
    out.toArray
  }

  /** LSH band-bucket hash: fold (acc*31 + x) % P over signature entries
    * [band*r, band*r + r); same fold as XFormulas.sparkBandBucket /
    * duckBandBucket (1-indexed slice there, 0-indexed here). */
  def bandBucket(sig: ArrayData, band: Long, r: Int): Long = {
    var acc = 0L
    val start = band.toInt * r
    var i = 0
    while (i < r) {
      acc = (acc * 31 + sig.getLong(start + i)) % P
      i += 1
    }
    acc
  }

  def simhash32(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var w = 0
    while (w < n) {
      val h = polyHash(arr.getUTF8String(w))
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      w += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Random-hyperplane LSH signature; weight formula and per-plane
    * left-to-right double fold match XFormulas.sparkSimSig exactly. */
  def simSig(vec: ArrayData, nbits: Int): Long = {
    var out = 0L
    val n = vec.numElements()
    var p = 0
    while (p < nbits) {
      var s = 0d
      var j = 0
      while (j < n) {
        val w = ((p.toLong * 73856093L + j.toLong * 19349663L + 83492791L) % 97L) - 48L
        s += vec.getFloat(j).toDouble * w
        j += 1
      }
      if (s > 0d) out |= (1L << p)
      p += 1
    }
    out
  }

  /** IVF coarse-quantizer cell: 1-based index of the max-dot centroid
    * (first occurrence on ties), centroid weights from the same
    * deterministic family as simSig with a +37 plane offset — matches
    * XFormulas.sparkIvfCell(sparkIvfScores(…)) bit-for-bit (identical
    * left-to-right double folds). */
  def ivfCell(vec: ArrayData, nc: Int): Long = {
    val n = vec.numElements()
    var best = Double.NegativeInfinity
    var bestP = 0
    var p = 0
    while (p < nc) {
      var s = 0d
      var j = 0
      while (j < n) {
        val w = (((p.toLong + 37L) * 73856093L + j.toLong * 19349663L +
          83492791L) % 97L) - 48L
        s += vec.getFloat(j).toDouble * w
        j += 1
      }
      if (s > best) { best = s; bestP = p }
      p += 1
    }
    bestP + 1L
  }

  /** Lowercased space-run tokens; see [[Tokens]] for the contract. */
  def tokens(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        out.add(UTF8String.fromString(s.substring(start, i)))
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Max single-element occurrence count in a string array (0 if empty).
    * Null elements are ignored — both functions are on the public
    * `graft_*` SQL surface, where a user's array('a', NULL) must not
    * crash the executor. */
  def topTokenCount(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    var best = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val c = counts.merge(s, 1, (x, y) => x + y)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }

  /** LZ78 phrase count over the UTF-8 bytes — the Lempel-Ziv complexity
    * of the text. The parse walks a byte trie (nodes keyed by
    * (parent, byte) in one flat HashMap); every dictionary miss closes a
    * phrase, adds the extended string, and restarts at the root. Pure
    * integer/JVM code — no zlib, so the count is identical on every
    * executor and every platform (a Deflater-based ratio would silently
    * depend on the native zlib version).
    *
    * Why it's a quality signal: random text yields ~n/log(n) phrases,
    * heavily repeated boilerplate collapses to far fewer — the
    * compression-ratio heuristic of Gopher/Dolma-style filters, in
    * deterministic form. Normalize by byte length downstream
    * (`phrases / nullif(len, 0)`); low ratio = repetitive. */
  def lzPhrases(s: UTF8String): Long = {
    val bytes = s.getBytes
    val dict = new java.util.HashMap[java.lang.Long, Integer](
      bytes.length * 2 + 16)
    var phrases = 0L
    var node = 0 // 0 = trie root; children get ids 1..n
    var next = 1
    var i = 0
    while (i < bytes.length) {
      val key = java.lang.Long.valueOf((node.toLong << 8) | (bytes(i) & 0xffL))
      val child = dict.get(key)
      if (child == null) {
        dict.put(key, next); next += 1
        phrases += 1
        node = 0
      } else node = child.intValue()
      i += 1
    }
    // a trailing match that never missed is still an (incomplete) phrase
    if (node != 0) phrases += 1
    phrases
  }

  /** Sorted-merge distinct-intersection count for two string arrays
    * (UTF8String binary order — any total order works for a merge).
    * Null elements are skipped: a null never counts toward the overlap. */
  def setOverlapStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    def nonNull(ad: ArrayData, n0: Int): Array[Object] = {
      val buf = new java.util.ArrayList[Object](n0)
      var i = 0
      while (i < n0) {
        if (!ad.isNullAt(i)) buf.add(ad.getUTF8String(i))
        i += 1
      }
      buf.toArray
    }
    val xs = nonNull(a, na)
    val ys = nonNull(b, nb)
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var j = 0
    var k = 0
    var n = 0L
    var last: UTF8String = null
    while (j < xs.length && k < ys.length) {
      val x = xs(j).asInstanceOf[UTF8String]
      val cmp = x.compareTo(ys(k).asInstanceOf[UTF8String])
      if (cmp < 0) j += 1
      else if (cmp > 0) k += 1
      else {
        if (last == null || !x.equals(last)) { n += 1; last = x }
        j += 1; k += 1
      }
    }
    n
  }

  /** Sorted-merge distinct-intersection count for two long arrays.
    * Null elements are skipped (a null slot would otherwise read as a
    * spurious 0). */
  def setOverlap(a: ArrayData, b: ArrayData): Long = {
    val na0 = a.numElements()
    val nb0 = b.numElements()
    if (na0 == 0 || nb0 == 0) return 0L
    def nonNull(ad: ArrayData, n0: Int): Array[Long] = {
      val buf = new Array[Long](n0)
      var i = 0
      var m = 0
      while (i < n0) {
        if (!ad.isNullAt(i)) { buf(m) = ad.getLong(i); m += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(buf, m)
    }
    val xs = nonNull(a, na0)
    val ys = nonNull(b, nb0)
    val na = xs.length
    val nb = ys.length
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var j = 0
    var k = 0
    var n = 0L
    var last = 0L
    var any = false
    while (j < na && k < nb) {
      val x = xs(j)
      val y = ys(k)
      if (x < y) j += 1
      else if (x > y) k += 1
      else {
        if (!any || x != last) { n += 1; last = x; any = true }
        j += 1; k += 1
      }
    }
    n
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    i = 0
    while (i < a.numElements()) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dense mat-vec: y_j = sum_i mat[j*d + i] * v_i for j < k, over a
    * float-vector column and a driver-computed row-major k×d double
    * matrix (PCA basis, random-projection matrix, …). Accumulation is
    * a fixed left-to-right loop, so results are deterministic across
    * partitionings. */
  def matVec(v: ArrayData, mat: Array[Double], k: Int, d: Int): ArrayData = {
    val n = math.min(d, v.numElements())
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0d
      val off = j * d
      var i = 0
      while (i < n) { acc += mat(off + i) * v.getFloat(i).toDouble; i += 1 }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Bloom membership: all k double-hashed positions of `key` set in the
    * m-bit mask. Same position family as `Bloom.positionsSql` — keys must
    * be non-negative and < 2^63/2654435761 (≈3.5e9) to avoid overflow. */
  def bloomContains(key: Long, mask: Array[Long], m: Int, k: Int): Boolean = {
    val h1 = (key * 2654435761L) % P
    val h2 = ((key * 40503L + 7919L) % P) + 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if ((mask((pos >> 6).toInt) & (1L << (pos & 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** PQ encode: for each of the m subspaces, the 0-based index of the
    * codeword minimizing squared L2 over that subspace's sd dimensions.
    * Bit-identical to `XFormulas.sparkPqCodes` (the HOF/DuckDB form):
    * per-dimension `(px - py) * (px - py)` accumulated left-to-right in
    * doubles, first-minimum tie-break (strict `<` keeps the earlier
    * codeword, matching `array_position(sc, array_min(sc))`). */
  def pqCodes(vec: ArrayData, vecFloat: Boolean, cb: ArrayData,
      cbFloat: Boolean, m: Int, ks: Int, sd: Int): ArrayData = {
    def at(a: ArrayData, f: Boolean, i: Int): Double =
      if (f) a.getFloat(i).toDouble else a.getDouble(i)
    val codes = new Array[Any](m)
    var sb = 0
    while (sb < m) {
      var best = 0L
      var bestD = Double.PositiveInfinity
      var cd = 0
      while (cd < ks) {
        val cw = cb.getArray(cd)
        var d = 0.0
        var p = 0
        val off = sb * sd
        while (p < sd) {
          val diff = at(vec, vecFloat, off + p) - at(cw, cbFloat, off + p)
          d += diff * diff
          p += 1
        }
        if (d < bestD) { bestD = d; best = cd.toLong }
        cd += 1
      }
      codes(sb) = best
      sb += 1
    }
    new GenericArrayData(codes)
  }

  /** PQ asymmetric distance: sum over subspaces of squared L2 between
    * the raw query's subvector and the codeword selected by `codes`.
    * Bit-identical to `XFormulas.sparkPqAdc` (subspaces ascending, then
    * dimensions ascending, double accumulation — same fold order). */
  def pqAdc(q: ArrayData, qFloat: Boolean, codes: ArrayData, cb: ArrayData,
      cbFloat: Boolean, m: Int, sd: Int): Double = {
    def at(a: ArrayData, f: Boolean, i: Int): Double =
      if (f) a.getFloat(i).toDouble else a.getDouble(i)
    var acc = 0.0
    var sb = 0
    while (sb < m) {
      val cw = cb.getArray(codes.getLong(sb).toInt)
      var d = 0.0
      var p = 0
      val off = sb * sd
      while (p < sd) {
        val diff = at(q, qFloat, off + p) - at(cw, cbFloat, off + p)
        d += diff * diff
        p += 1
      }
      acc += d
      sb += 1
    }
    acc
  }

  /** Set `key`'s k Bloom positions in `mask` in place (same position
    * family as [[bloomContains]]). */
  def bloomSet(key: Long, mask: Array[Long], m: Int, k: Int): Unit = {
    val h1 = (key * 2654435761L) % P
    val h2 = ((key * 40503L + 7919L) % P) + 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      mask((pos >> 6).toInt) |= 1L << (pos & 63).toInt
      i += 1
    }
  }
}

/** Polynomial rolling hash of a string, mod 1e9+7 (document
  * fingerprint). Whole-stage-codegen'd; ~30x the interpreted HOF chain
  * `aggregate(split(s, ''), …)` it replaces. */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a raw text column (codegen'd; folds
  * the whole tokenize → shingle → dedupe HOF chain into one call). */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** POSITIONAL shingle-hash array of a raw text column (codegen'd): the
  * polyHash of every word n-gram in position order, duplicates kept —
  * for position-sensitive consumers (winnowing, contamination spans)
  * that `posexplode` it. [[Shingles]] dedupes by design and must not
  * feed them. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** MinHash signature over an array<bigint> of precomputed hashes — the
  * [[MinHashSig]] twin for hash streams that skip string shingles
  * entirely (char n-grams, stored fingerprints). */
case class MinHashLongs(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_longs"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.minhashLongs(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.minhashLongs($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashLongs =
    copy(child = newChild)
}

/** Positional CHARACTER n-gram hashes of a string (see
  * [[HashImpl.charShingleHashes]]) — the whitespace-free-script twin of
  * [[ShingleHashes]]. */
case class CharShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.charShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.charShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

/** Winnowed L-gram anchor rows — the MOSS selection as ONE native
  * generator: per document, hash every L-codepoint window (XXH64 over
  * the gram's UTF-8 bytes, 64-bit — a ~2^30 poly hash would saturate at
  * corpus-scale anchor joins), then each complete w-window of the hash
  * stream selects its minimum (RIGHTMOST position on ties — content-
  * local, so two docs sharing the window's grams select the same
  * relative offset) via an O(n) monotonic deque, emitting the distinct
  * selected (pos, h) pairs. Positions are 1-based CODEPOINTS, aligned
  * with SQL `substring` so the exact-residual verify downstream slices
  * the same characters. Replaces a per-window aggregate-HOF fold whose
  * interpreted per-element struct allocation dominated the sampled
  * substring operator's wall (measured ~10 s warm at sf0.1 for the HOF
  * vs the hash pass itself being sub-second). Runs in GenerateExec like
  * explode — generators are not whole-stage-codegen'd; the win is the
  * native loop. */
case class WinnowedAnchorRows(child: Expression, minLen: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def elementSchema: StructType =
    StructType(StructField("pos", LongType, nullable = false) ::
      StructField("h", LongType, nullable = false) :: Nil)
  override def prettyName: String = "graft_winnowed_anchor_rows"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else HashImpl.winnowedAnchorRows(t.asInstanceOf[UTF8String], minLen, w)
  }
  override protected def withNewChildInternal(newChild: Expression)
      : WinnowedAnchorRows = copy(child = newChild)
}

/** Table-generating (UDTF-shaped) variant of [[Shingles]]: one output ROW
  * per distinct shingle, for consumers that explode anyway (word/shingle
  * frequency, inverted indexes) — skips materializing the intermediate
  * array per document. Runs in GenerateExec like the built-in explode
  * (generators are not whole-stage-codegen'd; the per-shingle work is
  * the same native loop). */
case class ShingleRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)
  override def prettyName: String = "graft_shingle_rows"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = HashImpl.shingles(t.asInstanceOf[UTF8String], n)
      val out = new Array[InternalRow](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = InternalRow(arr.getUTF8String(i))
        i += 1
      }
      out
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleRows =
    copy(child = newChild)
}

/** MinHash signature (k permutations) over an array<string> of shingles. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.minhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band-bucket hash over a MinHash signature: polynomial fold of the
  * `r` signature entries of band `band` (0-based). Codegen'd; replaces
  * the interpreted `aggregate(slice(…))` HOF chain in the banding
  * self-join's hot path. */
case class BandBucket(left: Expression, right: Expression, r: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got $l and $rt")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bandbucket"
  protected override def nullSafeEval(sig: Any, band: Any): Any =
    HashImpl.bandBucket(sig.asInstanceOf[ArrayData], band.asInstanceOf[Long], r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sig, band) =>
      s"graft.functions.expressions.HashImpl.bandBucket($sig, $band, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandBucket =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash over an array<string> of shingles. */
case class SimHash32(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature (nbits) of a float vector. */
case class SimSig(child: Expression, nbits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simsig"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.simSig(input.asInstanceOf[ArrayData], nbits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.simSig($c, $nbits)")
  override protected def withNewChildInternal(newChild: Expression): SimSig =
    copy(child = newChild)
}

/** IVF coarse-quantizer cell id (1-based argmax-dot centroid) of a float
  * vector. */
case class IvfCell(child: Expression, nc: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ivfcell"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.ivfCell(input.asInstanceOf[ArrayData], nc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.ivfCell($c, $nc)")
  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

/** Cosine similarity of two float vectors, accumulated in doubles
  * left-to-right (same fold order as the HOF/oracle formulation). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.HashImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** |a ∩ b| over two long-array columns, counting DISTINCT common values
  * (inputs from `array_distinct`/`Shingles` are already distinct; the
  * dedup skip makes the count correct even if not). Sorted-merge — no
  * per-row hash-map allocation churn. The shared impl lives on
  * [[HashImpl]] so interpreted eval and generated Java agree.
  *
  * This replaces `size(array_intersect(a, b))` in the dedup verify
  * stages: the counts are exact integers either way (so oracle doubles
  * derived from them are bit-identical), but the native form avoids the
  * HOF's catalyst-array materialization and, more importantly at bench
  * time, the very large generated-code body the array_intersect/union
  * pair JITs per query (measured multi-second cold-start cuts on the
  * prefix-join family). */
case class SetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isStr = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> or two array<string> " +
          s"arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_set_overlap"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isStr)
      HashImpl.setOverlapStr(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      HashImpl.setOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isStr) "setOverlapStr" else "setOverlap"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.HashImpl.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}

/** Highest single-token occurrence count in a token array — the
  * numerator of the repetition gates' `top_share`. One O(n) hash-count
  * pass; the HOF equivalent `array_max(transform(array_distinct(toks),
  * w -> size(filter(toks, x -> x = w))))` is O(distinct × n) per
  * document and JITs a large generated body. Counts are exact integers
  * on both paths, so `top_share` doubles are bit-identical; for the
  * empty array both forms end NULL after the `/ nullif(size, 0)`
  * division (this returns 0 there, the HOF returns NULL — the
  * numerator is irrelevant once the denominator is NULL). */
case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_count"
  protected override def nullSafeEval(a: Any): Any =
    HashImpl.topTokenCount(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.HashImpl.topTokenCount($a)")
  override protected def withNewChildInternal(c: Expression): TopTokenCount =
    copy(child = c)
}

/** LZ78 phrase count of a string — deterministic Lempel-Ziv text
  * complexity (see [[HashImpl.lzPhrases]]). Low normalized counts mark
  * machine-repeated/boilerplate text; the codegen'd scalar keeps the
  * gate inside whole-stage codegen like the other quality signals. */
case class LzPhrases(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lz_phrases"
  protected override def nullSafeEval(a: Any): Any =
    HashImpl.lzPhrases(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.HashImpl.lzPhrases($a)")
  override protected def withNewChildInternal(c: Expression): LzPhrases =
    copy(child = c)
}

/** Lowercased whitespace tokens of a raw text column — the exact
  * element set and order of the HOF form
  * `filter(split(lower(text), ' +'), w -> w <> '')` (split on runs of
  * spaces, no empties; only ' ' is a separator, matching the oracle's
  * string_split). This is the entry expression of every text query, so
  * the smaller generated body pays off across the whole suite's cold
  * pass; the loop is shared with [[HashImpl.shingles]]. */
case class Tokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  protected override def nullSafeEval(a: Any): Any =
    HashImpl.tokens(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.HashImpl.tokens($a)")
  override protected def withNewChildInternal(c: Expression): Tokens =
    copy(child = c)
}

/** Codegen'd PQ encode of a vector against a (ks × dim) codebook column:
  * per subspace, the first-minimum squared-L2 codeword index — the hot
  * inner loop of PQ training (every Lloyd iteration encodes the corpus)
  * and of the encode pass, folded from ~m·ks·sd interpreted HOF lambda
  * calls per row into one flat JVM loop. Bit-identical to the
  * `XFormulas.sparkPqCodes` HOF form (same fold order and tie-break), so
  * the DuckDB oracle is unchanged. */
case class PqCodes(left: Expression, right: Expression,
    m: Int, ks: Int, sd: Int) extends BinaryExpression {
  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(e, _) => Some(e)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = elemOf(left.dataType)
      .exists(e => e == FloatType || e == DoubleType)
    val cbOk = elemOf(right.dataType).flatMap(elemOf)
      .exists(e => e == FloatType || e == DoubleType)
    if (vecOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<float|double>>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }
  private def vecFloat: Boolean = elemOf(left.dataType).contains(FloatType)
  private def cbFloat: Boolean =
    elemOf(right.dataType).flatMap(elemOf).contains(FloatType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  protected override def nullSafeEval(vec: Any, cb: Any): Any =
    HashImpl.pqCodes(vec.asInstanceOf[ArrayData], vecFloat,
      cb.asInstanceOf[ArrayData], cbFloat, m, ks, sd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.HashImpl.pqCodes($v, $vecFloat, $c, $cbFloat, $m, $ks, $sd)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PqCodes = copy(left = l, right = r)
}

/** Codegen'd PQ asymmetric distance (ADC): the raw query vector scored
  * against a candidate's compact codes via the shared codebook — the hot
  * scoring loop of PQ search (runs once per (query, candidate) pair).
  * Replaces a HOF chain whose per-pair cost was ~2·m array `slice`
  * allocations plus m·sd lambda calls. Bit-identical to
  * `XFormulas.sparkPqAdc`, so the DuckDB oracle is unchanged. */
case class PqAdc(first: Expression, second: Expression, third: Expression,
    m: Int, sd: Int) extends TernaryExpression {
  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(e, _) => Some(e)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = elemOf(first.dataType)
      .exists(e => e == FloatType || e == DoubleType)
    val codesOk = elemOf(second.dataType).contains(LongType)
    val cbOk = elemOf(third.dataType).flatMap(elemOf)
      .exists(e => e == FloatType || e == DoubleType)
    if (qOk && codesOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<bigint>, " +
        s"array<array<float|double>>), got (${first.dataType}, " +
        s"${second.dataType}, ${third.dataType})")
  }
  private def qFloat: Boolean = elemOf(first.dataType).contains(FloatType)
  private def cbFloat: Boolean =
    elemOf(third.dataType).flatMap(elemOf).contains(FloatType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  protected override def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    HashImpl.pqAdc(q.asInstanceOf[ArrayData], qFloat,
      codes.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      cbFloat, m, sd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, codes, cb) =>
      s"graft.functions.expressions.HashImpl.pqAdc($q, $qFloat, $codes, $cb, $cbFloat, $m, $sd)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PqAdc =
    copy(first = f, second = s, third = t)
}

/** Codegen'd Bloom-filter membership test of a non-negative BIGINT key
  * against a fixed m-bit mask (built driver-side from the dim side's
  * keys — bounded by the filter size, not the dim cardinality). The mask
  * rides into generated code as one referenced `long[]`: per row the
  * test is k multiply/mod/shift/AND steps with early exit — no lambda
  * machinery and no per-batch re-materialization of the `array(...)`
  * literal that the equivalent `forall(transform(sequence(...)))` HOF
  * chain pays for.
  *
  * Positions are Kirsch–Mitzenmacher double hashing in mod-P integer
  * math, bit-identical to [[graft.operators.Bloom.positionsSql]] and the
  * DuckDB replica, so filter statistics have an exact oracle. */
/** Project a float-vector column through a driver-computed row-major
  * k×d double matrix (the PCA basis / any fixed linear map): one
  * codegen'd call per row, the matrix rides the generated code as ONE
  * referenced double[] (the [[BloomMightContain]] pattern) — never a
  * per-row literal array or a join. */
case class MatVecProject(child: Expression, mat: Array[Double], k: Int, d: Int)
    extends UnaryExpression {
  require(k > 0 && d > 0 && mat.length == k * d,
    s"matrix must be k*d row-major doubles, got ${mat.length} for k=$k d=$d")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> vector, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.matVec(input.asInstanceOf[ArrayData], mat, k, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("projMat", mat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashImpl.matVec($c, $matRef, $k, $d)")
  }
  override protected def withNewChildInternal(c: Expression): MatVecProject =
    copy(child = c)
}

case class BloomMightContain(child: Expression, mask: Array[Long], k: Int)
    extends UnaryExpression {
  require(mask.nonEmpty && (mask.length * 64L) <= Int.MaxValue && k > 0,
    s"bloom mask must be non-empty with m <= 2^31 bits and k > 0")
  private def m: Int = mask.length * 64
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.bloomContains(input.asInstanceOf[Long], mask, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maskRef = ctx.addReferenceObj("bloomMask", mask, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashImpl.bloomContains($c, $maskRef, $m, $k)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

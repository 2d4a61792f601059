package graft.functions

/** Cross-engine formula library: each text/hash primitive is defined ONCE
  * here in both dialects — Spark SQL (higher-order functions, codegen-
  * friendly, no UDFs) and DuckDB SQL (list functions) — so every operator
  * built on them has an exact DuckDB oracle. All hashes are pure integer
  * arithmetic mod P = 1e9+7 with multipliers sized so intermediates stay
  * under 2^63 (Spark `sequence` is forced to BIGINT elements: INT
  * multiplies would silently wrap).
  *
  * Determinism contract: fold order is left-to-right in both engines
  * (Spark `aggregate` = DuckDB `list_reduce`), strings are ASCII
  * (`ascii` = `ord`), and all arithmetic is 64-bit integer — results are
  * bit-identical across engines by construction.
  */
object XFormulas {

  val P = 1000000007L

  // ---- tokenization: lowercase, split on spaces, drop empties ----
  def sparkTokens(c: String): String =
    s"filter(split(lower($c), ' +'), w -> w <> '')"
  def duckTokens(c: String): String =
    s"list_filter(string_split(lower($c), ' '), w -> w <> '')"

  // ---- polynomial rolling hash of a string (document fingerprint) ----
  // h = fold(chars, 0, (acc, ch) -> (acc*31 + code(ch)) % P)
  def sparkStrHash(c: String): String =
    s"aggregate(split($c, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % $P)"
  def duckStrHash(c: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($c, ''), ch -> ord(ch)::BIGINT)), (acc, x) -> (acc * 31 + x) % $P)"

  // ---- per-token hashes of a token array expression ----
  def sparkWordHashes(tokens: String): String =
    s"transform($tokens, w -> ${sparkStrHash("w")})"
  def duckWordHashes(tokens: String): String =
    s"list_transform($tokens, w -> ${duckStrHash("w")})"

  // ---- MinHash signature over a BIGINT hash-array expression ----
  // mh_i = min over h of ((a_i*h + b_i) % P), i in 0..k-1
  // a_i = (1103515245*i + 12345) % P  (≤1e9, so a_i*h ≤ 1e18 < 2^63)
  // b_i = (1299709*i + 7919) % P
  // Empty-doc convention: an empty hash array yields an all-ZEROS
  // signature (array_min/list_min over [] is NULL — coalesce to 0 so the
  // HOF form matches HashImpl.minhash's degenerate-signature contract).
  def sparkMinhash(hashes: String, k: Int): String =
    s"transform(sequence(0L, ${k - 1}L), i -> coalesce(array_min(transform($hashes, " +
      s"h -> (((1103515245 * i + 12345) % $P) * h + ((1299709 * i + 7919) % $P)) % $P)), 0L))"
  def duckMinhash(hashes: String, k: Int): String =
    s"list_transform(range(0, $k), i -> coalesce(list_min(list_transform($hashes, " +
      s"h -> (((1103515245 * i + 12345) % $P) * h + ((1299709 * i + 7919) % $P)) % $P)), 0::BIGINT))"

  // ---- LSH band bucket: hash rows [band*r+1 .. band*r+r] of a signature
  def sparkBandBucket(mh: String, band: String, r: Int): String =
    s"aggregate(slice($mh, cast($band * $r + 1 as int), $r), 0L, (acc, x) -> (acc * 31 + x) % $P)"
  def duckBandBucket(mh: String, band: String, r: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, ($mh)[($band * $r + 1):($band * $r + $r)]), (acc, x) -> (acc * 31 + x) % $P)"

  // ---- 32-bit SimHash over a BIGINT hash-array expression ----
  // bit j set iff sum over hashes of (2*((h>>j)&1) - 1) > 0
  def sparkSimhash(hashes: String): String =
    s"aggregate(sequence(0L, 31L), 0L, (acc, j) -> acc + IF(" +
      s"aggregate($hashes, 0L, (s, h) -> s + IF((shiftright(h, cast(j as int)) & 1) = 1, 1L, -1L)) > 0, " +
      s"shiftleft(1L, cast(j as int)), 0L))"
  def duckSimhash(hashes: String): String =
    s"CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN " +
      s"list_sum(list_transform($hashes, h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 " +
      s"THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"

  // ---- word n-gram shingles of a token-array expression ----
  // Guarded for docs shorter than n tokens: Spark's sequence(1, stop)
  // steps DOWNWARD when stop < 1 (yielding [1, 0, …] and an
  // INVALID_INDEX_OF_ZERO from element_at), while DuckDB's range()
  // yields an empty list — both sides must produce [] for short docs.
  def sparkShingles(tokens: String, n: Int): String = {
    val parts = (0 until n).map(o => s"element_at($tokens, cast(i + $o as int))")
      .mkString(", ")
    s"IF(size($tokens) < $n, array(), " +
      s"transform(sequence(1L, size($tokens) - ${n - 1}L), i -> concat_ws(' ', $parts)))"
  }
  def duckShingles(tokens: String, n: Int): String = {
    val parts = (0 until n).map(o => s"($tokens)[i + $o]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($tokens) - ${n - 2}), i -> $parts)"
  }

  // ---- exact Jaccard between two DISTINCT-element array expressions ----
  // nullif guard: Spark 4 runs ANSI mode, where double/0 is IEEE NaN/Inf
  // while DuckDB yields NULL — nullif makes both sides NULL on empty sets.
  def sparkJaccard(a: String, b: String): String =
    s"CAST(size(array_intersect($a, $b)) AS DOUBLE) / nullif(size(array_union($a, $b)), 0)"
  def duckJaccard(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct(list_concat($a, $b)))"

  // ---- cosine similarity between two float-vector expressions ----
  // Element-wise double products folded left-to-right: bit-identical
  // across engines; DuckDB's list_cosine_similarity is NOT used (it
  // computes in float and drifts).
  def sparkDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (s, v) -> s + v)"
  def sparkCosine(a: String, b: String): String =
    s"${sparkDot(a, b)} / (sqrt(${sparkDot(a, a)}) * sqrt(${sparkDot(b, b)}))"
  def duckCosine(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  // ---- unit-normalized DOUBLE list of a float-vector expression ----
  // The cosine geometry the semantic-dedup index lives in (cos(a,b) =
  // 1 - |â-b̂|²/2, so a cosine threshold is an L2 radius on unit
  // vectors). Norm = the same left-fold dot as sparkDot/duckDot —
  // bit-identical across engines; sqrt and division are IEEE
  // correctly-rounded on both.
  def sparkUnitVec(v: String): String =
    s"transform($v, x -> CAST(x AS DOUBLE) / sqrt(${sparkDot(v, v)}))"
  def duckUnitVec(v: String): String =
    s"list_transform($v, x -> x::DOUBLE / sqrt(${duckDot(v, v)}))"

  // ---- squared L2 distance between two DOUBLE-vector expressions ----
  // Same fold-order contract as sparkDot/duckDot: element-wise squared
  // diffs in index order, left fold — bit-identical across engines.
  // Both inputs must already be DOUBLE lists (widen floats first).
  def sparkSqDist(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (s, v) -> s + v)"
  def duckSqDist(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(1, ${dim + 1}), i -> " +
      s"((($a)[i]) - (($b)[i])) * ((($a)[i]) - (($b)[i])))), (s, v) -> s + v)"

  // ---- random-hyperplane LSH signature (nbits) for a float vector ----
  // plane p, dim j weight = ((p*73856093 + j*19349663 + 83492791) % 97) - 48
  // (deterministic pseudo-random ints in [-48, 48])
  private def planeWeight(p: String, j: String) =
    s"((($p) * 73856093 + ($j) * 19349663 + 83492791) % 97) - 48"
  def sparkSimSig(vec: String, nbits: Int, dim: Int): String =
    s"aggregate(sequence(0L, ${nbits - 1}L), 0L, (acc, p) -> acc + IF(" +
      s"aggregate(zip_with($vec, sequence(0L, ${dim - 1}L), (x, j) -> CAST(x AS DOUBLE) * (${planeWeight("p", "j")})), 0D, (s, v) -> s + v) > 0D, " +
      s"shiftleft(1L, cast(p as int)), 0L))"
  def duckSimSig(vec: String, nbits: Int, dim: Int): String =
    s"CAST(list_sum(list_transform(range(0, $nbits), p -> CASE WHEN " +
      s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(0, $dim), j -> ($vec)[j + 1]::DOUBLE * (${planeWeight("p", "j")}))), (s, v) -> s + v) > 0 " +
      s"THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT)"

  // ---- char trigrams of a string expression (language-ID profiles) ----
  // Same short-input guard as sparkShingles: strings under 3 chars yield
  // an empty list on both sides.
  def sparkCharTrigrams(c: String): String =
    s"IF(length($c) < 3, array(), transform(sequence(1L, length($c) - 2L), " +
      s"i -> substring($c, cast(i AS int), 3)))"
  def duckCharTrigrams(c: String): String =
    s"list_transform(range(1, length($c) - 1), i -> substr($c, CAST(i AS INT), 3))"

  /** High-frequency English char trigrams (from public letter-frequency
    * tables); the per-occurrence hit DENSITY over a document's trigrams is
    * the language score. */
  val enTrigrams: Seq[String] = Seq(
    "the", "he ", " th", "ing", "and", " an", "nd ", "ion", "ent",
    " of", "of ", " to", "to ", "ed ", "er ", " in", "in ")
  def sparkTrigramHits(tris: String): String =
    s"size(filter($tris, t -> array_contains(array(${enTrigrams.map("'" + _ + "'").mkString(",")}), t)))"
  def duckTrigramHits(tris: String): String =
    s"len(list_filter($tris, t -> list_contains([${enTrigrams.map("'" + _ + "'").mkString(",")}], t)))"

  // ---- IVF coarse quantizer: argmax-dot cell over deterministic
  // pseudo-centroids (same weight family as the hyperplanes, offset so
  // the centroid set differs from the SimSig planes) ----
  private def centroidWeight(p: String, j: String) =
    s"(((($p) + 37) * 73856093 + ($j) * 19349663 + 83492791) % 97) - 48"
  def sparkIvfScores(vec: String, nc: Int, dim: Int): String =
    s"transform(sequence(0L, ${nc - 1}L), p -> aggregate(zip_with($vec, " +
      s"sequence(0L, ${dim - 1}L), (x, j) -> CAST(x AS DOUBLE) * " +
      s"(${centroidWeight("p", "j")})), 0D, (s, v) -> s + v))"
  def sparkIvfCell(scores: String): String =
    s"array_position($scores, array_max($scores))"
  def duckIvfScores(vec: String, nc: Int, dim: Int): String =
    s"list_transform(range(0, $nc), p -> list_reduce(list_prepend(0::DOUBLE, " +
      s"list_transform(range(0, $dim), j -> ($vec)[j + 1]::DOUBLE * " +
      s"(${centroidWeight("p", "j")}))), (s, v) -> s + v))"
  def duckIvfCell(scores: String): String =
    s"list_position($scores, list_max($scores))"

  // ---- product quantization (PQ): m subspaces of `sd` dims, ks
  // centroids per subspace taken from a CODEBOOK ARRAY expression
  // (list of ks full vectors — in practice a deterministic data sample,
  // k-means++-style seeding without the iterations; a random synthetic
  // codebook measurably collapses recall to chance). Codes compress a
  // vector to m small ints; ADC (asymmetric distance computation)
  // scores a raw query against codes without decompressing candidates —
  // the memory-bound ANN path (Jegou et al.). All distance math is
  // fixed-fold-order doubles: bit-identical across engines. ----
  def sparkPqSqDist(vec: String, cb: String, sub: String, cid: String,
      sd: Int): String =
    s"aggregate(zip_with(slice($vec, cast(($sub) * $sd + 1 as int), $sd), " +
      s"slice(element_at($cb, cast(($cid) + 1 as int)), cast(($sub) * $sd + 1 as int), $sd), " +
      s"(px, py) -> (CAST(px AS DOUBLE) - CAST(py AS DOUBLE)) * " +
      s"(CAST(px AS DOUBLE) - CAST(py AS DOUBLE))), 0D, (pa, pv) -> pa + pv)"
  def duckPqSqDist(vec: String, cb: String, sub: String, cid: String,
      sd: Int): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(0, $sd), " +
      s"pj -> (($vec)[($sub) * $sd + pj + 1]::DOUBLE - (($cb)[($cid) + 1])[($sub) * $sd + pj + 1]::DOUBLE) * " +
      s"(($vec)[($sub) * $sd + pj + 1]::DOUBLE - (($cb)[($cid) + 1])[($sub) * $sd + pj + 1]::DOUBLE))), " +
      s"(pa, pv) -> pa + pv)"
  /** 0-based nearest-centroid code per subspace. */
  def sparkPqCodes(vec: String, cb: String, m: Int, ks: Int, sd: Int): String =
    s"transform(transform(sequence(0L, ${m - 1}L), sb -> " +
      s"transform(sequence(0L, ${ks - 1}L), cd -> ${sparkPqSqDist(vec, cb, "sb", "cd", sd)})), " +
      s"sc -> array_position(sc, array_min(sc)) - 1)"
  def duckPqCodes(vec: String, cb: String, m: Int, ks: Int, sd: Int): String =
    s"list_transform(list_transform(range(0, $m), sb -> " +
      s"list_transform(range(0, $ks), cd -> ${duckPqSqDist(vec, cb, "sb", "cd", sd)})), " +
      s"sc -> list_position(sc, list_min(sc)) - 1)"
  /** ADC: raw query vs a candidate's codes. */
  def sparkPqAdc(q: String, codes: String, cb: String, m: Int, sd: Int): String =
    s"aggregate(sequence(0L, ${m - 1}L), 0D, (acc, sb) -> acc + " +
      s"${sparkPqSqDist(q, cb, "sb", s"element_at($codes, cast(sb + 1 as int))", sd)})"
  def duckPqAdc(q: String, codes: String, cb: String, m: Int, sd: Int): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(0, $m), sb -> " +
      s"${duckPqSqDist(q, cb, "sb", s"($codes)[sb + 1]", sd)})), (acc, v) -> acc + v)"

  // ---- Hilbert curve key (the xy2d iterative form): one CASE-fragment
  // triple per level, ALL-integer and ANSI-dialect-free, so the SAME
  // strings drive the Spark plan and the DuckDB oracle. Reads the
  // PRE-rotation x, y of the level (evaluate the three fragments in one
  // simultaneous SELECT). `s` is the level's sub-square size, `n` the
  // full grid width. rx = (x & s) > 0, ry = (y & s) > 0; the d increment
  // is s²·((3·rx) XOR ry) spelled as nested CASE (DuckDB's ^ is POWER,
  // so the xor is arithmetic); the rotation is flip-then-swap when
  // ry = 0. ----
  def hilbertX(s: Int, n: Int, x: String = "x", y: String = "y"): String =
    s"CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) > 0 " +
      s"THEN ${n - 1} - $y ELSE $y END) ELSE $x END"
  def hilbertY(s: Int, n: Int, x: String = "x", y: String = "y"): String =
    s"CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) > 0 " +
      s"THEN ${n - 1} - $x ELSE $x END) ELSE $y END"
  def hilbertD(s: Int, x: String = "x", y: String = "y", d: String = "d"): String =
    s"$d + CAST(${s.toLong * s} AS BIGINT) * " +
      s"(CASE WHEN ($x & $s) = 0 THEN (CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) " +
      s"ELSE (CASE WHEN ($y & $s) > 0 THEN 2 ELSE 3 END) END)"

  // ---- English stopword hit count over a token array ----
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  def sparkStopHits(tokens: String): String =
    s"size(array_intersect($tokens, array(${stopwords.map("'" + _ + "'").mkString(",")})))"
  def duckStopHits(tokens: String): String =
    s"len(list_intersect($tokens, [${stopwords.map("'" + _ + "'").mkString(",")}]))"
}

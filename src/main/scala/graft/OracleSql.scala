package graft

/** DuckDB oracle SQL — the ANSI-SQL twin of every oracle-checkable entry in
  * [[SparkEntry.queries]].
  *
  * Mirroring contract (why these strings look the way they do):
  *   - every aggregate over doubles is an integer-scaled sum
  *     (`FLOOR(x*scale+0.5)` per row → BIGINT sum → one division at the
  *     edge) so results are bit-identical regardless of accumulation order;
  *   - expression structure (operator order, literal types) matches the
  *     Spark side exactly — IEEE double ops are deterministic when the
  *     operand order is the same;
  *   - every query ends in the same ORDER BY as its Spark twin;
  *   - DuckDB `SUM(BIGINT)` → HUGEINT and `len()` → BIGINT are explicitly
  *     cast to match Spark's LongType output schema.
  */
object OracleSql {

  /** quality_model_score's CTE body (frozen linear head → `qml` with one
    * logit_e12 row per doc) — shared with curriculum_stages so the score
    * has ONE SQL definition. */
  private lazy val qmsCtes: String = {
    import graft.operators.TextOps.{QmBiasE12, QmLenCap, QmWAlpha, QmWLen, QmWPunct, QmWStop}
    s"""qmb AS (SELECT doc_id,
       |  CAST(len(string_split(text,' ')) AS BIGINT) AS words_n,
       |  GREATEST(CAST(length(text) AS BIGINT), 1) AS chars_n,
       |  CAST(length(text) - length(regexp_replace(text,'[.,;:!?]','','g')) AS BIGINT) AS punct_n,
       |  ${stopHits("en")} AS stop_n,
       |  CAST(len(list_filter(string_split(text,' '), x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_n
       |FROM documents),
       |qmf AS (SELECT doc_id,
       |  CAST(FLOOR(CAST(stop_n*1000000 AS DOUBLE)/words_n) AS BIGINT) AS stop_e6,
       |  CAST(FLOOR(CAST(punct_n*1000000 AS DOUBLE)/chars_n) AS BIGINT) AS punct_e6,
       |  CAST(FLOOR(CAST(alpha_n*1000000 AS DOUBLE)/words_n) AS BIGINT) AS alpha_e6,
       |  LEAST(words_n, $QmLenCap)*2000 AS len_e6
       |FROM qmb),
       |qml AS (SELECT doc_id, stop_e6, punct_e6, alpha_e6, len_e6,
       |  CAST($QmBiasE12 + stop_e6*$QmWStop + punct_e6*$QmWPunct
       |    + alpha_e6*$QmWAlpha + len_e6*$QmWLen AS BIGINT) AS logit_e12
       |FROM qmf)""".stripMargin
  }

  /** Shared canonicalization expression (dedup_normalized + curation_report). */
  private val normTextSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** repetition_stats oracle — ALSO the k_r source for curation_report
    * (one source of truth for gate semantics on the SQL side too). */
  private val repetitionStatsSql: String = {

      import graft.operators.TextOps.{RepMaxDupBigram, RepMaxTopWord}
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |b AS (SELECT doc_id, w,
         |  list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1]) AS g
         |FROM t),
         |c AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS words_n,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS uniq_words,
         |  CAST(len(g) AS BIGINT) AS bigrams_n,
         |  CAST(len(list_distinct(g)) AS BIGINT) AS uniq_bigrams,
         |  CAST(list_max(list_transform(list_distinct(w),
         |    x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_word_n
         |FROM b),
         |m AS (SELECT doc_id, words_n, uniq_words, bigrams_n, top_word_n,
         |  CAST(words_n - uniq_words AS DOUBLE)/words_n AS dup_word_frac,
         |  CASE WHEN bigrams_n > 0
         |    THEN CAST(bigrams_n - uniq_bigrams AS DOUBLE)/bigrams_n
         |    ELSE 0.0 END AS dup_bigram_frac,
         |  CAST(top_word_n AS DOUBLE)/words_n AS top_word_frac
         |FROM c)
         |SELECT *, dup_bigram_frac <= $RepMaxDupBigram AND top_word_frac <= $RepMaxTopWord AS keep
         |FROM m ORDER BY doc_id""".stripMargin
  }

  /** gopher_gates oracle — ALSO the k_g source for curation_report. */
  private val gopherGatesSql: String = {

      import graft.operators.TextOps._
      s"""WITH b AS (SELECT doc_id,
         |  string_split(text, ' ') AS w,
         |  string_split(text, chr(10)) AS lines,
         |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS cns,
         |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hash_n,
         |  CAST((length(text) - length(replace(text, '...', '')))/3 AS BIGINT) AS ell_n
         |FROM documents),
         |c AS (SELECT doc_id, cns, hash_n, ell_n,
         |  CAST(len(w) AS BIGINT) AS words_n,
         |  CAST(len(lines) AS BIGINT) AS lines_n,
         |  CAST(len(list_filter(lines, x -> left(x,2) IN ('- ','* '))) AS BIGINT) AS bullet_n,
         |  CAST(len(list_filter(lines, x -> x LIKE '%...')) AS BIGINT) AS ell_lines,
         |  CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_n
         |FROM b),
         |m AS (SELECT doc_id, words_n,
         |  CAST(cns AS DOUBLE)/words_n AS mean_word_len,
         |  CAST(hash_n + ell_n AS DOUBLE)/words_n AS symbol_ratio,
         |  CAST(bullet_n AS DOUBLE)/lines_n AS bullet_line_frac,
         |  CAST(ell_lines AS DOUBLE)/lines_n AS ellipsis_line_frac,
         |  CAST(alpha_n AS DOUBLE)/words_n AS alpha_word_frac
         |FROM c)
         |SELECT *,
         |  (mean_word_len >= $GopherMinMeanWord AND mean_word_len <= $GopherMaxMeanWord
         |   AND symbol_ratio < $GopherMaxSymbolRatio
         |   AND bullet_line_frac < $GopherMaxBulletFrac
         |   AND ellipsis_line_frac < $GopherMaxEllipsisFrac
         |   AND alpha_word_frac > $GopherMinAlphaFrac) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------- steam domain prelude ----------

  private val rates =
    """SELECT n_nationkey, n_name, n_regionkey,
      |  CASE WHEN n_nationkey=0 THEN 1.0 ELSE 1.0+(n_nationkey%7)*0.5 END AS rate,
      |  CASE WHEN n_nationkey=23 THEN 'uk' ELSE lower(n_name) END AS cc
      |FROM nation""".stripMargin

  private val priceStrSql = {
    val ws = "CAST(CAST(FLOOR(ct/100.0) AS BIGINT) AS VARCHAR)"
    val fs = "lpad(CAST(ct%100 AS VARCHAR),2,'0')"
    s"CASE WHEN fmt=0 THEN $ws||','||$fs WHEN fmt=1 THEN $ws||'.'||$fs ELSE '$$ '||$ws||'.'||$fs END"
  }

  private def factCte(withBad: Boolean): String = {
    val strExpr =
      if (withBad) s"CASE WHEN l_orderkey%17=0 THEN 'N/A' ELSE ($priceStrSql) END"
      else priceStrSql
    s"""rates AS ($rates),
       |base AS (SELECT l_orderkey, l_linenumber, n_nationkey, n_name, cc, rate,
       |  CAST(FLOOR(l_extendedprice*rate/1000.0*100.0+0.5) AS BIGINT) AS ct,
       |  l_orderkey%3 AS fmt
       |  FROM lineitem JOIN rates ON l_suppkey%25 = n_nationkey),
       |strs AS (SELECT *, $strExpr AS price_str FROM base),
       |ms AS (SELECT *, regexp_extract(price_str, '[0-9]+[,. ]?[0-9]*') AS m FROM strs),
       |ps AS (SELECT *,
       |  TRY_CAST(replace(replace(replace(m,' ',''),'.',''),',','.') AS DOUBLE)/rate AS p1,
       |  TRY_CAST(replace(replace(m,' ',''),',','') AS DOUBLE)/rate AS p2 FROM ms),
       |fact AS (SELECT l_orderkey, l_linenumber, n_nationkey, n_name, cc, rate, ct, price_str,
       |  CASE WHEN m IS NULL OR m='' THEN NULL WHEN p1>100 OR p1<0.1 THEN p2 ELSE p1 END AS usd_price
       |  FROM ps)""".stripMargin
  }

  private val avgE6 =
    "CAST(SUM(CAST(FLOOR(usd_price*1000000.0+0.5) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(usd_price)"

  private val statsCtes =
    s"""cstats AS (SELECT cc, $avgE6 AS avg_usd FROM fact GROUP BY cc),
       |wstats AS (SELECT $avgE6 AS world_avg FROM fact),
       |dev AS (SELECT cc, avg_usd, avg_usd/world_avg - 1.0 AS perc_dif,
       |  (avg_usd/world_avg - 1.0)*world_avg AS usd_dif FROM cstats, wstats)""".stripMargin

  private val normExpr = "upper(CASE WHEN cc='uk' THEN 'gb' ELSE cc END)"

  private val isoCte =
    s"iso AS (SELECT $normExpr AS iso_a2, $normExpr||'_A3' AS iso_a3 FROM rates WHERE n_nationkey<>5)"

  private val geoCte =
    s"geo AS (SELECT $normExpr AS g_alpha2, $normExpr||'_A3' AS g_alpha3, r_name AS continent FROM rates JOIN region ON n_regionkey=r_regionkey)"

  private val worldCtes =
    s"""$isoCte,
       |$geoCte,
       |enr AS (SELECT iso_a3 AS s_alpha3, avg_usd, perc_dif, usd_dif
       |  FROM (SELECT dev.*, $normExpr AS alpha2 FROM dev) d
       |  LEFT JOIN iso ON d.alpha2=iso.iso_a2),
       |world AS (SELECT g_alpha2 AS alpha2, g_alpha3 AS alpha3, continent, avg_usd, perc_dif, usd_dif
       |  FROM geo LEFT JOIN enr ON g_alpha3=s_alpha3)""".stripMargin

  private val euPropExpr =
    "CASE WHEN continent='EUROPE' THEN MAX(usd_dif) OVER (PARTITION BY (continent='EUROPE')) ELSE usd_dif END"

  // ---------- shared numeric helpers ----------

  private def e2(x: String) = s"CAST(FLOOR(($x)*100.0+0.5) AS BIGINT)"
  private def sumE2(x: String) = s"CAST(SUM(${e2(x)}) AS DOUBLE)/100.0"
  private def avgE2(x: String) = s"CAST(SUM(${e2(x)}) AS DOUBLE)/100.0/COUNT(*)"

  // embeddings: exact scaled-int dot product, mirroring graft's DotE12
  // ---------- XXH64 single-long fold, emulated exactly in DuckDB ----------
  // Spark's xxhash64(longCol, longLit) (the sampling operators' keyed
  // coin) is XXH64.hashLong folded per argument from seed 42. DuckDB has
  // no xxhash64, but every step is expressible in HUGEINT arithmetic:
  // 64×64-bit products split 32/32 (a full product would overflow the
  // signed int128), rotations as shift+or on disjoint bit ranges, xor by
  // re-signing through BIGINT (two's-complement xor IS 64-bit xor). The
  // stage chain lands in MATERIALIZED CTEs — DuckDB inlines plain CTEs
  // and lateral aliases by substitution, and the 24-deep chain would
  // otherwise expand exponentially. Verified bit-equal to the JVM on the
  // operators' own outputs.
  private val XxM = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val XxH63 = "CAST('9223372036854775808' AS HUGEINT)" // 2^63
  private val XxB32 = "CAST(4294967296 AS HUGEINT)" // 2^32
  private val XxP1 = "CAST('11400714785074694791' AS HUGEINT)"
  private val XxP2 = "CAST('14029467366897019727' AS HUGEINT)"
  private val XxP3 = "CAST('1609587929392839161' AS HUGEINT)"
  private val XxP4 = "CAST('9650029242287828579' AS HUGEINT)"
  private val XxP5 = "CAST('2870177450012600261' AS HUGEINT)"

  private def xxMulMod(x: String, y: String) =
    s"(((($x // $XxB32) * $y % $XxB32) * $XxB32 + ($x % $XxB32) * $y) % $XxM)"
  private def xxSign(x: String) =
    s"(CASE WHEN $x >= $XxH63 THEN CAST($x - $XxM AS BIGINT) ELSE CAST($x AS BIGINT) END)"
  private def xxUxor(a: String, b: String) = {
    val s = s"xor(${xxSign(a)}, ${xxSign(b)})"
    s"(CAST($s AS HUGEINT) + CASE WHEN $s < 0 THEN $XxM ELSE CAST(0 AS HUGEINT) END)"
  }
  private def xxUnsign(x: String) =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $XxM ELSE CAST(($x) AS HUGEINT) END)"
  private def xxRotl(x: String, r: Int) =
    s"((($x * ${1L << r}) % $XxM) + ($x // ${1L << (64 - r)}))"

  /** MATERIALIZED CTE stages computing `{p}out` = XXH64.hashLong(inp, seed)
    * starting from CTE `src`, carrying `keep` columns through. */
  private def xxHashLongCtes(p: String, src: String, keep: Seq[String],
      inp: String, seed: String): Seq[(String, String)] = {
    val k = keep.mkString(", ")
    Seq(
      (s"${p}s1", s"SELECT $k, ${xxMulMod(inp, XxP2)} AS ${p}k1, " +
        s"(($seed + $XxP5 + 8) % $XxM) AS ${p}h0 FROM $src"),
      (s"${p}s2", s"SELECT $k, ${p}h0, ${xxRotl(s"${p}k1", 31)} AS ${p}k2 FROM ${p}s1"),
      (s"${p}s2b", s"SELECT $k, ${p}h0, ${xxMulMod(s"${p}k2", XxP1)} AS ${p}k3 FROM ${p}s2"),
      (s"${p}s3", s"SELECT $k, ${xxUxor(s"${p}h0", s"${p}k3")} AS ${p}h1 FROM ${p}s2b"),
      (s"${p}s3b", s"SELECT $k, ${xxRotl(s"${p}h1", 27)} AS ${p}h2 FROM ${p}s3"),
      (s"${p}s4", s"SELECT $k, (${xxMulMod(s"${p}h2", XxP1)} + $XxP4) % $XxM AS ${p}h3 FROM ${p}s3b"),
      (s"${p}s4b", s"SELECT $k, ${xxUxor(s"${p}h3", s"(${p}h3 // 8589934592)")} AS ${p}f1 FROM ${p}s4"),
      (s"${p}s5", s"SELECT $k, ${xxMulMod(s"${p}f1", XxP2)} AS ${p}f2 FROM ${p}s4b"),
      (s"${p}s5b", s"SELECT $k, ${xxUxor(s"${p}f2", s"(${p}f2 // 536870912)")} AS ${p}f3 FROM ${p}s5"),
      (s"${p}s6", s"SELECT $k, ${xxMulMod(s"${p}f3", XxP3)} AS ${p}f4 FROM ${p}s5b"),
      (s"${p}s7", s"SELECT $k, ${xxUxor(s"${p}f4", s"(${p}f4 // 4294967296)")} AS ${p}out FROM ${p}s6"))
  }

  // ---------- XXH64 over STRINGS (full algorithm: 32-byte stripes, 8/4/1-
  // byte tails), emulated in DuckDB ----------
  // Verified bit-equal to Spark's xxhash64 on ASCII and multi-byte UTF-8
  // at every length regime (<32, ==32, >32, 8k+r tails). The fold phases
  // run as list_reduce over the DATA (stripe lists / tail lanes), so the
  // recurrence depth lives in rows, not in the expression tree — only
  // the fixed stage chain needs MATERIALIZED CTEs.

  private val XxV1 = "CAST('6983438078262162944' AS HUGEINT)" // (42+P1+P2) mod 2^64
  private val XxV2 = "CAST('14029467366897019769' AS HUGEINT)" // 42+P2
  private val XxV3 = "CAST(42 AS HUGEINT)"
  private val XxV4 = "CAST('7046029288634856867' AS HUGEINT)" // (42-P1) mod 2^64

  /** UTF-8 byte list of a string expression (codepoints re-encoded — the
    * hash is over bytes; shared recipe with the text_fingerprint twin). */
  private def xxUtf8Bytes(t: String): String =
    s"CAST(flatten(list_transform(range(1, length($t)+1), ci -> (CASE " +
      s"WHEN ord($t[ci]) < 128 THEN [ord($t[ci])] " +
      s"WHEN ord($t[ci]) < 2048 THEN [192 + ord($t[ci]) // 64, 128 + ord($t[ci]) % 64] " +
      s"WHEN ord($t[ci]) < 65536 THEN [224 + ord($t[ci]) // 4096, 128 + (ord($t[ci]) // 64) % 64, 128 + ord($t[ci]) % 64] " +
      s"ELSE [240 + ord($t[ci]) // 262144, 128 + (ord($t[ci]) // 4096) % 64, 128 + (ord($t[ci]) // 64) % 64, 128 + ord($t[ci]) % 64] END))) AS BIGINT[])"

  /** One stripe-lane round: v ← rotl31(v + lane·P2)·P1, all mod 2⁶⁴. */
  private def xxRound(v: String, l: String): String =
    xxMulMod(xxRotl(s"(($v) + ${xxMulMod(l, XxP2)}) % $XxM", 31), XxP1)

  /** One accumulator merge: h ← (h ⊕ rotl31(v·P2)·P1)·P1 + P4. */
  private def xxMerge(h: String, v: String): String =
    s"(${xxMulMod(xxUxor(h, xxMulMod(xxRotl(xxMulMod(v, XxP2), 31), XxP1)), XxP1)} + $XxP4) % $XxM"

  /** MATERIALIZED CTE chain from `src` (columns: `keep` + BIGINT[] `bs`)
    * to CTE `xh` (columns: `keep` + unsigned-HUGEINT `xh` =
    * XXH64(bytes, seed 42) — Spark's `xxhash64` on the original string). */
  private def xxStringCtes(src: String, keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    val w8sum = (0 until 8).map(t =>
      s"CAST(bs[8*wj+${t + 1}] AS HUGEINT) * CAST('${BigInt(1) << (8 * t)}' AS HUGEINT)")
      .mkString(" + ")
    val lane4 = (0 until 4).map(t =>
      s"CAST(bs[(n//8)*8+${t + 1}] AS HUGEINT) * ${1L << (8 * t)}").mkString(" + ")
    s"""x1 AS MATERIALIZED (SELECT $k, bs, len(bs) AS n,
       |  list_transform(range(0, len(bs)//8), wj -> $w8sum) AS w8 FROM $src),
       |x2 AS MATERIALIZED (SELECT $k, bs, n, w8,
       |  list_reduce(list_prepend([$XxV1, $XxV2, $XxV3, $XxV4],
       |    list_transform(range(0, n//32), sj -> [w8[4*sj+1], w8[4*sj+2], w8[4*sj+3], w8[4*sj+4]])),
       |    (a, l) -> [${xxRound("a[1]", "l[1]")}, ${xxRound("a[2]", "l[2]")}, ${xxRound("a[3]", "l[3]")}, ${xxRound("a[4]", "l[4]")}]) AS acc FROM x1),
       |x3a AS MATERIALIZED (SELECT $k, bs, n, w8, acc,
       |  (${xxRotl("acc[1]", 1)} + ${xxRotl("acc[2]", 7)} + ${xxRotl("acc[3]", 12)} + ${xxRotl("acc[4]", 18)}) % $XxM AS hm FROM x2),
       |x3b AS MATERIALIZED (SELECT $k, bs, n, w8, acc, ${xxMerge("hm", "acc[1]")} AS hm FROM x3a),
       |x3c AS MATERIALIZED (SELECT $k, bs, n, w8, acc, ${xxMerge("hm", "acc[2]")} AS hm FROM x3b),
       |x3d AS MATERIALIZED (SELECT $k, bs, n, w8, acc, ${xxMerge("hm", "acc[3]")} AS hm FROM x3c),
       |x3e AS MATERIALIZED (SELECT $k, bs, n, w8,
       |  ((CASE WHEN n >= 32 THEN ${xxMerge("hm", "acc[4]")} ELSE (42 + $XxP5) % $XxM END) + n) % $XxM AS h FROM x3d),
       |x4 AS MATERIALIZED (SELECT $k, bs, n,
       |  list_reduce(list_prepend(h, list_transform(range((n//32)*4, n//8), wj -> w8[wj+1])),
       |    (a, l) -> (${xxMulMod(xxRotl(xxUxor("a", xxMulMod(xxRotl(xxMulMod("l", XxP2), 31), XxP1)), 27), XxP1)} + $XxP4) % $XxM) AS h FROM x3e),
       |x5 AS MATERIALIZED (SELECT $k, bs, n,
       |  CASE WHEN n - (n//8)*8 >= 4
       |    THEN (${xxMulMod(xxRotl(xxUxor("h", xxMulMod(s"($lane4)", XxP1)), 23), XxP2)} + $XxP3) % $XxM
       |    ELSE h END AS h FROM x4),
       |x6 AS MATERIALIZED (SELECT $k,
       |  list_reduce(list_prepend(h,
       |      list_transform(range((n//8)*8 + CASE WHEN n - (n//8)*8 >= 4 THEN 4 ELSE 0 END, n),
       |        bj -> CAST(bs[bj+1] AS HUGEINT))),
       |    (a, b) -> ${xxMulMod(xxRotl(xxUxor("a", s"(b * $XxP5) % $XxM"), 11), XxP1)}) AS h FROM x5),
       |x7 AS MATERIALIZED (SELECT $k, ${xxMulMod(xxUxor("h", "(h // 8589934592)"), XxP2)} AS f2 FROM x6),
       |x8 AS MATERIALIZED (SELECT $k, ${xxMulMod(xxUxor("f2", "(f2 // 536870912)"), XxP3)} AS f4 FROM x7),
       |xh AS (SELECT $k, ${xxUxor("f4", "(f4 // 4294967296)")} AS xh FROM x8)""".stripMargin
  }

  // ---------- GRMM multimodal synthesis twin ----------
  // The media payloads are a deterministic function of (doc_id, text)
  // (MediaCodec.encodeFor), so the decode outputs are reproducible in
  // SQL: the oracle re-derives dims from the doc_id golden-ratio mix
  // (64-bit wrap multiply + low 32 bits) and body bytes from the UTF-8
  // content cycle — proving decode ∘ encode = identity independently of
  // the JVM byte path.
  private def mmDimsCtes: String =
    s"""dm AS (SELECT doc_id, text, CAST(doc_id % 3 AS INT) AS kind,
       |  ${xxMulMod(xxUnsign("doc_id"), "CAST('11400714819323198485' AS HUGEINT)")} % $XxB32 AS sv
       |  FROM documents),
       |d2 AS (SELECT doc_id, text, kind,
       |  CAST(CASE kind WHEN 0 THEN 16 + sv % 16 WHEN 1 THEN 64 + sv % 64
       |    ELSE 8 + sv % 12 END AS INT) AS w,
       |  CAST(CASE kind WHEN 0 THEN 16 + (sv // 256) % 16 WHEN 1 THEN 1
       |    ELSE 8 + (sv // 256) % 12 END AS INT) AS h,
       |  CAST(CASE kind WHEN 0 THEN 3 WHEN 1 THEN 1 + (sv // 256) % 2
       |    ELSE 3 END AS INT) AS ch,
       |  CAST(CASE kind WHEN 0 THEN 1 WHEN 1 THEN 4 + (sv // 65536) % 4
       |    ELSE 4 + (sv // 65536) % 8 END AS INT) AS nf
       |  FROM dm),
       |d3 AS (SELECT doc_id, kind, w, h, ch, nf,
       |  CAST(nf AS BIGINT) * w * h * ch AS bl,
       |  CASE kind WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  ${xxUtf8Bytes("text")} AS cb FROM d2)""".stripMargin

  /** Body byte at offset `i` (0-based): (content[i mod clen] + 31·i) mod 256. */
  private def mmByte(i: String): String =
    s"((CASE WHEN len(cb) = 0 THEN 0 ELSE cb[(($i) % len(cb)) + 1] END) + 31 * ($i)) % 256"

  // ---------- BPE training, unrolled ----------
  // The trainer's argmax-per-round loop has no ANSI fixed point, but —
  // like the unrolled PageRank twin — a FIXED merge count unrolls to one
  // CTE block per round: overlapping pair counts over the current
  // segmentation, the (freq DESC, l, r) argmax (binary string collation
  // in both engines), and the left-to-right non-overlapping merge as a
  // list fold. The fold's last-element check is equivalent to the
  // kernel's index-skip: a merged symbol l||r can never re-equal l (r is
  // nonempty), so greedy re-merge cannot cascade within a round.
  private def bpeCtes(numMerges: Int): String = {
    val wf =
      s"""wf AS (SELECT w, COUNT(*) AS cnt FROM (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents) WHERE length(w) > 0
         |  GROUP BY w),
         |seg0 AS (SELECT w, cnt,
         |  list_transform(range(1, length(w)+1), ci -> w[ci]) AS syms FROM wf)""".stripMargin
    val rounds = (0 until numMerges).map { r =>
      s"""p$r AS (SELECT s.syms[i] AS l, s.syms[i+1] AS r2, SUM(s.cnt) AS freq
         |  FROM seg$r s, UNNEST(generate_series(1, len(s.syms)-1)) AS u(i)
         |  WHERE len(s.syms) >= 2 GROUP BY 1, 2),
         |m$r AS (SELECT l, r2, freq FROM p$r ORDER BY freq DESC, l, r2 LIMIT 1),
         |seg${r + 1} AS MATERIALIZED (SELECT s.w, s.cnt,
         |  list_reduce(list_transform(s.syms, c -> [c]),
         |    (a, x) -> CASE WHEN a[-1] = m.l AND x[1] = m.r2
         |      THEN a[1:len(a)-1] || [a[-1] || x[1]]
         |      ELSE a || x END) AS syms
         |  FROM seg$r s, m$r m)""".stripMargin
    }
    (wf +: rounds).mkString(",\n")
  }

  /** CTE block `hx` exposing `keep` + `pm` = Spark
    * `pmod(xxhash64(doc_id, <seed>L), m)` for every documents row. */
  private def xxDocCoinCtes(keep: Seq[String], seed: Long, m: Long): String = {
    val ctes =
      xxHashLongCtes("a", "documents", keep,
        s"(CASE WHEN doc_id < 0 THEN CAST(doc_id AS HUGEINT) + $XxM " +
          s"ELSE CAST(doc_id AS HUGEINT) END)", s"CAST(42 AS HUGEINT)") ++
      xxHashLongCtes("b", "as7", keep :+ "aout",
        s"CAST($seed AS HUGEINT)", "aout")
    (ctes.map { case (n, q) => s"$n AS MATERIALIZED ($q)" } :+
      (s"hx AS (SELECT ${keep.mkString(", ")}, " +
        s"(((${xxSign("bout")} % $m) + $m) % $m) AS pm FROM bs7)")).mkString(",\n")
  }

  private def dotE12(a: String, b: String) =
    s"CAST(list_sum(list_transform(generate_series(1,64), i -> " +
      s"CAST(FLOOR(CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)*1000000000000.0+0.5) AS BIGINT))) AS BIGINT)"

  /** Exact scaled-int dot of an embedding column with a LITERAL ±1 plane
    * (the LSH/projection plane family, inlined as a DuckDB list). */
  private def dotPlane(emb: String, w: String) =
    s"CAST(list_sum(list_transform(generate_series(1,64), i -> " +
      s"CAST(FLOOR(CAST($emb[i] AS DOUBLE)*($w)[i]*1000000000000.0+0.5) AS BIGINT))) AS BIGINT)"

  /** SimilarityOps.lshBucket's bit-exact SQL twin: bit p set iff the
    * exact dot with seeded plane p is strictly positive. */
  private def lshBucketSql(emb: String): String =
    graft.operators.SimilarityOps.planeWeights(64).zipWithIndex.map { case (p, i) =>
      val w = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN ${dotPlane(emb, w)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  private def cosSim(dt: String, na: String, nb: String) =
    s"CAST($dt AS DOUBLE)/(sqrt(CAST($na AS DOUBLE))*sqrt(CAST($nb AS DOUBLE)))"

  /** Exact integer squared L2 between two e6 long lists (ClusterOps.dist2). */
  private def kmDist(v: String, c: String, dims: Int = 64) =
    s"CAST(list_sum(list_transform(generate_series(1,$dims), i -> " +
      s"($v[i]-$c[i])*($v[i]-$c[i]))) AS BIGINT)"

  /** ClusterOps.kmeansAssign unrolled (the graph_pagerank / bpe_merges
    * trick applied to Lloyd's algorithm): cR/aR CTE pairs reproduce each
    * round's argmin assignment (row_number over (d, cluster) == Spark's
    * min(struct)) and the round-half-up e6 integer centroid update, with
    * empty clusters retaining their previous centroid via LEFT JOIN +
    * coalesce. Training runs over `tr` (the rows matching `trainWhere` —
    * the full table for the batch operators, the corpus slice for the
    * frozen-quantizer incremental path); the final assignment `af`
    * covers EVERY vector: (vec_id, cluster, exact d). */
  private def kmeansCtes(k: Int, rounds: Int, trainWhere: String = "TRUE",
      sliceLo: Int = 1, sliceLen: Int = 64, p: String = "",
      normalized: Boolean = false, eOverride: String = null): String = {
    // eOverride: full SELECT yielding (vec_id, v) — lets a caller point
    // the unrolled trainer at a DERIVED vector source (e.g. the hashed
    // doc vectors of semantic_dedup_text) instead of the embeddings
    // table; sliceLen then only sizes kmDist's generate_series.
    // `p` prefixes every CTE name so embedding_pq can compose one
    // instance per subspace in a single WITH; sliceLo/sliceLen carve the
    // subspace out of the embedding (1-based, mirroring Spark's slice);
    // `normalized` mirrors ClusterOps.quantized(normalize = true) — e6
    // integers of the unit vector, x·10¹²/√nrmE12 (the cosine-metric PQ
    // convention)
    val vecExpr =
      if (sliceLo == 1 && sliceLen == 64) "embedding"
      else s"embedding[$sliceLo:${sliceLo + sliceLen - 1}]"
    val comp =
      if (!normalized) "CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0+0.5) AS BIGINT)"
      else "CAST(FLOOR(CAST(x AS DOUBLE)*1000000000000.0/sqrt(CAST(nrm AS DOUBLE))+0.5) AS BIGINT)"
    val src =
      if (!normalized) "embeddings"
      else s"(SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings)"
    val sb = new StringBuilder
    val eBody =
      if (eOverride != null) eOverride
      else s"""SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |  list_transform($vecExpr, x -> $comp) AS v
      |FROM $src""".stripMargin
    sb ++= s"""${p}e AS ($eBody),
      |${p}tr AS (SELECT * FROM ${p}e WHERE $trainWhere),
      |${p}c0 AS (SELECT vec_id AS cluster, v AS c FROM ${p}tr WHERE vec_id < $k)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
      |${p}s$r AS (SELECT tr.vec_id, pc.cluster, ${kmDist("tr.v", "pc.c", sliceLen)} AS d FROM ${p}tr tr CROSS JOIN ${p}c${r - 1} pc),
      |${p}a$r AS (SELECT vec_id, cluster FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn FROM ${p}s$r) WHERE rn = 1),
      |${p}u$r AS (SELECT cluster, i, CAST(FLOOR(CAST(SUM(tr.v[i]) AS DOUBLE)/COUNT(*)+0.5) AS BIGINT) AS m
      |  FROM ${p}a$r a JOIN ${p}tr tr USING (vec_id) CROSS JOIN generate_series(1,$sliceLen) gs(i) GROUP BY cluster, i),
      |${p}n$r AS (SELECT cluster, list(m ORDER BY i) AS c FROM ${p}u$r GROUP BY cluster),
      |${p}c$r AS (SELECT pc.cluster, coalesce(n.c, pc.c) AS c FROM ${p}c${r - 1} pc LEFT JOIN ${p}n$r n USING (cluster))""".stripMargin
    }
    sb ++= s""",
      |${p}sf AS (SELECT e.vec_id, pc.cluster, ${kmDist("e.v", "pc.c", sliceLen)} AS d FROM ${p}e e CROSS JOIN ${p}c$rounds pc),
      |${p}af AS (SELECT vec_id, cluster, d FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn FROM ${p}sf) WHERE rn = 1)""".stripMargin
    sb.toString
  }

  /** Full-recompute CC twin (recursive min-label closure over the
    * symmetric co-purchase edges) — shared verbatim by `graph_components`
    * and `graph_components_incremental`: the incremental path's contract
    * is "equals a full rebuild". */
  private val graphComponentsSql =
    """WITH RECURSIVE p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
      |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
      |reach(node, lbl) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
      |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
      |sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS component_size
      |  FROM comp GROUP BY 1)
      |SELECT c.node AS node_id,
      |  CASE WHEN c.node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
      |  c.node // 2 AS key, c.component, s.component_size
      |FROM comp c JOIN sz s USING (component) ORDER BY node_id""".stripMargin

  /** The unrolled IVF-PQ twin (coarse + M subspace kmeans instances in
    * one WITH) — shared verbatim by `ann_ivf_pq` (in-query training) and
    * `ann_index_probe` (the landed-index read path): the two Spark
    * compositions are bit-identical by construction, so one oracle
    * covers both. */

  /** The chunking→token-hashing CTE chain ending in `v` (doc_id,
    * chunk_id, dim, sg) — shared by `chunk_embed` and
    * `chunk_neighbors`. */
  private def chunkHashCtes: String = {
    val dims = graft.operators.TextOps.EmbedDims
    val size = graft.operators.TextOps.ChunkSize
    val stride = graft.operators.TextOps.ChunkStride
    s"""t AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |ch AS (SELECT doc_id, CAST(i // $stride AS BIGINT) AS chunk_id,
         |  substr(text, CAST(i AS INT) + 1, $size) AS chunk
         |  FROM t, UNNEST(generate_series(0, greatest(n - 1, 0), $stride)) AS u(i)),
         |cw AS (SELECT doc_id, chunk_id, string_split(chunk, ' ') AS w FROM ch),
         |tok AS (SELECT doc_id, chunk_id, i, w[i] AS tok
         |  FROM cw, UNNEST(generate_series(1, len(w))) AS u(i)),
         |src AS (SELECT doc_id, chunk_id, i, ${xxUtf8Bytes("tok")} AS bs FROM tok),
         |${xxStringCtes("src", Seq("doc_id", "chunk_id", "i"))},
         |v AS (SELECT doc_id, chunk_id, CAST(xh % $dims AS BIGINT) AS dim,
         |  CASE WHEN (xh // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg FROM xh)""".stripMargin
  }

  private def annIvfPqSql: String = annIvfPqSqlWhere("TRUE")

  /** The IVF-PQ twin's CTE chain, ending at `rk` (q_id, n_id, adist,
    * rnk) — exposed separately from the final SELECT so composed twins
    * (link_prediction_indexed) can consume the ranked neighbor lists.
    * `trainWhere` restricts quantizer training; `queryWhere` selects
    * which vectors probe (the keyed probe convention is the isQuery
    * modulus slice; the kNN-graph build probes with EVERYONE).
    *
    * PRECONDITION (ADVICE r12): this twin trains the coarse quantizer
    * at the FIXED ClusterOps.CoarseCells = 8, while the landed index's
    * buildAnnIndex sizes cells adaptively — the two agree only while
    * the embeddings corpus stays ≤ CellOccupancyTarget·CoarseCells
    * (= 32768) vectors, where AnnIndexOps.adaptiveCells floors at 8.
    * A larger check corpus would hash-MISMATCH ann_index_probe /
    * link_prediction_indexed loudly, not silently; if the check SF
    * ever grows past that, derive the cell count here from the same
    * adaptiveCells rule instead of the constant. */
  private def annIvfPqCtes(trainWhere: String, queryWhere: String): String = {
      import graft.operators.ClusterOps.{CoarseCells, CoarseRounds, PqK, PqM, PqNprobe, PqRounds}
      val dimsPer = 64 / PqM
      val coarse = kmeansCtes(CoarseCells, CoarseRounds, trainWhere, 1, 64, "cv",
        normalized = true)
      val subCtes = (0 until PqM).map(i =>
        kmeansCtes(PqK, PqRounds, trainWhere, i * dimsPer + 1, dimsPer, s"q$i",
          normalized = true)).mkString(",\n")
      val luts = (0 until PqM).map(i =>
        s"""lut$i AS (SELECT e.vec_id AS q_id, pc.cluster AS code, ${kmDist("e.v", "pc.c", dimsPer)} AS d
           |  FROM q${i}e e CROSS JOIN q${i}c$PqRounds pc
           |  WHERE $queryWhere)""".stripMargin).mkString(",\n")
      val scores = (0 until PqM).map(i =>
        s"SELECT c.q_id, c.n_id, l.d FROM cand c JOIN q${i}af a ON a.vec_id = c.n_id " +
          s"JOIN lut$i l ON l.q_id = c.q_id AND l.code = a.cluster")
        .mkString("\nUNION ALL\n")
      s"""WITH $coarse,
         |$subCtes,
         |pc AS (SELECT e.vec_id AS q_id, p.cluster AS cell, ${kmDist("e.v", "p.c")} AS cd
         |  FROM cve e CROSS JOIN cvc$CoarseRounds p WHERE $queryWhere),
         |probed AS (SELECT q_id, cell FROM (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY cd, cell) AS rn FROM pc) WHERE rn <= $PqNprobe),
         |cand AS (SELECT p.q_id, a.vec_id AS n_id FROM probed p
         |  JOIN cvaf a ON a.cluster = p.cell AND a.vec_id <> p.q_id),
         |$luts,
         |pp AS ($scores),
         |sc AS (SELECT q_id, n_id, CAST(SUM(d) AS BIGINT) AS adist FROM pp GROUP BY 1, 2),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS BIGINT) AS rnk FROM sc)""".stripMargin
  }

  /** The deterministic-walk CTE chain ending at `wu` (start, node,
    * step) — graph_random_walks' unrolled twin, shared with `walk_pmi`
    * (the landed walk corpus equals a from-scratch generation because
    * the Knuth-mix neighbor choice is fully deterministic). */
  private def randomWalksCtes: String = {
    val steps = (1 to graft.operators.GraphOps.RwSteps).map { k =>
      s"""w$k AS (SELECT w.start, a.dst AS node, CAST($k AS BIGINT) AS step
         |  FROM w${k - 1} w JOIN adj a ON a.src = w.node
         |  AND a.nb_rank = ((w.node % 1000003) * 2654435761 + $k * 40503) % a.deg)""".stripMargin
    }.mkString(",\n")
    val union = (0 to graft.operators.GraphOps.RwSteps)
      .map(k => s"SELECT * FROM w$k").mkString("\n|UNION ALL ").stripMargin
    s"""p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
       |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
       |adj AS (SELECT src, dst,
       |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS nb_rank,
       |  CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS deg
       |  FROM edges),
       |w0 AS (SELECT DISTINCT src AS start, src AS node, CAST(0 AS BIGINT) AS step FROM adj),
       |$steps,
       |wu AS ($union)""".stripMargin
  }

  /** The second-order (node2vec) walk CTE chain ending at `wu2` (start,
    * node, step) — node2vec_walks' twin, shared with `node2vec_pmi`
    * (deterministic walks: the landed corpus equals a from-scratch
    * generation). Per step, the HASH-CAPPED dst-ordered neighbors of
    * `cur` (adjc — GraphOps.n2vCappedAdjacency's twin: per src, the
    * N2vNbrCap neighbors ranked by the Knuth-mix permutation, the r12
    * hub-blowup bound) carry integer node2vec weights (return 3 /
    * triadic 6 / outward 2 — the triadic test is a keyed LEFT-join
    * edge-existence probe against the FULL edge set); the walk takes
    * the neighbor whose cumulative-weight interval contains the
    * Knuth-mix draw mod total weight. Exact BIGINT end to end — both
    * engines compute the identical CDF and draw. Step 1 runs with
    * prev = -1 (matches nothing -> uniform outward weights), the
    * node2vec convention. */
  private def node2vecWalkCtes: String =
    s"""p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
       |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
       |$node2vecStepsOverEdges""".stripMargin

  /** The walk body alone — tri, the hash-capped adjc, f0 and the step
    * CTEs through `wu2` — over whatever symmetrized `edges(src, dst)`
    * CTE precedes it, so composed twins (pmi_ann_agreement) can walk a
    * DIFFERENT edge substrate (the landed-index kNN graph) through the
    * identical chain. */
  private def node2vecStepsOverEdges: String = {
    val (rw, tw, ow) = (graft.operators.GraphOps.N2vReturnW,
      graft.operators.GraphOps.N2vTriadW, graft.operators.GraphOps.N2vOutW)
    val cap = graft.operators.GraphOps.N2vNbrCap
    val steps = (1 to graft.operators.GraphOps.RwSteps).map { k =>
      s"""c$k AS (SELECT f.start, f.prev, f.cur, a.dst,
         |  CASE WHEN a.dst = f.prev THEN $rw
         |       WHEN t.d IS NOT NULL THEN $tw
         |       ELSE $ow END AS wt
         |  FROM f${k - 1} f JOIN adjc a ON a.src = f.cur
         |  LEFT JOIN tri t ON t.p = f.prev AND t.d = a.dst),
         |s$k AS (SELECT *, SUM(wt) OVER (PARTITION BY start ORDER BY dst) AS cum,
         |  SUM(wt) OVER (PARTITION BY start) AS tot FROM c$k),
         |f$k AS (SELECT start, cur AS prev, dst AS cur FROM s$k
         |  WHERE cum - wt <= ((cur % 1000003) * 2654435761 + $k * 40503) % tot
         |    AND ((cur % 1000003) * 2654435761 + $k * 40503) % tot < cum)""".stripMargin
    }.mkString(",\n")
    val union = (s"SELECT start, cur AS node, CAST(0 AS BIGINT) AS step FROM f0" +:
      (1 to graft.operators.GraphOps.RwSteps).map(k =>
        s"SELECT start, cur AS node, CAST($k AS BIGINT) AS step FROM f$k"))
      .mkString("\nUNION ALL ")
    s"""tri AS (SELECT src AS p, dst AS d FROM edges),
       |adjc AS (SELECT src, dst FROM (SELECT src, dst, row_number() OVER
       |  (PARTITION BY src ORDER BY ((dst % 1000003) * 2654435761 + src * 40503) % 1000000007, dst) AS hr
       |  FROM edges) WHERE hr <= $cap),
       |f0 AS (SELECT DISTINCT src AS start, CAST(-1 AS BIGINT) AS prev,
       |  src AS cur FROM edges),
       |$steps,
       |wu2 AS ($union)""".stripMargin
  }

  /** The skip-gram-pairs → exact-integer-PMI tail over any (start,
    * node, step) walk CTE chain — shared by `walk_pmi` (first-order
    * corpus, `wu`) and `node2vec_pmi` (second-order corpus, `wu2`). */
  private def pmiSqlOver(walkCtes: String, wu: String): String =
    s"""WITH $walkCtes,
       |${pmiCtesOver(wu)}
       |SELECT a, b, pair_count, cnt_a, cnt_b, pmi_ratio_e6 FROM pmif
       |ORDER BY a, b""".stripMargin

  /** The PMI body alone, ending at `pmif(a, b, pair_count, cnt_a,
    * cnt_b, pmi_ratio_e6)` — exposed so the agreement twin can rank the
    * panel instead of selecting it. */
  private def pmiCtesOver(wu: String): String = {
    // sg-prefixed names: the agreement twin splices this after the
    // IVF-PQ chain, whose own CTEs already claim `pc` etc.
    val w = graft.operators.GraphOps.RwWindow
    s"""sgp AS (SELECT least(x.node, y.node) AS a, greatest(x.node, y.node) AS b
       |  FROM $wu x JOIN $wu y ON x.start = y.start
       |  AND y.step > x.step AND y.step <= x.step + $w AND x.node <> y.node),
       |sgt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sgp),
       |sgc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS pair_count FROM sgp GROUP BY 1, 2),
       |sgn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c FROM
       |  (SELECT a AS node FROM sgp UNION ALL SELECT b FROM sgp) GROUP BY 1),
       |pmif AS (SELECT sgc.a, sgc.b, sgc.pair_count, ca.c AS cnt_a, cb.c AS cnt_b,
       |  (sgc.pair_count * sgt.n * 1000000) // (ca.c * cb.c) AS pmi_ratio_e6
       |FROM sgc CROSS JOIN sgt
       |JOIN sgn ca ON ca.node = sgc.a JOIN sgn cb ON cb.node = sgc.b)""".stripMargin
  }

  /** The link-prediction wedge-scoring tail over a `topk(src, nb)` CTE —
    * canonical edges, degrees, wedge counting with RA at the wedge,
    * Jaccard from endpoint degrees (integer divisions only). Shared by
    * `link_prediction` (brute cosine topk) and `link_prediction_indexed`
    * (the landed IVF-PQ index's ranked lists as topk). */
  private def lpScoreTail: String = {
    val mc = graft.operators.GraphOps.LpMinCommon
    s"""e AS (SELECT DISTINCT least(src,nb) AS u, greatest(src,nb) AS v FROM topk),
       |adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       |deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY a),
       |wedge AS (SELECT x.b AS u, y.b AS v, x.a AS z FROM adj x
       |  JOIN adj y ON x.a = y.a AND x.b < y.b),
       |cn AS (SELECT w.u, w.v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
       |  CAST(SUM(1000000 // d.d) AS BIGINT) AS ra_e6
       |  FROM wedge w JOIN deg d ON d.node = w.z GROUP BY w.u, w.v),
       |ne AS (SELECT cn.* FROM cn LEFT JOIN e ON cn.u = e.u AND cn.v = e.v
       |  WHERE e.u IS NULL)
       |SELECT ne.u, ne.v, common_neighbors, ra_e6,
       |  (common_neighbors * 1000000) // (du.d + dv.d - common_neighbors) AS jaccard_e6
       |FROM ne JOIN deg du ON du.node = ne.u JOIN deg dv ON dv.node = ne.v
       |WHERE common_neighbors >= $mc
       |ORDER BY u, v""".stripMargin
  }

  /** Same twin with the quantizer training restricted to `trainWhere`
    * rows — `ann_index_probe_admitted` probes the index whose artifacts
    * froze on the corpus slice while codes cover everyone. */
  private def annIvfPqSqlWhere(trainWhere: String): String = {
      val qm = graft.operators.SimilarityOps.QueryModulus
      s"""${annIvfPqCtes(trainWhere, s"e.vec_id % $qm = 0")}
         |SELECT q_id, n_id, adist, rnk FROM rk WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
  }

  /** Exact 3-gram Jaccard near-dup pairs twin — shared by the
    * standalone `dedup_ngram_jaccard` key and `dedup_report`'s
    * near-dup leg (wrapped as a subquery). The hot-shingle df cutoff
    * (kept CTE) mirrors DedupOps.MaxShingleDf. */
  private def ngramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
         |kept AS (SELECT shingle FROM sh0 GROUP BY shingle
         |         HAVING COUNT(*) <= ${graft.operators.DedupOps.MaxShingleDf}),
         |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
         |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id),
         |j AS (SELECT doc_a, doc_b, CAST(common AS DOUBLE)/(za.n_sh + zb.n_sh - common) AS jaccard
         |      FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin

  /** dedup_clusters twin — same exact-Jaccard pair pipeline as
    * dedup_ngram_jaccard, then a recursive reachability closure: a
    * node's label set is every node that reaches it over the undirected
    * pair graph; MIN(label) is the component minimum — exactly what
    * iterative min-label pointer jumping converges to. UNION (not UNION
    * ALL) dedups rows, so the recursion reaches the transitive-closure
    * fixpoint and stops. Shared by the standalone key and
    * dedup_survivors (wrapped as a subquery — DuckDB allows WITH
    * RECURSIVE inside a derived table). */
  private def dedupClustersSql: String =
    s"""WITH RECURSIVE
       |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
       |kept AS (SELECT shingle FROM sh0 GROUP BY shingle
       |         HAVING COUNT(*) <= ${graft.operators.DedupOps.MaxShingleDf}),
       |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
       |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |j AS (SELECT doc_a, doc_b
       |      FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id
       |      WHERE CAST(common AS DOUBLE)/(za.n_sh + zb.n_sh - common) >= 0.5),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM j
       |      UNION ALL SELECT doc_b, doc_a FROM j),
       |reach(id, label) AS (
       |  SELECT DISTINCT a, a FROM e
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.id),
       |lab AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id)
       |SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN lab USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** lexical_neighbors twin — distinct-token-set Jaccard as an exact e6
    * integer over df-capped posting lists (cap mirrors
    * DedupOps.MaxShingleDf; set sizes count KEPT tokens only, matching
    * the Spark side). Shared by the standalone key and
    * hybrid_retrieval's sparse leg (wrapped as a subquery). */
  private def lexicalNeighborsSql: String = lexicalNeighborsSqlWhere("TRUE")

  /** `keptWhere` restricts which docs VOTE on the kept-token vocabulary
    * (build-time df) — "TRUE" for the inline key; the corpus-slice
    * predicate for the frozen-vocab admitted index. Scoring always runs
    * over every doc. */
  /** The df-capped kept-token posting-list CTE chain (ltk → lkept → lsh
    * → lsz) — the lexical leg's corpus side, shared by the neighbor twin
    * and mmr_diversify's redundancy matrix. */
  private def lexicalBaseCtes(keptWhere: String): String =
    s"""ltk AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE length(tok) > 0),
       |lkept AS (SELECT tok FROM ltk WHERE $keptWhere GROUP BY tok
       |  HAVING COUNT(*) <= ${graft.operators.DedupOps.MaxShingleDf}),
       |lsh AS (SELECT ltk.doc_id, ltk.tok FROM ltk JOIN lkept USING (tok)),
       |lsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM lsh GROUP BY doc_id)""".stripMargin

  private def lexicalNeighborsSqlWhere(keptWhere: String): String = {
    val qm = graft.operators.SimilarityOps.QueryModulus
    val scale = graft.operators.RetrievalOps.RrfScale
    s"""WITH ${lexicalBaseCtes(keptWhere)},
       |lpr AS (SELECT a.doc_id AS q_id, b.doc_id AS n_id, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM lsh a JOIN lsh b ON a.tok = b.tok AND a.doc_id % $qm = 0
       |    AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |lj AS (SELECT q_id, n_id, common,
       |  CAST((common * $scale) // (za.n_tok + zb.n_tok - common) AS BIGINT) AS j_e6
       |  FROM lpr JOIN lsz za ON q_id = za.doc_id JOIN lsz zb ON n_id = zb.doc_id),
       |lrk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY j_e6 DESC, n_id) AS BIGINT) AS rnk FROM lj)
       |SELECT q_id, n_id, common, j_e6, rnk FROM lrk WHERE rnk <= ${graft.operators.RetrievalOps.PoolK}
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** doc_neighbors twin — long-form hashed-feature vectors (absent dims
    * are implicit 0, so the dim-join dot product is exact); pairs with
    * NO shared dim get dot 0 via the LEFT JOIN + coalesce — they still
    * rank. Shared by the standalone key and hybrid_retrieval's dense
    * leg (wrapped as a subquery). */
  /** The documents→hashed-integer-vector CTE chain ending in `f`
    * (doc_id, dim, fv — long form, absent dims implicit 0) and `nrm`
    * (doc_id, n2) — shared by the brute and LSH dense-leg twins. */
  private def docVecCtes: String = {
    val dims = graft.operators.TextOps.EmbedDims
    s"""t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |tok AS (SELECT doc_id, i, w[i] AS tok
       |  FROM t0, UNNEST(generate_series(1, len(w))) AS u(i)),
       |src AS (SELECT doc_id, i, ${xxUtf8Bytes("tok")} AS bs FROM tok),
       |${xxStringCtes("src", Seq("doc_id", "i"))},
       |v AS (SELECT doc_id, CAST(xh % $dims AS BIGINT) AS dim,
       |  CASE WHEN (xh // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg FROM xh),
       |f AS (SELECT doc_id, dim, CAST(SUM(sg) AS BIGINT) AS fv FROM v GROUP BY 1, 2),
       |nrm AS (SELECT doc_id, CAST(SUM(fv*fv) AS BIGINT) AS n2 FROM f GROUP BY 1)""".stripMargin
  }

  /** TextOps.docLshBucket's bit-exact SQL twin over the LONG-FORM vector
    * frame `f`: one GROUP BY doc_id computing every plane's exact integer
    * dot (absent dims contribute 0 on both engines) — bit p set iff
    * strictly positive, the same seeded ±1 planes inlined as literals. */
  private def docLshBucketExpr: String =
    graft.operators.TextOps.docPlaneWeights.zipWithIndex.map { case (w, p) =>
      val lst = w.mkString("[", ",", "]")
      s"(CASE WHEN SUM(fv * ($lst)[dim+1]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def docProbeMasks: String =
    graft.operators.SimilarityOps
      .probeMasks(2, graft.operators.TextOps.DocPlanes)
      .mkString("[", ",", "]")

  private def docNeighborsSql: String = {
    val qm = graft.operators.SimilarityOps.QueryModulus
    s"""WITH $docVecCtes,
       |pr AS (SELECT na.doc_id AS q_id, nb.doc_id AS n_id, na.n2 AS qn, nb.n2 AS nn
       |  FROM nrm na JOIN nrm nb ON na.doc_id <> nb.doc_id
       |  WHERE na.doc_id % $qm = 0 AND na.n2 > 0 AND nb.n2 > 0),
       |dt AS (SELECT a.doc_id AS q_id, b.doc_id AS n_id, CAST(SUM(a.fv*b.fv) AS BIGINT) AS dt
       |  FROM f a JOIN f b ON a.dim = b.dim AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % $qm = 0 GROUP BY 1, 2),
       |sc AS (SELECT pr.q_id, pr.n_id,
       |  CAST(COALESCE(dt.dt, 0) AS DOUBLE)/(sqrt(CAST(pr.qn AS DOUBLE))*sqrt(CAST(pr.nn AS DOUBLE))) AS cos_sim
       |  FROM pr LEFT JOIN dt ON dt.q_id = pr.q_id AND dt.n_id = pr.n_id),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, n_id, cos_sim, rnk FROM rk WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** doc_neighbors_lsh twin — the dedup_embedding_lsh pattern applied to
    * the long-form hashed doc vectors: bucket per doc (literal ±1
    * planes, exact integer dots), multi-probe masks on the query side
    * (each candidate pair meets exactly once — a corpus doc has ONE
    * bucket and a query's probed buckets are distinct), exact cosine +
    * rank on candidates only. Shared by the standalone key and the
    * fused/landed retrieval twins (wrapped as a subquery). */
  private def docNeighborsLshSql: String = {
    val qm = graft.operators.SimilarityOps.QueryModulus
    s"""WITH $docVecCtes,
       |bk AS (SELECT doc_id, $docLshBucketExpr AS bucket FROM f GROUP BY doc_id),
       |bkn AS (SELECT bk.doc_id, bk.bucket FROM bk JOIN nrm USING (doc_id) WHERE nrm.n2 > 0),
       |pm AS (SELECT doc_id AS q_id, unnest(list_transform($docProbeMasks, m -> xor(bucket, m))) AS bucket
       |  FROM bkn WHERE doc_id % $qm = 0),
       |cnd AS (SELECT pm.q_id, b.doc_id AS n_id FROM pm JOIN bkn b
       |  ON b.bucket = pm.bucket AND b.doc_id <> pm.q_id),
       |pr AS (SELECT cnd.q_id, cnd.n_id, qa.n2 AS qn, nb.n2 AS nn
       |  FROM cnd JOIN nrm qa ON cnd.q_id = qa.doc_id JOIN nrm nb ON cnd.n_id = nb.doc_id),
       |dt AS (SELECT a.doc_id AS q_id, b.doc_id AS n_id, CAST(SUM(a.fv*b.fv) AS BIGINT) AS dt
       |  FROM f a JOIN f b ON a.dim = b.dim AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % $qm = 0 GROUP BY 1, 2),
       |sc AS (SELECT pr.q_id, pr.n_id,
       |  CAST(COALESCE(dt.dt, 0) AS DOUBLE)/(sqrt(CAST(pr.qn AS DOUBLE))*sqrt(CAST(pr.nn AS DOUBLE))) AS cos_sim
       |  FROM pr LEFT JOIN dt ON dt.q_id = pr.q_id AND dt.n_id = pr.n_id),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, n_id, cos_sim, rnk FROM rk WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Scored cross-doc chunk pairs (CTE chain ending in `sc`): long-form
    * chunk vectors (absent dims implicit 0 — the dim-join dot is exact),
    * LEFT JOIN + coalesce as in doc_neighbors, keyed by (doc, chunk),
    * same-doc chunks excluded, zero-norm chunks excluded. Shared by
    * chunk_neighbors (rank tail) and maxsim_retrieval (max/sum tail). */
  private def chunkScoredCtes: String = {
    val qm = graft.operators.SimilarityOps.QueryModulus
    s"""$chunkHashCtes,
       |f AS (SELECT doc_id, chunk_id, dim, CAST(SUM(sg) AS BIGINT) AS fv
       |  FROM v GROUP BY 1, 2, 3),
       |nrm AS (SELECT doc_id, chunk_id, CAST(SUM(fv*fv) AS BIGINT) AS n2
       |  FROM f GROUP BY 1, 2),
       |pr AS (SELECT qa.doc_id AS q_doc, qa.chunk_id AS q_chunk,
       |    nb.doc_id AS n_doc, nb.chunk_id AS n_chunk, qa.n2 AS qn, nb.n2 AS nn
       |  FROM nrm qa JOIN nrm nb ON qa.doc_id <> nb.doc_id
       |  WHERE qa.doc_id % $qm = 0 AND qa.n2 > 0 AND nb.n2 > 0),
       |dt AS (SELECT a.doc_id AS q_doc, a.chunk_id AS q_chunk,
       |    b.doc_id AS n_doc, b.chunk_id AS n_chunk,
       |    CAST(SUM(a.fv*b.fv) AS BIGINT) AS dt
       |  FROM f a JOIN f b ON a.dim = b.dim AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % $qm = 0 GROUP BY 1, 2, 3, 4),
       |sc AS (SELECT pr.q_doc, pr.q_chunk, pr.n_doc, pr.n_chunk,
       |  CAST(COALESCE(dt.dt, 0) AS DOUBLE)/(sqrt(CAST(pr.qn AS DOUBLE))*sqrt(CAST(pr.nn AS DOUBLE))) AS cos_sim
       |  FROM pr LEFT JOIN dt ON dt.q_doc = pr.q_doc AND dt.q_chunk = pr.q_chunk
       |    AND dt.n_doc = pr.n_doc AND dt.n_chunk = pr.n_chunk)""".stripMargin
  }

  /** The BUCKETED twin of [[chunkScoredCtes]] (ends in the same-shaped
    * `sc`, restricted to multi-probe LSH bucket collisions) — shared by
    * chunk_neighbors_lsh and maxsim_retrieval_lsh. */
  private def chunkLshScoredCtes: String = {
    val qm = graft.operators.SimilarityOps.QueryModulus
    s"""$chunkHashCtes,
       |f AS (SELECT doc_id, chunk_id, dim, CAST(SUM(sg) AS BIGINT) AS fv
       |  FROM v GROUP BY 1, 2, 3),
       |nrm AS (SELECT doc_id, chunk_id, CAST(SUM(fv*fv) AS BIGINT) AS n2
       |  FROM f GROUP BY 1, 2),
       |bk AS (SELECT doc_id, chunk_id, $docLshBucketExpr AS bucket
       |  FROM f GROUP BY doc_id, chunk_id),
       |bkn AS (SELECT bk.doc_id, bk.chunk_id, bk.bucket FROM bk
       |  JOIN nrm USING (doc_id, chunk_id) WHERE nrm.n2 > 0),
       |pm AS (SELECT doc_id AS q_doc, chunk_id AS q_chunk,
       |  unnest(list_transform($docProbeMasks, m -> xor(bucket, m))) AS bucket
       |  FROM bkn WHERE doc_id % $qm = 0),
       |cnd AS (SELECT pm.q_doc, pm.q_chunk, b.doc_id AS n_doc, b.chunk_id AS n_chunk
       |  FROM pm JOIN bkn b ON b.bucket = pm.bucket AND b.doc_id <> pm.q_doc),
       |pr AS (SELECT cnd.q_doc, cnd.q_chunk, cnd.n_doc, cnd.n_chunk, qa.n2 AS qn, nb.n2 AS nn
       |  FROM cnd JOIN nrm qa ON cnd.q_doc = qa.doc_id AND cnd.q_chunk = qa.chunk_id
       |  JOIN nrm nb ON cnd.n_doc = nb.doc_id AND cnd.n_chunk = nb.chunk_id),
       |dt AS (SELECT a.doc_id AS q_doc, a.chunk_id AS q_chunk,
       |    b.doc_id AS n_doc, b.chunk_id AS n_chunk,
       |    CAST(SUM(a.fv*b.fv) AS BIGINT) AS dt
       |  FROM f a JOIN f b ON a.dim = b.dim AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % $qm = 0 GROUP BY 1, 2, 3, 4),
       |sc AS (SELECT pr.q_doc, pr.q_chunk, pr.n_doc, pr.n_chunk,
       |  CAST(COALESCE(dt.dt, 0) AS DOUBLE)/(sqrt(CAST(pr.qn AS DOUBLE))*sqrt(CAST(pr.nn AS DOUBLE))) AS cos_sim
       |  FROM pr LEFT JOIN dt ON dt.q_doc = pr.q_doc AND dt.q_chunk = pr.q_chunk
       |    AND dt.n_doc = pr.n_doc AND dt.n_chunk = pr.n_chunk)""".stripMargin
  }

  /** chunk_neighbors_lsh twin — the same bucket/probe chain at chunk
    * grain over the shared chunkHashCtes vectors; same-doc chunks
    * excluded at the candidate join exactly as in Spark. */
  private def chunkNeighborsLshSql: String =
    s"""WITH $chunkLshScoredCtes,
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_doc, q_chunk
       |  ORDER BY cos_sim DESC, n_doc, n_chunk) AS BIGINT) AS rnk FROM sc)
       |SELECT q_doc, q_chunk, n_doc, n_chunk, cos_sim, rnk FROM rk WHERE rnk <= 5
       |ORDER BY q_doc, q_chunk, rnk""".stripMargin

  /** The MaxSim (late-interaction) reduction over a scored chunk-pair
    * chain: floor each pair cosine to an e6 long, MAX per (query chunk,
    * candidate doc), SUM per (query doc, candidate doc), rank top-5 —
    * RetrievalOps.maxsimRank's twin, shared by both maxsim keys. */
  private def maxsimTail(scoredCtes: String): String =
    s"""WITH $scoredCtes,
       |mx AS (SELECT q_doc, q_chunk, n_doc,
       |    MAX(CAST(FLOOR(cos_sim*1000000.0+0.5) AS BIGINT)) AS best_e6
       |  FROM sc GROUP BY 1, 2, 3),
       |sm AS (SELECT q_doc, n_doc, CAST(SUM(best_e6) AS BIGINT) AS maxsim_e6,
       |    CAST(COUNT(*) AS BIGINT) AS n_q_chunks
       |  FROM mx GROUP BY 1, 2),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_doc
       |  ORDER BY maxsim_e6 DESC, n_doc) AS BIGINT) AS rnk FROM sm)
       |SELECT q_doc, n_doc, maxsim_e6, n_q_chunks, rnk FROM rk WHERE rnk <= 5
       |ORDER BY q_doc, rnk""".stripMargin

  /** hybrid_retrieval twin — ALSO retrieval_index_probe's oracle: the
    * landed-index probe runs the same leg + fusion cores over the same
    * corpus, so the two keys share this string verbatim (the
    * ann_index_probe convention). */
  private def hybridRetrievalSql: String = hybridRetrievalSqlWhere("TRUE")

  private def hybridRetrievalSqlWhere(keptWhere: String): String = {
      // each leg wraps its standalone key's twin as a subquery, so the
      // fusion is definitionally pinned to those keys; RRF terms are e6
      // integers via `//` (≡ Spark's `div` for positive operands)
      val k0 = graft.operators.RetrievalOps.RrfK0
      val scale = graft.operators.RetrievalOps.RrfScale
      val k = graft.operators.RetrievalOps.PoolK
      // dense leg = the BUCKETED doc_neighbors_lsh twin (round 10: the
      // fused keys ride the scale-shaped leg, pinned to that key's SQL)
      s"""WITH sem AS (SELECT q_id, n_id, rnk AS sem_rnk FROM ($docNeighborsLshSql)),
         |lex AS (SELECT q_id, n_id, rnk AS lex_rnk FROM (${lexicalNeighborsSqlWhere(keptWhere)})),
         |f AS (SELECT COALESCE(sem.q_id, lex.q_id) AS q_id,
         |  COALESCE(sem.n_id, lex.n_id) AS n_id,
         |  CAST(COALESCE(sem_rnk, 0) AS BIGINT) AS sem_rnk,
         |  CAST(COALESCE(lex_rnk, 0) AS BIGINT) AS lex_rnk
         |  FROM sem FULL OUTER JOIN lex ON sem.q_id = lex.q_id AND sem.n_id = lex.n_id),
         |r AS (SELECT *, CAST(
         |  (CASE WHEN sem_rnk > 0 THEN $scale // ($k0 + sem_rnk) ELSE 0 END)
         |  + (CASE WHEN lex_rnk > 0 THEN $scale // ($k0 + lex_rnk) ELSE 0 END)
         |  AS BIGINT) AS rrf_e6 FROM f),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_e6 DESC, n_id) AS BIGINT) AS rnk FROM r)
         |SELECT q_id, n_id, rrf_e6, sem_rnk, lex_rnk, rnk FROM rk WHERE rnk <= $k
         |ORDER BY q_id, rnk""".stripMargin
  }

  /** zorder_geometry twin — the z-layout MATH mirrored bit-for-bit:
    * min-max normalize each dimension into [0, 2^bits) (the one double
    * division, identical association both sides), interleave bits into
    * the Morton z-value (pure integer shifts), assign files by exact
    * z-rank octile (ntile over the totally-ordered (z, event_id)), and
    * box each octile. The WRITE key (`zorder_layout`) stays rows-only
    * because RangePartitioner's sampled boundaries are the one
    * non-ANSI-reproducible step — this twin hash-checks every
    * deterministic stage of the same pipeline. */
  private def zorderGeometrySql: String = {
    val bits = graft.operators.LayoutOps.ZBits
    val maxCell = (1L << bits) - 1
    def norm(c: String, mn: String, mx: String) =
      s"""(CASE WHEN $mx - $mn <= 0 THEN CAST(0 AS BIGINT)
         |  ELSE LEAST(CAST(floor((CAST($c - $mn AS DOUBLE) / CAST($mx - $mn AS DOUBLE)) * $maxCell) AS BIGINT), $maxCell) END)""".stripMargin
    val zterms = (0 until bits).flatMap(b => Seq(
      s"(((nu >> $b) & 1) << ${b * 2})",
      s"(((nt >> $b) & 1) << ${b * 2 + 1})")).mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us FROM events),
       |agg AS (SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
       |  MIN(us) AS mnt, MAX(us) AS mxt FROM e),
       |n AS (SELECT event_id, user_id, us,
       |  ${norm("user_id", "mnu", "mxu")} AS nu,
       |  ${norm("us", "mnt", "mxt")} AS nt FROM e, agg),
       |z AS (SELECT event_id, user_id, us, CAST($zterms AS BIGINT) AS zv FROM n),
       |t AS (SELECT *, CAST(ntile(8) OVER (ORDER BY zv, event_id) AS BIGINT) AS octile FROM z)
       |SELECT octile, CAST(COUNT(*) AS BIGINT) AS rows,
       |  MIN(user_id) AS mn_user_id, MAX(user_id) AS mx_user_id,
       |  MIN(us) AS mn_us, MAX(us) AS mx_us
       |FROM t GROUP BY octile ORDER BY octile""".stripMargin
  }

  /** hybrid_retrieval_ivf twin — the hybrid fusion with the DENSE leg
    * swapped to the doc_neighbors_ivf twin (each leg wraps its
    * standalone key's SQL as a subquery, so the fused behavior is
    * pinned to those keys' definitions leg by leg). */
  private def hybridRetrievalIvfSql: String = {
    val k0 = graft.operators.RetrievalOps.RrfK0
    val scale = graft.operators.RetrievalOps.RrfScale
    val k = graft.operators.RetrievalOps.PoolK
    s"""WITH sem AS (SELECT q_id, n_id, rnk AS sem_rnk FROM ($docNeighborsIvfSql)),
       |lex AS (SELECT q_id, n_id, rnk AS lex_rnk FROM ($lexicalNeighborsSql)),
       |f AS (SELECT COALESCE(sem.q_id, lex.q_id) AS q_id,
       |  COALESCE(sem.n_id, lex.n_id) AS n_id,
       |  CAST(COALESCE(sem_rnk, 0) AS BIGINT) AS sem_rnk,
       |  CAST(COALESCE(lex_rnk, 0) AS BIGINT) AS lex_rnk
       |  FROM sem FULL OUTER JOIN lex ON sem.q_id = lex.q_id AND sem.n_id = lex.n_id),
       |r AS (SELECT *, CAST(
       |  (CASE WHEN sem_rnk > 0 THEN $scale // ($k0 + sem_rnk) ELSE 0 END)
       |  + (CASE WHEN lex_rnk > 0 THEN $scale // ($k0 + lex_rnk) ELSE 0 END)
       |  AS BIGINT) AS rrf_e6 FROM f),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_e6 DESC, n_id) AS BIGINT) AS rnk FROM r)
       |SELECT q_id, n_id, rrf_e6, sem_rnk, lex_rnk, rnk FROM rk WHERE rnk <= $k
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** mmr_diversify twin — the hybrid pool wrapped as a subquery (pinning
    * the pool to that key's definition), the kept-token Jaccard
    * redundancy matrix from the shared lexical CTE chain, and the greedy
    * selection UNROLLED MmrK rounds (the BPE/kmeans convention): each
    * round anti-joins the already-selected set, folds MAX(sim) per
    * remaining candidate, and picks one row per query by
    * (mmr_w DESC, n_id). All-integer scoring — no doubles anywhere. */
  private def mmrDiversifySql: String = {
    import graft.operators.RetrievalOps.{MmrK, MmrLam, MmrLamC, PoolK, RrfScale}
    val relUnit = RrfScale / PoolK
    def round(t: Int): String = {
      val prevSel = (1 until t).map(i => s"SELECT q_id, n_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""sel$t AS ($prevSel),
         |r$t AS (SELECT p.* FROM p WHERE NOT EXISTS
         |  (SELECT 1 FROM sel$t z WHERE z.q_id = p.q_id AND z.n_id = p.n_id)),
         |m$t AS (SELECT ps.q_id, ps.n_id, MAX(ps.sim_e6) AS ms FROM psim ps
         |  JOIN sel$t z ON ps.q_id = z.q_id AND ps.m_id = z.n_id GROUP BY 1, 2),
         |sc$t AS (SELECT r$t.q_id, r$t.n_id, r$t.rel_e6,
         |  CAST(COALESCE(m$t.ms, 0) AS BIGINT) AS maxsim_e6,
         |  CAST($MmrLam*r$t.rel_e6 - $MmrLamC*COALESCE(m$t.ms, 0) AS BIGINT) AS mmr_w
         |  FROM r$t LEFT JOIN m$t ON r$t.q_id = m$t.q_id AND r$t.n_id = m$t.n_id),
         |s$t AS (SELECT q_id, n_id, rel_e6, maxsim_e6, mmr_w, CAST($t AS BIGINT) AS rnk
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY mmr_w DESC, n_id) AS rk
         |        FROM sc$t) WHERE rk = 1)""".stripMargin
    }
    val rounds = (2 to MmrK).map(round).mkString(",\n")
    val unionAll = (1 to MmrK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH pool AS (SELECT q_id, n_id, rnk FROM ($hybridRetrievalSql)),
       |p AS (SELECT q_id, n_id, CAST(($PoolK + 1 - rnk) * $relUnit AS BIGINT) AS rel_e6 FROM pool),
       |${lexicalBaseCtes("TRUE")},
       |cand AS (SELECT DISTINCT n_id AS doc_id FROM p),
       |shc AS (SELECT lsh.doc_id, lsh.tok FROM lsh JOIN cand USING (doc_id)),
       |cm AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM shc a JOIN shc b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |sab AS (SELECT a_id, b_id,
       |  CAST((common * $RrfScale) // (za.n_tok + zb.n_tok - common) AS BIGINT) AS sim_e6
       |  FROM cm JOIN lsz za ON a_id = za.doc_id JOIN lsz zb ON b_id = zb.doc_id),
       |sim AS (SELECT a_id AS n_id, b_id AS m_id, sim_e6 FROM sab
       |  UNION ALL SELECT b_id, a_id, sim_e6 FROM sab),
       |psim AS (SELECT x.q_id, x.n_id, y.n_id AS m_id, COALESCE(s.sim_e6, 0) AS sim_e6
       |  FROM p x JOIN p y ON x.q_id = y.q_id AND x.n_id <> y.n_id
       |  LEFT JOIN sim s ON s.n_id = x.n_id AND s.m_id = y.n_id),
       |s1 AS (SELECT q_id, n_id, rel_e6, CAST(0 AS BIGINT) AS maxsim_e6,
       |  CAST($MmrLam*rel_e6 AS BIGINT) AS mmr_w, CAST(1 AS BIGINT) AS rnk
       |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY $MmrLam*rel_e6 DESC, n_id) AS rk
       |        FROM p) WHERE rk = 1),
       |$rounds
       |SELECT q_id, n_id, rel_e6, maxsim_e6, mmr_w, rnk FROM ($unionAll)
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** The documents→dense-hashed-doc-vector CTE chain ending in `docv`
    * (vec_id, v — a dims-long integer list, nrm; zero-norm docs excluded)
    * — the docEmbedVectors twin, shared by `semantic_dedup_text` and
    * `doc_neighbors_ivf`. */
  private def docDenseVecCtes: String = {
    val dims = graft.operators.TextOps.EmbedDims
    s"""t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |tok AS (SELECT doc_id, i, w[i] AS tok
       |  FROM t0, UNNEST(generate_series(1, len(w))) AS u(i)),
       |src AS (SELECT doc_id, i, ${xxUtf8Bytes("tok")} AS bs FROM tok),
       |${xxStringCtes("src", Seq("doc_id", "i"))},
       |hv AS (SELECT doc_id, CAST(xh % $dims AS BIGINT) AS dim,
       |  CASE WHEN (xh // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg FROM xh),
       |f AS (SELECT doc_id, dim, CAST(SUM(sg) AS BIGINT) AS fv FROM hv GROUP BY 1, 2),
       |dense AS (SELECT d.doc_id, gs.i AS dim, COALESCE(f.fv, 0) AS fv
       |  FROM (SELECT DISTINCT doc_id FROM f) d
       |  CROSS JOIN generate_series(0, ${dims - 1}) gs(i)
       |  LEFT JOIN f ON f.doc_id = d.doc_id AND f.dim = gs.i),
       |docv AS (SELECT CAST(doc_id AS BIGINT) AS vec_id,
       |  list(fv ORDER BY dim) AS v, CAST(SUM(fv*fv) AS BIGINT) AS nrm
       |  FROM dense GROUP BY doc_id HAVING SUM(fv*fv) > 0)""".stripMargin
  }

  /** doc_neighbors_ivf twin — the ann_ivf pattern over the derived doc
    * vectors: unrolled exact-integer kmeans (docv via eOverride, the
    * semantic_dedup_text convention), probe choice by exact integer L2
    * with the (distance, cell) tie-break, exact integer-cosine ranking
    * inside probed cells only. */
  private def docNeighborsIvfSql: String = {
    import graft.operators.TextOps.{DocIvfCells, DocIvfNprobe, DocIvfRounds}
    val dims = graft.operators.TextOps.EmbedDims
    val qm = graft.operators.SimilarityOps.QueryModulus
    val km = kmeansCtes(DocIvfCells, DocIvfRounds, "TRUE", 1, dims, "dv",
      eOverride = "SELECT vec_id, v FROM docv")
    s"""WITH $docDenseVecCtes,
       |$km,
       |pc AS (SELECT e.vec_id AS q_id, p.cluster AS cell, ${kmDist("e.v", "p.c", dims)} AS cd
       |  FROM dve e CROSS JOIN dvc$DocIvfRounds p WHERE e.vec_id % $qm = 0),
       |probed AS (SELECT q_id, cell FROM (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY cd, cell) AS rn FROM pc) WHERE rn <= $DocIvfNprobe),
       |cand AS (SELECT p.q_id, a.vec_id AS n_id FROM probed p
       |  JOIN dvaf a ON a.cluster = p.cell AND a.vec_id <> p.q_id),
       |sc AS (SELECT c.q_id, c.n_id,
       |  CAST(list_sum(list_transform(generate_series(1,$dims), i -> qd.v[i]*nd.v[i])) AS DOUBLE)
       |    /(sqrt(CAST(qd.nrm AS DOUBLE))*sqrt(CAST(nd.nrm AS DOUBLE))) AS cos_sim
       |  FROM cand c JOIN docv qd ON qd.vec_id = c.q_id JOIN docv nd ON nd.vec_id = c.n_id),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, n_id, cos_sim, rnk FROM rk WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** The documents→hashed-vectors→SemDeDup composed twin — shared by the
    * standalone `semantic_dedup_text` key and `dedup_report`'s semantic
    * leg (wrapped as a subquery). */
  private def semanticDedupTextSql: String = {
      // documents → hashed vectors (the doc_embed XXH64 twin, densified
      // to 16-long lists) → unrolled kmeans over the RAW integer vectors
      // (eOverride: no e6 scaling — counts are already integers) →
      // within-cluster integer-cosine verdicts
      import graft.operators.ClusterOps.{KmeansK, KmeansRounds, SemThreshold}
      val dims = graft.operators.TextOps.EmbedDims
      val km = kmeansCtes(KmeansK, KmeansRounds, "TRUE", 1, dims, "",
        eOverride = "SELECT vec_id, v FROM docv")
      s"""WITH $docDenseVecCtes,
         |$km,
         |x AS (SELECT af.vec_id, af.cluster, d.v, d.nrm FROM af JOIN docv d USING (vec_id)),
         |dup AS (SELECT b.vec_id, MIN(y.vec_id) AS dup_of FROM x b JOIN x y
         |  ON b.cluster = y.cluster AND y.vec_id < b.vec_id
         |  AND CAST(list_sum(list_transform(generate_series(1,$dims), i -> b.v[i]*y.v[i])) AS DOUBLE)
         |    /(sqrt(CAST(b.nrm AS DOUBLE))*sqrt(CAST(y.nrm AS DOUBLE))) >= $SemThreshold
         |  GROUP BY 1)
         |SELECT x.vec_id AS doc_id, x.cluster, dup.dup_of,
         |  dup.dup_of IS NULL AS keep
         |FROM x LEFT JOIN dup USING (vec_id) ORDER BY doc_id""".stripMargin
  }

  private def stopList(lang: String): String =
    graft.operators.TextOps.Stopwords(lang).map(w => s"'$w'").mkString("[", ",", "]")

  private def stopHits(lang: String): String =
    s"CAST(len(list_filter(string_split(text,' '), x -> list_contains(${stopList(lang)}, x))) AS BIGINT)"

  /** Shared calendar-densification CTE chain (gap_fill and the rolling
    * window composed on it): `filled` = dense (priority, day) spine with
    * zero-filled measures. */
  private val gapFillCtes =
    s"""daily AS (SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
       |        CAST(COUNT(*) AS BIGINT) AS n_orders, ${sumE2("o_totalprice")} AS revenue
       |      FROM orders GROUP BY 1, 2),
       |span AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS d0, CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders),
       |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d FROM span),
       |spine AS (SELECT priority, d FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) CROSS JOIN days),
       |filled AS (SELECT priority, CAST(d AS TIMESTAMP) AS day,
       |    COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
       |    COALESCE(revenue, 0.0) AS revenue
       |  FROM spine LEFT JOIN daily USING (priority, d))""".stripMargin

  /** Brute-force-ranked nearest as-of, shared by the window-algorithm
    * query (asof_nearest) and the native-exec twin (asof_nearest_native):
    * the (|Δt|, p_us, p_event) argmin spelled as a row_number over the
    * full click × same-user-purchase join. */
  private val asofNearestSql =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |c AS (SELECT event_id, user_id, us FROM e WHERE event_type='click'),
      |p AS (SELECT event_id AS p_event, user_id, us AS p_us FROM e WHERE event_type='purchase'),
      |j AS (SELECT c.event_id, c.user_id, c.us, p.p_event, p.p_us,
      |  abs(c.us - p.p_us) AS delta_us,
      |  row_number() OVER (PARTITION BY c.event_id
      |    ORDER BY abs(c.us - p.p_us), p.p_us, p.p_event) AS r
      |FROM c JOIN p USING (user_id))
      |SELECT event_id, user_id, us, p_event, p_us, delta_us,
      |  CASE WHEN p_us <= us THEN 'past' ELSE 'future' END AS direction
      |FROM j WHERE r = 1 ORDER BY event_id""".stripMargin

  // ---------- the map ----------

  val all: Map[String, String] = Map(

    "price_parse" ->
      s"""WITH ${factCte(false)}
         |SELECT l_orderkey, l_linenumber, price_str, usd_price
         |FROM fact ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "currency_convert" ->
      s"""WITH ${factCte(false)}
         |SELECT l_orderkey, l_linenumber, n_name,
         |  CAST(ct AS DOUBLE)/100.0 AS local_price,
         |  CAST(ct AS DOUBLE)/100.0/rate AS usd_direct
         |FROM fact ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "country_avg" ->
      s"""WITH ${factCte(false)},
         |cstats AS (SELECT cc, $avgE6 AS avg_usd FROM fact GROUP BY cc)
         |SELECT cc, avg_usd FROM cstats ORDER BY cc""".stripMargin,

    "world_avg_dev" ->
      s"""WITH ${factCte(false)},
         |$statsCtes
         |SELECT cc, avg_usd, perc_dif, usd_dif FROM dev ORDER BY cc""".stripMargin,

    "code_normalize" ->
      s"""WITH rates AS ($rates)
         |SELECT n_nationkey, cc AS cc_raw, $normExpr AS cc_norm
         |FROM rates ORDER BY n_nationkey""".stripMargin,

    "iso_join" ->
      s"""WITH ${factCte(false)},
         |$statsCtes,
         |$isoCte
         |SELECT alpha2, iso_a3 AS alpha3, avg_usd
         |FROM (SELECT dev.*, $normExpr AS alpha2 FROM dev) d
         |LEFT JOIN iso ON d.alpha2=iso.iso_a2
         |ORDER BY alpha2""".stripMargin,

    "geo_enrich_join" ->
      s"""WITH ${factCte(false)},
         |$statsCtes,
         |$worldCtes
         |SELECT alpha2, continent, avg_usd FROM world ORDER BY alpha2""".stripMargin,

    "eu_propagate" ->
      s"""WITH ${factCte(false)},
         |$statsCtes,
         |$worldCtes
         |SELECT alpha2, continent, $euPropExpr AS usd_dif_prop
         |FROM world ORDER BY alpha2""".stripMargin,

    "world_map_features" -> {
      // the boundary dim is deterministic in-code Scala, so its parsed
      // rings inline as a VALUES literal (the seeded-planes convention)
      // and the geometry panel hash-checks end to end: the twin pins the
      // Spark-side struct plumbing (flatten / array_min folds over the
      // MultiPolygon nesting, the broadcast boundary join, has_data from
      // the stats left-join) against straight Scala folds over the same
      // parsed rows; ring parsing itself is WorldBoundariesSpec's job
      val vals = graft.sources.WorldBoundaries.rows.map { r =>
        val pts = r.coordinates.flatten.flatten
        val lons = pts.map(_.head); val lats = pts.map(_(1))
        s"('${r.alpha3}', CAST(${r.coordinates.size} AS BIGINT), " +
          s"CAST(${pts.size} AS BIGINT), CAST(${lons.min} AS DOUBLE), " +
          s"CAST(${lons.max} AS DOUBLE), CAST(${lats.min} AS DOUBLE), " +
          s"CAST(${lats.max} AS DOUBLE))"
      }.mkString(",\n|  ")
      s"""WITH ${factCte(false)},
         |$statsCtes,
         |$worldCtes,
         |bounds(alpha3, n_polygons, n_vertices, lon_min, lon_max, lat_min, lat_max) AS (VALUES
         |  $vals)
         |SELECT w.alpha3, w.continent, b.n_polygons, b.n_vertices,
         |  b.lon_min, b.lon_max, b.lat_min, b.lat_max,
         |  (w.perc_dif IS NOT NULL) AS has_data
         |FROM world w JOIN bounds b USING (alpha3)
         |ORDER BY alpha3""".stripMargin
    },

    "latest_partition" ->
      """WITH m AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events)
        |SELECT event_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date, event_type, value
        |FROM events, m WHERE CAST(ts AS DATE) = maxd ORDER BY event_id""".stripMargin,

    "json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k_val,
        |  TRY_CAST(regexp_extract(props, '"missing": *([0-9]+)', 1) AS BIGINT) AS missing_val,
        |  TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "null_handling" ->
      s"""WITH ${factCte(true)}
         |SELECT cc, COUNT(*) AS n_total, COUNT(usd_price) AS n_parsed,
         |  CAST(SUM(CASE WHEN usd_price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  $avgE6 AS avg_usd
         |FROM fact GROUP BY cc ORDER BY cc""".stripMargin,

    "steam_pipeline" ->
      s"""WITH ${factCte(true)},
         |$statsCtes,
         |$worldCtes
         |SELECT alpha2, alpha3, continent, avg_usd, perc_dif, $euPropExpr AS usd_dif
         |FROM world ORDER BY alpha2""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumE2("l_quantity")} AS sum_qty,
         |  ${sumE2("l_extendedprice")} AS sum_base_price,
         |  ${sumE2("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |  ${avgE2("l_quantity")} AS avg_qty,
         |  ${avgE2("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q17_small_qty" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(FLOOR(l_extendedprice*100.0+0.5) AS BIGINT) AS price_c FROM lineitem),
        |pp AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_q,
        |  COUNT(*) AS n_q FROM li GROUP BY 1)
        |SELECT p_brand, CAST(SUM(price_c) AS DOUBLE)/100.0/7.0 AS avg_yearly
        |FROM li JOIN pp USING (l_partkey) JOIN part ON p_partkey = l_partkey
        |WHERE qty * n_q * 5 < sum_q
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q3_join_agg" ->
      s"""SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
         |  ${sumE2("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN customer ON o_custkey=c_custkey
         |WHERE c_mktsegment='BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)
         |ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      s"""SELECT n_name, ${sumE2("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN supplier ON l_suppkey=s_suppkey
         |JOIN customer ON o_custkey=c_custkey AND c_nationkey=s_nationkey
         |JOIN nation ON s_nationkey=n_nationkey
         |JOIN region ON n_regionkey=r_regionkey
         |WHERE r_name='EUROPE'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "window_running" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(${e2("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS run_total
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "quantiles" ->
      s"""SELECT o_orderpriority,
         |  quantile_cont(${e2("o_totalprice")}, 0.5)/100.0 AS p50,
         |  quantile_cont(${e2("o_totalprice")}, 0.9)/100.0 AS p90,
         |  quantile_cont(${e2("o_totalprice")}, 0.99)/100.0 AS p99,
         |  COUNT(*) AS n
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "semi_anti_join" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0)
        |SELECT c_mktsegment,
        |  COUNT(CASE WHEN b.o_custkey IS NOT NULL THEN 1 END) AS with_big,
        |  COUNT(CASE WHEN b.o_custkey IS NULL THEN 1 END) AS without_big
        |FROM customer c LEFT JOIN big b ON c_custkey=b.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // incremental_stats: the oracle is the DIRECT one-pass computation —
    // Spark merges per-(type, day) moment partials, so hash equality
    // proves merge-of-partials == direct.
    "incremental_stats" -> {
      val vc = e2("value")
      s"""WITH m AS (SELECT event_type,
         |  CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_partials,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  SUM(CAST($vc AS HUGEINT)) AS s1,
         |  SUM(CAST($vc AS HUGEINT)*$vc) AS s2,
         |  MIN($vc) AS mn, MAX($vc) AS mx
         |FROM events GROUP BY 1)
         |SELECT event_type, n_partials, n,
         |  CAST(s1 AS DOUBLE)/100.0 AS sum_v,
         |  CAST(mn AS DOUBLE)/100.0 AS min_v,
         |  CAST(mx AS DOUBLE)/100.0 AS max_v,
         |  CASE WHEN n > 1 THEN CAST(n*s2 - s1*s1 AS DOUBLE) /
         |    (CAST(n AS DOUBLE)*(n-1)) / 10000.0 END AS var_v
         |FROM m ORDER BY event_type""".stripMargin
    },

    // skew_join_salted / bloom_prune_join: the oracle is the PLAIN join —
    // salting and bloom pruning are semantics-preserving physical
    // rewrites, so equality with the unrewritten join is the whole claim.
    "skew_join_salted" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         |  ${sumE2("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "bloom_prune_join" ->
      s"""SELECT l_orderkey AS o_orderkey, l_linenumber,
         |  ${e2("l_extendedprice")} AS cents, o_orderpriority
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |WHERE o_orderkey % 100 = 0
         |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "rollup_agg" ->
      s"""SELECT r_name AS region_name, n_name AS nation_name, COUNT(*) AS n_cust,
         |  CAST(SUM(${e2("c_acctbal")}) AS DOUBLE)/100.0 AS total_bal
         |FROM customer JOIN nation ON c_nationkey=n_nationkey
         |JOIN region ON n_regionkey=r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "cube_agg" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  CAST(SUM(${e2("l_quantity")}) AS DOUBLE)/100.0 AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "pivot_events" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").flatMap { t =>
        Seq(
          s"COUNT(CASE WHEN event_type='$t' THEN 1 END) AS ${t}_n",
          s"CAST(SUM(CASE WHEN event_type='$t' THEN ${e2("value")} END) AS DOUBLE)/100.0 AS ${t}_value")
      }.mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    // one-pass pairwise Pearson matrix: every sum/square/cross moment in
    // ONE aggregate row (HUGEINT vs Spark's decimal(38,0) — both exact),
    // then a C(C,2)-branch union over that single row
    "corr_matrix" -> {
      val ms = graft.operators.CoreOps.CorrMeasures
      val sums = ms.map { case (n, c) =>
        s"SUM(CAST(${e2(c)} AS HUGEINT)) AS s_$n,\n  SUM(CAST(${e2(c)} AS HUGEINT)*${e2(c)}) AS ss_$n"
      }.mkString(",\n  ")
      val pairs = for {
        (i, (nx, cx)) <- ms.zipWithIndex.map(_.swap)
        (ny, cy) <- ms.drop(i + 1)
      } yield (nx, cx, ny, cy)
      val crosses = pairs.map { case (nx, cx, ny, cy) =>
        s"SUM(CAST(${e2(cx)} AS HUGEINT)*${e2(cy)}) AS sp_${nx}_$ny"
      }.mkString(",\n  ")
      val branches = pairs.map { case (nx, _, ny, _) =>
        s"""SELECT '$nx' AS x, '$ny' AS y, n,
           |  CAST(n*sp_${nx}_$ny - s_$nx*s_$ny AS DOUBLE) /
           |  (sqrt(CAST(n*ss_$nx - s_$nx*s_$nx AS DOUBLE)) * sqrt(CAST(n*ss_$ny - s_$ny*s_$ny AS DOUBLE))) AS corr
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  $sums,
         |  $crosses
         |FROM lineitem)
         |$branches
         |ORDER BY x, y""".stripMargin
    },

    "corr_agg" -> {
      val xc = e2("l_quantity")
      val yc = e2("l_extendedprice")
      s"""WITH m AS (SELECT l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  SUM(CAST($xc AS HUGEINT)) AS sx,
         |  SUM(CAST($yc AS HUGEINT)) AS sy,
         |  SUM(CAST($xc AS HUGEINT)*$xc) AS sxx,
         |  SUM(CAST($yc AS HUGEINT)*$yc) AS syy,
         |  SUM(CAST($xc AS HUGEINT)*$yc) AS sxy
         |FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, n,
         |  CAST(n*sxy - sx*sy AS DOUBLE) /
         |  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
         |FROM m ORDER BY l_returnflag""".stripMargin
    },

    "histogram" -> {
      val xc = e2("o_totalprice")
      // same double-division binning as the Spark side (long*20 exact in
      // a double up to 2^53, so FLOOR agrees bit-for-bit)
      s"""WITH b AS (SELECT LEAST(19, GREATEST(0,
         |  CAST(FLOOR(CAST(($xc - 0)*20 AS DOUBLE)/60000000) AS BIGINT))) AS bucket
         |FROM orders)
         |SELECT bucket,
         |  CAST(0 + bucket*3000000 AS DOUBLE)/100.0 AS lo,
         |  CAST(0 + (bucket+1)*3000000 AS DOUBLE)/100.0 AS hi,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "latest_by_key" ->
      // composite HUGEINT key == the Spark side's (us, event_id) struct
      // ordering, since 0 <= event_id < 10^10
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |k AS (SELECT *, CAST(us AS HUGEINT)*10000000000 + event_id AS ord FROM e)
        |SELECT user_id,
        |  arg_max(event_id, ord) AS last_event,
        |  arg_max(event_type, ord) AS last_type,
        |  arg_max(us, ord) AS last_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,

    "outliers" -> {
      val xc = e2("o_totalprice")
      s"""WITH m AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         |  SUM(CAST($xc AS HUGEINT)) AS sx,
         |  SUM(CAST($xc AS HUGEINT)*$xc) AS sxx
         |FROM orders GROUP BY 1)
         |SELECT o_orderkey, o.o_orderpriority, o_totalprice,
         |  CAST(n*$xc - sx AS DOUBLE) /
         |    sqrt(CAST(n AS DOUBLE) * CAST(n*sxx - sx*sx AS DOUBLE) / (n-1)) AS z
         |FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
         |WHERE abs(CAST(n*$xc - sx AS DOUBLE) /
         |    sqrt(CAST(n AS DOUBLE) * CAST(n*sxx - sx*sx AS DOUBLE) / (n-1))) > 3.0
         |ORDER BY o_orderkey""".stripMargin
    },

    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(FLOOR(l_quantity*100.0+0.5)) AS DOUBLE)/100.0 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "monthly_revenue" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  ${sumE2("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "event_path" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events)
        |SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY us, event_id) AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(make_timestamp(epoch_ns(ts)//1000) AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY 1)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        |  CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY f.cohort, date_diff('day', cohort, d)
        |ORDER BY cohort, day_offset""".stripMargin,

    "scd2_history" ->
      """WITH e AS (SELECT event_id, user_id, event_type AS state, epoch_ns(ts)//1000 AS us FROM events),
        |l AS (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |c AS (SELECT * FROM l WHERE prev IS NULL OR prev <> state),
        |v AS (SELECT user_id, state, us AS valid_from_us,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
        |        CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS version
        |      FROM c)
        |SELECT user_id, state, valid_from_us, valid_to_us, version,
        |  valid_to_us IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    "merge_upsert" ->
      """WITH latest AS (SELECT * FROM (SELECT o_custkey, o_orderkey, o_orderstatus,
        |    o_totalprice, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1),
        |ch AS (SELECT
        |    CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey + 1000000
        |      ELSE o_custkey END AS BIGINT) AS key,
        |    CASE WHEN o_orderstatus = 'F' THEN 'D'
        |      WHEN o_orderpriority = '1-URGENT' THEN 'I' ELSE 'U' END AS op,
        |    o_totalprice AS new_bal
        |  FROM latest),
        |b AS (SELECT CAST(c_custkey AS BIGINT) AS key, c_name, c_acctbal FROM customer),
        |m AS (SELECT COALESCE(b.key, ch.key) AS key, b.c_name, b.c_acctbal, ch.op, ch.new_bal
        |  FROM b FULL OUTER JOIN ch ON b.key = ch.key)
        |SELECT key,
        |  COALESCE(c_name, 'cust#' || CAST(key AS VARCHAR)) AS name,
        |  CASE WHEN op IS NOT NULL THEN new_bal ELSE c_acctbal END AS acctbal,
        |  CASE WHEN op IS NULL THEN 'unchanged'
        |    WHEN c_name IS NULL THEN 'inserted' ELSE 'updated' END AS src
        |FROM m WHERE op IS NULL OR op <> 'D' ORDER BY key""".stripMargin,

    "gap_fill" ->
      s"""WITH $gapFillCtes
         |SELECT priority, day, n_orders, revenue FROM filled
         |ORDER BY priority, day""".stripMargin,

    "rolling_revenue" ->
      s"""WITH $gapFillCtes
         |SELECT priority, day, n_orders,
         |  CAST(SUM(CAST(FLOOR(revenue*100.0+0.5) AS BIGINT)) OVER w AS DOUBLE)/100.0 AS rev_7d,
         |  CAST(SUM(n_orders) OVER w AS BIGINT) AS orders_7d
         |FROM filled
         |WINDOW w AS (PARTITION BY priority ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY priority, day""".stripMargin,

    "mode_agg" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn,
        |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types FROM c)
        |SELECT user_id, event_type AS top_type, cnt, n_types FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "quantile_buckets" ->
      """WITH b AS (SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM documents),
        |a AS (SELECT doc_id, n_chars,
        |        CAST(1 + len(list_filter(bs, x -> x < CAST(n_chars AS DOUBLE))) AS BIGINT) AS bucket
        |      FROM documents CROSS JOIN b)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin,

    "ngram_counts" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS ngram
        |      FROM t, UNNEST(generate_series(1, len(w)-1)) AS u(i) WHERE len(w) >= 2)
        |SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM g GROUP BY ngram ORDER BY n_total DESC, ngram LIMIT 100""".stripMargin,

    "doc_chunk" ->
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents)
         |SELECT doc_id, CAST(i // ${graft.operators.TextOps.ChunkStride} AS BIGINT) AS chunk_id,
         |  CAST(i AS BIGINT) AS start,
         |  substr(text, CAST(i AS INT) + 1, ${graft.operators.TextOps.ChunkSize}) AS chunk,
         |  CAST(length(substr(text, CAST(i AS INT) + 1, ${graft.operators.TextOps.ChunkSize})) AS BIGINT) AS chunk_len
         |FROM t, UNNEST(generate_series(0, greatest(n - 1, 0), ${graft.operators.TextOps.ChunkStride})) AS u(i)
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "decontaminate" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
         |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE source = '${graft.operators.CurationOps.EvalSource}'),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE source <> '${graft.operators.CurationOps.EvalSource}')
         |SELECT tr.doc_id, CAST(COUNT(DISTINCT tr.shingle) AS BIGINT) AS n_shared,
         |  CAST(COUNT(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
         |FROM tr JOIN ev USING (shingle)
         |GROUP BY tr.doc_id HAVING COUNT(DISTINCT tr.shingle) >= ${graft.operators.CurationOps.DecontMinShingles}
         |ORDER BY doc_id""".stripMargin,

    // same 3-gram shingle chain as decontaminate; LENGTH-INVARIANT
    // fractional scoring (share of the doc's own distinct shingles)
    "decontaminate_overlap" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
         |ev AS (SELECT DISTINCT shingle, 1 AS hit FROM sh WHERE source = '${graft.operators.CurationOps.EvalSource}'),
         |per AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |        CAST(SUM(CASE WHEN e.hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |        FROM sh s LEFT JOIN ev e USING (shingle)
         |        WHERE s.source <> '${graft.operators.CurationOps.EvalSource}' GROUP BY s.doc_id),
         |per2 AS (SELECT doc_id, n_shingles, n_shared,
         |         CASE WHEN n_shingles > 0 THEN CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE)
         |              ELSE 0.0 END AS overlap_frac FROM per)
         |SELECT d.doc_id, COALESCE(n_shingles, 0) AS n_shingles,
         |  COALESCE(n_shared, 0) AS n_shared,
         |  COALESCE(overlap_frac, 0.0) AS overlap_frac,
         |  COALESCE(overlap_frac, 0.0) < ${graft.operators.CurationOps.DecontOverlapTau} AS kept
         |FROM documents d LEFT JOIN per2 USING (doc_id)
         |WHERE d.source <> '${graft.operators.CurationOps.EvalSource}'
         |ORDER BY doc_id""".stripMargin,

    // eval-side leakage audit; shingle chain shared with decontaminate
    "contamination_report" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
         |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE source = '${graft.operators.CurationOps.EvalSource}'),
         |tdf AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS train_df FROM sh
         |        WHERE source <> '${graft.operators.CurationOps.EvalSource}' GROUP BY shingle)
         |SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN train_df IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  CAST(SUM(CASE WHEN train_df IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS contamination_frac,
         |  MAX(COALESCE(train_df, 0)) AS max_train_df
         |FROM ev LEFT JOIN tdf USING (shingle)
         |GROUP BY eval_id ORDER BY eval_id""".stripMargin,

    // corpus bigram document frequency folded back per doc — integer df
    // sums, ONE double division at the edge (the oracle-parity rule)
    "text_familiarity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |       FROM t, UNNEST(generate_series(1, len(w)-1)) AS u(i) WHERE len(w) >= 2),
        |df AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS df FROM bg GROUP BY bigram),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |        SUM(df) AS sum_df, MIN(df) AS min_df
        |        FROM bg JOIN df USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
        |  COALESCE(min_df, 0) AS min_df,
        |  CASE WHEN COALESCE(n_bigrams, 0) > 0
        |       THEN CAST(sum_df AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |       ELSE 0.0 END AS avg_df
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the MLE bigram LM: NON-distinct transition counts, prefix mass
    // derived from the transition frame (Σ_w2 p = 1 up to flooring),
    // per-transition ⌊c12·10⁶/c1⌋ and per-doc mean via `//` — all
    // integers end to end (the arithmetic-mean stand-in for a log-prob
    // perplexity; ordering is what the filter consumes)
    "bigram_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |       FROM t, UNNEST(generate_series(1, len(w)-1)) AS u(i) WHERE len(w) >= 2),
        |c12 AS (SELECT bigram, string_split(bigram, ' ')[1] AS w1,
        |        CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        |p AS (SELECT bigram, CAST((c12 * 1000000) // c1 AS BIGINT) AS p_e6
        |      FROM c12 JOIN c1 USING (w1))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS lm_e6,
        |  CAST(MIN(p_e6) AS BIGINT) AS min_p_e6
        |FROM bg JOIN p USING (bigram) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, doc_id % ${graft.operators.CurationOps.PackShards} AS shard,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(cum_before // ${graft.operators.CurationOps.PackBudget} AS BIGINT) AS seq_id,
         |  CAST(cum_before % ${graft.operators.CurationOps.PackBudget} AS BIGINT) AS seq_offset,
         |  CAST((cum_before + n_tokens - 1) // ${graft.operators.CurationOps.PackBudget}
         |    - cum_before // ${graft.operators.CurationOps.PackBudget} + 1 AS BIGINT) AS n_splits
         |FROM c ORDER BY doc_id""".stripMargin,

    "pack_sequences_bpe" -> {
      // the unrolled BPE-training twin supplies per-doc n_tokens; the
      // packing window SQL is pack_sequences' verbatim
      val n = graft.operators.TokenizerOps.NumMerges
      s"""WITH ${bpeCtes(n)},
         |wtok AS (SELECT w, CAST(len(syms) AS BIGINT) AS w_toks FROM seg$n),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, CAST(SUM(w_toks) AS BIGINT) AS n_tokens
         |  FROM wd JOIN wtok USING (w) GROUP BY doc_id),
         |d AS (SELECT doc_id, doc_id % ${graft.operators.CurationOps.PackShards} AS shard,
         |        n_tokens FROM agg),
         |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(cum_before // ${graft.operators.CurationOps.PackBudget} AS BIGINT) AS seq_id,
         |  CAST(cum_before % ${graft.operators.CurationOps.PackBudget} AS BIGINT) AS seq_offset,
         |  CAST((cum_before + n_tokens - 1) // ${graft.operators.CurationOps.PackBudget}
         |    - cum_before // ${graft.operators.CurationOps.PackBudget} + 1 AS BIGINT) AS n_splits
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "profile_table" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val legs = cs.map { c =>
        s"""SELECT '$c' AS col_name, (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
           |  CAST(COUNT($c) AS BIGINT) AS n_nonnull,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN(${e2(c)}) AS DOUBLE)/100.0 AS min,
           |  CAST(MAX(${e2(c)}) AS DOUBLE)/100.0 AS max
           |FROM lineitem""".stripMargin
      }
      legs.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type='click' AND us >= t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type='purchase' AND us >= t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM t2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM t3
        |ORDER BY step""".stripMargin,

    "set_ops" ->
      """WITH e AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |l AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM e INTERSECT SELECT * FROM l)
        |UNION ALL
        |SELECT o_custkey, 'early_only' AS tag FROM (SELECT * FROM e EXCEPT SELECT * FROM l)
        |UNION ALL
        |SELECT o_custkey, 'late_only' AS tag FROM (SELECT * FROM l EXCEPT SELECT * FROM e)
        |ORDER BY tag, o_custkey""".stripMargin,

    "unpivot_events" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, COALESCE(c.n, CAST(0 AS BIGINT)) AS n
        |FROM u CROSS JOIN t LEFT JOIN c USING (user_id, event_type)
        |ORDER BY user_id, event_type""".stripMargin,

    "window_time_range" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us, value FROM events)
         |SELECT event_id, user_id, us,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_30m,
         |  CAST(SUM(${e2("value")}) OVER w AS DOUBLE)/100.0 AS sum_30m
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, us, event_id""".stripMargin,

    "sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e)
        |SELECT event_id, user_id,
        |  CAST(SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM l ORDER BY user_id, us, event_id""".stripMargin,

    "hourly_profile" ->
      s"""SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
         |  CAST(SUM(${e2("value")}) AS DOUBLE)/100.0 AS total_value
         |FROM events GROUP BY 1 ORDER BY hr""".stripMargin,

    "daily_active" ->
      s"""SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(${e2("value")}) AS DOUBLE)/100.0 AS total_value
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "cumulative_reach" ->
      """WITH f AS (SELECT user_id, CAST(MIN(CAST(ts AS DATE)) AS DATE) AS first_d
        |FROM events GROUP BY user_id),
        |d AS (SELECT first_d, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY first_d)
        |SELECT CAST(first_d AS TIMESTAMP) AS day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY first_d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,

    "rolling_median" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us,
         |  ${e2("value")} AS cents FROM events)
         |SELECT event_id, user_id,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         |  CAST(median(cents) OVER w AS DOUBLE)/100.0 AS rolling_median
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, us, event_id""".stripMargin,

    "rolling_mad_outliers" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us,
         |  ${e2("value")} AS cents FROM events),
         |l AS (SELECT *, list(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS arr FROM e),
         |m AS (SELECT *, CAST(list_aggregate(arr, 'median') AS DOUBLE) AS med FROM l),
         |d AS (SELECT *, CAST(list_aggregate(
         |  list_transform(arr, x -> CAST(abs(x - med) AS DOUBLE)), 'median') AS DOUBLE) AS mad FROM m)
         |SELECT event_id, user_id, CAST(len(arr) AS BIGINT) AS n_window,
         |  med/100.0 AS med_price, mad/100.0 AS mad_price,
         |  CASE WHEN mad > 0 THEN abs(cents - med) > 3.0*mad
         |       ELSE abs(cents - med) > 0.0 END AS is_outlier
         |FROM d ORDER BY user_id, us, event_id""".stripMargin,

    "session_window_agg" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS us, value FROM events),
         |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
         |sess AS (SELECT *, CAST(SUM(CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |FROM l)
         |SELECT make_timestamp(MIN(us)) AS session_start,
         |  make_timestamp(MAX(us) + 1800000000) AS session_end,
         |  user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(${e2("value")}) AS DOUBLE)/100.0 AS total_value
         |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "sessionize_stats" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us, value FROM events),
         |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
         |sess AS (SELECT event_id, user_id, us, value,
         |  CAST(SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |FROM l)
         |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
         |  CAST(MIN(us) AS BIGINT) AS start_us,
         |  ${sumE2("value")} AS total_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ns(ts)//1000 AS us FROM events),
        |l AS (SELECT event_id, user_id, us FROM e WHERE event_type='click'),
        |r AS (SELECT user_id, us, event_id AS p_event, value AS p_value FROM e WHERE event_type='purchase')
        |SELECT l.event_id, l.user_id, l.us, r.p_event, r.p_value, r.us AS p_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us
        |ORDER BY l.event_id""".stripMargin,

    // same semantics, same oracle — asof_join_native runs on graft's custom
    // physical operator (plans/AsOfJoinExec) instead of the union+window plan
    "asof_join_native" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ns(ts)//1000 AS us FROM events),
        |l AS (SELECT event_id, user_id, us FROM e WHERE event_type='click'),
        |r AS (SELECT user_id, us, event_id AS p_event, value AS p_value FROM e WHERE event_type='purchase')
        |SELECT l.event_id, l.user_id, l.us, r.p_event, r.p_value, r.us AS p_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us
        |ORDER BY l.event_id""".stripMargin,

    "range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |c AS (SELECT event_id AS c_event, user_id, us FROM e WHERE event_type='click'),
        |p AS (SELECT event_id AS p_event, user_id, us AS w_lo, us + 1800000000 AS w_hi
        |      FROM e WHERE event_type='purchase')
        |SELECT p.p_event, c.c_event, c.us, p.w_lo
        |FROM p JOIN c ON c.user_id = p.user_id AND c.us >= p.w_lo AND c.us < p.w_hi
        |ORDER BY p_event, c_event""".stripMargin,

    "merge_intervals" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS lo,
        |  epoch_ns(ts)//1000 + 1800000000 AS hi
        |FROM events WHERE event_type='purchase'),
        |m AS (SELECT *, max(hi) OVER (PARTITION BY user_id ORDER BY lo, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_hi FROM iv),
        |f AS (SELECT *, CASE WHEN prev_max_hi IS NULL OR lo >= prev_max_hi
        |  THEN 1 ELSE 0 END AS is_new FROM m),
        |g AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY lo, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id FROM f)
        |SELECT user_id, island_id, MIN(lo) AS start_us, MAX(hi) AS end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_intervals, MAX(hi) - MIN(lo) AS covered_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, island_id""".stripMargin,

    "asof_nearest" -> asofNearestSql,
    // the native-exec twin shares the brute-force-ranked oracle: both
    // engines implement the same (|Δt|, p_us, p_event) argmin
    "asof_nearest_native" -> asofNearestSql,

    "time_weighted_avg" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS us, value FROM events),
         |l AS (SELECT *, lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_us FROM e),
         |iv AS (SELECT user_id, CAST(${e2("value")} AS HUGEINT) AS cents,
         |  CAST(next_us - us AS HUGEINT) AS dur FROM l WHERE next_us IS NOT NULL)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
         |  CAST(SUM(dur) AS BIGINT) AS held_us,
         |  CAST(SUM(cents*dur) AS DOUBLE)/CAST(SUM(dur) AS DOUBLE)/100.0 AS twa
         |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin,

    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |pr AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type FROM e),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE)/SUM(n) OVER (PARTITION BY from_type) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardSql,

    "dedup_containment" ->
      // same posting-list CTEs as dedup_ngram_jaccard; the score is the
      // overlap coefficient and contained_doc names the smaller-set side
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM t, UNNEST(generate_series(1, len(w)-2)) AS u(i) WHERE len(w) >= 3),
         |kept AS (SELECT shingle FROM sh0 GROUP BY shingle
         |         HAVING COUNT(*) <= ${graft.operators.DedupOps.MaxShingleDf}),
         |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
         |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id),
         |j AS (SELECT doc_a, doc_b,
         |      CASE WHEN za.n_sh <= zb.n_sh THEN doc_a ELSE doc_b END AS contained_doc,
         |      CAST(common AS DOUBLE)/least(za.n_sh, zb.n_sh) AS containment
         |      FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id)
         |SELECT doc_a, doc_b, contained_doc, containment FROM j
         |WHERE containment >= ${graft.operators.DedupOps.ContainmentThreshold}
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_clusters" -> dedupClustersSql,

    "dedup_survivors" ->
      // the cluster twin wrapped as a subquery + the quality-head CTEs:
      // per-cluster winner = max logit (ties → min doc_id)
      s"""WITH $qmsCtes,
         |cl AS (SELECT doc_id, cluster_id FROM ($dedupClustersSql)),
         |j AS (SELECT cl.doc_id, cl.cluster_id, qml.logit_e12 FROM cl JOIN qml USING (doc_id)),
         |k AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
         |  row_number() OVER (PARTITION BY cluster_id ORDER BY logit_e12 DESC, doc_id) AS r FROM j)
         |SELECT doc_id, cluster_id, logit_e12, n_members, r = 1 AS is_survivor
         |FROM k ORDER BY doc_id""".stripMargin,

    "semantic_clusters" -> {
      // dedup_embedding_lsh's bucketed candidate pairs (seeded planes
      // inlined as literals — same twin as that key's oracle), then the
      // same recursive reachability closure as dedup_clusters (min
      // label = what pointer-jumping CC converges to)
      val masks = graft.operators.SimilarityOps.probeMasks(2)
        .mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         |  ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |bkt AS (SELECT vec_id, ${lshBucketSql("embedding")} AS bucket FROM n),
         |pr AS (SELECT vec_id, unnest(list_transform($masks, m -> xor(bucket, m))) AS bucket FROM bkt),
         |cnd AS (SELECT DISTINCT a.vec_id AS id_a, pr.vec_id AS id_b
         |  FROM bkt a JOIN pr ON a.bucket = pr.bucket AND a.vec_id < pr.vec_id),
         |j AS (SELECT id_a, id_b FROM cnd
         |  JOIN n na ON id_a = na.vec_id JOIN n nb ON id_b = nb.vec_id
         |  WHERE ${cosSim(dotE12("na.embedding", "nb.embedding"), "na.nrm", "nb.nrm")} >= 0.35),
         |e AS (SELECT id_a AS a, id_b AS b FROM j
         |      UNION ALL SELECT id_b, id_a FROM j),
         |reach(id, label) AS (
         |  SELECT DISTINCT a, a FROM e
         |  UNION
         |  SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.id),
         |lab AS (SELECT id AS vec_id, MIN(label) AS cluster_id FROM reach GROUP BY id)
         |SELECT n.vec_id, COALESCE(lab.cluster_id, n.vec_id) AS cluster_id
         |FROM n LEFT JOIN lab USING (vec_id)
         |ORDER BY vec_id""".stripMargin
    },

    "dedup_embedding" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${dotE12("a.embedding", "b.embedding")} AS dt, a.nrm AS na, b.nrm AS nb
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, ${cosSim("dt", "na", "nb")} AS cos_sim
         |FROM p WHERE ${cosSim("dt", "na", "nb")} >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "ann_cosine_topk" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |q AS (SELECT * FROM n WHERE vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0),
         |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |  ${cosSim(dotE12("q.embedding", "c.embedding"), "q.nrm", "c.nrm")} AS cos_sim
         |  FROM q JOIN n c ON q.vec_id <> c.vec_id),
         |k AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM p)
         |SELECT q_id, n_id, cos_sim, rnk FROM k WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "embedding_sq8" -> {
      import graft.operators.QuantOps.{SqDims, SqLevels}
      val mnl = (1 to SqDims).map(i => s"MIN(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      val mxl = (1 to SqDims).map(i => s"MAX(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      // QuantOps mirror: per-dim 8-bit level floor((x-mn)/(mx-mn)*255+0.5)
      // (0 on a constant dim), reconstruction mn + q/255*(mx-mn), every
      // double chain associated identically, floored to longs BEFORE the
      // list_sum reductions — exact integer outputs
      s"""WITH st AS (SELECT $mnl AS mn, $mxl AS mx FROM embeddings),
         |qc AS (SELECT vec_id, embedding, mn, mx,
         |  list_transform(generate_series(1,$SqDims), i -> CASE WHEN mx[i] > mn[i]
         |    THEN CAST(FLOOR((CAST(embedding[i] AS DOUBLE)-mn[i])/(mx[i]-mn[i])*$SqLevels.0+0.5) AS BIGINT)
         |    ELSE 0 END) AS q
         |  FROM embeddings CROSS JOIN st),
         |rc AS (SELECT vec_id, embedding, q,
         |  list_transform(generate_series(1,$SqDims), i -> CASE WHEN mx[i] > mn[i]
         |    THEN mn[i] + CAST(q[i] AS DOUBLE)/$SqLevels.0*(mx[i]-mn[i]) ELSE mn[i] END) AS r
         |  FROM qc)
         |SELECT vec_id,
         |  CAST(list_sum(q) AS BIGINT) AS code_sum,
         |  CAST(list_sum(list_transform(q, v -> v*v)) AS BIGINT) AS code_sqsum,
         |  CAST(list_sum(list_transform(generate_series(1,$SqDims), i ->
         |    CAST(FLOOR((CAST(embedding[i] AS DOUBLE)-r[i])*(CAST(embedding[i] AS DOUBLE)-r[i])*1000000000000.0+0.5) AS BIGINT))) AS BIGINT) AS err_e12
         |FROM rc ORDER BY vec_id""".stripMargin
    },

    "ann_sq_topk" -> {
      import graft.operators.QuantOps.{SqDims, SqLevels}
      val qm = graft.operators.SimilarityOps.QueryModulus
      val mnl = (1 to SqDims).map(i => s"MIN(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      val mxl = (1 to SqDims).map(i => s"MAX(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      // full-precision query (native dotE12 norm) vs on-the-fly-decoded
      // SQ8 corpus, same e12 cosine kernel as ann_cosine_topk
      s"""WITH st AS (SELECT $mnl AS mn, $mxl AS mx FROM embeddings),
         |rc AS (SELECT vec_id,
         |  list_transform(generate_series(1,$SqDims), i -> CASE WHEN mx[i] > mn[i]
         |    THEN mn[i] + CAST(CAST(FLOOR((CAST(embedding[i] AS DOUBLE)-mn[i])/(mx[i]-mn[i])*$SqLevels.0+0.5) AS BIGINT) AS DOUBLE)/$SqLevels.0*(mx[i]-mn[i])
         |    ELSE mn[i] END) AS r
         |  FROM embeddings CROSS JOIN st),
         |rn AS (SELECT vec_id, r, CAST(list_sum(list_transform(generate_series(1,$SqDims), i ->
         |    CAST(FLOOR(r[i]*r[i]*1000000000000.0+0.5) AS BIGINT))) AS BIGINT) AS rn2 FROM rc),
         |q AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS qn
         |  FROM embeddings WHERE vec_id % $qm = 0),
         |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |  CAST(list_sum(list_transform(generate_series(1,$SqDims), i ->
         |    CAST(FLOOR(CAST(q.embedding[i] AS DOUBLE)*c.r[i]*1000000000000.0+0.5) AS BIGINT))) AS BIGINT) AS dt,
         |  q.qn, c.rn2
         |  FROM q JOIN rn c ON q.vec_id <> c.vec_id),
         |s AS (SELECT q_id, n_id, ${cosSim("dt", "qn", "rn2")} AS cos_sim FROM p),
         |k AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM s)
         |SELECT q_id, n_id, cos_sim, rnk FROM k WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
    },

    "hard_negatives" ->
      s"""WITH n AS (SELECT vec_id, embedding, label, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |q AS (SELECT * FROM n WHERE vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0),
         |p AS (SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS n_id, c.label AS n_label,
         |  ${cosSim(dotE12("q.embedding", "c.embedding"), "q.nrm", "c.nrm")} AS cos_sim
         |  FROM q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label),
         |k AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM p)
         |SELECT q_id, q_label, n_id, n_label, cos_sim, rnk FROM k WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "knn_classify" ->
      s"""WITH n AS (SELECT vec_id, embedding, label, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |q AS (SELECT * FROM n WHERE vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0),
         |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label,
         |  ${cosSim(dotE12("q.embedding", "c.embedding"), "q.nrm", "c.nrm")} AS cos_sim
         |  FROM q JOIN n c ON q.vec_id <> c.vec_id),
         |k AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM p),
         |v AS (SELECT q_id, label, CAST(COUNT(*) AS BIGINT) AS votes FROM k WHERE rnk <= 5 GROUP BY 1, 2),
         |w AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS r FROM v)
         |SELECT w.q_id, w.label AS pred_label, w.votes, q.label AS true_label,
         |  w.label = q.label AS correct
         |FROM w JOIN q ON w.q_id = q.vec_id WHERE w.r = 1 ORDER BY q_id""".stripMargin,

    "embedding_kmeans" ->
      s"""WITH ${kmeansCtes(graft.operators.ClusterOps.KmeansK, graft.operators.ClusterOps.KmeansRounds)}
         |SELECT vec_id, cluster, d AS dist2 FROM af ORDER BY vec_id""".stripMargin,

    "semantic_dedup" ->
      s"""WITH ${kmeansCtes(graft.operators.ClusterOps.KmeansK, graft.operators.ClusterOps.KmeansRounds)},
         |en AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         |  ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |pr AS (SELECT x.vec_id AS xid, y.vec_id AS yid
         |  FROM af x JOIN af y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
         |  JOIN en ex ON ex.vec_id = x.vec_id JOIN en ey ON ey.vec_id = y.vec_id
         |  WHERE ${cosSim(dotE12("ex.embedding", "ey.embedding"), "ex.nrm", "ey.nrm")}
         |    >= ${graft.operators.ClusterOps.SemThreshold}),
         |d AS (SELECT xid AS vec_id, MIN(yid) AS dup_of FROM pr GROUP BY 1)
         |SELECT af.vec_id, af.cluster, d.dup_of, d.dup_of IS NULL AS keep
         |FROM af LEFT JOIN d USING (vec_id) ORDER BY vec_id""".stripMargin,

    "embedding_pq" -> {
      import graft.operators.ClusterOps.{PqK, PqM, PqRounds}
      val dimsPer = 64 / PqM
      val ctes = (0 until PqM).map(i =>
        kmeansCtes(PqK, PqRounds, "TRUE", i * dimsPer + 1, dimsPer, s"q$i", normalized = true))
        .mkString(",\n")
      val joins = (1 until PqM)
        .map(i => s"JOIN q${i}af q$i ON q0.vec_id = q$i.vec_id").mkString(" ")
      val cols = (0 until PqM).map(i => s"q$i.cluster AS c$i").mkString(", ")
      val err = (0 until PqM).map(i => s"q$i.d").mkString(" + ")
      s"""WITH $ctes
         |SELECT q0.vec_id, $cols, CAST($err AS BIGINT) AS err
         |FROM q0af q0 $joins ORDER BY q0.vec_id""".stripMargin
    },

    "ann_pq" -> {
      import graft.operators.ClusterOps.{PqK, PqM, PqRounds}
      val dimsPer = 64 / PqM
      val ctes = (0 until PqM).map(i =>
        kmeansCtes(PqK, PqRounds, "TRUE", i * dimsPer + 1, dimsPer, s"q$i", normalized = true))
        .mkString(",\n")
      // per-subspace: query LUT (exact dist to every codebook entry) ⋈
      // corpus codes; ADC = sum of the M lookups
      val luts = (0 until PqM).map(i =>
        s"""lut$i AS (SELECT e.vec_id AS q_id, pc.cluster AS code, ${kmDist("e.v", "pc.c", dimsPer)} AS d
           |  FROM q${i}e e CROSS JOIN q${i}c$PqRounds pc
           |  WHERE e.vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0)""".stripMargin)
        .mkString(",\n")
      val scores = (0 until PqM).map(i =>
        s"SELECT l.q_id, a.vec_id AS n_id, l.d FROM lut$i l JOIN q${i}af a ON l.code = a.cluster AND l.q_id <> a.vec_id")
        .mkString("\nUNION ALL\n")
      s"""WITH $ctes,
         |$luts,
         |p AS ($scores),
         |sc AS (SELECT q_id, n_id, CAST(SUM(d) AS BIGINT) AS adist FROM p GROUP BY 1, 2),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS BIGINT) AS rnk FROM sc)
         |SELECT q_id, n_id, adist, rnk FROM rk WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "ann_ivf_pq" -> annIvfPqSql,

    "ann_index_probe" -> annIvfPqSql,

    "ann_ivf" -> {
      // exact-kmeans IVF (16 cells, 2 rounds): unrolled quantizer on the
      // raw e6 integers, probe choice by exact integer L2 with the
      // (distance, cell) tie-break, exact cosine inside probed cells
      val qm = graft.operators.SimilarityOps.QueryModulus
      val km = kmeansCtes(16, 2, "TRUE", 1, 64, "iv")
      s"""WITH $km,
         |n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         |  ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |pc AS (SELECT e.vec_id AS q_id, p.cluster AS cell, ${kmDist("e.v", "p.c")} AS cd
         |  FROM ive e CROSS JOIN ivc2 p WHERE e.vec_id % $qm = 0),
         |probed AS (SELECT q_id, cell FROM (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY cd, cell) AS rn FROM pc) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id AS n_id FROM probed p
         |  JOIN ivaf a ON a.cluster = p.cell AND a.vec_id <> p.q_id),
         |sc AS (SELECT c.q_id, c.n_id,
         |  ${cosSim(dotE12("qn.embedding", "nn.embedding"), "qn.nrm", "nn.nrm")} AS cos_sim
         |  FROM cand c JOIN n qn ON qn.vec_id = c.q_id JOIN n nn ON nn.vec_id = c.n_id),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
         |SELECT q_id, n_id, cos_sim, rnk FROM rk WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "ann_ivf_sq" -> {
      // literal composition of the ann_ivf twin (unrolled coarse kmeans,
      // exact-L2 probe choice with the (distance, cell) tie-break) and
      // the ann_sq_topk twin (on-the-fly SQ8 decode, per-term-floored
      // e12 cosine) — candidates restricted to the probed cells
      import graft.operators.QuantOps.{SqDims, SqLevels}
      val qm = graft.operators.SimilarityOps.QueryModulus
      val km = kmeansCtes(16, 2, "TRUE", 1, 64, "iv")
      val mnl = (1 to SqDims).map(i => s"MIN(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      val mxl = (1 to SqDims).map(i => s"MAX(CAST(embedding[$i] AS DOUBLE))")
        .mkString("list_value(", ", ", ")")
      s"""WITH $km,
         |st AS (SELECT $mnl AS mn, $mxl AS mx FROM embeddings),
         |rc AS (SELECT vec_id,
         |  list_transform(generate_series(1,$SqDims), i -> CASE WHEN mx[i] > mn[i]
         |    THEN mn[i] + CAST(CAST(FLOOR((CAST(embedding[i] AS DOUBLE)-mn[i])/(mx[i]-mn[i])*$SqLevels.0+0.5) AS BIGINT) AS DOUBLE)/$SqLevels.0*(mx[i]-mn[i])
         |    ELSE mn[i] END) AS r
         |  FROM embeddings CROSS JOIN st),
         |rcn AS (SELECT vec_id, r, CAST(list_sum(list_transform(generate_series(1,$SqDims), i ->
         |    CAST(FLOOR(r[i]*r[i]*1000000000000.0+0.5) AS BIGINT))) AS BIGINT) AS rn2 FROM rc),
         |q AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS qn
         |  FROM embeddings WHERE vec_id % $qm = 0),
         |pc AS (SELECT e.vec_id AS q_id, p.cluster AS cell, ${kmDist("e.v", "p.c")} AS cd
         |  FROM ive e CROSS JOIN ivc2 p WHERE e.vec_id % $qm = 0),
         |probed AS (SELECT q_id, cell FROM (SELECT *, row_number() OVER
         |  (PARTITION BY q_id ORDER BY cd, cell) AS rn FROM pc) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id AS n_id FROM probed p
         |  JOIN ivaf a ON a.cluster = p.cell AND a.vec_id <> p.q_id),
         |pd AS (SELECT c.q_id, c.n_id,
         |  CAST(list_sum(list_transform(generate_series(1,$SqDims), i ->
         |    CAST(FLOOR(CAST(q.embedding[i] AS DOUBLE)*nn.r[i]*1000000000000.0+0.5) AS BIGINT))) AS BIGINT) AS dt,
         |  q.qn, nn.rn2
         |  FROM cand c JOIN q ON q.vec_id = c.q_id JOIN rcn nn ON nn.vec_id = c.n_id),
         |sc AS (SELECT q_id, n_id, ${cosSim("dt", "qn", "rn2")} AS cos_sim FROM pd),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
         |SELECT q_id, n_id, cos_sim, rnk FROM rk WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "ann_index_stats" -> {
      // full-corpus index twin (same unrolled trainers as ann_ivf_pq),
      // aggregated to the per-cell health panel
      import graft.operators.ClusterOps.{CoarseCells, CoarseRounds, PqK, PqM, PqRounds}
      val dimsPer = 64 / PqM
      val coarse = kmeansCtes(CoarseCells, CoarseRounds, "TRUE", 1, 64, "cv",
        normalized = true)
      val subCtes = (0 until PqM).map(i =>
        kmeansCtes(PqK, PqRounds, "TRUE", i * dimsPer + 1, dimsPer, s"q$i",
          normalized = true)).mkString(",\n")
      val joins = (0 until PqM)
        .map(i => s"JOIN q${i}af q$i ON cv.vec_id = q$i.vec_id").mkString(" ")
      val err = (0 until PqM).map(i => s"q$i.d").mkString(" + ")
      // the -2/-3 sentinel rows RE-DERIVE the landed sizing from the
      // embeddings table + the adaptiveCells rule (smallest power-of-2 c
      // with CellOccupancyTarget·c ≥ n, floored at CoarseCells) — exact
      // integer shifts, no float log2 near a boundary
      val occ = graft.operators.AnnIndexOps.CellOccupancyTarget
      s"""WITH $coarse,
         |$subCtes,
         |base AS (SELECT cv.vec_id, cv.cluster AS cell, CAST($err AS BIGINT) AS err
         |  FROM cvaf cv $joins),
         |cells AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(err) AS BIGINT) AS err_sum FROM base GROUP BY cell),
         |nvec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
         |rule AS (SELECT GREATEST(CAST($CoarseCells AS BIGINT),
         |    (SELECT MIN(CAST(1 AS BIGINT) << p)
         |     FROM generate_series(0, 24) g(p), nvec
         |     WHERE (CAST($occ AS BIGINT) << p) >= nvec.n)) AS cells)
         |SELECT * FROM (
         |  SELECT CAST(-3 AS BIGINT) AS cell, n,
         |    CAST(NULL AS DOUBLE) AS share, CAST(NULL AS DOUBLE) AS err_mean
         |  FROM nvec
         |  UNION ALL
         |  SELECT CAST(-2 AS BIGINT) AS cell, cells AS n,
         |    CAST(NULL AS DOUBLE) AS share, CAST(NULL AS DOUBLE) AS err_mean
         |  FROM rule
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT) AS cell, CAST(0 AS BIGINT) AS n,
         |    0.0 AS share, CAST(NULL AS DOUBLE) AS err_mean
         |  UNION ALL
         |  SELECT cell, n,
         |    CAST(n AS DOUBLE)/CAST((SELECT SUM(n) FROM cells) AS DOUBLE) AS share,
         |    CAST(err_sum AS DOUBLE)/CAST(n AS DOUBLE) AS err_mean
         |  FROM cells
         |) ORDER BY cell""".stripMargin
    },

    "ann_index_probe_admitted" ->
      // the grown-index search twin: quantizers frozen on the corpus
      // slice, codes (af CTEs) cover corpus + admitted batch, queries
      // probe the full set
      annIvfPqSqlWhere(s"vec_id < ${graft.operators.ClusterOps.SemSplit}"),

    "ann_index_probe_compacted" ->
      // compaction is pure layout: same twin as the admitted probe
      annIvfPqSqlWhere(s"vec_id < ${graft.operators.ClusterOps.SemSplit}"),

    "ann_index_admit" -> {
      // the frozen-quantizer ingest twin: every kmeans instance trains
      // on the corpus slice (vec_id < SemSplit) — exactly what
      // buildAnnIndex landed — and `af` assigns EVERYONE, so the batch
      // rows' cells/codes are assignment-against-frozen-artifacts
      import graft.operators.ClusterOps.{CoarseCells, CoarseRounds, PqK, PqM, PqRounds, SemSplit}
      val dimsPer = 64 / PqM
      val coarse = kmeansCtes(CoarseCells, CoarseRounds, s"vec_id < $SemSplit",
        1, 64, "cv", normalized = true)
      val subCtes = (0 until PqM).map(i =>
        kmeansCtes(PqK, PqRounds, s"vec_id < $SemSplit", i * dimsPer + 1,
          dimsPer, s"q$i", normalized = true)).mkString(",\n")
      val joins = (0 until PqM)
        .map(i => s"JOIN q${i}af q$i ON cv.vec_id = q$i.vec_id").mkString(" ")
      val cols = (0 until PqM).map(i => s"q$i.cluster AS c$i").mkString(", ")
      val err = (0 until PqM).map(i => s"q$i.d").mkString(" + ")
      s"""WITH $coarse,
         |$subCtes
         |SELECT cv.vec_id, cv.cluster AS cell, $cols, CAST($err AS BIGINT) AS err
         |FROM cvaf cv $joins WHERE cv.vec_id >= $SemSplit
         |ORDER BY cv.vec_id""".stripMargin
    },

    "semantic_dedup_incremental" -> {
      import graft.operators.ClusterOps.{KmeansK, KmeansRounds, SemSplit, SemThreshold}
      s"""WITH ${kmeansCtes(KmeansK, KmeansRounds, s"vec_id < $SemSplit")},
         |en AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         |  ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |x AS (SELECT af.vec_id, af.cluster, en.embedding, en.nrm
         |  FROM af JOIN en USING (vec_id)),
         |bt AS (SELECT * FROM x WHERE vec_id >= $SemSplit),
         |cp AS (SELECT * FROM x WHERE vec_id < $SemSplit),
         |p AS (
         |  SELECT b.vec_id, TRUE AS from_corpus FROM bt b JOIN cp c
         |    ON b.cluster = c.cluster
         |    AND ${cosSim(dotE12("b.embedding", "c.embedding"), "b.nrm", "c.nrm")} >= $SemThreshold
         |  UNION ALL
         |  SELECT b.vec_id, FALSE FROM bt b JOIN bt y
         |    ON b.cluster = y.cluster AND y.vec_id < b.vec_id
         |    AND ${cosSim(dotE12("b.embedding", "y.embedding"), "b.nrm", "y.nrm")} >= $SemThreshold),
         |d AS (SELECT vec_id, bool_or(from_corpus) AS dup_of_corpus,
         |  bool_or(NOT from_corpus) AS dup_in_batch FROM p GROUP BY 1)
         |SELECT bt.vec_id, bt.cluster,
         |  coalesce(d.dup_of_corpus, FALSE) AS dup_of_corpus,
         |  coalesce(d.dup_in_batch, FALSE) AS dup_in_batch,
         |  NOT coalesce(d.dup_of_corpus, FALSE)
         |    AND NOT coalesce(d.dup_in_batch, FALSE) AS keep
         |FROM bt LEFT JOIN d USING (vec_id) ORDER BY vec_id""".stripMargin
    },

    "semantic_dedup_text" -> semanticDedupTextSql,

    "quality_model_score" ->
      s"""WITH $qmsCtes
         |SELECT *, logit_e12 > 0 AS keep FROM qml ORDER BY doc_id""".stripMargin,

    "curriculum_stages" ->
      s"""WITH $qmsCtes,
         |qt AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS toks FROM documents),
         |qd AS (SELECT qml.doc_id, qml.logit_e12, qt.toks FROM qml JOIN qt USING (doc_id)),
         |qb AS (SELECT quantile_cont(logit_e12, [0.25,0.5,0.75]) AS bs FROM qd),
         |qa AS (SELECT qd.*, CAST(1 + len(list_filter(bs, x -> x < CAST(logit_e12 AS DOUBLE))) AS BIGINT) AS stage
         |  FROM qd CROSS JOIN qb),
         |qg AS (SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  MIN(logit_e12) AS min_logit_e12, MAX(logit_e12) AS max_logit_e12
         |FROM qa GROUP BY stage)
         |SELECT stage, n_docs, n_tokens, min_logit_e12, max_logit_e12,
         |  CAST(n_tokens AS DOUBLE)/SUM(n_tokens) OVER () AS token_share
         |FROM qg ORDER BY stage""".stripMargin,

    "dq_checks" ->
      """WITH cu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS dup_keys
        |FROM customer),
        |ck AS (SELECT DISTINCT c_custkey FROM customer),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
        |  CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_date,
        |  CAST(SUM(CASE WHEN ck.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ri_orphans
        |FROM orders LEFT JOIN ck ON o_custkey = ck.c_custkey),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_range
        |FROM lineitem),
        |r AS (SELECT 'orders_pk_unique' AS rule, dup_keys AS violations, n AS checked FROM o
        |  UNION ALL SELECT 'orders_price_nonneg', neg_price, n FROM o
        |  UNION ALL SELECT 'orders_date_notnull', null_date, n FROM o
        |  UNION ALL SELECT 'orders_custkey_ri', ri_orphans, n FROM o
        |  UNION ALL SELECT 'lineitem_qty_range', qty_range, n FROM l
        |  UNION ALL SELECT 'customer_pk_unique', dup_keys, n FROM cu)
        |SELECT rule, violations, checked, violations = 0 AS pass
        |FROM r ORDER BY rule""".stripMargin,

    "text_langid" -> {
      val scores = graft.operators.TextOps.Langs
        .map(l => s"${stopHits(l)} AS s_$l").mkString(",\n  ")
      s"""WITH s AS (SELECT doc_id,
         |  $scores
         |FROM documents)
         |SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
         |  CASE WHEN s_en>=s_es AND s_en>=s_de AND s_en>=s_fr AND s_en>=s_zh THEN 'en'
         |       WHEN s_es>=s_de AND s_es>=s_fr AND s_es>=s_zh THEN 'es'
         |       WHEN s_de>=s_fr AND s_de>=s_zh THEN 'de'
         |       WHEN s_fr>=s_zh THEN 'fr'
         |       ELSE 'zh' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_quality" ->
      s"""WITH b AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS chars_n,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS words_n,
         |  CAST(length(text) - length(regexp_replace(text,'[.,;:!?]','','g')) AS BIGINT) AS punct_n,
         |  ${stopHits("en")} AS stop_n
         |FROM documents)
         |SELECT doc_id, chars_n, words_n,
         |  CAST(punct_n AS DOUBLE)/chars_n AS punct_ratio,
         |  CAST(stop_n AS DOUBLE)/words_n AS stop_ratio,
         |  CAST(stop_n AS DOUBLE)/words_n*0.5 + (1.0 - CAST(punct_n AS DOUBLE)/chars_n)*0.3 + least(words_n,100)/100.0*0.2 AS quality,
         |  CAST(stop_n AS DOUBLE)/words_n*0.5 + (1.0 - CAST(punct_n AS DOUBLE)/chars_n)*0.3 + least(words_n,100)/100.0*0.2 >= 0.5 AS keep
         |FROM b ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      // FNV-1a with Java wrap-around, emulated EXACTLY in DuckDB: codepoints
      // re-encode to UTF-8 bytes (the hash is over bytes, not chars), the
      // fold runs in HUGEINT mod 2^64 (the 2^104-bit product fits int128),
      // xor touches only the low byte (h ^ b == h - h%256 + xor(h%256, b)
      // for b < 256), and the final value re-signs into BIGINT — verified
      // bit-equal to the JVM kernel on ASCII, 2/3/4-byte UTF-8.
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(flatten(list_transform(range(1, length(text)+1), i -> (
        |      CASE
        |        WHEN ord(text[i]) < 128 THEN [ord(text[i])]
        |        WHEN ord(text[i]) < 2048 THEN [192 + ord(text[i]) // 64, 128 + ord(text[i]) % 64]
        |        WHEN ord(text[i]) < 65536 THEN [224 + ord(text[i]) // 4096, 128 + (ord(text[i]) // 64) % 64, 128 + ord(text[i]) % 64]
        |        ELSE [240 + ord(text[i]) // 262144, 128 + (ord(text[i]) // 4096) % 64, 128 + (ord(text[i]) // 64) % 64, 128 + ord(text[i]) % 64]
        |      END))) AS BIGINT[]) AS bytes
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST('14695981039346656037' AS HUGEINT), list_transform(bytes, x -> CAST(x AS HUGEINT))),
        |    (h, x) -> ((h - (h % 256) + CAST(xor(CAST(h % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT)) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)
        |  ) AS uh
        |  FROM b)
        |SELECT doc_id, CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
        |  THEN CAST(uh - CAST('18446744073709551616' AS HUGEINT) AS BIGINT)
        |  ELSE CAST(uh AS BIGINT) END AS fingerprint
        |FROM h ORDER BY doc_id""".stripMargin,

    "heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text,' ')) AS tok FROM documents),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w)
        |SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |FROM w, t GROUP BY tok, t.n HAVING COUNT(*) > t.n*0.01
        |ORDER BY tok""".stripMargin,

    "group_heavy_hitters" ->
      // CAST(n AS DOUBLE) forces the same IEEE threshold Spark computes
      // (a DECIMAL 0.05 × BIGINT would be exact and could differ at a
      // boundary count)
      """WITH w AS (SELECT lang, unnest(string_split(text,' ')) AS tok FROM documents),
        |t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1)
        |SELECT w.lang AS lang, tok, CAST(COUNT(*) AS BIGINT) AS c
        |FROM w JOIN t ON w.lang = t.lang
        |GROUP BY w.lang, tok, t.n HAVING COUNT(*) > CAST(t.n AS DOUBLE)*0.01
        |ORDER BY w.lang, tok""".stripMargin,

    "text_pii_scrub" -> {
      val pats = graft.operators.TextOps.PiiPatterns
      val scrub = pats.foldLeft("text") { case (acc, (pat, tag)) =>
        // DuckDB single-quoted literals keep backslashes verbatim
        s"regexp_replace($acc, '$pat', '$tag', 'g')"
      }
      // count matches on the ORIGINAL text, mirroring TextOps.textPiiScrub
      val counts = pats.map { case (pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)"
      }.mkString(" + ")
      s"""WITH s AS (SELECT doc_id, text, $scrub AS sc FROM documents)
         |SELECT doc_id, md5(sc) AS scrubbed_md5,
         |  $counts AS n_redactions,
         |  sc <> text AS had_pii
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "corpus_filter" -> {
      val scores = graft.operators.TextOps.Langs
        .map(l => s"${stopHits(l)} AS s_$l").mkString(",\n  ")
      s"""WITH b AS (SELECT doc_id, lang, text,
         |  CAST(length(text) AS BIGINT) AS chars_n,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS words_n,
         |  CAST(length(text) - length(regexp_replace(text,'[.,;:!?]','','g')) AS BIGINT) AS punct_n,
         |  $scores
         |FROM documents),
         |s AS (SELECT doc_id, lang, text,
         |  CAST(s_en AS DOUBLE)/words_n*0.5 + (1.0 - CAST(punct_n AS DOUBLE)/chars_n)*0.3 + least(words_n,100)/100.0*0.2 AS quality,
         |  CASE WHEN s_en>=s_es AND s_en>=s_de AND s_en>=s_fr AND s_en>=s_zh THEN 'en'
         |       WHEN s_es>=s_de AND s_es>=s_fr AND s_es>=s_zh THEN 'es'
         |       WHEN s_de>=s_fr AND s_de>=s_zh THEN 'de'
         |       WHEN s_fr>=s_zh THEN 'fr'
         |       ELSE 'zh' END AS pred_lang
         |FROM b),
         |k AS (SELECT * FROM s WHERE quality >= 0.5 AND pred_lang = lang)
         |SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_dups,
         |  arg_min(quality, doc_id) AS keep_quality
         |FROM k GROUP BY md5(text) ORDER BY h""".stripMargin
    },

    "text_tokens" -> {
      // the regex passes into DuckDB's single-quoted literal verbatim
      val pat = graft.operators.TextOps.BpeishRegex
      s"""SELECT doc_id,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text,'$pat')) AS BIGINT) AS re_tokens,
         |  CAST(length(text) AS DOUBLE)/CAST(len(regexp_extract_all(text,'$pat')) AS BIGINT) AS chars_per_token
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "repetition_stats" -> repetitionStatsSql,


    "bm25_topk" -> {
      import graft.operators.RetrievalOps.{QueryTerms, K1, B, TopK}
      // interpolating the Scala doubles guarantees the SQL literal parses
      // back to the IDENTICAL double (shortest-roundtrip repr)
      val k1p1 = K1 + 1
      val tfs = QueryTerms.map(t =>
        s"CAST(len(list_filter(w, y -> y = '$t')) AS BIGINT) AS tf_$t").mkString(",\n  ")
      val dfs = QueryTerms.map(t =>
        s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n  ")
      // every mixed term forces DOUBLE: DuckDB parses bare decimal
      // literals as exact DECIMALs, and BIGINT±DECIMAL math is exact —
      // not the IEEE chain Spark computes — unless one operand is DOUBLE
      val score = QueryTerms.map(t =>
        s"(CAST(n - df_$t AS DOUBLE) + 0.5)/(CAST(df_$t AS DOUBLE) + 0.5)*(CAST(tf_$t AS DOUBLE)*$k1p1)/(CAST(tf_$t AS DOUBLE) + $K1*(1.0 - $B + $B*(CAST(dl AS DOUBLE)/(CAST(sumdl AS DOUBLE)/n))))")
        .mkString(" + ")
      val tfList = QueryTerms.map(t => s"tf_$t").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |d AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |  $tfs
         |FROM t),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
         |  $dfs
         |FROM d),
         |sc AS (SELECT doc_id, dl, $tfList,
         |  $score AS score
         |FROM d CROSS JOIN st),
         |top AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT $TopK)
         |SELECT doc_id, dl, $tfList, score,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
         |FROM top ORDER BY rnk""".stripMargin
    },

    "dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
         |c AS (SELECT DISTINCT h FROM d WHERE doc_id < ${graft.operators.DedupOps.IncrementalSplit}),
         |b AS (SELECT doc_id, h,
         |        row_number() OVER (PARTITION BY h ORDER BY doc_id) > 1 AS dup_in_batch
         |      FROM d WHERE doc_id >= ${graft.operators.DedupOps.IncrementalSplit})
         |SELECT b.doc_id, b.h, c.h IS NOT NULL AS dup_of_corpus, b.dup_in_batch,
         |  (c.h IS NULL AND NOT b.dup_in_batch) AS keep
         |FROM b LEFT JOIN c ON b.h = c.h ORDER BY b.doc_id""".stripMargin,

    "rare_token_stats" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM t GROUP BY tok)
         |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN f.freq <= ${graft.operators.TextOps.RareMaxFreq} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(SUM(CASE WHEN f.freq <= ${graft.operators.TextOps.RareMaxFreq} THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS rare_frac,
         |  CAST(SUM(CASE WHEN f.freq <= ${graft.operators.TextOps.RareMaxFreq} THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) <= ${graft.operators.TextOps.RareMaxFrac} AS keep
         |FROM t JOIN f USING (tok) GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // the 5-term concat chain mirrors TextOps.SpanK = 5 (same w[i]||' '||…
    // shape as ngram_counts/decontaminate, two terms wider)
    "repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS gram
         |      FROM t, UNNEST(generate_series(1, len(w)-${graft.operators.TextOps.SpanK - 1})) AS u(i)
         |      WHERE len(w) >= ${graft.operators.TextOps.SpanK}),
         |gd AS (SELECT gram, doc_id, COUNT(*) AS cnt FROM g GROUP BY gram, doc_id),
         |wd AS (SELECT doc_id, cnt,
         |       COUNT(*) OVER (PARTITION BY gram) AS n_docs FROM gd),
         |per AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_spans,
         |        CAST(SUM(CASE WHEN n_docs >= ${graft.operators.TextOps.SpanDupMinDocs}
         |                 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup_spans
         |        FROM wd GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(n_spans, 0) AS n_spans,
         |  COALESCE(n_dup_spans, 0) AS n_dup_spans,
         |  CASE WHEN COALESCE(n_spans, 0) > 0
         |       THEN CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE)
         |       ELSE 0.0 END AS dup_frac
         |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,

    // same SpanK=5 gram chain as repeated_spans; positions are 1-based
    // here vs Spark's 0-based posexplode — they never cross engines, only
    // key the anti-join within each
    "span_scrub" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, i AS pos,
         |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS gram
         |      FROM t, UNNEST(generate_series(1, len(w)-${graft.operators.TextOps.SpanK - 1})) AS u(i)
         |      WHERE len(w) >= ${graft.operators.TextOps.SpanK}),
         |df AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
         |       GROUP BY gram HAVING COUNT(*) >= ${graft.operators.TextOps.SpanDupMinDocs}),
         |cov AS (SELECT DISTINCT doc_id, pos + j AS wpos
         |        FROM g SEMI JOIN df USING (gram),
         |             UNNEST(generate_series(0, ${graft.operators.TextOps.SpanK - 1})) AS v(j)),
         |words AS (SELECT doc_id, i AS wpos, w[i] AS word
         |          FROM t, UNNEST(generate_series(1, len(w))) AS u(i)),
         |kept AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         string_agg(word, ' ' ORDER BY wpos) AS clean_text
         |         FROM (SELECT * FROM words ANTI JOIN cov USING (doc_id, wpos))
         |         GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
         |  CAST(len(string_split(d.text, ' ')) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
         |  COALESCE(clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,

    // unrolled power iteration: GraphOps.PRIterations rounds of the exact
    // integer recurrence (teleport + (85*(pr//deg))//100 per in-edge) —
    // BIGINT-only arithmetic, so the recursion is hash-exact vs Spark
    "graph_pagerank" -> {
      val t = graft.operators.GraphOps.TeleportE12
      val steps = (1 to graft.operators.GraphOps.PRIterations).map { k =>
        s"""r$k AS (SELECT e.dst AS node,
           |  $t + CAST(SUM((85 * (r.pr // d.deg)) // 100) AS BIGINT) AS pr
           |  FROM r${k - 1} r JOIN deg d ON r.node = d.node
           |  JOIN edges e ON r.node = e.src GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
         |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
         |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
         |$steps
         |SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  node // 2 AS key, pr AS rank_e12
         |FROM r${graft.operators.GraphOps.PRIterations} ORDER BY node_id""".stripMargin
    },

    // min-label closure as a recursive CTE: min reachable id over the
    // symmetric edge set == the component min that Spark's pointer-
    // jumping converges to (a min is iteration-order-free, so the two
    // very different algorithms share one fixed point). The CTE is
    // O(component²) pairs — fine at the check SFs, which is exactly why
    // the Spark side is the 100 TB path and this is only the oracle.
    "graph_components" -> graphComponentsSql,

    // Personalized PageRank: the global twin with a seeded CASE teleport
    // (r0 = 1e12 on the BUILDING-segment customers, 0 elsewhere; per
    // round teleport 0.15e12 only on seeds). Same unrolled rounds, same
    // integer recurrence.
    "graph_ppr" -> {
      val t = graft.operators.GraphOps.TeleportE12
      val steps = (1 to graft.operators.GraphOps.PRIterations).map { k =>
        s"""r$k AS (SELECT e.dst AS node,
           |  (CASE WHEN sd.node IS NOT NULL THEN $t ELSE 0 END) +
           |  CAST(SUM((85 * (r.pr // d.deg)) // 100) AS BIGINT) AS pr
           |  FROM r${k - 1} r JOIN deg d ON r.node = d.node
           |  JOIN edges e ON r.node = e.src
           |  LEFT JOIN sd ON sd.node = e.dst
           |  GROUP BY e.dst, sd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
         |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
         |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
         |sd AS (SELECT DISTINCT c_custkey*2 AS node FROM customer
         |  WHERE c_mktsegment = 'BUILDING'),
         |r0 AS (SELECT d.node,
         |  CAST(CASE WHEN sd.node IS NOT NULL THEN 1000000000000 ELSE 0 END AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN sd ON sd.node = d.node),
         |$steps
         |SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  node // 2 AS key, pr AS ppr_e12
         |FROM r${graft.operators.GraphOps.PRIterations} ORDER BY node_id""".stripMargin
    },

    // Deterministic hash-seeded walks: neighbor ranks from one window,
    // each step unrolled as an equi-join on (node, rank) where rank =
    // ((node mod 1000003)*2654435761 + step*40503) mod deg — bounded
    // BIGINT operands, no wrap on either engine.
    "graph_random_walks" ->
      s"""WITH $randomWalksCtes
         |SELECT start, node, step FROM wu
         |ORDER BY start, step""".stripMargin,

    // second-order biased walks over the hash-capped adjacency — the
    // full twin lives in node2vecWalkCtes (shared with node2vec_pmi)
    "node2vec_walks" ->
      s"""WITH $node2vecWalkCtes
         |SELECT start, node, step FROM wu2
         |ORDER BY start, step""".stripMargin,

    // incremental refresh across the IncrBatchMod admission split must
    // equal walking the grown graph from scratch (the replay theorem:
    // untouched-visiting walks replay bit-identically; invalidated and
    // new starts re-derive on the full adjacency) — so each incremental
    // key's oracle is its full-walk twin VERBATIM, and the hash check
    // IS the keep/redo-union correctness proof.
    "walks_incremental" ->
      s"""WITH $randomWalksCtes
         |SELECT start, node, step FROM wu
         |ORDER BY start, step""".stripMargin,
    "walks_n2v_incremental" ->
      s"""WITH $node2vecWalkCtes
         |SELECT start, node, step FROM wu2
         |ORDER BY start, step""".stripMargin,

    // walks -> skip-gram pairs -> exact-integer PMI ratio: the walk
    // chain is graph_random_walks' twin verbatim (the landed store
    // equals a from-scratch generation — walks are deterministic), and
    // the panel is pure integer count arithmetic, so one oracle
    // hash-checks the landing AND the PMI math end to end.
    "walk_pmi" -> pmiSqlOver(randomWalksCtes, "wu"),

    // the same panel over the landed SECOND-order corpus: the walk
    // chain is node2vec_walks' twin verbatim (deterministic, so the
    // `walks_n2v/` landing equals a from-scratch generation) — one
    // oracle hash-checks the n2v landing AND its PMI math end to end.
    "node2vec_pmi" -> pmiSqlOver(node2vecWalkCtes, "wu2"),

    // The landed label store serves the SAME fixed point a full rebuild
    // computes (labels are component minima, order-free), so the probe
    // key shares the full-recompute twin verbatim — hash equality checks
    // the store-read path against the from-scratch definition.
    "graph_label_probe" -> graphComponentsSql,

    // NN-Descent-style candidate generation over the exact cosine kNN
    // graph: topk per vector (same dot/cos idiom as ann_cosine_topk, no
    // query modulus — every vector is a node), symmetrized canonical
    // edges, then wedge counting with RA = Σ 1e6 // deg(z) computed at
    // the wedge and Jaccard from endpoint degrees — integer divisions
    // only, both sides.
    "link_prediction" -> {
      val k = graft.operators.GraphOps.KnnK
      s"""WITH n AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |p AS (SELECT a.vec_id AS src, b.vec_id AS nb,
         |  ${cosSim(dotE12("a.embedding", "b.embedding"), "a.nrm", "b.nrm")} AS cs
         |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
         |topk AS (SELECT src, nb FROM (SELECT *, row_number() OVER
         |  (PARTITION BY src ORDER BY cs DESC, nb) rn FROM p) WHERE rn <= $k),
         |$lpScoreTail""".stripMargin
    },

    // the landed-index edge source: the IVF-PQ twin's ranked neighbor
    // lists (all-queries, top-KnnK by approximate distance) feed the
    // IDENTICAL wedge-scoring tail — one oracle hash-checks the edge
    // substrate swap end to end
    "link_prediction_indexed" ->
      s"""${annIvfPqCtes("TRUE", "TRUE")},
         |topk AS (SELECT q_id AS src, n_id AS nb FROM rk
         |  WHERE rnk <= ${graft.operators.GraphOps.KnnK}),
         |$lpScoreTail""".stripMargin,

    // walks → PMI → agreement against the index's own edges, all in one
    // id space: the IVF-PQ twin's kNN substrate is symmetrized, the
    // capped second-order walk chain runs over it verbatim, the PMI body
    // ranks each node's partners, and the tail LEFT-joins each node's
    // top-T back against the direct edge set — exact integers end to
    // end, so one hash checks the whole walks→PMI→embedding-eval loop.
    "pmi_ann_agreement" -> {
      val t = graft.operators.GraphOps.PmiTopT
      s"""${annIvfPqCtes("TRUE", "TRUE")},
         |e AS MATERIALIZED (SELECT DISTINCT least(q_id, n_id) AS u, greatest(q_id, n_id) AS v
         |  FROM rk WHERE rnk <= ${graft.operators.GraphOps.KnnK}),
         |edges AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
         |$node2vecStepsOverEdges,
         |${pmiCtesOver("wu2")},
         |sympmi AS (SELECT a AS node, b AS nb, pmi_ratio_e6 FROM pmif
         |  UNION ALL SELECT b, a, pmi_ratio_e6 FROM pmif),
         |topp AS (SELECT node, nb FROM (SELECT *, row_number() OVER
         |  (PARTITION BY node ORDER BY pmi_ratio_e6 DESC, nb) AS rn FROM sympmi)
         |  WHERE rn <= $t)
         |SELECT t.node, CAST(COUNT(*) AS BIGINT) AS top_pmi,
         |  CAST(SUM(CASE WHEN ed.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ann_hits,
         |  (CAST(SUM(CASE WHEN ed.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(COUNT(*) AS BIGINT) AS agreement_e6
         |FROM topp t LEFT JOIN e ed
         |  ON ed.u = least(t.node, t.nb) AND ed.v = greatest(t.node, t.nb)
         |GROUP BY t.node
         |ORDER BY node""".stripMargin
    },

    // the incremental key's contract IS "equals a full rebuild": landed
    // labels are component minima, so contracting a batch against them
    // and re-labeling only the touched components reaches the same
    // min-id fixed point — one oracle covers both paths verbatim (the
    // ann_index_probe / annIvfPqSql sharing pattern)
    "graph_components_incremental" -> graphComponentsSql,

    // textbook id-canonical 3-way self-join (each triangle a<b<c found
    // once) — no orientation needed here; hash equality against the
    // degree-oriented Spark plan is the point of the twin
    "graph_triangles" -> {
      val m = graft.operators.GraphOps.SuppMinCoOrders
      s"""WITH os AS (SELECT DISTINCT o_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT a.sk AS u, b.sk AS v FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $m),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
         |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
         |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1
         |  JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         |pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM
         |  (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
         |  GROUP BY 1)
         |SELECT d.node AS suppkey, d.degree,
         |  COALESCE(pn.triangles, 0) AS triangles,
         |  CASE WHEN d.degree >= 2
         |    THEN (2 * COALESCE(pn.triangles, 0) * 1000000) // (d.degree * (d.degree - 1))
         |    ELSE 0 END AS clustering_e6
         |FROM deg d LEFT JOIN pn ON pn.node = d.node ORDER BY suppkey""".stripMargin
    },

    // synchronous LPA unrolled (the graph_pagerank trick): per round,
    // neighbor-label votes -> (votes DESC, label ASC) argmax per node —
    // both total-ordered, so the rounds are hash-exact cross-engine
    "graph_label_prop" -> {
      val m = graft.operators.GraphOps.SuppMinCoOrders
      val rounds = graft.operators.GraphOps.LpaRounds
      val steps = (1 to rounds).map { k =>
        s"""v$k AS (SELECT e.src AS node, r.lbl, CAST(COUNT(*) AS BIGINT) AS votes
           |  FROM r${k - 1} r JOIN edges e ON r.node = e.dst GROUP BY 1, 2),
           |r$k AS (SELECT node, lbl FROM (SELECT *, row_number() OVER
           |  (PARTITION BY node ORDER BY votes DESC, lbl) AS rn FROM v$k) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH os AS (SELECT DISTINCT o_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |pr AS (SELECT a.sk AS u, b.sk AS v FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $m),
         |edges AS (SELECT u AS src, v AS dst FROM pr UNION ALL SELECT v, u FROM pr),
         |r0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
         |$steps,
         |sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
         |  FROM r$rounds GROUP BY 1)
         |SELECT r.node AS suppkey, r.lbl AS community, s.community_size
         |FROM r$rounds r JOIN sz s USING (lbl) ORDER BY suppkey""".stripMargin
    },

    // recursive BFS walk from the min node id, UNION-distinct on
    // (node, d) and depth-capped at the SAME BfsMaxDepth constant the
    // Spark loop stops at — min over the walk == frontier BFS level
    "graph_bfs" -> {
      val cap = graft.operators.GraphOps.BfsMaxDepth
      s"""WITH RECURSIVE p AS (SELECT DISTINCT o.o_custkey*2 AS c, l.l_suppkey*2+1 AS s
         |     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
         |walk(node, d) AS (
         |  SELECT MIN(src), 0 FROM edges
         |  UNION
         |  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON w.node = e.src
         |  WHERE w.d < $cap)
         |SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  node // 2 AS key, CAST(MIN(d) AS BIGINT) AS dist
         |FROM walk GROUP BY node ORDER BY node_id""".stripMargin
    },

    "target_affinity" -> {
      // hashed-token bucket via the XXH64 emulation (B a power of two so
      // unsigned % = Spark's signed pmod); ratio doubles mirror the
      // Spark op order verbatim, floored to e6 per bucket
      val b = graft.operators.CurationOps.AffinityBuckets
      val tl = graft.operators.CurationOps.AffinityTargetLang
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tok AS (SELECT * FROM (SELECT doc_id, i, w[i] AS tok
         |  FROM t0, UNNEST(generate_series(1, len(w))) AS u(i)) WHERE length(tok) > 0),
         |src AS (SELECT doc_id, i, ${xxUtf8Bytes("tok")} AS bs FROM tok),
         |${xxStringCtes("src", Seq("doc_id", "i"))},
         |bk AS (SELECT xh.doc_id, CAST(xh % $b AS BIGINT) AS b, d.lang
         |  FROM xh JOIN documents d USING (doc_id)),
         |cc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_cnt,
         |  CAST(SUM(CASE WHEN lang = '$tl' THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
         |  FROM bk GROUP BY b),
         |tot AS (SELECT CAST(SUM(c_cnt) AS BIGINT) AS c_total,
         |  CAST(SUM(t_cnt) AS BIGINT) AS t_total FROM cc),
         |rt AS (SELECT b, CAST(FLOOR(((CAST(t_cnt AS DOUBLE) * c_total) /
         |  (CAST(c_cnt AS DOUBLE) * t_total)) * 1000000.0) AS BIGINT) AS ratio_e6
         |  FROM cc CROSS JOIN tot),
         |sc AS (SELECT bk.doc_id, CAST(SUM(rt.ratio_e6) AS BIGINT) AS score_sum,
         |  CAST(COUNT(*) AS BIGINT) AS n_tok FROM bk JOIN rt USING (b) GROUP BY bk.doc_id)
         |SELECT sc.doc_id, d.lang, d.lang = '$tl' AS is_target, sc.n_tok,
         |  CAST(sc.score_sum // sc.n_tok AS BIGINT) AS affinity_e6
         |FROM sc JOIN documents d USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "token_histogram" ->
      """WITH d AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |b AS (SELECT source, toks,
        |  CAST(length(bin(GREATEST(toks, 1))) AS BIGINT) AS bucket FROM d)
        |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS tokens_n,
        |  MIN(toks) AS min_toks, MAX(toks) AS max_toks
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "source_mix" ->
      """WITH per AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS docs_n,
        |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens_n,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_n
        |FROM documents GROUP BY 1, 2)
        |SELECT source, lang, docs_n, tokens_n, chars_n,
        |  CAST(tokens_n AS DOUBLE)/SUM(tokens_n) OVER () AS token_share
        |FROM per ORDER BY source, lang""".stripMargin,

    "embedding_centroids" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
        |  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000.0+0.5) AS BIGINT) AS v6
        |FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(v6) AS DOUBLE)/COUNT(*)/1000000.0 AS centroid
        |FROM e GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    "text_winnow" -> {
      val k = graft.operators.TextOps.WinnowK
      val w = graft.operators.TextOps.WinnowW
      val gram = (0 until k).map(j => s"wds[i+$j]").mkString(" || ' ' || ")
      // grams hash through the full XXH64 string emulation; winnowing =
      // min signed hash over each w-window of gram positions, distinct
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS wds FROM documents),
         |g AS (SELECT doc_id, i, $gram AS gram
         |  FROM t, UNNEST(generate_series(1, len(wds)-${k - 1})) AS u(i)
         |  WHERE len(wds) >= ${k + w - 1}),
         |src AS (SELECT doc_id, i, ${xxUtf8Bytes("gram")} AS bs FROM g),
         |${xxStringCtes("src", Seq("doc_id", "i"))},
         |win AS (SELECT doc_id, i,
         |  MIN(${xxSign("xh")}) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp,
         |  MAX(i) OVER (PARTITION BY doc_id) AS mx FROM xh)
         |SELECT DISTINCT doc_id, fp FROM win WHERE i <= mx - ${w - 1}
         |ORDER BY doc_id, fp""".stripMargin
    },

    "doc_embed" -> {
      val dims = graft.operators.TextOps.EmbedDims
      val sums = (0 until dims).map(i =>
        s"CAST(SUM(CASE WHEN dim = $i THEN sg ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n|  ")
      // per-token XXH64 through the full string emulation; dim = low 4
      // bits, sign = bit 4 (unsigned floor-div, matching Spark's >>>)
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tok AS (SELECT doc_id, i, w[i] AS tok
         |  FROM t0, UNNEST(generate_series(1, len(w))) AS u(i)),
         |src AS (SELECT doc_id, i, ${xxUtf8Bytes("tok")} AS bs FROM tok),
         |${xxStringCtes("src", Seq("doc_id", "i"))},
         |v AS (SELECT doc_id, CAST(xh % $dims AS BIGINT) AS dim,
         |  CASE WHEN (xh // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg FROM xh)
         |SELECT doc_id,
         |  $sums
         |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "chunk_embed" -> {
      val dims = graft.operators.TextOps.EmbedDims
      val sums = (0 until dims).map(i =>
        s"CAST(SUM(CASE WHEN dim = $i THEN sg ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n|  ")
      s"""WITH $chunkHashCtes
         |SELECT doc_id, chunk_id,
         |  $sums
         |FROM v GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin
    },

    "chunk_neighbors" ->
      s"""WITH $chunkScoredCtes,
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_doc, q_chunk
         |  ORDER BY cos_sim DESC, n_doc, n_chunk) AS BIGINT) AS rnk FROM sc)
         |SELECT q_doc, q_chunk, n_doc, n_chunk, cos_sim, rnk FROM rk WHERE rnk <= 5
         |ORDER BY q_doc, q_chunk, rnk""".stripMargin,

    "maxsim_retrieval" -> maxsimTail(chunkScoredCtes),

    "maxsim_retrieval_lsh" -> maxsimTail(chunkLshScoredCtes),

    // landed-chunk-artifact probe — bit-identical to the inline bucketed
    // MaxSim (bucket assignment is a pure function of the chunk vector;
    // the artifact just materializes it), so the twin is shared verbatim
    // (the retrieval_index_probe convention)
    "retrieval_index_probe_maxsim" -> maxsimTail(chunkLshScoredCtes),

    "doc_neighbors" -> docNeighborsSql,

    "doc_neighbors_lsh" -> docNeighborsLshSql,
    "doc_neighbors_ivf" -> docNeighborsIvfSql,

    "chunk_neighbors_lsh" -> chunkNeighborsLshSql,

    "hard_negatives_lsh" -> {
      // the ann_lsh twin with the cross-label predicate riding the same
      // candidate join (seeded planes inlined as literals)
      val masks = graft.operators.SimilarityOps.probeMasks(2)
        .mkString("[", ",", "]")
      s"""WITH n AS (SELECT vec_id, embedding, label, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |b AS (SELECT vec_id, embedding, label, nrm, ${lshBucketSql("embedding")} AS bucket FROM n),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, label AS q_label,
         |  unnest(list_transform($masks, m -> xor(bucket, m))) AS bucket
         |  FROM b WHERE vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0),
         |sc AS (SELECT q.q_id, q.q_label, e.vec_id AS n_id, e.label AS n_label,
         |  ${cosSim(dotE12("q_emb", "e.embedding"), "q_nrm", "e.nrm")} AS cos_sim
         |  FROM b e JOIN q ON e.bucket = q.bucket AND q.q_id <> e.vec_id
         |    AND q.q_label <> e.label),
         |r AS (SELECT q_id, q_label, n_id, n_label, cos_sim,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
         |SELECT q_id, q_label, n_id, n_label, cos_sim, rnk FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "lexical_neighbors" -> lexicalNeighborsSql,

    "hybrid_retrieval" -> hybridRetrievalSql,
    "hybrid_retrieval_ivf" -> hybridRetrievalIvfSql,
    "zorder_geometry" -> zorderGeometrySql,
    "mmr_diversify" -> mmrDiversifySql,

    "retrieval_index_probe" -> hybridRetrievalSql,

    "retrieval_index_probe_admitted" ->
      // the hybrid twin with the kept-token vocabulary frozen on the
      // corpus slice (batch docs score against it but never vote)
      hybridRetrievalSqlWhere(
        s"doc_id < ${graft.operators.DedupOps.IncrementalSplit}"),

    "retrieval_index_probe_compacted" ->
      // compaction is pure layout: same twin as the admitted probe
      hybridRetrievalSqlWhere(
        s"doc_id < ${graft.operators.DedupOps.IncrementalSplit}"),

    "retrieval_index_stats" -> {
      // the health panel re-derived from FIRST PRINCIPLES: the Spark
      // side reads the landed grown index (build on doc_id < split,
      // batch admitted); this twin recomputes every artifact count and
      // the OOV drift ratio from the documents table + the split
      // convention, so hash equality proves the landed index is exactly
      // what a from-scratch build+admit produces
      val split = graft.operators.DedupOps.IncrementalSplit
      val scale = graft.operators.RetrievalOps.RrfScale
      // the adaptive plane RULE mirrored in SQL (TextOps.adaptivePlanes:
      // smallest p with target·2^p ≥ built vectors, floored at the keyed
      // plane count) — hash equality proves the landed meta/ artifact is
      // exactly what the rule computes for the corpus slice
      val tgt = graft.operators.TextOps.DocBucketTarget
      val minPlanes = graft.operators.TextOps.DocPlanes
      s"""WITH ${lexicalBaseCtes(s"doc_id < $split")},
         |adm AS (SELECT doc_id, tok FROM ltk WHERE doc_id >= $split),
         |admo AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
         |  CAST(COALESCE(SUM(CASE WHEN k.tok IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS o
         |  FROM adm LEFT JOIN lkept k ON adm.tok = k.tok),
         |vstats AS (SELECT * FROM (WITH $docVecCtes
         |  SELECT CAST(COUNT(*) AS BIGINT) AS all_docs,
         |    CAST(COALESCE(SUM(CASE WHEN doc_id >= $split THEN 1 ELSE 0 END), 0) AS BIGINT) AS adm_docs,
         |    CAST(COALESCE(SUM(CASE WHEN doc_id < $split THEN 1 ELSE 0 END), 0) AS BIGINT) AS built
         |  FROM nrm WHERE n2 > 0))
         |SELECT metric, value FROM (
         |  SELECT 'admitted_docs_dense' AS metric, (SELECT adm_docs FROM vstats) AS value
         |  UNION ALL SELECT 'admitted_docs_sparse',
         |    (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM lsh WHERE doc_id >= $split)
         |  UNION ALL SELECT 'admitted_pairs_oov', (SELECT o FROM admo)
         |  UNION ALL SELECT 'admitted_pairs_total', (SELECT t FROM admo)
         |  UNION ALL SELECT 'buckets_docs', (SELECT all_docs FROM vstats)
         |  UNION ALL SELECT 'built_docs', (SELECT built FROM vstats)
         |  UNION ALL SELECT 'planes',
         |    (SELECT GREATEST(CAST($minPlanes AS BIGINT), COALESCE(
         |      (SELECT CAST(MIN(range) AS BIGINT) FROM range(0, 48)
         |       WHERE $tgt * (CAST(1 AS BIGINT) << range) >= (SELECT built FROM vstats)),
         |      CAST(48 AS BIGINT))))
         |  UNION ALL SELECT 'chunks_docs', (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT)
         |    FROM (WITH $chunkHashCtes,
         |      cf AS (SELECT doc_id, chunk_id, dim, CAST(SUM(sg) AS BIGINT) AS fv
         |        FROM v GROUP BY 1, 2, 3),
         |      cn AS (SELECT doc_id, chunk_id, CAST(SUM(fv*fv) AS BIGINT) AS n2
         |        FROM cf GROUP BY 1, 2)
         |      SELECT doc_id FROM cn WHERE n2 > 0))
         |  UNION ALL SELECT 'doclens_docs', (SELECT CAST(COUNT(*) AS BIGINT) FROM lsz)
         |  UNION ALL SELECT 'kept_vocab_size', (SELECT CAST(COUNT(*) AS BIGINT) FROM lkept)
         |  UNION ALL SELECT 'oov_e6',
         |    (SELECT CASE WHEN t = 0 THEN CAST(0 AS BIGINT)
         |            ELSE CAST((o * $scale) // t AS BIGINT) END FROM admo)
         |  UNION ALL SELECT 'postings_docs',
         |    (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM lsh)
         |  UNION ALL SELECT 'postings_rows', (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh)
         |  UNION ALL SELECT 'vectors_docs', (SELECT all_docs FROM vstats)
         |) ORDER BY metric""".stripMargin
    },

    "dedup_simhash" -> {
      val pow2 = (0 until 64).map(b => s"CAST('${BigInt(1) << b}' AS HUGEINT)")
        .mkString("[", ",", "]")
      val bandDiv = Seq("1", "65536", "4294967296", "281474976710656")
        .mkString("[", ",", "]")
      // per-token XXH64 → ±1 votes per bit (on the UNSIGNED value, so
      // (xh // 2^b) % 2 is exactly Java's >>> b & 1) → majority bits →
      // 16-bit band buckets (size in [2, MaxBucket]) → hamming via
      // bit_count(xor) on the re-signed signatures
      s"""WITH tk AS (SELECT doc_id, tok FROM
         |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |src AS (SELECT doc_id, ${xxUtf8Bytes("tok")} AS bs FROM tk),
         |${xxStringCtes("src", Seq("doc_id"))},
         |vt AS (SELECT doc_id, b,
         |  SUM(CASE WHEN (xh // ($pow2)[b+1]) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM xh, UNNEST(generate_series(0, 63)) AS bb(b) GROUP BY doc_id, b),
         |sg AS (SELECT doc_id,
         |  SUM(CASE WHEN v > 0 THEN ($pow2)[b+1] ELSE CAST(0 AS HUGEINT) END) AS usig
         |  FROM vt GROUP BY doc_id),
         |bb AS (SELECT doc_id, ${xxSign("usig")} AS sh, band,
         |  CAST((usig // ($bandDiv)[band+1]) % 65536 AS BIGINT) AS bucket
         |  FROM sg, UNNEST([0, 1, 2, 3]) AS bd(band)),
         |sz AS (SELECT band, bucket FROM bb GROUP BY band, bucket
         |  HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.DedupOps.MaxBucket}),
         |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |  JOIN sz ON a.band = sz.band AND a.bucket = sz.bucket)
         |SELECT doc_a, doc_b, hamming FROM pr WHERE hamming <= 16
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "bpe_merges" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      val union = (0 until n).map(r =>
        s"SELECT $r AS rank, l, r2, freq FROM m$r").mkString("\n|  UNION ALL ")
      s"""WITH ${bpeCtes(n)},
         |mg AS ($union)
         |SELECT CAST(rank AS INT) AS rank, l AS "left", r2 AS "right",
         |  CAST(freq AS BIGINT) AS freq, l || r2 AS token
         |FROM mg ORDER BY rank""".stripMargin
    },

    "bpe_tokens" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      s"""WITH ${bpeCtes(n)},
         |wtok AS (SELECT w, CAST(len(syms) AS BIGINT) AS w_toks FROM seg$n),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(w_toks) AS BIGINT) AS n_tokens
         |  FROM wd JOIN wtok USING (w) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_tokens,
         |  CAST(d.n_chars AS DOUBLE) / n_tokens AS chars_per_token
         |FROM agg JOIN documents d USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // Greedy MaxMatch vs the BPE fold under one learned vocabulary. The
    // greedy step table `stp` is precomputed OUTSIDE the recursion — per
    // (word, position), the cursor advance = length of the LONGEST vocab
    // token matching there (MAX over a plain LEFT JOIN; equal-length
    // matches are the same substring, so the max is unique), falling
    // back to 1 char. A matched token can never overshoot the word
    // (substr(w,pos,len)=t forces t to fit the remainder), so the walk
    // terminates at exactly pos = length(w)+1, which has no step row.
    // The recursion itself is join-only: a correlated aggregate inside a
    // recursive CTE mis-evaluates in DuckDB (observed nondeterministic),
    // the same reason graphComponentsSql recurses over joins.
    "wordpiece_tokens" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      val mu = (0 until n).map(r => s"SELECT l, r2 FROM m$r")
        .mkString("\n|  UNION ALL ")
      s"""WITH RECURSIVE ${bpeCtes(n)},
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT l || r2 AS t FROM ($mu)
         |  UNION
         |  SELECT DISTINCT w[ci] AS t FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)),
         |stp AS MATERIALIZED (SELECT p.w, p.pos,
         |  COALESCE(MAX(length(v.t)), 1) AS adv
         |  FROM (SELECT w, ci AS pos FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)) p
         |  LEFT JOIN vocab v ON v.t = substr(p.w, CAST(p.pos AS INT), length(v.t))
         |  GROUP BY p.w, p.pos),
         |walk(w, pos, ntok) AS (
         |  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wf
         |  UNION ALL
         |  SELECT s.w, s.pos + st.adv, s.ntok + 1
         |  FROM walk s JOIN stp st ON st.w = s.w AND st.pos = s.pos),
         |wp AS (SELECT w, ntok AS w_wp FROM walk WHERE pos = length(w) + 1),
         |bt AS (SELECT w, CAST(len(syms) AS BIGINT) AS w_bpe FROM seg$n),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(w_wp) AS BIGINT) AS n_wp_tokens,
         |  CAST(SUM(w_bpe) AS BIGINT) AS n_bpe_tokens
         |  FROM wd JOIN wp USING (w) JOIN bt USING (w) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_wp_tokens, n_bpe_tokens,
         |  (n_wp_tokens * 1000000) // n_bpe_tokens AS wp_vs_bpe_e6
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    // Shortest tokenization vs greedy under one learned vocabulary. The
    // the optimal_segment step table annotated with rank costs: token
    // freq = occurrence-weighted substring count, cost = row_number
    // under (freq DESC, t); the fallback step fires ONLY where no
    // 1-char vocab token matches (mirroring the kernel); reach
    // enumerates (pos, score) states (score = cost*scale + ntok,
    // additive per step) with UNION dedup, MIN(score) at the end is
    // Viterbi and MIN(score % scale) the count optimum off one state
    // set. Join-only recursion throughout.
    "viterbi_segment" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      val sc = graft.functions.Wordpiece.ViterbiScale
      val mu = (0 until n).map(r => s"SELECT l, r2 FROM m$r")
        .mkString("\n|  UNION ALL ")
      s"""WITH RECURSIVE ${bpeCtes(n)},
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT l || r2 AS t FROM ($mu)
         |  UNION
         |  SELECT DISTINCT w[ci] AS t FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)),
         |wpos AS MATERIALIZED (SELECT w, cnt, ci AS pos FROM wf,
         |  UNNEST(range(1, length(w)+1)) AS u(ci)),
         |occ AS (SELECT v.t, CAST(COALESCE(SUM(p.cnt), 0) AS BIGINT) AS freq
         |  FROM vocab v LEFT JOIN wpos p
         |    ON substr(p.w, CAST(p.pos AS INT), length(v.t)) = v.t
         |  GROUP BY v.t),
         |vc AS MATERIALIZED (SELECT t,
         |  CAST(row_number() OVER (ORDER BY freq DESC, t) AS BIGINT) AS c
         |  FROM occ),
         |nv AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS fb FROM vc),
         |stp AS MATERIALIZED (
         |  SELECT p.w, p.pos, CAST(length(vc.t) AS BIGINT) AS adv, vc.c
         |  FROM wpos p
         |  JOIN vc ON vc.t = substr(p.w, CAST(p.pos AS INT), length(vc.t))
         |  UNION ALL
         |  SELECT p.w, p.pos, CAST(1 AS BIGINT), nv.fb
         |  FROM wpos p CROSS JOIN nv
         |  WHERE NOT EXISTS (SELECT 1 FROM vc
         |    WHERE vc.t = substr(p.w, CAST(p.pos AS INT), 1))),
         |reach(w, pos, score) AS (
         |  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wf
         |  UNION
         |  SELECT s.w, s.pos + st.adv, s.score + st.c * $sc + 1
         |  FROM reach s JOIN stp st ON st.w = s.w AND st.pos = s.pos),
         |fin AS (SELECT w, MIN(score) AS vsc, MIN(score % $sc) AS w_opt
         |  FROM reach WHERE pos = length(w) + 1 GROUP BY w),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(vsc // $sc) AS BIGINT) AS vit_cost,
         |  CAST(SUM(vsc % $sc) AS BIGINT) AS n_vit_tokens,
         |  CAST(SUM(w_opt) AS BIGINT) AS n_opt_tokens
         |  FROM wd JOIN fin USING (w) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_vit_tokens, vit_cost, n_opt_tokens,
         |  (n_vit_tokens * 1000000) // n_opt_tokens AS viterbi_overhead_e6
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    // step table generalizes wordpiece's max-advance to ALL matching
    // advances (plus the 1-char fallback, UNION-dedup'd); the reach
    // recursion enumerates (pos, ntok) STATES with UNION dedup (state
    // space <= len^2 per word), and MIN(ntok) at pos = len+1 is the DP
    // optimum. Join-only recursion (the wordpiece_tokens lesson); the
    // greedy walk reuses the same table via its MAX(adv) projection.
    "optimal_segment" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      val mu = (0 until n).map(r => s"SELECT l, r2 FROM m$r")
        .mkString("\n|  UNION ALL ")
      s"""WITH RECURSIVE ${bpeCtes(n)},
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT l || r2 AS t FROM ($mu)
         |  UNION
         |  SELECT DISTINCT w[ci] AS t FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)),
         |stp AS MATERIALIZED (
         |  SELECT p.w, p.pos, CAST(length(v.t) AS BIGINT) AS adv
         |  FROM (SELECT w, ci AS pos FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)) p
         |  JOIN vocab v ON v.t = substr(p.w, CAST(p.pos AS INT), length(v.t))
         |  UNION
         |  SELECT w, ci AS pos, CAST(1 AS BIGINT) FROM wf,
         |    UNNEST(range(1, length(w)+1)) AS u(ci)),
         |reach(w, pos, ntok) AS (
         |  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wf
         |  UNION
         |  SELECT s.w, s.pos + st.adv, s.ntok + 1
         |  FROM reach s JOIN stp st ON st.w = s.w AND st.pos = s.pos),
         |opt AS (SELECT w, MIN(ntok) AS w_opt FROM reach
         |  WHERE pos = length(w) + 1 GROUP BY w),
         |gst AS MATERIALIZED (SELECT w, pos, MAX(adv) AS adv FROM stp
         |  GROUP BY w, pos),
         |walk(w, pos, ntok) AS (
         |  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wf
         |  UNION ALL
         |  SELECT s.w, s.pos + st.adv, s.ntok + 1
         |  FROM walk s JOIN gst st ON st.w = s.w AND st.pos = s.pos),
         |wp AS (SELECT w, ntok AS w_wp FROM walk WHERE pos = length(w) + 1),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(w_opt) AS BIGINT) AS n_opt_tokens,
         |  CAST(SUM(w_wp) AS BIGINT) AS n_wp_tokens
         |  FROM wd JOIN opt USING (w) JOIN wp USING (w) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_opt_tokens, n_wp_tokens,
         |  (n_wp_tokens * 1000000) // n_opt_tokens AS greedy_overhead_e6
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    "bpe_fertility" -> {
      val n = graft.operators.TokenizerOps.NumMerges
      s"""WITH ${bpeCtes(n)},
         |wtok AS (SELECT w, CAST(len(syms) AS BIGINT) AS w_toks FROM seg$n),
         |wd AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(w_toks) AS BIGINT) AS n_tokens
         |  FROM wd JOIN wtok USING (w) GROUP BY doc_id),
         |j AS (SELECT d.source, agg.n_words, agg.n_tokens, d.n_chars
         |  FROM agg JOIN documents d USING (doc_id)),
         |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM j GROUP BY source)
         |SELECT source, n_docs, n_words, n_tokens,
         |  CAST(n_tokens AS DOUBLE)/CAST(n_words AS DOUBLE) AS fertility,
         |  CAST(n_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS chars_per_token
         |FROM g ORDER BY source""".stripMargin
    },

    "mm_metadata" ->
      s"""WITH $mmDimsCtes,
         |st AS (SELECT doc_id, media_type, kind, w, h, ch, nf, bl,
         |  CAST(list_sum(list_transform(range(0, bl), i -> ${mmByte("i")})) AS BIGINT) AS body_sum
         |  FROM d3)
         |SELECT doc_id, media_type, 14 + bl AS byte_len, TRUE AS valid, kind,
         |  w AS width, h AS height, ch AS channels, nf AS n_frames, bl AS body_len,
         |  CAST(body_sum AS DOUBLE) / bl AS feat_mean,
         |  CAST(GREATEST(1, FLOOR(w * (224.0 / GREATEST(w, h)) + 0.5)) AS INT) AS out_width,
         |  CAST(GREATEST(1, FLOOR(h * (224.0 / GREATEST(w, h)) + 0.5)) AS INT) AS out_height
         |FROM st ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      s"""WITH $mmDimsCtes
         |SELECT doc_id, CAST(idx AS INT) AS frame_idx,
         |  CAST(w AS BIGINT) * h * ch AS frame_len,
         |  CAST(list_sum(list_transform(
         |    range(idx * (CAST(w AS BIGINT) * h * ch), (idx + 1) * (CAST(w AS BIGINT) * h * ch)),
         |    i -> ${mmByte("i")})) AS BIGINT) AS frame_sum
         |FROM d3, UNNEST(generate_series(0, nf - 1)) AS fr(idx)
         |WHERE kind = 2 AND idx % ${graft.functions.MediaCodec.SampleEvery} = 0
         |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_features" -> {
      // float32 bucket accumulation folded in byte order (DuckDB REAL
      // arithmetic is IEEE float32 — probed bit-equal to the JVM), then
      // the double-precision norm, REAL re-normalization, and the FNV-1a
      // checksum over the e6-scaled components in HUGEINT mod 2^64
      val dim = graft.functions.MediaCodec.FeatureDim
      val rawF = (0 until dim).map(j =>
        s"list_reduce(list_prepend(CAST(0 AS REAL), list_transform(range($j, bl, $dim), " +
          s"i -> CAST(CAST(${mmByte("i")} AS REAL) / CAST(255 AS REAL) AS REAL))), " +
          s"(a, x) -> CAST(a + x AS REAL)) AS r$j").mkString(",\n|  ")
      val n2 = (0 until dim).map(j =>
        s"CAST(r$j AS DOUBLE) * CAST(r$j AS DOUBLE)").mkString(" + ")
      val normF = (0 until dim).map(j =>
        s"CASE WHEN nrm = 0 THEN r$j ELSE CAST(CAST(r$j AS DOUBLE) / nrm AS REAL) END AS f$j")
        .mkString(",\n|  ")
      val scaled = (0 until dim).map(j =>
        s"CAST(FLOOR(CAST(f$j AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT) % 4294967296")
        .mkString("[", ", ", "]")
      s"""WITH $mmDimsCtes,
         |rf AS MATERIALIZED (SELECT doc_id, media_type, bl,
         |  $rawF
         |  FROM d3),
         |nr AS MATERIALIZED (SELECT *, sqrt($n2) AS nrm FROM rf),
         |fv AS MATERIALIZED (SELECT doc_id, media_type,
         |  $normF
         |  FROM nr),
         |ck AS (SELECT *, list_reduce(
         |  list_prepend(CAST('14695981039346656037' AS HUGEINT), $scaled),
         |  (hh, x) -> ((hh - (hh % 4294967296) +
         |    CAST(xor(CAST(hh % 4294967296 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
         |    * 1099511628211) % $XxM) AS uck FROM fv)
         |SELECT doc_id, media_type, $dim AS dim, ${xxSign("uck")} AS feat_checksum,
         |  ${(0 until dim).map(j => s"f$j").mkString(", ")}
         |FROM ck ORDER BY doc_id""".stripMargin
    },

    "dedup_minhash_lsh" -> {
      // The FULL MinHash-LSH candidate pipeline, bit-exact in DuckDB:
      // shingle → XXH64 string hash (hb) → 32 signature slots, slot k =
      // min over hashLong(hb, slot_seed(k)) with slot_seed(k) =
      // XXH64.hashInt(k, 42) interpolated straight from Spark's own
      // kernel — then 8 band buckets, each a 4-deep hashLong fold over
      // the band's signature slots from seed 42 (Spark's multi-arg
      // xxhash64), bucket-size cap [2, MaxBucket], in-bucket pairs.
      val seeds = (0 until graft.functions.MinHash32.K).map { k =>
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L)
        s"CAST('${(BigInt(v) + (BigInt(1) << 64)) % (BigInt(1) << 64)}' AS HUGEINT)"
      }.mkString("[", ",", "]")
      val slotChain = xxHashLongCtes("sl", "kx", Seq("doc_id", "k"), "xh", "sseed")
        .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      def bandChain(p: String, src: String, rest: Seq[String], slot: String,
          seed: String) =
        xxHashLongCtes(p, src, Seq("doc_id", "band") ++ rest, xxUnsign(slot), seed)
          .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS wds FROM documents),
         |g AS (SELECT doc_id, wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS gram
         |  FROM t, UNNEST(generate_series(1, len(wds)-2)) AS u(i) WHERE len(wds) >= 3),
         |src AS (SELECT doc_id, ${xxUtf8Bytes("gram")} AS bs FROM g),
         |${xxStringCtes("src", Seq("doc_id"))},
         |kx AS (SELECT doc_id, xh, kk AS k, ($seeds)[kk+1] AS sseed
         |  FROM xh, UNNEST(generate_series(0, 31)) AS ks(kk)),
         |$slotChain,
         |sm AS (SELECT doc_id, k, MIN(${xxSign("slout")}) AS smin FROM sls7 GROUP BY doc_id, k),
         |bands AS (SELECT doc_id, k // 4 AS band,
         |  MAX(CASE WHEN k % 4 = 0 THEN smin END) AS s1,
         |  MAX(CASE WHEN k % 4 = 1 THEN smin END) AS s2,
         |  MAX(CASE WHEN k % 4 = 2 THEN smin END) AS s3,
         |  MAX(CASE WHEN k % 4 = 3 THEN smin END) AS s4
         |  FROM sm GROUP BY doc_id, k // 4),
         |${bandChain("c1", "bands", Seq("s2", "s3", "s4"), "s1", "CAST(42 AS HUGEINT)")},
         |${bandChain("c2", "c1s7", Seq("s3", "s4"), "s2", "c1out")},
         |${bandChain("c3", "c2s7", Seq("s4"), "s3", "c2out")},
         |${bandChain("c4", "c3s7", Seq(), "s4", "c3out")},
         |bb AS (SELECT doc_id, band, ${xxSign("c4out")} AS bucket FROM c4s7),
         |sz AS (SELECT band, bucket FROM bb GROUP BY band, bucket
         |  HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.DedupOps.MaxBucket}),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |  JOIN sz ON a.band = sz.band AND a.bucket = sz.bucket)
         |SELECT doc_a, doc_b, COUNT(*) AS n_bands FROM pr GROUP BY doc_a, doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_minhash_incremental" -> {
      // the fuzzy admission kernel: batch (doc_id >= split) vs corpus
      // (doc_id < split) candidates from the banded index (corpus
      // mega-buckets skipped, self-pairs guarded) + in-batch pairs
      // (earlier doc blocks, batch bucket size in [2, MaxBucket]), then
      // exact Jaccard >= 0.5 verified on candidates only — per-doc
      // verdicts exactly as admissionAgainstIndex aggregates them
      val split = graft.operators.DedupOps.IncrementalSplit
      val maxB = graft.operators.DedupOps.MaxBucket
      val seeds = (0 until graft.functions.MinHash32.K).map { k =>
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L)
        s"CAST('${(BigInt(v) + (BigInt(1) << 64)) % (BigInt(1) << 64)}' AS HUGEINT)"
      }.mkString("[", ",", "]")
      val slotChain = xxHashLongCtes("sl", "kx", Seq("doc_id", "k"), "xh", "sseed")
        .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      def bandChain(p: String, src: String, rest: Seq[String], slot: String,
          seed: String) =
        xxHashLongCtes(p, src, Seq("doc_id", "band") ++ rest, xxUnsign(slot), seed)
          .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS wds FROM documents),
         |g AS (SELECT doc_id, wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS gram
         |  FROM t, UNNEST(generate_series(1, len(wds)-2)) AS u(i) WHERE len(wds) >= 3),
         |src AS (SELECT doc_id, ${xxUtf8Bytes("gram")} AS bs FROM g),
         |${xxStringCtes("src", Seq("doc_id"))},
         |kx AS (SELECT doc_id, xh, kk AS k, ($seeds)[kk+1] AS sseed
         |  FROM xh, UNNEST(generate_series(0, 31)) AS ks(kk)),
         |$slotChain,
         |sm AS (SELECT doc_id, k, MIN(${xxSign("slout")}) AS smin FROM sls7 GROUP BY doc_id, k),
         |bands AS (SELECT doc_id, k // 4 AS band,
         |  MAX(CASE WHEN k % 4 = 0 THEN smin END) AS s1,
         |  MAX(CASE WHEN k % 4 = 1 THEN smin END) AS s2,
         |  MAX(CASE WHEN k % 4 = 2 THEN smin END) AS s3,
         |  MAX(CASE WHEN k % 4 = 3 THEN smin END) AS s4
         |  FROM sm GROUP BY doc_id, k // 4),
         |${bandChain("c1", "bands", Seq("s2", "s3", "s4"), "s1", "CAST(42 AS HUGEINT)")},
         |${bandChain("c2", "c1s7", Seq("s3", "s4"), "s2", "c1out")},
         |${bandChain("c3", "c2s7", Seq("s4"), "s3", "c2out")},
         |${bandChain("c4", "c3s7", Seq(), "s4", "c3out")},
         |bb AS (SELECT doc_id, band, ${xxSign("c4out")} AS bucket FROM c4s7),
         |corpb AS (SELECT * FROM bb WHERE doc_id < $split),
         |batb AS (SELECT * FROM bb WHERE doc_id >= $split),
         |bigc AS (SELECT band, bucket FROM corpb GROUP BY band, bucket HAVING COUNT(*) > $maxB),
         |cand_c AS (SELECT DISTINCT b.doc_id AS b, o.doc_id AS o
         |  FROM batb b JOIN corpb o ON b.band = o.band AND b.bucket = o.bucket
         |    AND b.doc_id <> o.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM bigc WHERE bigc.band = o.band AND bigc.bucket = o.bucket)),
         |szb AS (SELECT band, bucket FROM batb GROUP BY band, bucket
         |  HAVING COUNT(*) BETWEEN 2 AND $maxB),
         |cand_b AS (SELECT DISTINCT l.doc_id AS b, e.doc_id AS o
         |  FROM batb l JOIN batb e ON l.band = e.band AND l.bucket = e.bucket
         |    AND e.doc_id < l.doc_id
         |  JOIN szb ON l.band = szb.band AND l.bucket = szb.bucket),
         |cands AS (SELECT b, o, TRUE AS from_corpus FROM cand_c
         |  UNION ALL SELECT b, o, FALSE FROM cand_b),
         |shd AS (SELECT DISTINCT doc_id, xh FROM xh),
         |szs AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
         |cm AS (SELECT c.b, c.o, c.from_corpus, COUNT(*) AS common
         |  FROM cands c JOIN shd sa ON sa.doc_id = c.b
         |  JOIN shd sb ON sb.doc_id = c.o AND sb.xh = sa.xh
         |  GROUP BY c.b, c.o, c.from_corpus),
         |ver AS (SELECT b, o, from_corpus FROM cm
         |  JOIN szs za ON cm.b = za.doc_id JOIN szs zb ON cm.o = zb.doc_id
         |  WHERE CAST(common AS DOUBLE)/(za.n_sh + zb.n_sh - common) >= 0.5),
         |pd AS (SELECT b AS doc_id, MAX(from_corpus) AS dup_of_corpus,
         |  MAX(NOT from_corpus) AS dup_in_batch FROM ver GROUP BY b)
         |SELECT d.doc_id,
         |  COALESCE(pd.dup_of_corpus, FALSE) AS dup_of_corpus,
         |  COALESCE(pd.dup_in_batch, FALSE) AS dup_in_batch,
         |  (NOT COALESCE(pd.dup_of_corpus, FALSE))
         |    AND (NOT COALESCE(pd.dup_in_batch, FALSE)) AS keep
         |FROM documents d LEFT JOIN pd USING (doc_id)
         |WHERE d.doc_id >= $split
         |ORDER BY doc_id""".stripMargin
    },

    "dedup_minhash_verified" -> {
      // the LSH candidate block above + exact Jaccard on candidates only
      // (sizes/intersections over DISTINCT per-doc shingle hashes — the
      // engine's hashedShingles frame)
      val seeds = (0 until graft.functions.MinHash32.K).map { k =>
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L)
        s"CAST('${(BigInt(v) + (BigInt(1) << 64)) % (BigInt(1) << 64)}' AS HUGEINT)"
      }.mkString("[", ",", "]")
      val slotChain = xxHashLongCtes("sl", "kx", Seq("doc_id", "k"), "xh", "sseed")
        .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      def bandChain(p: String, src: String, rest: Seq[String], slot: String,
          seed: String) =
        xxHashLongCtes(p, src, Seq("doc_id", "band") ++ rest, xxUnsign(slot), seed)
          .map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS wds FROM documents),
         |g AS (SELECT doc_id, wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS gram
         |  FROM t, UNNEST(generate_series(1, len(wds)-2)) AS u(i) WHERE len(wds) >= 3),
         |src AS (SELECT doc_id, ${xxUtf8Bytes("gram")} AS bs FROM g),
         |${xxStringCtes("src", Seq("doc_id"))},
         |kx AS (SELECT doc_id, xh, kk AS k, ($seeds)[kk+1] AS sseed
         |  FROM xh, UNNEST(generate_series(0, 31)) AS ks(kk)),
         |$slotChain,
         |sm AS (SELECT doc_id, k, MIN(${xxSign("slout")}) AS smin FROM sls7 GROUP BY doc_id, k),
         |bands AS (SELECT doc_id, k // 4 AS band,
         |  MAX(CASE WHEN k % 4 = 0 THEN smin END) AS s1,
         |  MAX(CASE WHEN k % 4 = 1 THEN smin END) AS s2,
         |  MAX(CASE WHEN k % 4 = 2 THEN smin END) AS s3,
         |  MAX(CASE WHEN k % 4 = 3 THEN smin END) AS s4
         |  FROM sm GROUP BY doc_id, k // 4),
         |${bandChain("c1", "bands", Seq("s2", "s3", "s4"), "s1", "CAST(42 AS HUGEINT)")},
         |${bandChain("c2", "c1s7", Seq("s3", "s4"), "s2", "c1out")},
         |${bandChain("c3", "c2s7", Seq("s4"), "s3", "c2out")},
         |${bandChain("c4", "c3s7", Seq(), "s4", "c3out")},
         |bb AS (SELECT doc_id, band, ${xxSign("c4out")} AS bucket FROM c4s7),
         |sz AS (SELECT band, bucket FROM bb GROUP BY band, bucket
         |  HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.DedupOps.MaxBucket}),
         |cp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |  JOIN sz ON a.band = sz.band AND a.bucket = sz.bucket),
         |shd AS (SELECT DISTINCT doc_id, xh FROM xh),
         |szs AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
         |cm AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS common
         |  FROM cp c JOIN shd a ON a.doc_id = c.doc_a
         |  JOIN shd b ON b.doc_id = c.doc_b AND b.xh = a.xh
         |  GROUP BY c.doc_a, c.doc_b),
         |j AS (SELECT doc_a, doc_b,
         |  CAST(common AS DOUBLE)/(za.n_sh + zb.n_sh - common) AS jaccard
         |  FROM cm JOIN szs za ON doc_a = za.doc_id JOIN szs zb ON doc_b = zb.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "ann_lsh" -> {
      // the SAME seeded ±1 hyperplanes as SimilarityOps.lshBucket,
      // inlined as list literals; bucket bit p = sign of the exact
      // scaled-int dot — approximate vs BRUTE by design, but a pure
      // function of (embedding, planes), so algorithm parity is
      // oracle-checkable even though recall is RecallSpec's business
      val masks = graft.operators.SimilarityOps.probeMasks(2)
        .mkString("[", ",", "]")
      s"""WITH n AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |b AS (SELECT vec_id, embedding, nrm, ${lshBucketSql("embedding")} AS bucket FROM n),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
         |  unnest(list_transform($masks, m -> xor(bucket, m))) AS bucket
         |  FROM b WHERE vec_id % ${graft.operators.SimilarityOps.QueryModulus} = 0),
         |sc AS (SELECT q.q_id, e.vec_id AS n_id,
         |  ${cosSim(dotE12("q_emb", "e.embedding"), "q_nrm", "e.nrm")} AS cos_sim
         |  FROM b e JOIN q ON e.bucket = q.bucket AND q.q_id <> e.vec_id),
         |r AS (SELECT q_id, n_id, cos_sim,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rnk FROM sc)
         |SELECT q_id, n_id, cos_sim, rnk FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    },

    "dedup_embedding_lsh" -> {
      val masks = graft.operators.SimilarityOps.probeMasks(2)
        .mkString("[", ",", "]")
      s"""WITH n AS (SELECT vec_id, embedding, ${dotE12("embedding", "embedding")} AS nrm FROM embeddings),
         |b AS (SELECT vec_id, ${lshBucketSql("embedding")} AS bucket FROM n),
         |p AS (SELECT vec_id, unnest(list_transform($masks, m -> xor(bucket, m))) AS bucket FROM b),
         |c AS (SELECT DISTINCT a.vec_id AS id_a, p.vec_id AS id_b
         |  FROM b a JOIN p ON a.bucket = p.bucket AND a.vec_id < p.vec_id),
         |s AS (SELECT id_a, id_b,
         |  ${cosSim(dotE12("na.embedding", "nb.embedding"), "na.nrm", "nb.nrm")} AS cos_sim
         |  FROM c JOIN n na ON id_a = na.vec_id JOIN n nb ON id_b = nb.vec_id)
         |SELECT id_a, id_b, cos_sim FROM s WHERE cos_sim >= 0.35
         |ORDER BY id_a, id_b""".stripMargin
    },

    "stratified_sample" ->
      s"""WITH ${xxDocCoinCtes(Seq("doc_id", "lang", "source", "n_chars"), 42L, 1048576L)}
         |SELECT doc_id, lang, source, n_chars FROM hx
         |WHERE CAST(pm AS DOUBLE)/1048576.0 <
         |  (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END)
         |ORDER BY doc_id""".stripMargin,

    "dataset_split" ->
      s"""WITH ${xxDocCoinCtes(Seq("doc_id", "lang", "source", "n_chars"), 42L, 10000L)}
         |SELECT doc_id,
         |  CASE WHEN pm < 100 THEN 'test' WHEN pm < 200 THEN 'val'
         |    ELSE 'train' END AS split,
         |  lang, source, n_chars FROM hx
         |ORDER BY doc_id""".stripMargin,

    "mixture_sample" ->
      // rate formula replicated with Spark's exact expression tree
      // (((n^α / Z) * (total·budget)) / n); Z accumulates in source order
      // via an explicitly sequential list_reduce — a windowed SUM's
      // accumulation order is engine-internal and could diverge at ulp
      s"""WITH ${xxDocCoinCtes(Seq("doc_id", "source", "lang", "n_chars"), 42L, 1048576L)},
         |counts AS (SELECT source, COUNT(*) AS src_n FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(src_n) AS BIGINT) AS total,
         |  list_reduce(list(pow(CAST(src_n AS DOUBLE), ${graft.operators.CurationOps.MixAlpha}) ORDER BY source),
         |    (a, b) -> a + b) AS z
         |  FROM counts),
         |rates AS (SELECT source,
         |  LEAST(1.0, ((pow(CAST(src_n AS DOUBLE), ${graft.operators.CurationOps.MixAlpha}) / z)
         |    * (CAST(total AS DOUBLE) * ${graft.operators.CurationOps.MixBudget})) / CAST(src_n AS DOUBLE)) AS rate
         |  FROM counts, tot)
         |SELECT h.doc_id, h.source, h.lang, h.n_chars
         |FROM hx h JOIN rates r USING (source)
         |WHERE CAST(h.pm AS DOUBLE)/1048576.0 < r.rate
         |ORDER BY doc_id""".stripMargin,

    "embedding_project" -> {
      // same seeded ±1 planes as SimilarityOps.projPlanes, inlined as
      // DuckDB list literals; per-term floor(x*w*1e12+0.5) then integer
      // sum — the DotE12 recurrence, order-independent and bit-exact
      val cols = graft.operators.SimilarityOps.projPlanes(8).zipWithIndex
        .map { case (p, i) =>
          val w = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
          s"CAST(list_sum(list_transform(generate_series(1,64), i -> " +
            s"CAST(FLOOR(CAST(embedding[i] AS DOUBLE)*($w)[i]*1000000000000.0+0.5) " +
            s"AS BIGINT))) AS BIGINT) AS p$i"
        }.mkString(",\n|  ")
      s"""SELECT vec_id,
         |  $cols
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |sc AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE)*n/df AS tfidf
        |       FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk FROM sc)
        |SELECT doc_id, term, tf, df, tfidf, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "stream_window_agg" ->
      s"""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(${e2("value")}) AS DOUBLE)/100.0 AS v
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // ---------- ML feature generation / mining ----------

    "lag_features" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us,
         |  ${e2("value")} AS cents FROM events)
         |SELECT event_id, user_id, event_type, us, cents,
         |  lag(cents, 1) OVER w AS prev_cents,
         |  cents - lag(cents, 1) OVER w AS delta_cents,
         |  us - lag(us, 1) OVER w AS gap_us,
         |  CAST(COUNT(*) OVER w3 AS BIGINT) AS n_prev3,
         |  CAST(SUM(cents) OVER w3 AS BIGINT) AS sum_prev3_cents
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id),
         |  w3 AS (PARTITION BY user_id ORDER BY us, event_id
         |         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
         |ORDER BY event_id""".stripMargin,

    "rank_normalize" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pr
        |FROM documents)
        |SELECT doc_id, source, n_chars, pr,
        |  LEAST(CAST(FLOOR(pr*10) AS BIGINT), 9) AS decile
        |FROM r ORDER BY doc_id""".stripMargin,

    "string_sim_join" ->
      """WITH v AS (SELECT DISTINCT tok FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 4)
        |SELECT a.tok AS a, b.tok AS b,
        |  CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
        |FROM v a JOIN v b
        |  ON abs(length(a.tok) - length(b.tok)) <= 2 AND a.tok < b.tok
        |WHERE levenshtein(a.tok, b.tok) <= 2
        |ORDER BY a, b""".stripMargin,

    "cooccurrence_pairs" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
        |p AS (SELECT x.event_type AS a, y.event_type AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |      FROM ud x JOIN ud y ON x.user_id = y.user_id AND x.d = y.d
        |        AND x.event_type < y.event_type
        |      GROUP BY 1, 2),
        |tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ud GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups FROM
        |      (SELECT DISTINCT user_id, d FROM ud))
        |SELECT p.a, p.b, p.n_ab,
        |  CAST(p.n_ab * g.n_groups AS DOUBLE) / CAST(ta.c * tb.c AS DOUBLE) AS lift
        |FROM p JOIN tc ta ON p.a = ta.event_type
        |       JOIN tc tb ON p.b = tb.event_type
        |       CROSS JOIN g
        |ORDER BY a, b""".stripMargin,

    "attribution_last_touch" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us,
         |  ${e2("value")} AS cents FROM events),
         |t AS (SELECT *, last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
         |  FROM e)
         |SELECT COALESCE(touch, 'none') AS touch,
         |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
         |  CAST(SUM(cents) AS DOUBLE)/100.0 AS attributed_value
         |FROM t WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY touch""".stripMargin,

    "trend_agg" ->
      s"""WITH m AS (SELECT o_orderpriority AS priority,
         |  CAST((year(o_orderdate)-1995)*12 + month(o_orderdate)-1 AS BIGINT) AS x,
         |  CAST(SUM(${e2("o_totalprice")}) AS BIGINT) AS y
         |  FROM orders GROUP BY 1, 2),
         |s AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months,
         |  CAST(SUM(x) AS BIGINT) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |  SUM(CAST(x AS HUGEINT)*y) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
         |  FROM m GROUP BY 1),
         |sl AS (SELECT *, CASE WHEN n_months*sxx - sx*sx = 0 THEN NULL
         |  ELSE CAST(n_months*sxy - sx*sy AS DOUBLE) /
         |    CAST(n_months*sxx - sx*sx AS DOUBLE) END AS slope_cents FROM s)
         |SELECT priority, n_months, slope_cents,
         |  (CAST(sy AS DOUBLE) - slope_cents*CAST(sx AS DOUBLE)) /
         |    CAST(n_months AS DOUBLE) AS intercept_cents
         |FROM sl ORDER BY priority""".stripMargin,

    "mix_drift" -> {
      val cut = graft.operators.DedupOps.IncrementalSplit
      s"""WITH t AS (SELECT source,
         |  CASE WHEN doc_id < $cut THEN 'old' ELSE 'new' END AS drp,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS t FROM documents),
         |per AS (SELECT source,
         |  CAST(SUM(CASE WHEN drp = 'old' THEN t ELSE 0 END) AS BIGINT) AS t_old,
         |  CAST(SUM(CASE WHEN drp = 'new' THEN t ELSE 0 END) AS BIGINT) AS t_new
         |FROM t GROUP BY 1),
         |tot AS (SELECT CAST(SUM(t_old) AS BIGINT) AS n_old,
         |  CAST(SUM(t_new) AS BIGINT) AS n_new FROM per)
         |SELECT source, t_old, t_new,
         |  CAST(t_old AS DOUBLE)/n_old AS share_old,
         |  CAST(t_new AS DOUBLE)/n_new AS share_new,
         |  CAST(t_new AS DOUBLE)/n_new - CAST(t_old AS DOUBLE)/n_old AS share_delta,
         |  CASE WHEN t_old > 0 THEN
         |    (CAST(t_new AS DOUBLE) - CAST(t_old AS DOUBLE)*n_new/n_old) *
         |    (CAST(t_new AS DOUBLE) - CAST(t_old AS DOUBLE)*n_new/n_old) /
         |    (CAST(t_old AS DOUBLE)*n_new/n_old)
         |  END AS chi2_part
         |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
    },

    "curation_report" -> {
      // the gate CTEs are THE standalone oracles, referenced as
      // subqueries — no second SQL source of truth for gate semantics
      s"""WITH gk AS (SELECT doc_id, keep AS k_g FROM ($gopherGatesSql)),
         |rk AS (SELECT doc_id, keep AS k_r FROM ($repetitionStatsSql)),
         |f AS (SELECT d.doc_id, $normTextSql AS norm,
         |  k_g, (k_g AND k_r) AS k_both
         |FROM documents d JOIN gk USING (doc_id) JOIN rk USING (doc_id)),
         |co AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
         |  CAST(SUM(CASE WHEN k_g THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
         |  CAST(SUM(CASE WHEN k_both THEN 1 ELSE 0 END) AS BIGINT) AS n_rep FROM f),
         |dd AS (SELECT CAST(COUNT(DISTINCT norm) AS BIGINT) AS n_dedup
         |  FROM f WHERE k_both)
         |SELECT stage, n_pass, CAST(n_pass AS DOUBLE)/n_input AS pass_rate FROM (
         |  SELECT '1_input' AS stage, n_input AS n_pass, n_input FROM co
         |  UNION ALL SELECT '2_gopher', n_gopher, n_input FROM co
         |  UNION ALL SELECT '3_repetition', n_rep, n_input FROM co
         |  UNION ALL SELECT '4_dedup_normalized', n_dedup, n_input FROM co, dd)
         |ORDER BY stage""".stripMargin
    },

    "ab_test" ->
      s"""WITH pu AS (SELECT user_id, CAST(SUM(${e2("value")}) AS BIGINT) AS x,
         |  CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS cohort
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |m AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         |  SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(x AS HUGEINT)*x) AS sxx
         |  FROM pu GROUP BY 1),
         |st AS (SELECT cohort, n, CAST(sx AS DOUBLE)/n AS mean_cents,
         |  CASE WHEN n > 1 THEN
         |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) / (n - 1)
         |  END AS var_cents FROM m)
         |SELECT a.n AS n_a, b.n AS n_b, a.mean_cents AS mean_a,
         |  b.mean_cents AS mean_b,
         |  b.mean_cents - a.mean_cents AS lift_cents,
         |  (b.mean_cents - a.mean_cents) /
         |    sqrt(a.var_cents/a.n + b.var_cents/b.n) AS t_stat
         |FROM (SELECT * FROM st WHERE cohort='control') a,
         |     (SELECT * FROM st WHERE cohort='treatment') b""".stripMargin,

    "dedup_report" ->
      // each leg wraps the corresponding standalone key's twin as a
      // subquery — the panel is definitionally pinned to those keys
      s"""WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |legs AS (
         |  SELECT 'exact' AS space,
         |    CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_flagged
         |  FROM documents
         |  UNION ALL
         |  SELECT 'normalized',
         |    CAST(COUNT(*) - COUNT(DISTINCT md5($normTextSql)) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'near_dup_jaccard', CAST(COUNT(DISTINCT doc_b) AS BIGINT)
         |  FROM ($ngramJaccardSql)
         |  UNION ALL
         |  SELECT 'semantic_text', CAST(COUNT(*) AS BIGINT)
         |  FROM ($semanticDedupTextSql) WHERE NOT keep)
         |SELECT space, n_docs, n_flagged,
         |  CAST(n_flagged AS DOUBLE)/CAST(n_docs AS DOUBLE) AS flagged_rate
         |FROM legs, tot ORDER BY space""".stripMargin,

    "dedup_normalized" ->
      s"""SELECT md5($normTextSql) AS h,
         |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    "gopher_gates" -> gopherGatesSql,


    "spatial_join" -> {
      import graft.operators.GeoOps._
      s"""WITH b AS (SELECT n_nationkey, n_name,
         |  CAST((n_nationkey % $GridCols) * $LonSpacing + $LonBase AS DOUBLE) AS lon0,
         |  CAST((n_nationkey // $GridCols) * $LatSpacing + $LatBase AS DOUBLE) AS lat0 FROM nation),
         |p AS (SELECT event_id,
         |  CAST(event_id % $PxMod AS DOUBLE)/100.0 - 180.0 AS px,
         |  CAST((event_id * $PyMul) % $PyMod AS DOUBLE)/100.0 - 90.0 AS py FROM events)
         |SELECT n_nationkey, n_name, CAST(COUNT(*) AS BIGINT) AS n_points
         |FROM p JOIN b ON px >= lon0 AND px <= lon0 + $BoxW
         |              AND py >= lat0 AND py <= lat0 + $BoxH
         |GROUP BY 1, 2 ORDER BY n_nationkey""".stripMargin
    },

    "key_skew_report" ->
      """WITH c AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows FROM c)
        |SELECT key, n, CAST(n AS DOUBLE)/n_rows AS share,
        |  CAST(n AS DOUBLE)*n_keys/n_rows AS skew_x
        |FROM c CROSS JOIN st ORDER BY n DESC, key LIMIT 10""".stripMargin,

    "snapshot_diff" ->
      """WITH a AS (SELECT c_custkey AS k, c_acctbal AS bal_a, c_mktsegment AS seg_a,
        |  TRUE AS in_a FROM customer),
        |b AS (SELECT c_custkey AS k,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal_b,
        |  c_mktsegment AS seg_b, TRUE AS in_b FROM customer WHERE c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000000 AS k, c_acctbal AS bal_b, c_mktsegment AS seg_b,
        |  TRUE AS in_b FROM customer WHERE c_custkey % 13 = 0),
        |j AS (SELECT COALESCE(a.in_a, FALSE) AS ia, COALESCE(b.in_b, FALSE) AS ib,
        |  bal_a, bal_b, seg_a, seg_b FROM a FULL OUTER JOIN b ON a.k = b.k),
        |st AS (SELECT CASE WHEN NOT ia THEN 'added' WHEN NOT ib THEN 'removed'
        |  WHEN bal_a <> bal_b OR seg_a <> seg_b THEN 'changed'
        |  ELSE 'unchanged' END AS status,
        |  CASE WHEN ia AND ib AND bal_a <> bal_b THEN 1 ELSE 0 END AS bc FROM j)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(bc) AS BIGINT) AS n_bal_changed
        |FROM st GROUP BY 1 ORDER BY status""".stripMargin,

    "embedding_norm_stats" ->
      """WITH c AS (SELECT vec_id, CAST(label AS BIGINT) AS label, len(embedding) AS dim,
        |  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000.0+0.5) AS BIGINT) AS v6
        |  FROM embeddings),
        |nr AS (SELECT vec_id, label, CAST(MIN(dim) AS BIGINT) AS dim,
        |  CAST(FLOOR(sqrt(CAST(SUM(CAST(v6 AS HUGEINT)*v6) AS DOUBLE))+0.5) AS BIGINT) AS n6
        |  FROM c GROUP BY 1, 2)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(dim) AS BIGINT) AS min_dim, CAST(MAX(dim) AS BIGINT) AS max_dim,
        |  CAST(SUM(n6) AS DOUBLE)/1000000.0/COUNT(*) AS avg_norm,
        |  CAST(MIN(n6) AS DOUBLE)/1000000.0 AS min_norm,
        |  CAST(MAX(n6) AS DOUBLE)/1000000.0 AS max_norm
        |FROM nr GROUP BY 1 ORDER BY label""".stripMargin,

    "char_diversity" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents),
        |cc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS r FROM ch GROUP BY 1, 2),
        |t AS (SELECT doc_id, CAST(SUM(r*r) AS BIGINT) AS sumsq, CAST(SUM(r) AS BIGINT) AS n,
        |      CAST(COUNT(*) AS BIGINT) AS distinct_chars FROM cc GROUP BY 1)
        |SELECT doc_id, n, distinct_chars,
        |  1.0 - CAST(sumsq AS DOUBLE)/CAST(n*n AS DOUBLE) AS simpson,
        |  CAST(n*n AS DOUBLE)/CAST(sumsq AS DOUBLE) AS eff_chars
        |FROM t ORDER BY doc_id""".stripMargin
  )
}

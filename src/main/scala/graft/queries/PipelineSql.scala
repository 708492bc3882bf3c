package graft.queries

import graft.functions.Text

/** The DuckDB-twin SQL building blocks shared across the pipeline
  * families (cosine/unnest CTEs, the Lloyd cell chains, SQ8 dequant,
  * the LSH oracle with its inlined sign matrix, BPE/DSIR CTE chains) —
  * one owner so a tie-break or stride fix cannot drift between twins.
  */
object PipelineSql {

  /** t27 twin: k BPE merge steps unrolled into CTE chains (the n4/n6
    * unrolled-Lloyd precedent). Pair extraction is an (i, i+1)
    * positional self-join per word; the rewrite is the same exclusive
    * per-position CASE the Spark transform applies (l ≠ r guarantees
    * non-overlap); every count stays BIGINT.
    */
  private[queries] def bpeOracle(k: Int): String = {
    val rows = (1 to k).map { n =>
      s"""SELECT CAST($n AS BIGINT) AS step, l AS "left", r AS "right",
           l || r AS merged, cnt AS pair_count,
           (SELECT n_syms_after FROM s$n) AS n_syms_after FROM m$n"""
    }.mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(k)}
         SELECT * FROM ($rows) ORDER BY step"""
  }

  /** The k-step CTE chain shared by the t27 (merge table) and t28
    * (corpus encode) oracles: wf/w0 initialization plus per-step
    * t/p/m/w/s CTEs; w$k is the final segmentation.
    */
  private[queries] def bpeCtes(k: Int): String = {
    val steps = (1 to k).map { n =>
      s"""t$n AS (SELECT word, freq, unnest(s) AS sym,
                  generate_subscripts(s, 1) AS i FROM w${n - 1}),
         p$n AS (SELECT a.sym AS l, b.sym AS r,
                  CAST(sum(a.freq) AS BIGINT) AS cnt
                FROM t$n a JOIN t$n b
                  ON a.word = b.word AND b.i = a.i + 1
                WHERE a.sym <> b.sym GROUP BY 1, 2),
         m$n AS (SELECT l, r, cnt FROM p$n
                 ORDER BY cnt DESC, l, r LIMIT 1),
         w$n AS (SELECT word, freq,
                  list_filter(list_transform(range(1, len(s) + 1), i ->
                    CASE WHEN i < len(s) AND s[i] = l AND s[i+1] = r
                           THEN l || r
                         WHEN i > 1 AND s[i-1] = l AND s[i] = r
                           THEN NULL
                         ELSE s[i] END), x -> x IS NOT NULL) AS s
                FROM w${n - 1}, m$n),
         s$n AS (SELECT CAST(sum(freq * len(s)) AS BIGINT)
                   AS n_syms_after FROM w$n)"""
    }.mkString(",\n         ")
    s"""wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS word
                 FROM documents)
           WHERE length(word) > 0 GROUP BY 1),
         w0 AS (SELECT word, freq,
                  list_append(list_transform(range(1, length(word) + 1),
                    i -> substring(word, i, 1)), '</w>') AS s
                FROM wf),
         $steps"""
  }

  /** DuckDB twin of `conv(substring(md5(e),1,4),16,10) % 1024` — the
    * t19/t29 hashed-feature bucket (DuckDB has no base-conv; four
    * strpos nibbles rebuild the same 16-bit value).
    */
  private[queries] def duckBkt(e: String): String =
    s"""(16*16*16*(strpos('0123456789abcdef', substr(md5($e),1,1))-1)
       +16*16*(strpos('0123456789abcdef', substr(md5($e),2,1))-1)
       +16*(strpos('0123456789abcdef', substr(md5($e),3,1))-1)
       +(strpos('0123456789abcdef', substr(md5($e),4,1))-1)) % 1024"""

  /** t29's CTE chain (through the per-doc sums, `dper`), shared with
    * the pipe2 composition oracle. Occupied-bucket weights only — the
    * Spark side's full-bucket table adds rows no feature joins, so the
    * totals and every joined weight are identical.
    */
  private[queries] def dsirCtes: String =
    s"""wl AS (SELECT doc_id, lang,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+') AS w
         FROM documents),
         tkp AS (SELECT doc_id, lang, unnest(w) AS tok,
                   generate_subscripts(w, 1) AS i FROM wl),
         fs AS (SELECT doc_id, lang, tok AS f FROM tkp
                UNION ALL
                SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS f
                FROM tkp a JOIN tkp b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         feats AS (SELECT doc_id, lang, ${duckBkt("f")} AS bkt FROM fs),
         ac AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_a
                FROM feats GROUP BY 1),
         tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_t
                FROM feats WHERE lang = 'en' GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS s_tot,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     AS BIGINT) AS t_tot
                 FROM feats),
         bt AS (SELECT ac.bkt,
                  (CAST(length(bin(COALESCE(tc.cnt_t, 0) + 1)) - 1
                     AS BIGINT)
                   + CAST(length(bin(s_tot + 1024)) - 1 AS BIGINT))
                - (CAST(length(bin(ac.cnt_a + 1)) - 1 AS BIGINT)
                   + CAST(length(bin(t_tot + 1024)) - 1 AS BIGINT)) AS sb
                FROM ac LEFT JOIN tc USING (bkt), tot),
         dper AS (SELECT doc_id, count(*) AS n_feat,
                   CAST(sum(sb) AS BIGINT) AS score_bits
                 FROM feats JOIN bt USING (bkt) GROUP BY 1)"""

  /** DuckDB twin of Text.markerCount (space-padded split-count). */
  private[queries] def duckMarker(m: String): String =
    s"(len(string_split(' ' || regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g') || ' ', ' $m ')) - 1)"

  private[queries] def duckLangScore(lang: String): String =
    Text.langMarkers.toMap.apply(lang).map(duckMarker).mkString(" + ")

  /** Fixed-precedence argmax CASE chain mirroring Text.langPredict. */
  private[queries] val duckLangCase: String = {
    val langs = Text.langMarkers.map(_._1)
    val branches = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      val cond = rest.map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }

  private[queries] def duckCos(a: String, b: String): String =
    s"CAST(SUM(CAST(floor($a*$b*1e16) AS BIGINT)) AS DOUBLE) / " +
      s"(sqrt(CAST(SUM(CAST(floor($a*$a*1e16) AS BIGINT)) AS DOUBLE)) * " +
      s"sqrt(CAST(SUM(CAST(floor($b*$b*1e16) AS BIGINT)) AS DOUBLE)))"

  private[queries] val duckUnnest =
    """SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
       FROM embeddings"""

  /** IVF cell-assignment CTEs (cu/vc/vr) of the stride-50 TEACHING form
    * — n3's oracle only since r14 (n12/n13 moved to the adaptive cells;
    * the shared-owner convention follows lshOracle's for hash-family
    * SQL).
    */
  private[queries] val duckIvfAssign =
    s"""cu AS (SELECT vec_id AS cid, x AS cx, i FROM u
                WHERE vec_id % 50 = 0),
         vc AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN cu b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM vc)"""

  /** Shared sampled-Lloyd cell CTEs (prm → vr) — one owner for the
    * n9/n14 oracles: COUNT(*)-derived moduli bound the training sample
    * (~400 vectors) and seed count (~16), two decimal-exact Lloyd
    * iterations over the sample, then the whole corpus assigns to the
    * trained centroids (vr ranks every vector's cells).
    */
  private[queries] val duckSampledCells: String = duckLloydCells(
    s"""prm AS (SELECT greatest(1, count(*) // 400) AS md
                 FROM embeddings),
         su AS (SELECT u.* FROM u, prm WHERE u.vec_id % prm.md = 0),
         ${duckSeedRank("16")}""")

  /** Rank-based Lloyd seed CTEs (st0/srk0/sd0): every st-th DISTINCT
    * sample member by rank, st = max(1, sampleCount // k) — the SQL
    * twin of [[graft.operators.Similarity.sampleSeedIds]] (on dense ids
    * exactly the retired second modulus; bounded at ~k seeds on ANY id
    * structure — the r15 replica id spaces collapsed the modulus form
    * to seeds = the whole sample). The prelude using it must define
    * `su`; `kExpr` is the seed-count expression (a literal, or a scalar
    * subquery like `(SELECT nl FROM kl)` for the adaptive geometry).
    */
  private def duckSeedRank(kExpr: String): String =
    s"""st0 AS (SELECT greatest(1, count(DISTINCT su.vec_id) // $kExpr)
                  AS st FROM su),
         srk0 AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1
                    AS q
                  FROM (SELECT DISTINCT vec_id FROM su)),
         sd0 AS (SELECT srk0.vec_id FROM srk0, st0
                 WHERE srk0.q % st0.st = 0)"""

  /** The ADAPTIVE-nlist prelude (n12/n13 since r14): same sampled-Lloyd
    * chain, but the seed count derives from COUNT(*) via the
    * [[graft.operators.Similarity.autoNlist]] rule — nlist =
    * max(16, ⌈√n⌉), training sample targets 32 points per centroid.
    * ⌈√n⌉ of an exact integer count is the same IEEE double in both
    * engines, so the whole derivation chain (count → nlist → moduli)
    * replays bit-for-bit.
    */
  private val duckAdaptivePrelude: String =
    s"""nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         kl AS (SELECT greatest(16, CAST(ceil(sqrt(CAST(n AS DOUBLE)))
                    AS BIGINT)) AS nl FROM nv),
         prm AS (SELECT greatest(1, nv.n // (32 * kl.nl)) AS md
                 FROM nv, kl),
         su AS (SELECT u.* FROM u, prm WHERE u.vec_id % prm.md = 0),
         ${duckSeedRank("(SELECT nl FROM kl)")}"""

  private[queries] val duckAdaptiveCells: String =
    duckLloydCells(duckAdaptivePrelude)

  /** The two-level (coarse-quantized) assignment tail over the adaptive
    * Lloyd chain — n16's twin of
    * [[graft.operators.Similarity.ivfTopKTwoLevel]]. The coarse layer is
    * every g-th SEED by rank (`sd0` rank % g = 0, g = max(1, ⌈√nlist⌉)
    * from the SAME `kl.nl` scalar — no rank window over the trained
    * cells); each trained cell parents to its nearest coarse centroid;
    * a vector keeps its top-`wAssign` coarse centroids and argmaxes
    * among only those groups' member cells. Defines `vr` (corpus cell
    * ranking — rn = 1 is the assignment) and `vrp` (probe cell
    * ranking, filtered to `probePred`). Probes rank FLAT over all
    * trained cells — the engine's FAISS-convention asymmetry
    * ([[graft.operators.Similarity.ivfTopKTwoLevel]]): only the
    * n-sized corpus routes two-hop; a probe pays a trivial nlist dots
    * (two-hop probe routing measured 0.42-vs-0.96 recall starvation
    * at the occupancy-matched nprobe, tools/Recall r14).
    */
  private[queries] def duckTwoLevelCells(wAssign: Int,
      probePred: String = "vec_id < 10"): String =
    s"""${duckLloydTrain(duckAdaptivePrelude)},
         gg AS (SELECT greatest(1, CAST(ceil(sqrt(CAST(nl AS DOUBLE)))
                  AS BIGINT)) AS g FROM kl),
         l1s AS (SELECT s.vec_id FROM (
                   SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1
                     AS sq FROM sd0) s, gg
                 WHERE s.sq % gg.g = 0),
         l1 AS (SELECT u.vec_id AS l1cid, u.i, u.x AS lx
                FROM u JOIN l1s ON u.vec_id = l1s.vec_id),
         cp AS (SELECT a.cid, b.l1cid, ${duckCos("a.cx", "b.lx")} AS csim
                FROM c2 a JOIN l1 b ON a.i = b.i GROUP BY 1, 2),
         par AS (SELECT cid, l1cid FROM (
                   SELECT cid, l1cid, row_number() OVER (
                     PARTITION BY cid ORDER BY csim DESC, l1cid) AS rn
                   FROM cp) WHERE rn = 1),
         tw AS (SELECT a.vec_id, b.l1cid, ${duckCos("a.x", "b.lx")} AS csim
                FROM u a JOIN l1 b ON a.i = b.i GROUP BY 1, 2),
         twr AS (SELECT vec_id, l1cid, row_number() OVER (
                   PARTITION BY vec_id ORDER BY csim DESC, l1cid) AS rn
                 FROM tw),
         s3 AS (SELECT a.vec_id, par.cid, ${duckCos("a.x", "c.cx")} AS csim
                FROM twr t JOIN par USING (l1cid)
                JOIN u a ON a.vec_id = t.vec_id
                JOIN c2 c ON c.cid = par.cid AND c.i = a.i
                WHERE t.rn <= $wAssign GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM s3),
         s3p AS (SELECT a.vec_id, c.cid, ${duckCos("a.x", "c.cx")} AS csim
                FROM u a JOIN c2 c ON c.i = a.i
                WHERE a.$probePred GROUP BY 1, 2),
         vrp AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM s3p)"""

  /** The Lloyd chain shared by the sampled/adaptive cell preludes: the
    * prelude must define `su` (the training sample) and `sd0` (the
    * seed id set); the chain runs two decimal-exact iterations over
    * `su`, then assigns the WHOLE corpus to the trained centroids (vr
    * ranks every vector's cells).
    */
  private[queries] def duckLloydCells(prelude: String): String =
    s"""${duckLloydTrain(prelude)},
         s3 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN c2 b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM s3)"""

  /** The TRAINING half of [[duckLloydCells]] (through the trained
    * cells `c2`, no corpus assignment) — shared with the two-level
    * tail, which assigns the corpus through the coarse layer instead
    * of flat against every cell.
    */
  private[queries] def duckLloydTrain(prelude: String): String =
    s"""$prelude,
         c0 AS (SELECT u.vec_id AS cid, u.x AS cx, u.i
                FROM u JOIN sd0 ON u.vec_id = sd0.vec_id),
         s1 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM su a JOIN c0 b ON a.i = b.i GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s1) WHERE rn = 1),
         c1 AS (SELECT a1.cid, su.i,
                  CAST(CAST(SUM(CAST(su.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM su JOIN a1 USING (vec_id) GROUP BY 1, 2),
         s2 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM su a JOIN c1 b ON a.i = b.i GROUP BY 1, 2),
         a2 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s2) WHERE rn = 1),
         c2 AS (SELECT a2.cid, su.i,
                  CAST(CAST(SUM(CAST(su.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM su JOIN a2 USING (vec_id) GROUP BY 1, 2)"""

  /** Shared SQ8 dequantization CTEs (st/dq) — one owner for the n10/n13
    * oracles; mirrors Sq8Kernel's encode floor/clamp + decode, rounded
    * through REAL like the Spark side's float cast.
    */
  private[queries] val duckSq8Dequant =
    """st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM u GROUP BY i),
         dq AS (SELECT vec_id, u.i, CAST(CAST(
             CASE WHEN mx = mn THEN mn
                  ELSE mn + least(255, greatest(0,
                    CAST(floor((x - mn) * 255 / (mx - mn)) AS BIGINT)))
                    * (mx - mn) / 255
             END AS REAL) AS DOUBLE) AS xq
           FROM u JOIN st ON u.i = st.i)"""

  /** Full DuckDB twin of lshTopK / lshTopKMultiProbe (n2/n5). The ±1
    * hyperplane weights are data-independent splitmix64 constants
    * (LshKernel.signNeg), so the oracle inlines the IDENTICAL sign matrix
    * as one ±-string literal per (table, bit); projections accumulate in
    * the scaled-long integer domain exactly like the kernel, so code
    * bits — and with them the candidate sets, exact re-rank, and hashes —
    * reproduce bit-for-bit. Multi-probe adds the Hamming-1 bucket
    * expansion on the probe side (code XOR 1<<b per bit).
    */
  private[queries] def lshOracle(multiProbe: Boolean, tables: Int = 8, bits: Int = 4,
                        dim: Int = 64, k: Int = 5,
                        probePred: String = "vec_id < 10",
                        adaptiveTarget: Option[Int] = None): String = {
    // the multi-probe flip expansion derives its range from the STATIC
    // `bits` parameter; combining it with an adaptive width would emit a
    // silently wrong oracle (flips past the derived width) — reject the
    // combination until pcx reads its range from the bv CTE
    require(!(multiProbe && adaptiveTarget.isDefined),
      "lshOracle: multiProbe with adaptiveTarget is not implemented")
    // Adaptive mode (n8/d16 since r11): the code width is not a constant
    // of the query but derived from COUNT(*) exactly like
    // Similarity.autoBits — smallest b in 1..24 with target·2^b ≥ n,
    // evaluated in BIGINT so both engines agree at exact powers of two.
    // The sign matrix inlines at the 24-bit cap and the `w` CTE keeps
    // only rows below the derived width.
    val genBits = adaptiveTarget.fold(bits)(_ => 24)
    val signRows = (for { t <- 0 until tables; b <- 0 until genBits } yield {
      val s = (0 until dim).map(d =>
        if (graft.plans.LshKernel.signNeg(t, b, d)) '-' else '+').mkString
      s"($t,$b,'$s')"
    }).mkString(",\n           ")
    val probeBuckets =
      if (multiProbe)
        s"""pcx AS (SELECT probe_id, t, code FROM pc
           UNION
           SELECT probe_id, t, xor(code, CAST(1 AS BIGINT) << fb)
           FROM pc, unnest(generate_series(0, ${bits - 1})) AS f(fb))"""
      else "pcx AS (SELECT probe_id, t, code FROM pc)"
    val widthCtes = adaptiveTarget.fold("") { occ =>
      s"""nv AS (SELECT count(*) AS n FROM embeddings),
       bv AS (SELECT coalesce(min(b), 24) AS bits
              FROM unnest(generate_series(1, 24)) AS g(b), nv
              WHERE (CAST($occ AS BIGINT) << b) >= n),
       """
    }
    val widthPred = adaptiveTarget.fold("")(_ => ", bv WHERE wt.b < bv.bits")
    s"""WITH u AS ($duckUnnest),
       ${widthCtes}wt(t, b, s) AS (VALUES
           $signRows),
       w AS (SELECT t, b, CAST(i AS BIGINT) AS i, substr(s, i, 1) = '-' AS neg
             FROM wt, unnest(generate_series(1, $dim)) AS g(i)$widthPred),
       pj AS (SELECT u.vec_id, w.t, w.b,
                SUM(CAST(floor((CASE WHEN w.neg THEN -u.x ELSE u.x END)*1e16)
                  AS BIGINT)) AS p
              FROM u JOIN w ON u.i = w.i GROUP BY 1, 2, 3),
       cd AS (SELECT vec_id, t,
                CAST(SUM(CASE WHEN p > 0 THEN 1 << b ELSE 0 END) AS BIGINT)
                  AS code
              FROM pj GROUP BY 1, 2),
       pc AS (SELECT vec_id AS probe_id, t, code FROM cd
              WHERE $probePred),
       $probeBuckets,
       ca AS (SELECT DISTINCT p.probe_id, c.vec_id AS cand_id
              FROM pcx p JOIN cd c ON p.t = c.t AND p.code = c.code
              WHERE c.vec_id <> p.probe_id),
       sc AS (SELECT ca.probe_id, ca.cand_id, ${duckCos("a.x", "b.x")} AS cos
              FROM ca JOIN u a ON a.vec_id = ca.probe_id
                      JOIN u b ON b.vec_id = ca.cand_id AND a.i = b.i
              GROUP BY 1, 2),
       r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
             FROM sc)
       SELECT probe_id, rank, cand_id AS neighbor_id, round(cos, 4) AS cosine
       FROM r WHERE rank <= $k ORDER BY probe_id, rank"""
  }

}

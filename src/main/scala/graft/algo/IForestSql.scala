package graft.algo

import graft.ml.IForest
import graft.ops.{Features, Windows}

/** DuckDB oracle mirror of the derandomized AA-AR pipeline — the SQL that
  * REGENERATES the isolation forests (q34), the sketch + change-score
  * stages (q31), and the attention routing (q45) from nothing but the
  * parquet tables and md5 arithmetic, so the flagship pipeline sits under
  * the driver's hash gate instead of rows-only.
  *
  * Why this is possible (round 11, SURVEY §7.4): every random draw in the
  * pipeline is a tag-keyed md5 hash and every engine-sensitive value is
  * quantized —
  *   - fit coordinates are `round(log10(f+1), 6)` (bit-equal across
  *     engines, the q85 idiom), so tree comparisons/min/max are exact;
  *   - node split fractions are ppm integers from the node digest, so
  *     splits are exact arithmetic over exact inputs;
  *   - leaf path lengths are `depth·10⁶ + cPpm(size)` integers, with the
  *     [[IForest.cPpm]] table emitted VERBATIM as a literal — ln is never
  *     recomputed cross-engine — so per-point sums over trees are exact;
  *   - sketch scores are ppm integers, so greedy argmaxes and sketch sums
  *     are exact;
  *   - the change-score SVD is a fixed 100-step power iteration
  *     ([[graft.ml.PowerDirection]]) built only from correctly-rounded
  *     IEEE ops in a pinned fold order, replayed here by a recursive CTE.
  * The only transcendental left is the final 2^x per point; consumers
  * round (q34, 2 dp) or re-quantize (sketch ppm), and rank comparisons
  * sit on score gaps ≥ ln2/(T·c(ψ)) ≈ 3.5e-9 — seven orders above pow's
  * 1-ulp engine spread — so orderings can't flip.
  *
  * The fit mirror replays tree growth LEVEL-BY-LEVEL (tag-keyed draws make
  * sibling subtrees independent — no sequential RNG to thread): level d
  * groups the live subsample slots by (group, tree, heap path), draws each
  * node's split from its digest, routes slots to children, and emits
  * leaves; ⌈log2 ψ⌉ ≤ 8 levels unroll statically. Scoring walks every
  * group point down the emitted node table, one hash join per level.
  */
object IForestSql {

  private val E = graft.model.Tables.edgesSqlCte

  /** The shared ppm c(n) table as a DuckDB list literal (index n+1). */
  private lazy val cpLit: String = IForest.cPpm.mkString("[", ", ", "]")

  private def h28(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 7)) AS BIGINT)"
  private def hPpm(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT) % 1000000"

  /** Windowed 12-feature CTE chain ending in `fl(wid, account, l)` with
    * `l` the DOUBLE[12] feature list in [[Features.featureCols]] order —
    * the (w, stride) generalization of the q05 oracle (hash-proven shape).
    */
  private def featureCtes(w: Int, stride: Int): String = {
    val listCols = Features.featureCols.map { c =>
      val zero = if (c.startsWith("unique") || c.startsWith("multi") ||
        c.startsWith("total")) "0" else "0.0"
      s"CAST(coalesce($c, $zero) AS DOUBLE)"
    }.mkString("[", ",\n       ", "]")
    s"""${Windows.sqlCte(w, stride)},
       |wnodes AS (SELECT wid, src AS account FROM wedges
       |           UNION SELECT wid, dst FROM wedges),
       |ins AS (
       |  SELECT wid, dst AS account,
       |    count(DISTINCT src) AS unique_in_degree,
       |    count(*) AS multi_in_degree,
       |    CAST(sum(weight) AS BIGINT) AS total_in_weight,
       |    CAST(sum(weight) AS DOUBLE) / count(*) AS mean_in_weight,
       |    quantile_cont(weight, 0.5) AS median_in_weight,
       |    (CAST(sum(weight*weight) AS DOUBLE) - CAST(sum(weight) AS DOUBLE) * CAST(sum(weight) AS DOUBLE) / count(*)) / count(*) AS var_in_weight
       |  FROM wedges GROUP BY 1, 2),
       |outs AS (
       |  SELECT wid, src AS account,
       |    count(DISTINCT dst) AS unique_out_degree,
       |    count(*) AS multi_out_degree,
       |    CAST(sum(weight) AS BIGINT) AS total_out_weight,
       |    CAST(sum(weight) AS DOUBLE) / count(*) AS mean_out_weight,
       |    quantile_cont(weight, 0.5) AS median_out_weight,
       |    (CAST(sum(weight*weight) AS DOUBLE) - CAST(sum(weight) AS DOUBLE) * CAST(sum(weight) AS DOUBLE) / count(*)) / count(*) AS var_out_weight
       |  FROM wedges GROUP BY 1, 2),
       |fl AS (
       |  SELECT n.wid, n.account,
       |    $listCols AS l
       |  FROM wnodes n
       |  LEFT JOIN ins USING (wid, account)
       |  LEFT JOIN outs USING (wid, account))""".stripMargin
  }

  /** Forest fit + score chain over `fl`, ending in
    * `fs(wid, pid, account, x, y, score)` — the exact AaAr.focusScores
    * table. `tagPfx` must equal the Spark side's `"if|" + seed`.
    *
    * Replay-cost engineering (rounds 13-14 — the driver gate's wall
    * time is a reliability property, not a nicety; r12/r13's gate died
    * under load). Round 13 packed (wid, pid, t, p) into ONE BIGINT key
    * `((wid·128 + pid)·32 + t)·1024 + p` (pid < 128, t < 32, p < 1024
    * by construction: 12-feature pairs ⇒ pid ≤ 65, heap position at
    * the depth-8 cap ⇒ p ≤ 511) — every per-level hash join and
    * group-by keys on one BIGINT; the md5 tags decode the components
    * arithmetically (`k >> 22`, …) so the hashed strings are
    * byte-identical to the unpacked form. Round 14 adds two structural
    * cuts, measured ~5× together on the sf0.01 replay:
    *   - the fit's slot frame and the scoring walk's point frame FUSE
    *     into one routed frame per level: one row per DISTINCT
    *     (group, tree, heap position, x, y) with m = the subsample-slot
    *     multiplicity on that point (0 = unsampled, walk-only). Node
    *     stats use the slot mass only (s = sum(m), bounds FILTER
    *     (m > 0)) — bit-equal to per-slot-row stats — and unsampled
    *     rows can never escape the slot-occupied subtree because an
    *     internal node has both children slot-occupied (the "split
    *     empties a side ⇒ leaf" rule), so one node table serves both
    *     leaf capture and advance;
    *   - the frames live in `CREATE OR REPLACE TEMP TABLE` statements,
    *     not MATERIALIZED CTEs: DuckDB 1.0 scans a materialized CTE
    *     near-serially (measured: identical group-by 8× slower from a
    *     materialized CTE than from a temp table), so the whole chain
    *     ran effectively single-threaded; temp-table scans parallelize.
    *     The oracle is therefore a multi-STATEMENT script (DuckDB's
    *     execute/sql/cursor APIs all run it and return the last
    *     SELECT); `CREATE OR REPLACE` keeps it idempotent on a shared
    *     connection. Plain (inlined) CTEs stay single-statement where
    *     they are referenced once or are tiny.
    */
  private def focusStmts(w: Int, stride: Int, trees: Int,
                         sampleSize: Int, seed: Long): String = {
    require(trees <= 32, "packed keys reserve 5 bits for t")
    val tagPfx = s"if|$seed"
    val sb = new StringBuilder
    sb ++= s"CREATE OR REPLACE TEMP TABLE __if_cpt AS SELECT $cpLit AS cp;\n"
    // melt -> pair points (P6 raw non-zero filter, quantized log coords);
    // pid = i*(23-i)/2 + (j-i-1), the strict-upper-triangle enumeration
    sb ++= s"""CREATE OR REPLACE TEMP TABLE __if_fp AS
       |WITH $E,
       |${featureCtes(w, stride)},
       |mel AS (SELECT wid, account, CAST(i AS INTEGER) AS fidx,
       |         l[i + 1] AS val
       |       FROM fl, unnest(range(0, 12)) u(i))
       |SELECT a.wid,
       |    CAST(a.fidx * (23 - a.fidx) // 2 + (b.fidx - a.fidx - 1)
       |      AS INTEGER) AS pid,
       |    a.account,
       |    round(log10(a.val + 1), 6) AS x,
       |    round(log10(b.val + 1), 6) AS y
       |  FROM mel a JOIN mel b
       |    ON a.wid = b.wid AND a.account = b.account AND a.fidx < b.fidx
       |  WHERE a.val <> 0 AND b.val <> 0;
       |CREATE OR REPLACE TEMP TABLE __if_gm AS
       |SELECT q.*, cp[psi + 1] AS cpsi
       |FROM (SELECT wid * 128 + pid AS gk, wid, pid, count(*) AS n,
       |    CAST(least(count(*), $sampleSize) AS INTEGER) AS psi,
       |    CASE WHEN least(count(*), $sampleSize) <= 2 THEN 1
       |         WHEN least(count(*), $sampleSize) <= 4 THEN 2
       |         WHEN least(count(*), $sampleSize) <= 8 THEN 3
       |         WHEN least(count(*), $sampleSize) <= 16 THEN 4
       |         WHEN least(count(*), $sampleSize) <= 32 THEN 5
       |         WHEN least(count(*), $sampleSize) <= 64 THEN 6
       |         WHEN least(count(*), $sampleSize) <= 128 THEN 7
       |         ELSE 8 END AS maxd
       |  FROM __if_fp GROUP BY 1, 2, 3) q, __if_cpt;
       |CREATE OR REPLACE TEMP TABLE __if_fpi AS
       |SELECT wid * 128 + pid AS gk, x, y,
       |    CAST(row_number() OVER
       |    (PARTITION BY wid, pid ORDER BY account) AS BIGINT) - 1 AS ridx
       |  FROM __if_fp;
       |CREATE OR REPLACE TEMP TABLE __if_a0 AS
       |WITH sl AS (SELECT g.gk, CAST(t AS INTEGER) AS t,
       |    ${h28(s"'$tagPfx|' || g.wid || '|' || g.pid || '|' || t || '|s|' || j")} % g.n AS ridx
       |  FROM __if_gm g, unnest(range(0, $trees)) ut(t),
       |       unnest(range(0, g.psi)) uj(j)),
       |sm AS (SELECT (s.gk * 32 + s.t) * 1024 + 1 AS k, f.x, f.y,
       |    CAST(count(*) AS BIGINT) AS m
       |  FROM sl s JOIN __if_fpi f ON f.gk = s.gk AND f.ridx = s.ridx
       |  GROUP BY 1, 2, 3),
       |pd AS (SELECT gk, x, y FROM __if_fpi GROUP BY 1, 2, 3)
       |SELECT q.k, q.x, q.y, coalesce(sm.m, CAST(0 AS BIGINT)) AS m
       |  FROM (SELECT (p.gk * 32 + t) * 1024 + 1 AS k, p.x, p.y
       |        FROM pd p CROSS JOIN unnest(range(0, $trees)) ut(t)) q
       |  LEFT JOIN sm ON sm.k = q.k AND sm.x = q.x AND sm.y = q.y;
       |""".stripMargin
    // Unrolled levels 0..7: one node temp table + one advanced-frame
    // temp table per level. Leaf classification is closed-form from the
    // node stats: besides the size-1 / depth-cap / no-spread rules, the
    // reference implementation's "a split that empties one side is a
    // leaf" is EXACTLY `split <= min` (left empty: no x < split) or
    // `split > max` (right empty: no x >= split — reachable only
    // through fp rounding of lo + u*(hi-lo) past hi), so no child-count
    // aggregation or anti join is needed. The leaf's path-length value
    // v is computed inline; leaf capture happens in the final
    // statement's hts union (a parallel re-join of each level's two
    // temp tables). A heap advance is k + (k & 1023) + routing-bit;
    // group identity is k >> 15, so wid/pid/t never travel through the
    // hot tables.
    for (d <- 0 to 7) {
      sb ++= s"""CREATE OR REPLACE TEMP TABLE __if_nd$d AS
         |SELECT k, dim, split, isleaf,
         |    CASE WHEN isleaf
         |         THEN CAST($d AS BIGINT) * 1000000 + cp[s + 1] END AS v
         |  FROM (SELECT k, s, dim, split, mn0, mx0, mn1, mx1,
         |      (isleaf OR split <= (CASE WHEN dim = 0 THEN mn0 ELSE mn1 END)
         |              OR split > (CASE WHEN dim = 0 THEN mx0 ELSE mx1 END))
         |        AS isleaf
         |    FROM (SELECT *,
         |        CASE WHEN isleaf THEN NULL ELSE
         |          (CASE WHEN dim = 0 THEN mn0 ELSE mn1 END)
         |          + (CAST(('0x' || substr(hx, 9, 15)) AS BIGINT) % 1000000)
         |            / 1000000.0
         |            * ((CASE WHEN dim = 0 THEN mx0 ELSE mx1 END)
         |               - (CASE WHEN dim = 0 THEN mn0 ELSE mn1 END)) END AS split
         |      FROM (SELECT *,
         |          CASE WHEN isleaf THEN NULL
         |               WHEN CAST(('0x' || substr(hx, 1, 7)) AS BIGINT) % 2 = 0
         |                 THEN (CASE WHEN mx0 > mn0 THEN 0 ELSE 1 END)
         |               ELSE (CASE WHEN mx1 > mn1 THEN 1 ELSE 0 END) END AS dim
         |        FROM (SELECT ns.*, g.maxd,
         |            (ns.s <= 1 OR $d >= g.maxd
         |              OR (ns.mn0 = ns.mx0 AND ns.mn1 = ns.mx1)) AS isleaf,
         |            md5('$tagPfx|' || (ns.k >> 22) || '|' ||
         |                ((ns.k >> 15) & 127) || '|' ||
         |                ((ns.k >> 10) & 31) || '|n|' || (ns.k & 1023)) AS hx
         |          FROM (SELECT k, CAST(sum(m) AS BIGINT) AS s,
         |              min(x) FILTER (WHERE m > 0) AS mn0,
         |              max(x) FILTER (WHERE m > 0) AS mx0,
         |              min(y) FILTER (WHERE m > 0) AS mn1,
         |              max(y) FILTER (WHERE m > 0) AS mx1
         |            FROM __if_a$d GROUP BY 1) ns
         |          JOIN __if_gm g ON g.gk = (ns.k >> 15)) q1$d) q2$d) q3$d)
         |    q4$d, __if_cpt;
         |CREATE OR REPLACE TEMP TABLE __if_a${d + 1} AS
         |SELECT a.k + (a.k & 1023) +
         |    (CASE WHEN (CASE WHEN n.dim = 0 THEN a.x ELSE a.y END) < n.split
         |          THEN 0 ELSE 1 END) AS k, a.x, a.y, a.m
         |  FROM __if_a$d a JOIN __if_nd$d n USING (k)
         |  WHERE NOT n.isleaf;
         |""".stripMargin
    }
    sb.toString
  }

  /** CTE text over [[focusStmts]]'s temp tables ending in `fs(wid, pid,
    * account, x, y, score)` — the exact AaAr.focusScores table. The hts
    * union re-joins each level's frame/node temp tables for leaf
    * capture (level 8 is the global depth cap: everything still alive
    * is a leaf of its surviving slot mass); per-point path sums attach
    * back to accounts by (group, x, y) equality — exact, both sides are
    * the same round()-ed doubles from __if_fp.
    */
  private def fsCte(trees: Int): String =
    s"""hts AS (${(0 to 7).map(d => s"SELECT a.k, a.x, a.y, n.v FROM __if_a$d a JOIN __if_nd$d n USING (k) WHERE n.isleaf").mkString("\n  UNION ALL ")}
       |  UNION ALL
       |  SELECT w.k, w.x, w.y, l.v FROM __if_a8 w JOIN
       |    (SELECT k, CAST(8 AS BIGINT) * 1000000
       |        + cp[CAST(sum(m) AS BIGINT) + 1] AS v
       |     FROM __if_a8, __if_cpt GROUP BY 1, cp) l USING (k)),
       |pe AS (SELECT k >> 15 AS gk, x, y, CAST(sum(v) AS BIGINT) AS e
       |  FROM hts GROUP BY 1, 2, 3),
       |esc AS (SELECT p.gk, f.account, f.x, f.y, p.e
       |  FROM __if_fp f JOIN pe p ON p.gk = f.wid * 128 + f.pid
       |    AND p.x = f.x AND p.y = f.y),
       |fs AS (
       |  SELECT g.wid, g.pid, e.account, e.x, e.y,
       |    CASE WHEN g.cpsi = 0 THEN 0.5
       |         ELSE pow(2.0, -CAST(e.e AS DOUBLE)
       |                / ($trees.0 * CAST(g.cpsi AS DOUBLE))) END AS score
       |  FROM esc e JOIN __if_gm g USING (gk))""".stripMargin

  /** q34's oracle: the per-(window, pair) face over the regenerated
    * forest scores. A multi-statement script (see [[focusStmts]]); the
    * last statement is the face SELECT.
    */
  def q34Sql(w: Int = 28, stride: Int = 14, trees: Int, sampleSize: Int = 256,
             seed: Long = 0L): String =
    s"""${focusStmts(w, stride, trees, sampleSize, seed)}
       |WITH ${fsCte(trees)}
       |SELECT wid, pid AS pair_id, count(*) AS n_scored,
       |  round(avg(score), 2) AS avg_score
       |FROM fs GROUP BY 1, 2""".stripMargin

  /** Statements materializing the sketch-stage hot tables over
    * `__if_fs`: the ppm-integer score table `__if_sp`, the kept-source
    * selection `__if_asel` (packed sak = account*64 + ski), and the
    * ~7M-row cell table `__if_cl` (packed spk = pid*64 + ski; ski < 64
    * by the sketchNum contract) — the r13 packed-key discipline, now as
    * temp tables so their many consumers scan them in parallel. The md5
    * selection tags keep the raw account/pid/ski rendering, so the
    * drawn coins are byte-identical to the unpacked form.
    */
  private def sketchStmts(sketchNum: Int, srcKeep: Long, dstKeep: Long,
                          seed: Long): String = {
    require(sketchNum <= 64, "packed keys reserve 6 bits for ski")
    s"""CREATE OR REPLACE TEMP TABLE __if_sp AS
       |SELECT wid, pid, account,
       |    CAST(round(score * 1000000.0, 0) AS BIGINT) AS s FROM __if_fs;
       |CREATE OR REPLACE TEMP TABLE __if_asel AS
       |WITH ski AS (SELECT CAST(unnest(generate_series(0, ${sketchNum - 1}))
       |    AS INTEGER) AS ski)
       |SELECT k.ski, a.account, a.account * 64 + k.ski AS sak
       |  FROM (SELECT DISTINCT account FROM __if_sp) a CROSS JOIN ski k
       |  WHERE ${hPpm(s"a.account || '|' || k.ski || '|afs$seed'")} < $srcKeep;
       |CREATE OR REPLACE TEMP TABLE __if_cl AS
       |WITH ${dselCte(sketchNum, dstKeep, seed)},
       |sg AS (SELECT account, pid, CAST(sum(s) AS BIGINT) AS s
       |  FROM __if_sp GROUP BY 1, 2)
       |SELECT a.sak, d.spk, g.s
       |  FROM __if_asel a JOIN sg g USING (account)
       |  JOIN dsel d ON d.spk = g.pid * 64 + a.ski;
       |""".stripMargin
  }

  /** The kept-destination selection `dsel` — tiny (pairs x sketches),
    * recomputed verbatim in each statement that needs it (deterministic
    * md5 coins, so the copies agree).
    */
  private def dselCte(sketchNum: Int, dstKeep: Long, seed: Long): String =
    s"""ski AS (SELECT CAST(unnest(generate_series(0, ${sketchNum - 1}))
       |    AS INTEGER) AS ski),
       |dsel AS (SELECT k.ski, p.pid, p.pid * 64 + k.ski AS spk
       |  FROM (SELECT DISTINCT pid FROM __if_sp) p CROSS JOIN ski k
       |  WHERE ${hPpm(s"p.pid || '|' || k.ski || '|afd$seed'")} < $dstKeep)""".stripMargin

  /** Final-statement CTE chain over the sketch temp tables, ending in
    * `sk(wid, ski, value)` — the exact AaAr.sketches table (ppm-integer
    * values, md5 ppm coins, the three greedy steps unrolled; numDst = 3
    * is the only unrolled arity).
    */
  private def sketchCte(sketchNum: Int, numDst: Int, dstKeep: Long,
                        seed: Long): String = {
    require(numDst == 3, "oracle unrolls exactly numDst = 3 greedy steps")
    s"""${dselCte(sketchNum, dstKeep, seed)},
       |st1 AS (SELECT spk, CAST(sum(s) AS BIGINT) AS tot
       |  FROM __if_cl GROUP BY 1),
       |p1 AS (SELECT ski, spk, tot FROM (
       |    SELECT spk % 64 AS ski, spk, tot, row_number() OVER
       |      (PARTITION BY spk % 64 ORDER BY tot DESC, spk // 64 ASC)
       |      AS rn
       |    FROM st1 WHERE tot > 0) q1 WHERE rn = 1),
       |b1 AS (SELECT c.sak, c.s
       |  FROM __if_cl c JOIN p1 ON p1.spk = c.spk),
       |g2 AS (SELECT d.ski, d.pid,
       |    CAST(coalesce(sum(CASE WHEN c.s > coalesce(b.s, 0)
       |      THEN c.s - coalesce(b.s, 0) ELSE 0 END), 0) AS BIGINT) AS gain
       |  FROM dsel d JOIN p1 ON p1.ski = d.ski AND p1.spk <> d.spk
       |  LEFT JOIN __if_cl c ON c.spk = d.spk
       |  LEFT JOIN b1 b ON b.sak = c.sak
       |  GROUP BY 1, 2),
       |p2 AS (SELECT ski, pid * 64 + ski AS spk FROM (
       |    SELECT ski, pid, row_number() OVER
       |      (PARTITION BY ski ORDER BY gain DESC, pid ASC) AS rn
       |    FROM g2) q2 WHERE rn = 1),
       |b2 AS (SELECT coalesce(b.sak, c.sak) AS sak,
       |    greatest(coalesce(b.s, 0), coalesce(c.s, 0)) AS s
       |  FROM b1 b FULL JOIN
       |    (SELECT c.sak, c.s FROM __if_cl c
       |     JOIN p2 ON p2.spk = c.spk) c
       |    ON b.sak = c.sak),
       |g3 AS (SELECT d.ski, d.pid,
       |    CAST(coalesce(sum(CASE WHEN c.s > coalesce(b.s, 0)
       |      THEN c.s - coalesce(b.s, 0) ELSE 0 END), 0) AS BIGINT) AS gain
       |  FROM dsel d JOIN p1 ON p1.ski = d.ski AND p1.spk <> d.spk
       |  JOIN p2 ON p2.ski = d.ski AND p2.spk <> d.spk
       |  LEFT JOIN __if_cl c ON c.spk = d.spk
       |  LEFT JOIN b2 b ON b.sak = c.sak
       |  GROUP BY 1, 2),
       |p3 AS (SELECT ski, pid * 64 + ski AS spk FROM (
       |    SELECT ski, pid, row_number() OVER
       |      (PARTITION BY ski ORDER BY gain DESC, pid ASC) AS rn
       |    FROM g3) q3 WHERE rn = 1),
       |chosen AS (SELECT spk FROM p1
       |  UNION ALL SELECT spk FROM p2
       |  UNION ALL SELECT spk FROM p3),
       |skv AS (SELECT s.wid, a.ski, CAST(sum(s.s) AS BIGINT) AS v
       |  FROM __if_sp s JOIN __if_asel a USING (account)
       |  JOIN chosen ch ON ch.spk = s.pid * 64 + a.ski
       |  GROUP BY 1, 2),
       |sk AS (SELECT g.wid, g.ski, coalesce(v, CAST(0 AS BIGINT)) AS value
       |  FROM (SELECT w.wid, k.ski
       |        FROM (SELECT DISTINCT wid FROM __if_sp) w CROSS JOIN ski k) g
       |  LEFT JOIN skv ON skv.wid = g.wid AND skv.ski = g.ski)""".stripMargin
  }

  /** Change-score chain over `sk`, ending in
    * `cs(wid, change_score, max_coord)` — AaAr.changeScores with the
    * 100-step power iteration replayed by a recursive CTE in the same
    * pinned fold order. The recursion is NESTED in `pv`'s subquery so the
    * statement's top-level WITH stays non-recursive: a top-level RECURSIVE
    * keyword makes DuckDB drop CTE materialization for the WHOLE chain,
    * re-evaluating each fit level's multiply-referenced CTEs — measured
    * exponential (the 7.5 s q34 prelude no longer finishes). The nested
    * form scopes the recursive planning to the tiny per-wid iteration.
    */
  private def changeCtes(backWs: Int, sketchNum: Int): String = {
    require(backWs == 4, "oracle mirrors the backWs = 4 frame")
    val iters = graft.ml.PowerDirection.Iterations
    s"""vs AS (SELECT wid, list(CAST(value AS DOUBLE) ORDER BY ski) AS l
       |  FROM sk GROUP BY wid),
       |vr AS (SELECT wid, l,
       |    CAST(row_number() OVER (ORDER BY wid) AS BIGINT) - 1 AS rn
       |  FROM vs),
       |fr AS (SELECT c.wid, a.l AS la, b.l AS lb, d.l AS lc, c.l AS ls
       |  FROM vr c JOIN vr a ON a.rn = c.rn - 4
       |    JOIN vr b ON b.rn = c.rn - 3
       |    JOIN vr d ON d.rn = c.rn - 2
       |  WHERE c.rn >= 4),
       |gg AS MATERIALIZED (SELECT wid, la, lb, lc, ls,
       |    list_dot_product(la, la) AS g00, list_dot_product(la, lb) AS g01,
       |    list_dot_product(la, lc) AS g02, list_dot_product(lb, lb) AS g11,
       |    list_dot_product(lb, lc) AS g12, list_dot_product(lc, lc) AS g22
       |  FROM fr),
       |pv AS (SELECT * FROM (
       |  WITH RECURSIVE pit(wid, k, v0, v1, v2) AS (
       |    -- anchor literals MUST be cast: a bare 1.0 is DECIMAL(2,1) in
       |    -- DuckDB and the recursive CTE adopts the ANCHOR's types — the
       |    -- whole iteration then quantizes v to one decimal place
       |    SELECT wid, 0, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
       |      CAST(1.0 AS DOUBLE) FROM gg
       |    UNION ALL
       |    SELECT wid, k + 1,
       |      CASE WHEN nrm > 0 THEN w0 / nrm ELSE 0.0 END,
       |      CASE WHEN nrm > 0 THEN w1 / nrm ELSE 0.0 END,
       |      CASE WHEN nrm > 0 THEN w2 / nrm ELSE 0.0 END
       |    FROM (SELECT wid, k, w0, w1, w2,
       |            sqrt((w0 * w0 + w1 * w1) + w2 * w2) AS nrm
       |          FROM (SELECT p.wid, p.k,
       |                  (g.g00 * p.v0 + g.g01 * p.v1) + g.g02 * p.v2 AS w0,
       |                  (g.g01 * p.v0 + g.g11 * p.v1) + g.g12 * p.v2 AS w1,
       |                  (g.g02 * p.v0 + g.g12 * p.v1) + g.g22 * p.v2 AS w2
       |                FROM pit p JOIN gg g USING (wid)
       |                WHERE p.k < $iters) t1) t2)
       |  SELECT wid, v0, v1, v2 FROM pit WHERE k = $iters)),
       |ux AS (SELECT g.wid, i,
       |    abs((g.la[i] * p.v0 + g.lb[i] * p.v1) + g.lc[i] * p.v2) AS ev,
       |    g.ls[i] AS skc
       |  FROM gg g JOIN pv p USING (wid),
       |       unnest(range(1, ${sketchNum + 1})) u(i)),
       |ul AS (SELECT wid, list(ev ORDER BY i) AS evl, list(skc ORDER BY i) AS skl
       |  FROM ux GROUP BY wid),
       |un AS (SELECT wid, evl, skl,
       |    list_reduce(evl, (a, b) -> a + b) AS l1e,
       |    list_reduce(skl, (a, b) -> a + b) AS l1s
       |  FROM ul),
       |rx AS (SELECT u.wid, i,
       |    CASE WHEN n.l1e = 0 THEN NULL ELSE u.ev / n.l1e END AS evn,
       |    CASE WHEN n.l1s = 0 THEN NULL ELSE u.skc / n.l1s END AS skn
       |  FROM ux u JOIN un n USING (wid)),
       |rl AS (SELECT wid,
       |    list(coalesce(evn, 0.0) ORDER BY i) AS evn0,
       |    list(coalesce(skn, 0.0) ORDER BY i) AS skn0,
       |    list(CASE WHEN evn IS NULL OR evn = 0 THEN NULL
       |              ELSE (skn - evn) / evn END ORDER BY i) AS ratio
       |  FROM rx GROUP BY wid),
       |cs AS (SELECT wid,
       |    coalesce(1.0 - (CASE WHEN l2e * l2s = 0 THEN NULL
       |                         ELSE dot / (l2e * l2s) END), 0.0)
       |      AS change_score,
       |    coalesce(list_position(ratio, list_max(ratio)) - 1,
       |      CAST(-1 AS BIGINT)) AS max_coord
       |  FROM (SELECT wid, ratio,
       |          list_dot_product(evn0, skn0) AS dot,
       |          sqrt(list_dot_product(evn0, evn0)) AS l2e,
       |          sqrt(list_dot_product(skn0, skn0)) AS l2s
       |        FROM rl) q)""".stripMargin
  }

  /** Shared statement prelude for q31/q45: forest temp tables, the
    * materialized `__if_fs`, and the sketch-stage temp tables.
    */
  private def fsSketchStmts(w: Int, stride: Int, trees: Int,
                            sketchNum: Int, seed: Long): String =
    s"""${focusStmts(w, stride, trees, 256, seed)}
       |CREATE OR REPLACE TEMP TABLE __if_fs AS
       |WITH ${fsCte(trees)}
       |SELECT * FROM fs;
       |${sketchStmts(sketchNum, AaAr.keepPpm(0.995), AaAr.keepPpm(0.8), seed)}""".stripMargin

  /** q31's oracle: the change-score series over the regenerated forest +
    * sketches. Parameters mirror SparkEntry.sharedChanges.
    */
  def q31Sql(w: Int = 28, stride: Int = 14, trees: Int,
             sketchNum: Int = 64, seed: Long = 0L): String =
    s"""${fsSketchStmts(w, stride, trees, sketchNum, seed)}
       |WITH ${sketchCte(sketchNum, 3, AaAr.keepPpm(0.8), seed)},
       |${changeCtes(4, sketchNum)}
       |SELECT wid, change_score, max_coord FROM cs""".stripMargin

  /** q45's oracle: attention routing over the regenerated focus + change
    * tables (AaAr.attentionRouting: numFigures = numAccounts = 3,
    * back = 4, the closed-form OLS overlay per attended pair).
    */
  def q45Sql(w: Int = 28, stride: Int = 14, trees: Int,
             sketchNum: Int = 64, seed: Long = 0L): String =
    s"""${fsSketchStmts(w, stride, trees, sketchNum, seed)}
       |WITH ${sketchCte(sketchNum, 3, AaAr.keepPpm(0.8), seed)},
       |${changeCtes(4, sketchNum)},
       |tw AS (SELECT wid FROM cs ORDER BY change_score DESC, wid ASC LIMIT 1),
       |f45 AS (SELECT f.* FROM __if_fs f JOIN tw USING (wid)),
       |tp AS (SELECT wid, pid, sum(score) AS pair_score,
       |    CASE WHEN var_pop(x) = 0 THEN NULL
       |         ELSE covar_pop(x, y) / var_pop(x) END AS fit_slope,
       |    avg(y) - (CASE WHEN var_pop(x) = 0 THEN NULL
       |              ELSE covar_pop(x, y) / var_pop(x) END) * avg(x)
       |      AS fit_intercept,
       |    corr(x, y) * corr(x, y) AS fit_r2
       |  FROM f45 GROUP BY 1, 2),
       |tpr AS (SELECT *, row_number() OVER
       |    (PARTITION BY wid ORDER BY pair_score DESC, pid ASC) AS prank
       |  FROM tp),
       |top3 AS (SELECT * FROM tpr WHERE prank <= 3),
       |ta AS (SELECT f.wid, f.pid, t.prank, f.account, f.x, f.y,
       |    t.fit_slope, t.fit_intercept, t.fit_r2,
       |    row_number() OVER (PARTITION BY f.wid, f.pid
       |      ORDER BY f.score DESC, f.account ASC) AS rnk
       |  FROM f45 f JOIN top3 t ON t.wid = f.wid AND t.pid = f.pid),
       |ta3 AS (SELECT * FROM ta WHERE rnk <= 3)
       |SELECT ta3.wid, ta3.pid AS pair_id, ta3.prank, ta3.rnk, ta3.account,
       |  round(ta3.x, 6) AS x, round(ta3.y, 6) AS y,
       |  round(avg(p.x), 6) AS past_x, round(avg(p.y), 6) AS past_y,
       |  round(ta3.fit_slope, 6) AS fit_slope,
       |  round(ta3.fit_intercept, 6) AS fit_intercept,
       |  round(ta3.fit_r2, 6) AS fit_r2
       |FROM ta3 LEFT JOIN __if_fs p
       |  ON p.pid = ta3.pid AND p.account = ta3.account
       |     AND p.wid >= ta3.wid - 4 AND p.wid < ta3.wid
       |GROUP BY ta3.wid, ta3.pid, ta3.prank, ta3.rnk, ta3.account,
       |  ta3.x, ta3.y, ta3.fit_slope, ta3.fit_intercept, ta3.fit_r2""".stripMargin
}

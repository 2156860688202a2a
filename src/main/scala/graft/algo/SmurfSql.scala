package graft.algo

/** DuckDB oracle mirror of the greedy MDL reordering loop — the SQL that
  * REPLAYS [[AaSmurf.greedyOrder]] (reference `AA-Smurf.py:116-163`)
  * bit-for-bit from nothing but the parquet tables, bringing q32 (the last
  * rows-only query) under the driver's hash gate.
  *
  * Why an exact replay is possible (round 11):
  *
  *   - **The MDL is integer-valued.** Every term of [[AaSmurf.computeMdl]]
  *     is a region COUNT times an integer bit-cost (`ceil(log2 ·)` /
  *     `ceil(logStar ·)` of small integers), plus integer header terms —
  *     so each iteration's description length is an exact integer double
  *     (≪ 2^53) and summation order cannot perturb it. The only
  *     order-sensitive float is the purity mean, replayed as the same
  *     left fold (`list_reduce` over blk-ordered purities).
  *   - **The bit-costs agree cross-engine.** `ceil(ln x / ln 2)` and
  *     `ceil(2·(ln x / ln 2) + 1)` agree between the JVM and DuckDB for
  *     every integer x ≤ 4096 (verified exhaustively, incl. every exact
  *     power of two — the only ceil-boundary candidates), so the SQL spells
  *     the Scala formulas verbatim instead of trusting a native `log2`.
  *   - **Selection is deterministic.** The greedy's argmax
  *     (`score = (prev−mdl)/prev · purity`, first-wins on ties — Scala
  *     `maxBy` over the cnt-desc/i/j-ordered candidate array) becomes
  *     `ORDER BY score DESC, rk ASC LIMIT 1`; both sides compute the score
  *     with the same IEEE ops on the same exact inputs.
  *   - **The loop is bounded.** With `maxIter = 8` the reference loop
  *     commits at most 9 iterations, so the whole program UNROLLS as 9
  *     chained single-row state CTEs (order, block starts, counts, MDL
  *     trace, order trace, done flag) — no recursive-CTE restrictions.
  *     A `done` flag propagates early termination (no candidate improves
  *     the MDL) through the remaining unrolled stages unchanged.
  *
  * The candidate list is the SAME top-K prefix both sides: Spark's
  * `twoHopMids → orderBy(cnt desc, i, j) → limit(cap)` (the documented
  * [[AaSmurf.runModelWithIds]] scale cap — the greedy explores exactly the
  * prefix it would have reached first uncapped) vs the `QUALIFY rk <= cap`
  * here. Dense indices are the ascending node-id rank, so id-space and
  * index-space orderings coincide.
  *
  * Shared CTEs and the per-iteration state/position/edge tables are
  * `MATERIALIZED`: DuckDB 1.0 inlines CTEs by default, and each state CTE
  * is referenced twice (next state + next candidate scan) — un-pinned,
  * the 9-deep chain would inline the upstream plan 2^9 times and exhaust
  * file handles re-opening the parquet scan.
  */
object SmurfSql {

  private val E = graft.model.Tables.edgesSqlCte

  /** `ceil(log2 n)` exactly as `AaSmurf.log2` computes it (ln ratio). */
  private val Log2N = "ceil(ln(CAST(n AS DOUBLE))/ln(2.0))"

  private def iterCtes(k: Int, maxIter: Int): String = {
    val p = k - 1
    s"""a$k AS (
       |  SELECT c.rk, c.i, c.j, s.ord, s.starts, s.c0, s.c1, s.c2, s.trace,
       |    list_filter(c.mids, m -> NOT list_contains(s.ord, m)
       |      AND m != c.i AND m != c.j) AS midsf
       |  FROM s$p s, cand c
       |  WHERE NOT s.done AND c.i != c.j
       |    AND NOT list_contains(s.ord, c.i)
       |    AND NOT list_contains(s.ord, c.j)),
       |t$k AS (
       |  SELECT rk,
       |    ord || [i] || midsf || [j] AS tent,
       |    starts || [len(ord) + len(midsf) + 2] AS tstarts,
       |    len(ord) + len(midsf) + 2 AS ds,
       |    c0 + 1 AS tc0, c1 + len(midsf) AS tc1, c2 + 1 AS tc2,
       |    trace[len(trace)] AS prev_mdl
       |  FROM a$k WHERE len(midsf) > 0),
       |f$k AS MATERIALIZED (
       |  SELECT t.*, t.tent || list_filter(av.all_v,
       |    v -> NOT list_contains(t.tent, v)) AS fullord
       |  FROM t$k t, av),
       |p$k AS MATERIALIZED (
       |  SELECT rk, unnest(fullord) AS node,
       |    generate_subscripts(fullord, 1) - 1 AS p
       |  FROM f$k),
       |pe$k AS MATERIALIZED (
       |  SELECT p1.rk, p1.p AS pi, p2.p AS pj
       |  FROM be e JOIN p$k p1 ON p1.node = e.s
       |            JOIN p$k p2 ON p2.rk = p1.rk AND p2.node = e.d),
       |bl$k AS (
       |  SELECT rk, generate_subscripts(tstarts, 1) AS bi,
       |    unnest(tstarts) AS sv
       |  FROM f$k),
       |blk$k AS (
       |  SELECT b1.rk, b1.bi AS idx, b1.sv AS bs, b2.sv - 1 AS be
       |  FROM bl$k b1 JOIN bl$k b2 ON b2.rk = b1.rk AND b2.bi = b1.bi + 1),
       |bc$k AS (
       |  SELECT b.rk, b.idx, b.bs, b.be, (b.be - b.bs + 1) AS kk, n,
       |    count(*) FILTER (WHERE pi >= b.bs + 1 AND pi < b.be
       |      AND pj >= b.bs AND pj < b.be - 1) AS m_mid,
       |    count(*) FILTER (WHERE pi >= b.be + 1 AND pi < n - 1
       |      AND pj >= b.bs AND pj < b.be) AS m_below,
       |    count(*) FILTER (WHERE pi >= b.bs AND pi < b.be
       |      AND pj >= b.be + 1 AND pj < n - 1) AS m_right,
       |    count(*) FILTER (WHERE pi >= b.bs AND pi < b.be
       |      AND pj >= b.bs AND pj < b.be) AS m_core
       |  FROM blk$k b JOIN pe$k pe ON pe.rk = b.rk CROSS JOIN nn
       |  GROUP BY b.rk, b.idx, b.bs, b.be, n),
       |bt$k AS (
       |  SELECT rk,
       |    SUM(m_mid * (2.0 * ceil(ln(kk - 1.0)/ln(2.0)))
       |      + (m_below + m_right) * ($Log2N
       |        + ceil(ln(CAST(n AS DOUBLE) - kk)/ln(2.0)))) AS block_bits,
       |    list_reduce(list_prepend(0.0, list(
       |        CASE WHEN (m_core + m_below + m_right) = 0 THEN 0.0
       |        ELSE (kk - 2.0) * 2.0 / (m_core + m_below + m_right) END
       |        ORDER BY idx)), (acc, x) -> acc + x) / count(*) AS purity
       |  FROM bc$k GROUP BY rk),
       |dt$k AS (
       |  SELECT f.rk,
       |    count(*) FILTER (WHERE pi >= f.ds AND pi < n - 1
       |      AND pj >= f.ds AND pj < n - 1) AS d_ones
       |  FROM f$k f JOIN pe$k pe ON pe.rk = f.rk CROSS JOIN nn
       |  GROUP BY f.rk, f.ds, n),
       |sc$k AS (
       |  SELECT f.rk, f.tent, f.tstarts, f.tc0, f.tc1, f.tc2, f.prev_mdl,
       |    bt.purity,
       |    bt.block_bits
       |    + (CAST(GREATEST(n - 1 - f.ds, 0) AS DOUBLE)
       |       * GREATEST(n - 1 - f.ds, 0) - dt.d_ones) * (2.0 * $Log2N)
       |    + ceil(2.0 * (ln(CAST(f.tc0 AS DOUBLE))/ln(2.0)) + 1.0)
       |    + ceil(2.0 * (ln(CAST(f.tc1 AS DOUBLE))/ln(2.0)) + 1.0)
       |    + (f.tc0 + f.tc1 + f.tc2) * $Log2N
       |    + ceil(2.0 * (ln(CAST(len(f.tstarts) - 1 AS DOUBLE))/ln(2.0))
       |        + 1.0) AS mdl
       |  FROM f$k f JOIN bt$k bt ON bt.rk = f.rk
       |             JOIN dt$k dt ON dt.rk = f.rk
       |  CROSS JOIN nn),
       |b$k AS (
       |  SELECT * FROM sc$k WHERE mdl < prev_mdl
       |  ORDER BY (prev_mdl - mdl) / prev_mdl * purity DESC, rk ASC
       |  LIMIT 1),
       |s$k AS MATERIALIZED (
       |  SELECT
       |    CASE WHEN b.rk IS NULL THEN s.ord ELSE b.tent END AS ord,
       |    CASE WHEN b.rk IS NULL THEN s.starts ELSE b.tstarts END AS starts,
       |    CASE WHEN b.rk IS NULL THEN s.c0 ELSE b.tc0 END AS c0,
       |    CASE WHEN b.rk IS NULL THEN s.c1 ELSE b.tc1 END AS c1,
       |    CASE WHEN b.rk IS NULL THEN s.c2 ELSE b.tc2 END AS c2,
       |    CASE WHEN b.rk IS NULL THEN s.trace
       |      ELSE list_append(s.trace, b.mdl) END AS trace,
       |    CASE WHEN b.rk IS NULL THEN s.otrace
       |      ELSE list_append(s.otrace, b.tent) END AS otrace,
       |    CASE WHEN b.rk IS NULL THEN s.iter ELSE s.iter + 1 END AS iter,
       |    CASE WHEN s.done OR b.rk IS NULL THEN true
       |      ELSE (s.iter + 1) > $maxIter END AS done
       |  FROM s$p s LEFT JOIN b$k b ON true)""".stripMargin
  }

  /** The full q32 oracle: greedy replay over the ≤`maxNodeId` subgraph
    * with the top-`cap` candidate prefix and `maxIter` iteration bound —
    * parameters MUST match the Spark call
    * (`AaSmurf.run(_, smallGraph, minCount, Some(maxIter), Some(cap))`).
    */
  def q32Sql(maxNodeId: Int = 300, minCount: Int = 3, cap: Int = 256,
             maxIter: Int = 8): String = {
    val unroll = maxIter + 1 // loop commits at most maxIter+1 iterations
    s"""WITH $E,
       |sg AS (SELECT * FROM edges
       |       WHERE src <= $maxNodeId AND dst <= $maxNodeId),
       |bin AS MATERIALIZED (SELECT DISTINCT src, dst FROM sg),
       |nd AS (SELECT src AS id FROM bin UNION SELECT dst FROM bin),
       |idx AS MATERIALIZED (SELECT id,
       |  CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS di
       |  FROM nd),
       |be AS MATERIALIZED (SELECT a.di AS s, b.di AS d
       |  FROM bin JOIN idx a ON bin.src = a.id
       |           JOIN idx b ON bin.dst = b.id),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS INTEGER) AS n,
       |  (SELECT count(*) FROM be) AS ones FROM idx),
       |av AS MATERIALIZED (SELECT list(di ORDER BY di) AS all_v FROM idx),
       |cand AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, i, j)
       |    AS INTEGER) AS rk, i, j, mids
       |  FROM (SELECT e1.s AS i, e2.d AS j, count(*) AS cnt,
       |               list_sort(list(DISTINCT e1.d)) AS mids
       |        FROM be e1 JOIN be e2 ON e1.d = e2.s
       |        GROUP BY 1, 2 HAVING count(*) >= $minCount)
       |  QUALIFY rk <= $cap),
       |s0 AS MATERIALIZED (SELECT
       |    CAST([] AS INTEGER[]) AS ord, [0] AS starts,
       |    0 AS c0, 0 AS c1, 0 AS c2,
       |    [ceil(CAST(CAST(n AS BIGINT) * n - ones AS DOUBLE))
       |      * (2.0 * $Log2N)] AS trace,
       |    [CAST([] AS INTEGER[])] AS otrace,
       |    0 AS iter, false AS done
       |  FROM nn),
       |${(1 to unroll).map(iterCtes(_, maxIter)).mkString(",\n")},
       |sel AS (
       |  SELECT *,
       |    CASE WHEN list_position(list_transform(trace,
       |        v -> v < trace[len(trace)] * 1.1), true) - 1 < 1
       |      THEN len(trace)
       |      ELSE list_position(list_transform(trace,
       |        v -> v < trace[len(trace)] * 1.1), true) - 1 END AS sel1
       |  FROM s$unroll),
       |fin AS (
       |  SELECT otrace[sel1] || list_filter(av.all_v,
       |      v -> NOT list_contains(otrace[sel1], v)) AS fullord,
       |    trace[sel1] AS mdl, iter
       |  FROM sel, av),
       |outp AS (
       |  SELECT CAST(generate_subscripts(fullord, 1) - 1 AS BIGINT) AS pos,
       |    unnest(fullord) AS di, mdl, CAST(iter AS BIGINT) AS iterations
       |  FROM fin)
       |SELECT o.pos, CAST(i.id AS BIGINT) AS node, o.mdl, o.iterations
       |FROM outp o JOIN idx i ON i.di = o.di""".stripMargin
  }
}

"""Integer-moment capacity audit (VERDICT r6 #5).

Every key whose arithmetic multiplies DATA-SIZED integers (moment
sums, rank·value products, cumulative cross-multiplies) is probed
here: a DuckDB query computes the LARGEST integer term the key's
arithmetic ever forms, at two scale factors. The ratio across the
10x step gives the empirical growth exponent, and extrapolation
gives the scale factor at which the term would cross int64
(9.22e18) — or, for the decimal-widened keys, decimal(38,0) (1e38).

Usage: python tools/audit_capacity.py [--sf-a sf0.01] [--sf-b sf0.1]
Emits a markdown table (paste into IMPLEMENTATION.md) plus one JSON
line per key. DuckDB widens to HUGEINT natively, so the probes
themselves cannot overflow.
"""

from __future__ import annotations

import argparse
import json
import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# key -> (probe SQL returning one row (max_term HUGEINT), growth note,
#         ceiling: "int64" or "dec38")
# Each probe reproduces the key's own integer expression tree and takes
# the max |term| actually formed.
PROBES: dict[str, tuple[str, str, str]] = {
    # Bipartite degree moments: syy ~ E*(E/25)^2 -> cubic in sf.
    # Widened to decimal(38,0) in round 7 (facets.py).
    "graph_assortativity": (
        """
        WITH e AS (SELECT DISTINCT o.o_custkey cust, p.p_brand brand
                   FROM orders o JOIN lineitem l ON l.l_orderkey=o.o_orderkey
                   JOIN part p ON p.p_partkey=l.l_partkey),
        du AS (SELECT cust, COUNT(*) dx FROM e GROUP BY 1),
        dt AS (SELECT brand, COUNT(*) dy FROM e GROUP BY 1),
        xy AS (SELECT dx, dy FROM e JOIN du USING(cust) JOIN dt USING(brand)),
        m AS (SELECT COUNT(*) n, SUM(dx) sx, SUM(dy) sy,
                     SUM(dx*dy) sxy, SUM(dx*dx) sxx, SUM(dy*dy) syy FROM xy)
        SELECT GREATEST(n*sxx, sx*sx, n*syy, sy*sy, n*sxy, sx*sy) FROM m
        """,
        "edges x (edges/25)^2: ~cubic",
        "dec38",
    ),
    # Daily two-counter Pearson: counts linear in sf, terms ~sf^2.
    "time_crosscorr": (
        """
        WITH daily AS (SELECT CAST(ts AS DATE) d,
                  SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) x,
                  SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) y
                  FROM events GROUP BY 1),
        m AS (SELECT COUNT(*) n, SUM(x) sx, SUM(y) sy, SUM(x*y) sxy,
                     SUM(x*x) sxx, SUM(y*y) syy FROM daily)
        SELECT GREATEST(n*sxx, sx*sx, n*syy, sy*sy, n*sxy, sx*sy) FROM m
        """,
        "daily counts linear, calendar fixed: ~sf^2",
        "int64",
    ),
    # Per-user lag-1 moments: per-user history linear in sf.
    "time_autocorr": (
        """
        WITH seq AS (SELECT user_id,
                  CAST(floor(value*1000) AS BIGINT) x,
                  LAG(CAST(floor(value*1000) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) px
                  FROM events),
        m AS (SELECT user_id, COUNT(*) n, SUM(x) sx, SUM(px) sy,
                     SUM(x*px) sxy, SUM(x*x) sxx, SUM(px*px) syy
              FROM seq WHERE px IS NOT NULL GROUP BY 1)
        SELECT MAX(GREATEST(n*sxx, sx*sx, n*syy, sy*sy,
                            abs(n*sxy), abs(sx*sy))) FROM m
        """,
        "per-user rows linear (fixed user pool): ~sf^2 worst user",
        "int64",
    ),
    # Per-type delta-method moments over per-user (x,y) pairs.
    "agg_delta_method": (
        """
        WITH pu AS (SELECT event_type, user_id,
                  SUM(CAST(floor(value*1000) AS BIGINT)) x, COUNT(*) y
                  FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, COUNT(*) n, SUM(x) sx, SUM(y) sy,
                     SUM(x*x) sxx, SUM(y*y) syy, SUM(x*y) sxy
              FROM pu GROUP BY 1)
        SELECT MAX(GREATEST(n*sxx, sx*sx, n*syy, sy*sy,
                            abs(n*sxy), abs(sx*sy))) FROM m
        """,
        "per-user x linear, n fixed: ~sf^2-sf^3",
        "dec38",  # widened r7: product sums + numerators in decimal(38,0)
    ),
    # Pooled CUPED moments over per-user half-month cent sums.
    # theta is formed in DOUBLE (n.cast(double) * sxy), so the only
    # int64-formed integers are the moment SUMS themselves.
    "agg_cuped": (
        """
        WITH pu AS (SELECT user_id,
                  SUM(CASE WHEN day(ts) <= 15
                      THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END) x,
                  SUM(CASE WHEN day(ts) > 15
                      THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END) y
                  FROM events GROUP BY 1),
        m AS (SELECT SUM(x*y) sxy, SUM(x*x) sxx FROM pu)
        SELECT GREATEST(abs(sxy), sxx) FROM m
        """,
        "sums of per-user cent products: ~sf^2 (theta itself is double)",
        "int64",
    ),
    # Whole-dollar OLS moment SUMS per segment — the slope/r2 algebra
    # is formed in DOUBLE, so only the sums live in int64 (capacity
    # math already in the docstring; measured here for the table).
    "agg_ols": (
        """
        WITH xy AS (SELECT c_mktsegment seg,
                  CAST(floor(c_acctbal) AS BIGINT) x,
                  CAST(floor(o_totalprice) AS BIGINT) y
                  FROM orders JOIN customer ON o_custkey=c_custkey),
        m AS (SELECT seg, SUM(x*y) sxy,
                     SUM(x*x) sxx, SUM(y*y) syy FROM xy GROUP BY 1)
        SELECT MAX(GREATEST(abs(sxy), sxx, syy)) FROM m
        """,
        "whole-dollar moment sums, rows linear: ~sf (slope is double)",
        "dec38",  # widened r11: moment sums in decimal(38,0)
    ),
    # Rank x cents Gini sum: rank grows with group size -> ~sf^2 sum,
    # and (n+1)*sx adds another factor. Widened to decimal in round 7.
    "agg_gini": (
        """
        WITH x AS (SELECT c_mktsegment seg,
                  CAST(floor(o_totalprice*100) AS BIGINT) cents,
                  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY floor(o_totalprice*100),
                                              o_orderkey) rnk
                  FROM orders JOIN customer ON o_custkey=c_custkey),
        m AS (SELECT seg, COUNT(*) n, SUM(cents) sx, SUM(rnk*cents) srx
              FROM x GROUP BY 1)
        SELECT MAX(GREATEST(2*srx, (n+1)*sx)) FROM m
        """,
        "rank x cents: ~sf^2",
        "dec38",
    ),
    # Third raw moment of deci-unit values (s4 already decimal).
    "agg_skew_kurt": (
        """
        WITH m AS (SELECT event_type,
                  SUM(CAST(floor(value*10) AS BIGINT)
                      * CAST(floor(value*10) AS BIGINT)
                      * CAST(floor(value*10) AS BIGINT)) s3,
                  SUM(CAST(floor(value*10) AS BIGINT)
                      * CAST(floor(value*10) AS BIGINT)) s2
                  FROM events GROUP BY 1)
        SELECT MAX(GREATEST(abs(s3), s2)) FROM m
        """,
        "values bounded, rows linear: ~sf",
        "int64",
    ),
    # Rolling 7-day second moment of daily whole-dollar revenue.
    "win_bollinger": (
        """
        WITH daily AS (SELECT l_returnflag flag, CAST(l_shipdate AS DATE) d,
                  SUM(CAST(floor(l_extendedprice) AS BIGINT)) rev
                  FROM lineitem GROUP BY 1, 2),
        w AS (SELECT COUNT(*) OVER win n, SUM(rev) OVER win s,
                     SUM(rev*rev) OVER win ss
              FROM daily
              WINDOW win AS (PARTITION BY flag ORDER BY d
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT MAX(GREATEST(n*ss, s*s)) FROM w
        """,
        "daily rev linear, frame fixed: ~sf^2",
        "dec38",  # widened r11: rev² + frame moments in decimal(38,0)
    ),
    # KS cross-multiplies: cumulative counts x totals <= N^2.
    "audit_ks": (
        """
        WITH vc AS (SELECT o_totalprice v,
                  SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) c_f,
                  SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) c_o,
                  SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) c_p
                  FROM orders GROUP BY 1),
        cum AS (SELECT SUM(c_f) OVER w cum_f, SUM(c_o) OVER w cum_o,
                       SUM(c_p) OVER w cum_p
                FROM vc WINDOW w AS (ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (SELECT MAX(cum_f) n_f, MAX(cum_o) n_o, MAX(cum_p) n_p
                FROM cum)
        SELECT MAX(GREATEST(cum_f*n_o, cum_o*n_f, cum_f*n_p,
                            cum_p*n_f, cum_o*n_p, cum_p*n_o))
        FROM cum CROSS JOIN tot
        """,
        "cum x total <= N^2: ~sf^2",
        "int64",
    ),
    # Mann-Whitney rank sums and t^3-t tie terms.
    "audit_mannwhitney": (
        """
        WITH vc AS (SELECT o_totalprice v,
                  SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) c_f,
                  SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) c_o,
                  SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) c_p
                  FROM orders GROUP BY 1),
        cum AS (SELECT c_f, c_o, c_p,
                       SUM(c_f) OVER w cum_f, SUM(c_o) OVER w cum_o,
                       SUM(c_p) OVER w cum_p
                FROM vc WINDOW w AS (ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW)),
        m AS (SELECT
            SUM(c_f*(2*((cum_f-c_f)+(cum_o-c_o))+(c_f+c_o)+1)) r2_fo,
            SUM((c_f+c_o)*(c_f+c_o)*(c_f+c_o)-(c_f+c_o)) t_fo,
            MAX(cum_f) n_f, MAX(cum_o) n_o FROM cum)
        SELECT GREATEST(r2_fo, t_fo, n_f*n_o, n_f*(n_f+1)) FROM m
        """,
        "rank sums ~N^2, tie cubes ~t^3: ~sf^2 (ties bounded)",
        "int64",
    ),
    # Kendall variance n(n-1)(2n+5): n = months, calendar-bounded.
    "time_mannkendall": (
        """
        WITH monthly AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) m
                         FROM orders GROUP BY 1),
        n AS (SELECT COUNT(*) n FROM monthly)
        SELECT n*(n-1)*(2*n+5) FROM n
        """,
        "n = months (calendar-bounded): ~sf^0",
        "int64",
    ),
    # Covariance cross-moments on the 1e6 grid: dims fixed, vectors
    # linear in sf.
    "emb_covariance": (
        """
        WITH xs AS (SELECT vec_id, i,
                  CAST(floor(embedding[i] * 1e6) AS BIGINT) xl
                  FROM embeddings,
                       LATERAL (SELECT UNNEST(range(1, 65)) AS i)),
        c AS (SELECT a.i, b.i j, SUM(a.xl*b.xl) sxy
              FROM xs a JOIN xs b ON a.vec_id=b.vec_id AND a.i <= b.i
              GROUP BY 1, 2)
        SELECT MAX(abs(sxy)) FROM c
        """,
        "per-vector product bounded (4e12), vectors linear: ~sf",
        "int64",
    ),
    # MMR / PCA projection dots on the 1e6 grid: 64 dims, sf-invariant
    # per-pair dot; max over pairs is effectively flat in sf.
    "emb_mmr": (
        """
        WITH xs AS (SELECT vec_id, i,
                  CAST(floor(embedding[i] * 1e6) AS BIGINT) xl
                  FROM embeddings,
                       LATERAL (SELECT UNNEST(range(1, 65)) AS i)),
        q AS (SELECT i, xl qxl FROM xs WHERE vec_id = 0)
        SELECT MAX(abs(d)) FROM (
          SELECT SUM(xs.xl*q.qxl) d FROM xs JOIN q USING (i)
          WHERE vec_id <> 0 GROUP BY vec_id)
        """,
        "64-dim dot of 1e6-grid unit vectors: ~sf^0",
        "int64",
    ),
    # bucketized_weighted_quantile (agg_weighted_median): the quantile
    # compare forms q_den*cw and q_num*tw with data-sized weight sums
    # (tw = SUM(l_quantity) per flag) — int64 terms, linear in sf.
    "agg_weighted_median": (
        """
        WITH m AS (SELECT l_returnflag,
                  SUM(CAST(l_quantity AS BIGINT)) tw
                  FROM lineitem GROUP BY 1)
        SELECT MAX(2*tw) FROM m
        """,
        "q_den x total weight, rows linear: ~sf",
        "int64",
    ),
    # bucketized_weighted_quantile value-domain precondition: bucket
    # ids derive from exact double floor division, so |cents| must
    # stay below 2^53/width (width=1024). Price domain is
    # sf-invariant; the in-plan raise_error guard backstops it.
    "agg_weighted_median_domain": (
        """
        SELECT MAX(abs(CAST(floor(l_extendedprice*100) AS BIGINT)))
        FROM lineitem
        """,
        "value domain fixed by price range: ~sf^0",
        "dbl53w",
    ),
    # grouped_percentiles (agg_percentile + agg_winsorize): the
    # interpolation position h = (n-1)*p is double arithmetic, exact
    # only while the per-group count n < 2^53. Probe the max group
    # count across both consumers' grouping keys.
    "grouped_percentiles_n": (
        """
        WITH a AS (SELECT COUNT(*) n FROM events GROUP BY event_type),
        b AS (SELECT COUNT(*) n FROM orders GROUP BY o_orderstatus)
        SELECT GREATEST((SELECT MAX(n) FROM a), (SELECT MAX(n) FROM b))
        """,
        "max per-group row count: ~sf",
        "dbl53",
    ),
    # Simpson concentration: sum of squared token counts. Widened to
    # decimal(38,0)/HUGEINT in round 12; this probe keeps the
    # conservative corpus-level (per-lang) growth model even though
    # the shipped query groups per doc_id (sf-invariant) — the dec38
    # ceiling holds under either. The n² denominator is double-domain
    # (deterministic cross-engine at any magnitude), so only the
    # integer Σc² moment is probed.
    "llm_simpson": (
        """
        WITH tok AS (SELECT lang,
                  UNNEST(string_split(regexp_replace(lower(text),
                         '[^a-z ]', ' ', 'g'), ' ')) w
                  FROM documents),
        c AS (SELECT lang, w, COUNT(*) c FROM tok WHERE w <> ''
              GROUP BY 1, 2),
        m AS (SELECT lang, SUM(CAST(c AS HUGEINT) * c) s2 FROM c
              GROUP BY 1)
        SELECT MAX(s2) FROM m
        """,
        "token counts linear: ~sf^2",
        "dec38",
    ),
}

INT64 = 9.22e18
DEC38 = 1e38
DBL53 = float(1 << 53)  # exact-integer double ceiling
DBL53W = float((1 << 53) // 1024)  # 2^53 / bucket_width(1024)
CEILINGS = {
    "int64": INT64,
    "dec38": DEC38,
    "dbl53": DBL53,
    "dbl53w": DBL53W,
}


def probe(con, key: str) -> int:
    sql, _, _ = PROBES[key]
    v = con.execute(sql).fetchone()[0]
    return int(v) if v is not None else 0


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/**/*.parquet')"
            if os.path.isdir(p) and not os.path.isfile(p)
            else f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')"
        )
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-a", default="/root/testdata/sf0.01")
    ap.add_argument("--sf-b", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    ca, cb = connect(args.sf_a), connect(args.sf_b)
    sfa = float(os.path.basename(args.sf_a.rstrip("/")).replace("sf", ""))
    sfb = float(os.path.basename(args.sf_b.rstrip("/")).replace("sf", ""))
    step = sfb / sfa

    rows = []
    for key in PROBES:
        va, vb = probe(ca, key), probe(cb, key)
        _, law, ceiling = PROBES[key]
        limit = CEILINGS[ceiling]
        if va > 0 and vb > va:
            k = math.log(vb / va) / math.log(step)  # empirical exponent
            try:
                sf_max = sfb * (limit / vb) ** (1.0 / k)
            except OverflowError:
                # near-flat growth (k ≈ 0): the extrapolated overflow
                # sf exceeds double range — effectively unreachable
                sf_max = float("inf")
        elif vb > 0:
            k, sf_max = 0.0, float("inf")  # flat in sf
        else:
            k, sf_max = 0.0, float("inf")
        rows.append(
            {
                "key": key,
                f"max_term_sf{sfa}": va,
                f"max_term_sf{sfb}": vb,
                "growth_exp": round(k, 2),
                "law": law,
                "ceiling": ceiling,
                "overflow_sf": (
                    round(sf_max, 1) if sf_max != float("inf") else "none"
                ),
                "headroom_sf10": (
                    "OK"
                    if sf_max == float("inf") or sf_max > 10
                    else "OVERFLOW"
                ),
            }
        )
        print(json.dumps(rows[-1]))

    print()
    print(
        f"| key | max term @sf{sfa} | max term @sf{sfb} | emp. exponent "
        f"| growth law | ceiling | overflows at |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['key']} | {r[f'max_term_sf{sfa}']:.3g} "
            f"| {r[f'max_term_sf{sfb}']:.3g} | {r['growth_exp']} "
            f"| {r['law']} | {r['ceiling']} | sf{r['overflow_sf']} |"
        )
    bad = [r for r in rows if r["headroom_sf10"] == "OVERFLOW"]
    print(f"\n# {len(rows)} keys audited, {len(bad)} without sf10 headroom")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

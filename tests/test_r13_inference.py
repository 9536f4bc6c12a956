"""Semantic contracts for the round-13 statistical-inference family —
properties the oracle comparison alone can't express (classical-formula
invariants, independent recomputation in plain Python)."""

from __future__ import annotations

import hashlib
import math

import duckdb

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"
P = 1_000_000_007


def _md5_mod(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


def test_good_turing_matches_naive_recompute(spark):
    rows = {r.r: r for r in QUERIES["docs_good_turing"].fn(spark, SF).collect()}
    texts = duckdb.sql(
        f"SELECT string_split(text, ' ') FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import Counter

    tri: Counter[str] = Counter()
    for (ws,) in texts:
        for i in range(len(ws) - 2):
            tri[" ".join(ws[i : i + 3])] += 1
    fof = Counter(tri.values())
    n_tokens = sum(r * n for r, n in fof.items())
    vocab = sum(fof.values())
    assert rows, "good-turing table empty"
    for r, row in rows.items():
        assert row.n_r == fof[r]
        assert row.n_r_next == fof.get(r + 1, 0)
        # Turing's estimator: r* = (r+1) N_{r+1} / N_r.
        assert abs(row.r_star - (r + 1) * fof.get(r + 1, 0) / fof[r]) < 1e-12
        assert row.n_tokens == n_tokens and row.vocab_size == vocab
        assert abs(row.p0_unseen - fof[1] / n_tokens) < 1e-12
    # Smoothing conserves mass downward for the head: r* < r+1 always.
    assert all(row.r_star <= row.r + 1 for row in rows.values())


def test_heaps_law_matches_naive_recompute(spark):
    [row] = QUERIES["docs_heaps_law"].fn(spark, SF).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, string_split(text, ' ') FROM "
        f"'{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    seen: set[str] = set()
    n = v = 0
    xs, ys = [], []
    for _did, ws in docs:
        n += len(ws)
        seen.update(ws)
        v = len(seen)
        xs.append(round(round(math.log(n), 8) * 10_000))
        ys.append(round(round(math.log(v), 8) * 10_000))
    assert row.n_docs == len(docs)
    assert row.n_tokens == n and row.vocab_size == v
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert abs(row.heaps_beta - beta) < 1e-9
    lnk = (sy - beta * sx) / (m * 10_000)
    assert abs(row.heaps_lnk - lnk) < 1e-9
    # Heaps exponent of a natural-ish corpus: strictly sublinear growth.
    assert 0.0 < row.heaps_beta < 1.0
    assert 0.0 <= row.fit_r2 <= 1.0
    # The fitted line must reproduce the endpoint within the fit's own
    # residual scale: ln V - (lnk + beta ln N) small relative to ln V.
    pred = row.heaps_lnk + row.heaps_beta * math.log(n)
    assert abs(pred - math.log(v)) < 0.5


def test_mannwhitney_matches_naive_recompute(spark):
    [row] = QUERIES["events_mannwhitney_value"].fn(spark, SF).collect()
    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet' "
        f"WHERE event_type IN ('view', 'click')"
    ).fetchall()
    a = sorted(v for t, v in vals if t == "view")
    b = sorted(v for t, v in vals if t == "click")
    both = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    # Midranks with ties, classic textbook recompute.
    ranks: dict[float, float] = {}
    i = 0
    tie_sum = 0
    while i < len(both):
        j = i
        while j < len(both) and both[j][0] == both[i][0]:
            j += 1
        t = j - i
        ranks[both[i][0]] = (i + 1 + j) / 2
        tie_sum += t * t * t - t
        i = j
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    u = ra - na * (na + 1) / 2
    assert row.n_a == na and row.n_b == nb
    assert abs(row.u_stat - u) < 1e-9
    assert row.tie_sum == tie_sum
    ntot = na + nb
    var = na * nb / 12 * ((ntot + 1) - tie_sum / (ntot * (ntot - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    assert abs(row.z_score - z) < 1e-9
    assert row.shift_detected == (abs(z) > 1.96)
    # U symmetry: U_a + U_b = n_a * n_b.
    rb = sum(ranks[v] for v in b)
    ub = rb - nb * (nb + 1) / 2
    assert abs(u + ub - na * nb) < 1e-9


def test_conformal_matches_naive_recompute(spark):
    rows = QUERIES["orders_conformal_interval"].fn(spark, SF).collect()
    orders = duckdb.sql(
        f"SELECT o_orderpriority, o_orderkey, "
        f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    by_prio: dict[str, dict[str, list[int]]] = {}
    for prio, key, cents in orders:
        sp = _md5_mod(str(key)) % 10
        bucket = "train" if sp < 6 else ("cal" if sp < 8 else "test")
        by_prio.setdefault(prio, {"train": [], "cal": [], "test": []})[
            bucket
        ].append(cents)
    assert len(rows) == len(by_prio)
    for r in rows:
        g = by_prio[r.o_orderpriority]
        n_tr, s_tr = len(g["train"]), sum(g["train"])
        assert r.n_train == n_tr
        assert r.n_cal == len(g["cal"]) and r.n_test == len(g["test"])
        k = math.ceil(9 * (len(g["cal"]) + 1) / 10)
        assert r.k_rank == k
        res = sorted(abs(c * n_tr - s_tr) for c in g["cal"])
        qhat = res[k - 1]
        assert abs(r.qhat_dollars - qhat / (100 * n_tr)) < 1e-9
        covered = sum(
            1 for c in g["test"] if abs(c * n_tr - s_tr) <= qhat
        )
        assert r.covered == covered
        assert abs(r.coverage - covered / len(g["test"])) < 1e-12
        # Finite-sample guarantee level k/(n_cal+1) is >= the 0.9 target.
        assert r.guarantee_level >= 0.9
        # Exchangeability sanity: empirical coverage within 5 points of
        # the guarantee on this fixture (binomial noise at n_test ~ 600).
        assert r.coverage > 0.85


def test_heaps_and_good_turing_totals_agree(spark):
    """Cross-query consistency: good-turing counts trigram events, heaps
    counts word tokens — every doc with >= 3 words has exactly
    len - 2 trigrams, and the fixture has no shorter doc, so the totals
    are linked by n_trigrams = n_words - 2 * n_docs."""
    [h] = QUERIES["docs_heaps_law"].fn(spark, SF).collect()
    gt = QUERIES["docs_good_turing"].fn(spark, SF).collect()[0]
    assert gt.n_tokens == h.n_tokens - 2 * h.n_docs


def test_assortativity_matches_naive_recompute(spark):
    [row] = QUERIES["graph_assortativity"].fn(spark, SF).collect()
    edges = duckdb.sql(
        f"""
        WITH os AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM '{SF}/lineitem.parquet'),
        pairs AS (
          SELECT a.l_suppkey AS s, b.l_suppkey AS t, count(*) AS w
          FROM os a JOIN os b
            ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
          GROUP BY 1, 2),
        directed AS (
          SELECT s AS z, t AS n, w FROM pairs
          UNION ALL SELECT t, s, w FROM pairs),
        knn AS (
          SELECT z, n FROM (
            SELECT z, n, row_number() OVER (
              PARTITION BY z ORDER BY w DESC, n) AS rk FROM directed)
          WHERE rk <= 3)
        SELECT DISTINCT least(z, n), greatest(z, n) FROM knn
        """
    ).fetchall()
    deg: dict[int, int] = {}
    for s, t in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[t] = deg.get(t, 0) + 1
    xs, ys = [], []
    for s, t in edges:
        xs += [deg[s] - 1, deg[t] - 1]
        ys += [deg[t] - 1, deg[s] - 1]
    m = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert row.n_nodes == len(deg) and row.n_edges == len(edges)
    assert abs(row.assortativity - r) < 1e-12
    # A correlation coefficient, exactly.
    assert -1.0 <= row.assortativity <= 1.0


def test_permutation_test_matches_naive_recompute(spark):
    [row] = QUERIES["events_permutation_test"].fn(spark, SF).collect()
    ev = duckdb.sql(
        f"SELECT event_id, event_type, "
        f"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
        f"FROM '{SF}/events.parquet' "
        f"WHERE event_type IN ('view', 'click')"
    ).fetchall()
    s = {"view": 0, "click": 0}
    n = {"view": 0, "click": 0}
    for _eid, t, c in ev:
        s[t] += c
        n[t] += 1
    obs = s["view"] / n["view"] - s["click"] / n["click"]
    assert row.n_a == n["view"] and row.n_b == n["click"]
    assert abs(row.obs_diff_dollars - obs / 100) < 1e-9
    n_ge = 0
    for b in range(1, 100):
        sa = na = sb = nb = 0
        for eid, _t, c in ev:
            if _md5_mod(f"{eid}:{b}") % 2 == 0:
                sa += c
                na += 1
            else:
                sb += c
                nb += 1
        if abs(sa / na - sb / nb) >= abs(obs):
            n_ge += 1
    assert row.n_ge == n_ge
    assert abs(row.p_value - (1 + n_ge) / 100) < 1e-12
    # p is a valid Monte-Carlo p-value: in (0, 1].
    assert 0 < row.p_value <= 1


def test_theil_sen_matches_naive_recompute(spark):
    [row] = QUERIES["orders_theil_sen"].fn(spark, SF).collect()
    days = duckdb.sql(
        f"""
        SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)),
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    assert row.n_days == len(days)
    slopes = sorted(
        (cv - cu) / (dv - du)
        for du, cu in days
        for dv, cv in days
        if du < dv
    )
    m = len(slopes)
    assert row.n_pairs == m
    med = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2
    assert abs(row.theil_sen_dollars_per_day - med / 100) < 1e-9
    nd = len(days)
    sd = sum(d for d, _ in days)
    sc = sum(c for _, c in days)
    sdd = sum(d * d for d, _ in days)
    sdc = sum(d * c for d, c in days)
    ols = (nd * sdc - sd * sc) / (nd * sdd - sd * sd)
    assert abs(row.ols_dollars_per_day - ols / 100) < 1e-6
    # Robust and OLS trends agree on direction for this well-behaved
    # fixture (no adversarial outlier days are injected).
    assert (row.theil_sen_dollars_per_day > 0) == (
        row.ols_dollars_per_day > 0
    )


def test_kruskal_wallis_matches_naive_recompute(spark):
    rows = QUERIES["events_kruskal_wallis"].fn(spark, SF).collect()
    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[float]] = {}
    for t, v in vals:
        groups.setdefault(t, []).append(v)
    allv = sorted(v for _t, v in vals)
    # midranks with ties
    ranks: dict[float, float] = {}
    i = 0
    tie_sum = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        t = j - i
        ranks[allv[i]] = (i + 1 + j) / 2
        tie_sum += t * t * t - t
        i = j
    n = len(allv)
    s = 0
    for g in groups.values():
        rj = sum(ranks[v] for v in g)
        s += round((2 * rj) ** 2 / len(g))
    h = 3 * s / (n * (n + 1)) - 3 * (n + 1)
    c = 1 - tie_sum / (n**3 - n)
    assert len(rows) == len(groups)
    for r in rows:
        g = groups[r.event_type]
        assert r.n_j == len(g)
        assert abs(r.mean_rank - sum(ranks[v] for v in g) / len(g)) < 1e-9
        assert r.n_total == n and r.dof == len(groups) - 1
        assert abs(r.h_stat - h) < 1e-9
        assert abs(r.h_tie_corrected - h / c) < 1e-9
        assert r.groups_differ_95 == (h / c > 9.487729036781154)
    # Mean ranks average to the grand mean rank (n+1)/2, weighted by n_j.
    wsum = sum(r.mean_rank * r.n_j for r in rows)
    assert abs(wsum / n - (n + 1) / 2) < 1e-6


def test_good_turing_no_singleton_corpus_keeps_rows(spark, tmp_path):
    # A corpus where every trigram appears >= 2 times has an empty N_1
    # class: the result table must keep its rows with NULL p0_unseen
    # (the oracle's scalar subquery returns NULL), not collapse to zero
    # rows through an empty broadcast (ADVICE r13).
    import pyarrow as pa
    import pyarrow.parquet as pq

    text = "alpha beta gamma delta epsilon zeta"
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [text, text]}),
        str(tmp_path / "documents.parquet"),
    )
    rows = QUERIES["docs_good_turing"].fn(spark, str(tmp_path)).collect()
    assert rows, "no-singleton corpus dropped the whole result set"
    assert all(r.p0_unseen is None for r in rows)
    assert {r.r for r in rows} == {2}
    assert rows[0].n_r == 4  # 4 distinct trigrams, each seen twice

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    orc = con.execute(QUERIES["docs_good_turing"].oracle).fetchall()
    assert len(orc) == len(rows)
    srow, orow = rows[0], orc[0]
    assert (
        srow.r,
        srow.n_r,
        srow.n_r_next,
        srow.r_star,
        srow.n_tokens,
        srow.vocab_size,
        srow.p0_unseen,
    ) == tuple(orow)

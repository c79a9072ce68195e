"""Independent recomputations for queries/curation.py (arg-extremum,
nth_value, INTERSECT ALL, file-metadata audit, gram novelty,
k-anonymity, chi-square cells, autocorrelation, RLE, systematic
sampling) — each invariant derived with pandas/numpy or first
principles, never by replaying the Spark plan."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.curation import _KANON_K, _SYS_K

SF = "/root/testdata/sf0.001"


def test_argmax_attains_group_extrema(spark):
    od = load_table(spark, SF, "orders").toPandas()
    got = {r["o_orderpriority"]: r for r in REGISTRY["agg_argmax"].fn(spark, SF).collect()}
    for pri, grp in od.groupby("o_orderpriority"):
        row = got[pri]
        assert row["top_price"] == grp.o_totalprice.max()
        assert row["bottom_price"] == grp.o_totalprice.min()
        # the returned keys must attain the extremum, with the
        # documented max-orderkey / min-orderkey tie-break
        top_ties = grp[grp.o_totalprice == grp.o_totalprice.max()]
        bot_ties = grp[grp.o_totalprice == grp.o_totalprice.min()]
        assert row["top_orderkey"] == top_ties.o_orderkey.max()
        assert row["bottom_orderkey"] == bot_ties.o_orderkey.min()


def test_win_nth_null_before_second_row(spark):
    out = REGISTRY["win_nth"].fn(spark, SF).toPandas()
    od = load_table(spark, SF, "orders").toPandas()
    # rn==1 rows never see a second price; rn>=2 rows all share the
    # customer's actual second price
    assert out[out.rn == 1].second_price.isna().all()
    seconds = {
        ck: grp.o_totalprice.iloc[1]
        for ck, grp in od.sort_values(["o_orderdate", "o_orderkey"]).groupby("o_custkey")
        if len(grp) >= 2
    }
    later = out[out.rn >= 2]
    for ck, grp in later.groupby("o_custkey"):
        assert (grp.second_price == seconds[ck]).all()


def test_intersect_all_multiplicity(spark):
    od = load_table(spark, SF, "orders").toPandas()
    od["m"] = od.o_orderdate.dt.month
    od["y"] = od.o_orderdate.dt.year
    a = od[od.y == 1995].groupby(["o_orderpriority", "m"]).size()
    b = od[od.y == 1996].groupby(["o_orderpriority", "m"]).size()
    expect = {
        k: min(a[k], b[k]) for k in set(a.index) & set(b.index)
    }
    got = (
        REGISTRY["set_intersect_all"].fn(spark, SF)
        .groupBy("o_orderpriority", "order_month")
        .count()
        .collect()
    )
    got_map = {(r[0], r[1]): r[2] for r in got}
    assert got_map == {(p, int(m)): int(c) for (p, m), c in expect.items() if c > 0}


def test_filemeta_counts_and_ranges(spark):
    rows = {r["file_name"]: r for r in REGISTRY["scan_filemeta"].fn(spark, SF).collect()}
    for tbl, key in (("customer", "c_custkey"), ("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        d = load_table(spark, SF, tbl)
        agg = d.agg(
            F.count(F.lit(1)).alias("n"), F.min(key).alias("lo"), F.max(key).alias("hi")
        ).first()
        r = rows[f"{tbl}.parquet"]
        assert (r["n_rows"], r["min_key"], r["max_key"]) == (agg["n"], agg["lo"], agg["hi"])


def test_filemeta_one_row_per_part_file(spark, tmp_path):
    """ADVICE r8 pin: with a multi-file table layout, scan_filemeta
    emits ONE ROW PER PART-FILE (the docstring's contract) — part
    files are never merged by basename, so per-file counts/key-ranges
    stay individually auditable in a partitioned lake."""
    import os

    # customer as a 2-part parquet dir; orders/lineitem borrowed from
    # the fixture via symlink (scan_filemeta scans all three tables).
    load_table(spark, SF, "customer").repartition(2).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    for tbl in ("orders", "lineitem"):
        os.symlink(f"{SF}/{tbl}.parquet", tmp_path / f"{tbl}.parquet")

    out = REGISTRY["scan_filemeta"].fn(spark, str(tmp_path)).toPandas()
    cust = out[out.file_name.str.startswith("part-")]
    assert len(cust) == 2  # one row per part file, not one per table
    total = load_table(spark, SF, "customer").count()
    assert int(cust.n_rows.sum()) == total
    lo, hi = int(cust.min_key.min()), int(cust.max_key.max())
    agg = load_table(spark, SF, "customer").agg(
        F.min("c_custkey"), F.max("c_custkey")
    ).first()
    assert (lo, hi) == (agg[0], agg[1])


def test_gram_novelty_conservation(spark):
    out = REGISTRY["llm_gram_novelty"].fn(spark, SF).toPandas()
    assert ((out.novelty >= 0) & (out.novelty <= 1)).all()
    assert (out.n_novel <= out.n_grams).all()
    # the earliest doc sees only novel grams
    first = out.loc[out.doc_id.idxmin()]
    assert first.novelty == 1.0
    # every distinct shingle is novel in exactly one document
    from flirt_consume_spark.operators.dedup import shingle_table

    n_distinct = (
        shingle_table(load_table(spark, SF, "documents"))
        .select("shingle").distinct().count()
    )
    assert int(out.n_novel.sum()) == n_distinct


def test_kanon_flags_match_counts(spark):
    out = REGISTRY["audit_kanon"].fn(spark, SF).toPandas()
    cu = load_table(spark, SF, "customer").toPandas()
    sizes = cu.groupby(["c_nationkey", "c_mktsegment"]).size()
    assert len(out) == len(sizes)
    for _, r in out.iterrows():
        assert r.group_size == sizes[(r.nationkey, r.c_mktsegment)]
        assert bool(r.at_risk) == (r.group_size < _KANON_K)


def test_chisq_cells_match_scipy_free_formula(spark):
    out = REGISTRY["audit_chisq"].fn(spark, SF).toPandas()
    n = out.n_obs.sum()
    # marginals consistent: each pri's n_row equals the sum of its cells
    for pri, grp in out.groupby("pri"):
        assert grp.n_row.iloc[0] == grp.n_obs.sum()
    for st, grp in out.groupby("status"):
        assert grp.n_col.iloc[0] == grp.n_obs.sum()
    exp = out.n_row * out.n_col / n
    assert np.allclose(out.expected, exp)
    contrib = (out.n_obs - exp) ** 2 / exp
    assert np.allclose(out.contribution, contrib)


def test_autocorr_matches_numpy(spark):
    ev = load_table(spark, SF, "events").toPandas()
    got = {r["user_id"]: r["autocorr"] for r in REGISTRY["time_autocorr"].fn(spark, SF).collect()}
    ev["x"] = np.floor(ev.value * 1000).astype("int64")
    for uid, grp in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        x = grp.x.values[1:]
        px = grp.x.values[:-1]
        if len(x) < 2 or x.std() == 0 or px.std() == 0:
            assert uid not in got
            continue
        expect = np.corrcoef(x, px)[0, 1]
        assert abs(got[uid] - expect) < 1e-9


def test_rle_reconstructs_sequence(spark):
    out = REGISTRY["time_rle"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    # total length conservation
    assert out.run_len.sum() == len(ev)
    for uid, grp in out.groupby("user_id"):
        grp = grp.sort_values("run_id")
        # run ids are 1..k dense, and consecutive runs differ in type
        assert list(grp.run_id) == list(range(1, len(grp) + 1))
        assert (grp.event_type.values[1:] != grp.event_type.values[:-1]).all()
        # replaying the runs yields the user's actual type sequence
        seq = ev[ev.user_id == uid].sort_values(["ts", "event_id"]).event_type.values
        replay = np.repeat(grp.event_type.values, grp.run_len.values)
        assert (replay == seq).all()


def test_systematic_ranks_are_multiples(spark):
    out = REGISTRY["sample_systematic"].fn(spark, SF).toPandas()
    n = load_table(spark, SF, "orders").count()
    assert len(out) == n // _SYS_K
    assert sorted(out.rnk) == [(_SYS_K * i) for i in range(1, n // _SYS_K + 1)]
    # rank k corresponds to the k-th smallest orderkey
    keys = sorted(
        r["o_orderkey"] for r in load_table(spark, SF, "orders").select("o_orderkey").collect()
    )
    for _, r in out.iterrows():
        assert r.o_orderkey == keys[int(r.rnk) - 1]


def test_bpe_train_matches_reference_trainer(spark):
    """Re-train BPE in pure Python (dict-of-tuples vocab, greedy
    leftmost-non-overlapping merge) and demand the identical merge
    table — algorithm-level parity, not a replay of the Spark plan."""
    import re
    from collections import Counter

    from flirt_consume_spark.queries.curation import _BPE_MERGES

    docs = load_table(spark, SF, "documents").select("text").collect()
    freq = Counter()
    for r in docs:
        for w in r["text"].strip().lower().split():
            if re.fullmatch(r"[a-z]{2,}", w):
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    expect = []
    for rank in range(1, _BPE_MERGES + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, cnt))
        merged = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        vocab = merged
    got = sorted(
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["cnt"])
        for r in REGISTRY["llm_bpe_train"].fn(spark, SF).collect()
    )
    assert got == expect


def test_union_byname_null_fill_and_alignment(spark):
    out = REGISTRY["set_union_byname"].fn(spark, SF).toPandas()
    od = load_table(spark, SF, "orders").toPandas()
    a = od[od.o_orderdate.dt.year == 1995]
    b = od[od.o_orderdate.dt.year == 1996]
    assert len(out) == len(a) + len(b)
    # 1995 rows carry price but no status; 1996 rows the reverse —
    # aligned by name, so no value ever lands in the wrong column
    merged = out.merge(od[["o_orderkey", "o_orderdate"]], on="o_orderkey")
    y95 = merged[merged.o_orderdate.dt.year == 1995]
    y96 = merged[merged.o_orderdate.dt.year == 1996]
    assert y95.o_orderstatus.isna().all() and y95.o_totalprice.notna().all()
    assert y96.o_totalprice.isna().all() and y96.o_orderstatus.notna().all()
    assert set(out.columns) == {
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus"
    }


def test_delta_method_matches_numpy(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["x"] = np.floor(ev.value * 1000).astype("int64")
    got = {r["event_type"]: r for r in REGISTRY["agg_delta_method"].fn(spark, SF).collect()}
    for et, grp in ev.groupby("event_type"):
        per = grp.groupby("user_id").agg(x=("x", "sum"), y=("x", "size"))
        n = len(per)
        if n < 2:
            assert et not in got
            continue
        r = got[et]
        R = per.x.sum() / per.y.sum()
        assert r["n"] == n and abs(r["ratio"] - R) < 1e-12
        vx = per.x.var(ddof=1)
        vy = per.y.var(ddof=1)
        cxy = per.x.cov(per.y)
        yb = per.y.mean()
        se = np.sqrt((vx + R * R * vy - 2 * R * cxy) / (n * yb * yb))
        assert abs(r["ratio_se"] - se) < 1e-9 * max(1.0, se)


def test_contract_clean_fixture_and_dirty_detection(spark):
    # the shipped fixture satisfies the contract
    out = {r["rule"]: r for r in REGISTRY["audit_contract"].fn(spark, SF).collect()}
    assert set(out) == {
        "orderkey_not_null", "orderkey_unique", "price_positive",
        "status_enum", "priority_format", "date_range",
    }
    n = load_table(spark, SF, "orders").count()
    for r in out.values():
        assert r["n_violations"] == 0 and r["n_checked"] == n
    # and the rules actually fire on corrupted rows (not vacuous)
    od = load_table(spark, SF, "orders").limit(4).toPandas()
    od.loc[0, "o_orderstatus"] = "X"
    od.loc[1, "o_totalprice"] = -5.0
    od.loc[2, "o_orderpriority"] = "9-BOGUS"
    od.loc[3, "o_orderkey"] = od.loc[2, "o_orderkey"]  # duplicate key
    dirty = spark.createDataFrame(od)
    import flirt_consume_spark.queries.curation as C
    from unittest import mock

    with mock.patch.object(C, "t", lambda s, d, n: dirty):
        bad = {r["rule"]: r["n_violations"] for r in C.audit_contract(spark, SF).collect()}
    assert bad["status_enum"] == 1 and bad["price_positive"] == 1
    assert bad["priority_format"] == 1 and bad["orderkey_unique"] == 1


def test_bpe_encode_consistent_with_trainer_vocab(spark):
    """Each doc's token count must equal the sum over its in-vocab
    words of the word's symbol count after replaying the learned
    merges in pure Python."""
    import re
    from collections import Counter

    merges = [
        (r["sym_a"], r["sym_b"])
        for r in sorted(
            REGISTRY["llm_bpe_train"].fn(spark, SF).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]

    def encode(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in REGISTRY["llm_bpe_encode"].fn(spark, SF).collect()}
    for d in docs:
        words = [
            w for w in d["text"].strip().lower().split()
            if re.fullmatch(r"[a-z]{2,}", w)
        ]
        if not words:
            assert d["doc_id"] not in got
            continue
        row = got[d["doc_id"]]
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_tokens"] == sum(encode(w) for w in words)
        assert row["chars_per_token"] == row["n_chars"] / row["n_tokens"]


def test_confusion_matrix_invariants(spark):
    out = REGISTRY["eval_confusion"].fn(spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").count()
    assert out.n_cell.sum() == docs
    for a, grp in out.groupby("actual"):
        assert grp.n_actual.iloc[0] == grp.n_cell.sum()
        assert abs(grp.recall_share.sum() - 1.0) < 1e-12
    for p, grp in out.groupby("predicted"):
        assert grp.n_pred.iloc[0] == grp.n_cell.sum()
        assert abs(grp.precision_share.sum() - 1.0) < 1e-12
    # cells agree with a direct recompute of the langid heuristic
    pred = (
        REGISTRY["llm_langid"].fn(spark, SF)
        .groupBy("actual", "predicted").count().collect()
    )
    direct = {(r["actual"], r["predicted"]): r["count"] for r in pred}
    got = {(r.actual, r.predicted): r.n_cell for _, r in out.iterrows()}
    assert got == direct


def test_budget_select_greedy_invariants(spark):
    from flirt_consume_spark.queries.curation import _BUDGET_CHARS

    out = REGISTRY["quota_budget_select"].fn(spark, SF).toPandas()
    q = REGISTRY["llm_quality"].fn(spark, SF).toPandas().set_index("doc_id")
    docs = load_table(spark, SF, "documents").toPandas().set_index("doc_id")
    # budget respected, cumsum consistent with the declared order
    assert out.cum_chars.max() <= _BUDGET_CHARS
    ordered = out.sort_values(["quality", "doc_id"], ascending=[False, True])
    assert (ordered.n_chars.cumsum().values == ordered.cum_chars.values).all()
    # recompute the greedy choice directly and compare sets exactly:
    # stable two-key order (quality desc, doc_id asc), keep every row
    # whose running cumulative char count stays within budget
    sel = set(out.doc_id)
    full = docs.assign(quality=q.quality, n=docs.text.str.len())
    greedy = full.sort_index().sort_values(
        "quality", kind="mergesort", ascending=False
    )
    expect, cum = [], 0
    for doc_id, row in greedy.iterrows():
        cum += row.n
        if cum <= _BUDGET_CHARS:
            expect.append(doc_id)
    assert sorted(expect) == sorted(sel)


def test_pr_curve_matches_sklearn_free_sweep(spark):
    """Recompute the PR sweep directly from per-doc (score, label)."""
    # en_ratio is llm_langid's emitted score; actual is the label
    langid = REGISTRY["llm_langid"].fn(spark, SF).toPandas()
    s = langid.en_ratio.values
    y = (langid.actual == "en").astype(int).values
    got = {r["threshold"]: r for r in REGISTRY["eval_pr_curve"].fn(spark, SF).collect()}
    P = y.sum()
    for tau in sorted(set(s)):
        mask = s >= tau
        tp = int(y[mask].sum())
        k = int(mask.sum())
        r = got[tau]
        assert (r["cum_n"], r["cum_pos"]) == (k, tp)
        assert r["precision_at"] == tp / k
        assert r["recall_at"] == tp / P
    assert set(got) == set(s)
    # recall grows monotonically as the threshold relaxes
    ordered = [got[t] for t in sorted(got, reverse=True)]
    rec = [r["recall_at"] for r in ordered]
    assert all(a <= b for a, b in zip(rec, rec[1:]))
    assert rec[-1] == 1.0


def test_auc_matches_pairwise_definition(spark):
    """AUC must equal the literal P(score+ > score-) + 0.5 P(tie),
    computed by brute force over all (pos, neg) pairs."""
    langid = REGISTRY["llm_langid"].fn(spark, SF).toPandas()
    s = langid.en_ratio.values
    y = (langid.actual == "en").values
    pos, neg = s[y], s[~y]
    wins = sum((p > q) for p in pos for q in neg)
    ties = sum((p == q) for p in pos for q in neg)
    r = REGISTRY["eval_auc"].fn(spark, SF).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["n_tied_pairs"] == ties
    assert r["u2"] == 2 * wins + ties
    assert r["auc"] == (2 * wins + ties) / (2.0 * len(pos) * len(neg))


def test_sql_params_fold_to_pushed_literals(spark):
    out = REGISTRY["sql_params"].fn(spark, SF)
    od = load_table(spark, SF, "orders").toPandas()
    sub = od[(od.o_totalprice > 100000.0) & (od.o_orderstatus == "O")]
    got = {r["o_orderpriority"]: (r["n"], r["cents"]) for r in out.collect()}
    for pri, grp in sub.groupby("o_orderpriority"):
        assert got[pri] == (
            len(grp),
            int(np.floor(grp.o_totalprice.values * 1e2).astype("int64").sum()),
        )
    # the named parameter reaches the scan as a pushed literal filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "100000" in plan


def test_generalization_ladder_levels(spark):
    cu = load_table(spark, SF, "customer").toPandas()
    na = load_table(spark, SF, "nation").toPandas().set_index("n_nationkey")
    cu["reg"] = cu.c_nationkey.map(na.n_regionkey)
    g0 = cu.groupby(["c_nationkey", "c_mktsegment"]).size()
    g1 = cu.groupby(["reg", "c_mktsegment"]).size()
    g2 = cu.groupby("reg").size()
    import collections

    counts = collections.Counter()
    for _, r in cu.iterrows():
        if g0[(r.c_nationkey, r.c_mktsegment)] >= _KANON_K:
            counts[0] += 1
        elif g1[(r.reg, r.c_mktsegment)] >= _KANON_K:
            counts[1] += 1
        elif g2[r.reg] >= _KANON_K:
            counts[2] += 1
        else:
            counts[3] += 1
    got = {r["level"]: r["n_customers"] for r in REGISTRY["anon_generalize"].fn(spark, SF).collect()}
    assert got == dict(counts)
    assert sum(got.values()) == len(cu)


def test_calibration_bins_match_direct_binning(spark):
    from flirt_consume_spark.queries.curation import _CAL_BINS

    langid = REGISTRY["llm_langid"].fn(spark, SF).toPandas()
    s = langid.en_ratio.values
    y = (langid.actual == "en").astype(int).values
    bins = np.minimum(np.floor(s * _CAL_BINS).astype(int), _CAL_BINS - 1)
    got = {r["bin"]: r for r in REGISTRY["eval_calibration"].fn(spark, SF).collect()}
    assert set(got) == set(bins)
    for b in set(bins):
        mask = bins == b
        r = got[b]
        assert r["n"] == int(mask.sum())
        assert r["n_pos"] == int(y[mask].sum())
        su = np.floor(s[mask] * 1e6).astype("int64").sum()
        assert r["mean_score"] == su / 1e6 / mask.sum()
        assert r["pos_rate"] == y[mask].sum() / mask.sum()

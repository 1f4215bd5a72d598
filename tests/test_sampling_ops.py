

def test_chunk_documents_sliding_windows(spark):
    from beats_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b c"),                               # fits one chunk
            (3, "   "),                                 # blank: no chunks
            (4, None),                                  # NULL: no chunks
            (5, "x  y\n z"),                            # whitespace runs
            (6, "hello world\n"),                       # trailing newline
            (7, "\n\t "),                               # ws-only: no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: step=3, last start = max(10-1-1,0)=8 -> starts 0,3,6 (9>8? seq to 8 step 3 = 0,3,6)
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[(1, 2)].chunk_text == "t6 t7 t8 t9"
    assert rows[(1, 2)].chunk_len == 4 and rows[(1, 2)].chunk_start == 6
    assert rows[(2, 0)].chunk_text == "a b c" and rows[(2, 0)].chunk_len == 3
    assert not any(k[0] in (3, 4, 7) for k in rows)
    assert rows[(5, 0)].chunk_text == "x y z"  # runs normalize
    # edge whitespace beyond spaces: no phantom empty tokens
    assert rows[(6, 0)].chunk_text == "hello world"
    assert rows[(6, 0)].chunk_len == 2
    # every token covered exactly: union of [start, start+len) == [0, n)
    for d, n in ((1, 10), (2, 3), (5, 3)):
        covered = set()
        for (doc, _), r in rows.items():
            if doc == d:
                covered |= set(range(r.chunk_start, r.chunk_start + r.chunk_len))
        assert covered == set(range(n))


def test_chunk_documents_zero_shuffle(spark):
    from beats_spark.operators.sampling import chunk_documents
    from tests.test_plan_shapes import plan_of

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert "Exchange" not in plan_of(chunk_documents(docs))


def test_chunk_documents_bad_params(spark):
    import pytest

    from beats_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for ct, ot in ((0, 0), (4, 4), (4, -1)):
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=ct, overlap_tokens=ot)


def test_mixture_epochs_uniform_weights(spark):
    """None weights → floor(1000/n_sources) each, computed in-plan."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import mixture_epochs

    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 40), ("c", 0)],
        "source string, toks long",
    )
    out = mixture_epochs(
        df, "source", F.col("toks"), budget_tokens=120, max_epochs_milli=9000
    ).collect()
    rows = {r.source: r for r in out}
    assert set(rows) == {"a", "b", "c"}
    for r in out:
        assert r.weight_milli == 333  # 1000 div 3
        assert r.target_tokens == 39  # 120*333 div 1000
    assert rows["a"].epochs_milli == 1950  # 39*1000 div 20
    assert rows["a"].planned_tokens == 39  # 20*1950 div 1000
    assert rows["b"].epochs_milli == 975  # 39*1000 div 40
    assert rows["c"].epochs_milli == 0  # zero tokens → no epochs
    assert rows["c"].planned_tokens == 0


def test_mixture_epochs_cap_and_missing_source(spark):
    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import mixture_epochs

    df = spark.createDataFrame(
        [("a", 10), ("z", 1000)], "source string, toks long"
    )
    rows = {
        r.source: r
        for r in mixture_epochs(
            df,
            "source",
            F.col("toks"),
            budget_tokens=1000,
            weights_milli={"a": 1000},
            max_epochs_milli=4000,
        ).collect()
    }
    assert rows["a"].epochs_milli == 4000  # 100 epochs wanted → capped
    assert rows["a"].planned_tokens == 40
    assert rows["z"].weight_milli == 0  # absent from the map
    assert rows["z"].epochs_milli == 0


def test_padding_stats_exact(spark):
    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import padding_stats

    df = spark.createDataFrame(
        [(0,), (1,), (31,), (32,), (33,), (None,)], "toks long"
    )
    rows = {
        r.cap: r
        for r in padding_stats(df, F.col("toks"), bucket=32).collect()
    }
    # 0, 1, 31, NULL→0 all land in cap 32; 32 exactly fills it; 33 → 64
    assert rows[32].n_seqs == 5 and rows[32].token_sum == 64
    assert rows[32].padding == 5 * 32 - 64
    assert rows[32].eff_ppm == 64 * 1_000_000 // (5 * 32)
    assert rows[64].n_seqs == 1 and rows[64].padding == 31

    import pytest

    with pytest.raises(ValueError):
        padding_stats(df, F.col("toks"), bucket=0)


def test_key_skew_stats_uniform_is_empty(spark):
    """No key ≥ 2× the mean → empty report; hot key → salt that
    levels it across reducers."""
    from beats_spark.operators.scale import key_skew_stats

    uniform = spark.createDataFrame(
        [(i % 8,) for i in range(80)], "k long"
    )
    assert key_skew_stats(uniform, "k", n_partitions=16).count() == 0

    hot = spark.createDataFrame(
        [(0,)] * 92 + [(i,) for i in range(1, 9)], "k long"
    )
    rows = key_skew_stats(hot, "k", n_partitions=10).collect()
    assert len(rows) == 1 and rows[0].k == 0
    assert rows[0].cnt == 92
    assert rows[0].share_ppm == 92 * 1_000_000 // 100
    assert rows[0].rec_salt == (92 * 10 + 99) // 100  # 10 sub-buckets
    assert rows[0].avg_cnt == 100 // 9


def test_cluster_balance_thins_overcap_cluster(spark):
    """Cluster at/below cap keeps everything; over-cap cluster thins
    by the md5 hash gate — replayed here in pure Python."""
    import hashlib

    from beats_spark.operators.sampling import cluster_balance

    cents = [[1, 1, 1, 1], [-1, -1, -1, -1]]
    rows = [(i, [0.5, 0.5, 0.5, 0.5]) for i in range(8)]          # cell 0
    rows += [(100 + i, [-0.5, -0.5, -0.5, -0.5]) for i in range(2)]  # cell 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in cluster_balance(df, cents, cap_per_cluster=3).collect()}
    assert len(out) == 10
    assert all(out[i]["cell"] == 0 and out[i]["n_cluster"] == 8 for i in range(8))
    assert all(out[100 + i]["kept"] for i in range(2))  # ≤ cap: keep all
    thresh = ((1 << 40) * 3) // 8
    for i in range(8):
        h = int(hashlib.md5(f"s0|{i}".encode()).hexdigest()[:15], 16)
        assert out[i]["kept"] == ((h >> 20) < thresh), i


def test_cluster_balance_rejects_huge_cap(spark):
    import pytest

    from beats_spark.operators.sampling import cluster_balance

    df = spark.createDataFrame([(1, [0.1])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        cluster_balance(df, [[1]], cap_per_cluster=(1 << 22) + 1)


def test_cluster_safe_split_members_share_side(spark):
    """Every member of a duplicate cluster lands on the same split
    side; singletons get exactly the plain hash split on their own
    id (same seed → same coin as split_train_eval)."""
    import hashlib

    from beats_spark.operators.dedup import connected_components
    from beats_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    # two chained clusters {0,1,2,11} and {20,21}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 0), (2, 0), (11, 1), (21, 20)], "a long, b long"
    )
    comp = connected_components(pairs, "a", "b")
    out = cluster_safe_split(docs, comp, eval_fraction=0.5, seed=3)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 30
    # chaining resolved: 11 reaches 0 through 1
    assert {rows[i].component for i in (0, 1, 2, 11)} == {0}
    assert {rows[i].component for i in (20, 21)} == {20}
    assert len({rows[i].split for i in (0, 1, 2, 11)}) == 1
    assert len({rows[i].split for i in (20, 21)}) == 1
    # the coin is the md5 gate on the group key
    thr = int(0.5 * (1 << 60))
    for i in (0, 5, 20):
        h = int(
            hashlib.md5(f"s3|{rows[i].component}".encode()).hexdigest()[:15], 16
        )
        want = "eval" if h < thr else "train"
        assert rows[i].split == want, i
    # singleton component is its own id
    assert rows[5].component == 5


def test_cluster_safe_split_rejects_bad_fraction(spark):
    import pytest

    from beats_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    comp = spark.createDataFrame([(1, 1)], "node long, component long")
    with pytest.raises(ValueError):
        cluster_safe_split(docs, comp, eval_fraction=1.5)


def test_budget_select_greedy_prefix(spark):
    from beats_spark.operators.sampling import budget_select

    # (id, toks, q): densities 9000, 4000, 2000, 1000 micro
    rows = [(1, 10, 90), (2, 20, 80), (3, 30, 60), (4, 40, 40)]
    df = spark.createDataFrame(rows, "doc_id long, n_toks long, q_milli long")
    out = {r.doc_id: r.asDict() for r in
           budget_select(df, budget_tokens=60, n_buckets=3).collect()}
    assert [out[i]["rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[i]["cum_tokens"] for i in (1, 2, 3, 4)] == [10, 30, 60, 100]
    # exact-fit boundary: doc 3 lands exactly on the budget and is kept
    assert [out[i]["kept"] for i in (1, 2, 3, 4)] == [True, True, True, False]


def test_budget_select_ties_and_zero_budget(spark):
    from beats_spark.operators.sampling import budget_select

    rows = [(2, 10, 50), (1, 10, 50), (3, 0, 99)]
    df = spark.createDataFrame(rows, "doc_id long, n_toks long, q_milli long")
    out = {r.doc_id: r.asDict() for r in
           budget_select(df, budget_tokens=10, n_buckets=2).collect()}
    # zero-token doc has top density (q*1000 div 1) and costs nothing
    assert out[3]["rank"] == 1 and out[3]["kept"]
    # equal densities tie-break by id
    assert out[1]["rank"] == 2 and out[2]["rank"] == 3
    assert out[1]["kept"] and not out[2]["kept"]
    zero = budget_select(df, budget_tokens=0, n_buckets=2)
    kept = {r.doc_id for r in zero.collect() if r.kept}
    assert kept == {3}

    import pytest

    with pytest.raises(ValueError):
        budget_select(df, budget_tokens=-1)


def test_stratified_quota_audit_exact_counts(spark):
    from beats_spark.operators.sampling import stratified_quota

    rows = [(f"s{i % 3}", i) for i in range(30)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = stratified_quota(
        df, "source", 4, "doc_id", seed=1, audit=True
    ).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.source, []).append(r)
    for s, rs in kept.items():
        assert sum(1 for r in rs if r.kept) == 4, s
        assert sorted(r.rank for r in rs) == list(range(1, 11))
    # audit kept-set == the original filtered-subset contract
    subset = {
        (r.source, r.doc_id)
        for r in stratified_quota(df, "source", 4, "doc_id", seed=1).collect()
    }
    assert {(r.source, r.doc_id) for r in out if r.kept} == subset
    # different seed → different selection
    other = {
        (r.source, r.doc_id)
        for r in stratified_quota(df, "source", 4, "doc_id", seed=2).collect()
    }
    assert subset != other


def test_stratified_quota_dict_and_overdraw(spark):
    import pytest

    from beats_spark.operators.sampling import stratified_quota

    rows = [("a", 1), ("a", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = {
        (r.source, r.doc_id): r.kept
        for r in stratified_quota(
            df, "source", {"a": 5}, "doc_id", audit=True
        ).collect()
    }
    # quota over stratum size keeps everything; missing stratum keeps none
    assert out[("a", 1)] and out[("a", 2)]
    assert not out[("b", 3)]
    # non-audit dict form filters the allowlist subset
    assert {
        r.doc_id
        for r in stratified_quota(df, "source", {"a": 5}, "doc_id").collect()
    } == {1, 2}
    with pytest.raises(ValueError):
        stratified_quota(df, "source", -1, "doc_id")
    with pytest.raises(ValueError):
        stratified_quota(df, "source", {"a": -2}, "doc_id")


def test_filter_cascade_plan(spark):
    import pytest

    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import filter_cascade

    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    filters = {
        "half": (F.col("x") % 2 == 0, 10),
        "cheap_90": (F.col("x") % 10 == 0, 1),
        "pricey_keep_all": (F.lit(True), 100),
    }
    got = {r.position: r for r in filter_cascade(df, filters).collect()}
    # cheapest-reject-first: 90%-reject at cost 1 leads
    assert [got[i].gate for i in (1, 2, 3)] == [
        "cheap_90", "half", "pricey_keep_all",
    ]
    assert got[1].exp_cost_micro == 1 and got[1].survivors_ppm == 100_000
    # second gate costs 10 on the surviving 10% -> 1 micro expected
    assert got[2].exp_cost_micro == 1 and got[2].survivors_ppm == 50_000
    # zero-reject gate runs last on 5% of docs
    assert got[3].exp_cost_micro == 5 and got[3].survivors_ppm == 50_000
    # NULL conditions fail closed
    df2 = spark.createDataFrame([(1,), (None,)], "x long")
    out = {r.gate: r for r in filter_cascade(
        df2, {"pos": (F.col("x") > 0, 1)}
    ).collect()}
    assert out["pos"].reject_ppm == 500_000
    with pytest.raises(ValueError):
        filter_cascade(df, {})
    with pytest.raises(ValueError):
        filter_cascade(df, {"bad": (F.lit(True), 0)})

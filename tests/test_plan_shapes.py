"""Physical-plan shape assertions — the ".explain and iterate" gate.

These tests pin the plan properties that matter at 100 TB: filters and
projections reaching the parquet scan, enrich joins being broadcast
(no shuffle of the fact side), sink reads pruning partitions, and the
processor chain staying inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain
from beats_spark.plans.pipeline import PipelineConfig, transform
from beats_spark.plans.router import META_SINK


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_push_down_to_scan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = ev.filter(F.col("event_type") == "error").select("event_id", "value")
    plan = formatted(q)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(event_type,error\)", plan)
    # column pruning: scan must read only the 3 needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) == {
        "event_id:bigint",
        "event_type:string",
        "value:double",
    }


def test_enrich_table_join_is_broadcast(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    chain = build_chain(
        [
            {
                "enrich_lookup": {
                    "key_field": "event_type",
                    "target_field": "cat",
                    "table": [{"key": "error", "value": "bad"}],
                    "default": "ok",
                }
            }
        ]
    )
    plan = plan_of(chain(ev))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_enrich_mapping_is_pure_expression(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    chain = build_chain(
        [
            {
                "enrich_lookup": {
                    "key_field": "event_type",
                    "target_field": "cat",
                    "mapping": {"error": "bad"},
                    "default": "ok",
                }
            }
        ]
    )
    plan = plan_of(chain(ev))
    # small literal maps must compile to expressions — no join at all
    assert "Join" not in plan


def test_transform_chain_is_one_codegen_stage_no_shuffle(spark, transcripts):
    cfg = PipelineConfig(
        processors=[
            {
                "dissect": {
                    "tokenizer": 'level=%{level} ts=%{event_ts} caller=%{caller} msg="%{message}"',
                    "field": "text",
                    "target_prefix": "",
                }
            },
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
            {
                "enrich_lookup": {
                    "key_field": "role",
                    "target_field": "channel",
                    "mapping": {"user": "inbound"},
                    "default": "other",
                }
            },
        ],
        router_rules=[{"index": "%{[level]}"}],
    )
    plan = plan_of(transform(transcripts, cfg))
    assert "Exchange" not in plan  # parse+mutate+enrich+route: zero shuffles
    assert plan.count("WholeStageCodegen") <= 2


def test_sink_read_prunes_partitions(spark, transcripts, tmp_path):
    from beats_spark.plans.sinks import read_sink, write_fanout

    cfg = PipelineConfig(
        processors=[],
        router_rules=[{"index": "%{[role]}"}],
        dead_letter=False,
    )
    routed = transform(transcripts, cfg)
    write_fanout(routed, str(tmp_path / "sinks"))
    back = read_sink(spark, str(tmp_path / "sinks"), "user")
    plan = formatted(back)
    # partition filter on _meta_sink, not a data filter
    assert re.search(r"PartitionFilters: \[.*_meta_sink.*\]", plan)


def test_rate_limit_single_shuffle_on_key(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = build_chain(
        [{"rate_limit": {"limit": 3, "fields": ["user_id"], "order_by": ["ts", "event_id"]}}]
    )(ev)
    plan = plan_of(out)
    assert plan.count("Exchange") == 1  # exactly the rate-limit key shuffle


def test_fanout_counts_ride_the_write_single_job(spark, transcripts, tmp_path):
    """With a static router sink set, write_fanout's per-sink counts
    come from an Observation riding the write — ONE Spark job total,
    no read-back of committed files (the 100 TB second-pass trap)."""
    from beats_spark.plans.pipeline import expected_sinks
    from beats_spark.plans.sinks import write_fanout

    cfg = PipelineConfig(
        processors=[],
        router_rules=[
            {"when": {"equals": {"role": "user"}}, "index": "users"},
        ],
        default_sink="rest",
        dead_letter=False,
    )
    routed = transform(transcripts, cfg)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    res = write_fanout(
        routed, str(tmp_path / "sinks"), known_sinks=expected_sinks(cfg)
    )
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert len(after - before) == 1, "fan-out write + counts must be one job"
    # counts exact vs an independent recount
    expect = {
        r["_meta_sink"]: r["n"]
        for r in routed.groupBy("_meta_sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res.sink_counts == expect


def test_fanout_counts_fallback_reconciles_dynamic_sinks(spark, transcripts, tmp_path):
    """An incomplete known_sinks list cannot produce wrong counts: the
    observed total fails to reconcile and the footer read-back runs."""
    from beats_spark.plans.sinks import write_fanout

    cfg = PipelineConfig(
        processors=[], router_rules=[{"index": "%{[role]}"}], dead_letter=False
    )
    routed = transform(transcripts, cfg)
    res = write_fanout(routed, str(tmp_path / "sinks"), known_sinks=["user"])
    expect = {
        r["_meta_sink"]: r["n"]
        for r in routed.groupBy("_meta_sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res.sink_counts == expect


def test_grok_and_js_script_stay_narrow(spark, transcripts):
    """The round-2 parse surfaces (grok battery, transpiled JS script)
    are pure column expressions: chained with router + DLQ they must
    still compile to a zero-Exchange narrow stage."""
    cfg = PipelineConfig(
        processors=[
            {"grok": {"field": "text",
                      "match": "%{NOTSPACE:head} %{GREEDYDATA:rest}"}},
            {"script": {"lang": "javascript",
                        "source": 'function process(event) {'
                                  ' event.Put("hl", event.Get("head").length);'
                                  ' if (event.Get("hl") > 40) { event.Tag("long"); }'
                                  ' }'}},
        ],
        router_rules=[{"when": {"has_fields": ["head"]}, "index": "parsed"}],
    )
    plan = plan_of(transform(transcripts, cfg))
    assert "Exchange" not in plan
    assert plan.count("WholeStageCodegen") <= 2


def test_mixture_sample_is_shuffle_free(spark):
    """Domain mixing must stay a narrow projection + explode: zero
    Exchanges regardless of weights (up- or down-sampling)."""
    from beats_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample(
        docs, "lang", {"en": 2.5, "de": 0.25, "fr": 0.0}, key_col="doc_id"
    )
    assert "Exchange" not in plan_of(out)


def test_html_extraction_is_zero_exchange_projection(spark):
    """extract_html_text must stay ONE narrow projection: no Exchange,
    and filters on OTHER columns still push to the parquet scan
    through it (the 100 TB crawl claim in operators/html.py)."""
    from beats_spark.operators.html import extract_html_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = extract_html_text(
        docs.withColumnRenamed("text", "html"), "html", "clean"
    )
    assert "Exchange" not in plan_of(out)
    filtered = out.filter(F.col("lang") == "en").select("doc_id", "clean")
    plan = formatted(filtered)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan), plan


def test_include_message_pushes_to_scan(spark):
    """The include_message rlike disjunction is a plain filter:
    Catalyst pushes the StringContains-able parts toward the scan and
    keeps the whole thing out of any shuffle."""
    from beats_spark.sources.lines import include_message_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = include_message_filter(
        docs.withColumnRenamed("text", "message"), ["alpha", "beta"]
    )
    assert "Exchange" not in plan_of(out)
    assert "Filter" in plan_of(out)


def test_url_dedup_single_shuffle(spark):
    """URL dedup = canonicalization projection + ONE window shuffle on
    the canonical string; canonicalization itself must not shuffle."""
    from beats_spark.operators.urlnorm import add_url_canonical, url_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    urls = docs.select("doc_id", F.col("source").alias("url"))
    assert "Exchange" not in plan_of(add_url_canonical(urls))
    assert plan_of(url_dedup(urls)).count("Exchange") == 1


def test_dsir_scoring_is_joinless_map_lookup(spark):
    """After the two bounded model fits, DSIR scoring must be a literal
    map lookup + one id-keyed aggregation — NO join anywhere in the
    returned plan (the bucket→weight table compiles into codegen)."""
    from beats_spark.operators.sampling import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=128
    )
    plan = plan_of(out)
    # the InMemoryRelation block embeds the persisted fit-stage plan;
    # the SCORING plan is everything above the cache read
    scoring = plan.split("InMemoryRelation")[0]
    assert "Join" not in scoring, plan
    assert scoring.count("Exchange") <= 1, plan  # only the groupBy(id)
    assert "element_at(map(keys" in scoring  # literal-map weight lookup


def test_substring_dedup_shuffles_hashes_not_grams(spark):
    """The gram-frequency exchange must carry the md5 fingerprint and
    the encoded keeper int — never gram text or the token array."""
    from beats_spark.operators.dedup import substring_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(substring_dedup(docs, n=20))
    m = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(_gk" in ln
    ]
    assert m, plan
    assert "_toks" not in m[0]


def test_semantic_dedup_single_projection_assignment(spark):
    """Cell id, norm², and the quantized vector must all come out of
    the narrow pre-join projection — no shuffle before the cell join,
    and the pair stage joins on the cell key."""
    from beats_spark.operators.dedup import semantic_dedup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dbl = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    plan = plan_of(semantic_dedup_pairs(dbl, dim=64))
    assert re.search(r"Join.*cell", plan) or "cell#" in plan
    # one spread() round-robin + at most the join's own exchanges
    assert plan.count("Exchange") <= 3, plan


def test_fanout_files_per_sink_bounds_file_count(spark, transcripts, tmp_path):
    """files_per_sink=k caps each sink directory at ≈k part files no
    matter how many tasks wrote, and max_records_per_file splits the
    other way — counts stay exact through the added shuffle."""
    import glob

    from beats_spark.plans.pipeline import expected_sinks
    from beats_spark.plans.sinks import write_fanout

    cfg = PipelineConfig(
        processors=[],
        router_rules=[
            {"when": {"equals": {"role": "user"}}, "index": "users"},
        ],
        default_sink="rest",
        dead_letter=False,
    )
    routed = transform(transcripts.repartition(16), cfg)
    root = str(tmp_path / "sinks")
    res = write_fanout(
        routed, root, known_sinks=expected_sinks(cfg), files_per_sink=2
    )
    for sink in res.sink_counts:
        files = glob.glob(f"{root}/_meta_sink={sink}/*.parquet")
        assert 1 <= len(files) <= 2, (sink, files)
    expect = {
        r["_meta_sink"]: r["n"]
        for r in routed.groupBy("_meta_sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert res.sink_counts == expect

    # row-budget splitting: 1 row per file explodes the file count
    root2 = str(tmp_path / "sinks2")
    n_rows = transcripts.count()
    res2 = write_fanout(
        routed,
        root2,
        known_sinks=expected_sinks(cfg),
        files_per_sink=2,
        max_records_per_file=max(1, n_rows // 50),
    )
    total_files = len(glob.glob(f"{root2}/_meta_sink=*/*.parquet"))
    assert total_files > 4
    assert res2.sink_counts == expect


def test_fanout_files_per_sink_with_map_columns(spark, tmp_path):
    """Map-typed columns (container attrs, journald custom fields,
    decode_json_fields overflow) must not crash the files_per_sink
    salt — Spark forbids hashing MAP types (ADVICE r3, sinks.py:94).
    Top-level maps hash via map_entries; nested maps drop out of the
    salt; counts stay exact."""
    import glob

    from beats_spark.plans.sinks import write_fanout

    df = spark.createDataFrame(
        [(i, f"k{i % 3}", {"a": str(i), "b": "x"},
          {"deep": {"m": i}}, "alerts" if i % 2 else "inbound")
         for i in range(200)],
        "id long, k string, attrs map<string,string>, "
        "nested struct<deep:map<string,long>>, _meta_sink string",
    ).repartition(8)
    root = str(tmp_path / "mapsinks")
    res = write_fanout(
        df, root, known_sinks=["alerts", "inbound"], files_per_sink=2
    )
    assert res.sink_counts == {"alerts": 100, "inbound": 100}
    for sink in ("alerts", "inbound"):
        files = glob.glob(f"{root}/_meta_sink={sink}/*.parquet")
        assert 1 <= len(files) <= 2, (sink, files)


def test_url_filter_blocklist_join_is_broadcast_semi(spark):
    """The blocklist is a broadcast DIMENSION: the corpus must never
    shuffle toward it — LeftSemi BroadcastHashJoin, no SortMergeJoin
    on the suffix key."""
    from beats_spark.operators.urlnorm import url_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fx = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 9).cast("string"),
            F.lit(".example.com/p"),
        ).alias("url"),
    )
    bl = spark.createDataFrame([("h3.example.com",)], "domain string")
    plan = plan_of(url_filter(fx, bl))
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), plan
    # the suffix-match side must not sort-merge anywhere
    assert plan.count("SortMergeJoin") == 0, plan


def test_perplexity_buckets_windows_only_the_histogram(spark):
    """The tier cutoffs must come from the bounded histogram — the
    single-partition window may only ever see the post-aggregation
    frame (hist), never the per-doc rows: every Window node sits above
    a HashAggregate of the milli key, and the corpus-side frames reach
    it only through that aggregate."""
    from beats_spark.operators.textstats import perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(perplexity_buckets(docs, "text", "doc_id"))
    # window exists, and the plan aggregates surprisal_milli BEFORE it
    w = plan.index("Window")
    assert "surprisal_milli" in plan[:w]
    assert re.search(r"HashAggregate.*count\(1\)", plan[:w]) or \
        "HashAggregate" in plan[:w], plan[:w]


def test_temperature_weights_single_corpus_shuffle(spark):
    """One corpus-sized exchange (the stratum groupBy, map-side
    combined); everything after runs on the bounded stratum frame."""
    from beats_spark.operators.sampling import temperature_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(temperature_weights(docs, "lang"))
    # partial_count before the exchange = map-side combine fired
    assert re.search(r"partial_count|partial.*count", plan), plan
    ex_before_window = plan.split("Window")[0].count("Exchange")
    # scan -> partial agg -> ONE hash exchange -> final agg (+ the
    # single-partition exchange feeding the window is on the tiny frame)
    assert ex_before_window <= 2, plan


def test_late_round4_curation_ops_stay_narrow(spark):
    """The per-row curation tail must ride the scan: mojibake repair,
    intra-doc repetition strip, and the frozen-model quality gate are
    pure projections (zero Exchange); the training-order shuffle is
    exactly its one hash Exchange."""
    from beats_spark.operators.dedup import strip_repeated_lines
    from beats_spark.operators.encoding import fix_mojibake
    from beats_spark.operators.sampling import shuffle_shards
    from beats_spark.operators.textstats import quality_classifier

    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "x y z")], "doc_id long, text string"
    )
    assert "Exchange" not in plan_of(fix_mojibake(docs))
    assert "Exchange" not in plan_of(strip_repeated_lines(docs))
    assert "Exchange" not in plan_of(quality_classifier(docs))
    assert plan_of(shuffle_shards(docs, "doc_id", 8)).count("Exchange") == 1


def test_scale_planning_ops_shuffle_budget(spark):
    """The planning trio stays cheap: padding_stats is exactly its one
    groupBy Exchange; key_skew_stats and mixture_epochs are the
    per-key/per-source groupBy plus the 1-row totals broadcast back
    (no second hash Exchange on the big frame, totals side arrives
    over a BroadcastExchange, and no SortMergeJoin anywhere)."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import mixture_epochs, padding_stats
    from beats_spark.operators.scale import key_skew_stats

    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "source string, k long, toks long"
    )
    assert plan_of(padding_stats(df, F.col("toks"))).count("Exchange") == 1

    skew = plan_of(key_skew_stats(df, "k", n_partitions=16))
    mix = plan_of(
        mixture_epochs(df, "source", F.col("toks"), budget_tokens=100)
    )
    for p in (skew, mix):
        assert "SortMergeJoin" not in p
        assert "BroadcastExchange" in p
        # both consumers of the shared per-key/per-source aggregate
        # (totals agg + crossJoin side) must read the PERSISTED frame —
        # ReuseExchange does not fire for shared aggregate subtrees
        # under joins (CLAUDE.md), so without the cache the corpus
        # groupBy would execute twice
        assert p.count("InMemoryTableScan") >= 2


def test_event_analytics_shuffle_budget(spark):
    """event_funnel is ONE user-keyed hash Exchange (conditional mins)
    + the single-partition global rollup — never a SortMergeJoin and
    never a per-step pass over the events. retention_cohorts adds the
    anchor/activity join and the distinct, but every Exchange is keyed
    (user / cohort) and the period-0 ratio join must not sort-merge."""
    from beats_spark.operators.analytics import event_funnel, retention_cohorts

    df = spark.createDataFrame(
        [(1, "view", "2024-01-01T00:00:00"), (1, "click", "2024-01-02T00:00:00")],
        "user_id long, event_type string, ts_s string",
    ).selectExpr("user_id", "event_type", "cast(ts_s as timestamp) as ts")

    fp = plan_of(event_funnel(df, ["view", "click", "purchase"]))
    assert fp.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in fp

    rp = plan_of(
        retention_cohorts(df, anchor_type="view", period_days=7, max_periods=2)
    )
    # the period-0 ratio join must arrive over a BroadcastExchange
    # (the frame is bounded by cohort count); the anchor join on
    # user_id may legitimately sort-merge in the static plan — a
    # per-user frame is NOT broadcastable at 10^9 users, and AQE
    # converts it at runtime when it happens to be small. Both
    # consumers of the cohort×period aggregate must read the PERSISTED
    # frame (ReuseExchange doesn't fire for shared aggregates under
    # joins), so the heavy events→anchors subtree appears ONCE.
    assert "BroadcastHashJoin" in rp
    assert rp.count("InMemoryTableScan") >= 2
    # the single user-keyed SMJ lives INSIDE the cached subtree, whose
    # plan text is reprinted under every InMemoryTableScan — cap the
    # count by the number of cache prints rather than asserting 1
    assert rp.count("SortMergeJoin") <= rp.count("InMemoryTableScan")


def test_sketch_ops_single_event_scale_shuffle(spark):
    """The three sketches claim O(state) reduce-side frames: hll and
    cms must be exactly ONE keyed Exchange with a map-side partial
    HashAggregate (the whole point of a mergeable sketch); hdr adds
    one more Exchange but ONLY for the window over the already-bucketed
    tiny frame — never a second pass over the raw events, never a
    sort-merge join."""
    from beats_spark.operators.sketches import cms_sketch, hdr_quantiles, hll_sketch

    df = spark.createDataFrame(
        [("a", "u1", 1.5), ("a", "u2", 2.5)], "g string, k string, v double"
    )

    hp = plan_of(hll_sketch(df, "k", by=("g",)))
    assert hp.count("Exchange") == 1
    assert hp.count("HashAggregate") == 2  # partial + final

    cp = plan_of(cms_sketch(df, "k", by=("g",)))
    assert cp.count("Exchange") == 1
    assert cp.count("HashAggregate") == 2

    qp = plan_of(hdr_quantiles(df, "v", by=("g",)))
    assert qp.count("Exchange") == 2  # bucket agg + tiny window repartition
    assert "Join" not in qp


def test_winlog_framing_is_zero_exchange(spark):
    """split_winlog_export must stay ONE narrow generate+projection:
    no Exchange, no Python — the framing rides the file scan."""
    from beats_spark.sources.winlog import split_winlog_export

    df = spark.createDataFrame(
        [("f", "<Event a='1'><x>1</x></Event><Event b='2'><x>2</x></Event>")],
        "file string, value string",
    )
    p = plan_of(split_winlog_export(df, "value", "file"))
    assert "Exchange" not in p
    assert "Python" not in p and "ArrowEval" not in p


def test_incremental_neardup_shuffle_shape(spark):
    """The fuzzy ingest-tick op must keep its docstring promises in the
    physical plan: no CartesianProduct anywhere (candidates come from
    the (band, sig) equi-join), the candidate join keyed on the band
    signature, and a bounded shuffle budget — the op is a fixed
    pipeline of key-material joins, not a data-dependent explosion.
    (The redundant pre-anti-join distinct was measured at ~0.6 s of
    pure Exchange cost and removed; this caps regressions.)"""
    from beats_spark.operators.dedup import (
        incremental_neardup,
        neardup_index,
        shingle_index,
    )

    hist = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon eta")], "doc_id long, text string"
    )
    out = incremental_neardup(
        batch, neardup_index(hist), shingle_index(hist), threshold=0.7
    )
    p = plan_of(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert re.search(r"Exchange hashpartitioning\(band", p)
    # fixed pipeline: band agg (hot) + candidate join + pair dedup +
    # two verify joins + anti-join + spread — everything else must ride
    # those stages (static plan, pre-AQE; AQE only removes exchanges)
    assert p.count("Exchange") <= 14


def test_bloom_probe_broadcasts_the_position_set(spark, tmp_path):
    """The probe joins the ≤ n_bits-row position set as a broadcast
    hash join — the bit lookup never shuffles the probe stream.
    Parquet-backed inputs so the static planner has size stats
    (CLAUDE.md: executedPlan() strings are pre-AQE; in-memory frames
    without stats would show the runtime-only SMJ fallback)."""
    from beats_spark.operators.sketches import bloom_build, bloom_probe

    src = str(tmp_path / "u.parquet")
    spark.createDataFrame(
        [(f"u{i}",) for i in range(50)], "u string"
    ).write.parquet(src)
    df = spark.read.parquet(src)
    bp = str(tmp_path / "bloom.parquet")
    bloom_build(df, "u", 1024, 3).write.parquet(bp)
    bloom = spark.read.parquet(bp)
    p = plan_of(bloom_probe(df, bloom, "u", 1024, 3))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_running_prefix_has_no_global_single_partition_sort(spark):
    """shard_plan's prefix must never compile to the single-partition
    global window: the only SinglePartition exchange allowed is the
    n_buckets-row bucket-totals frame; corpus-side movement is the
    range partitioning + the per-bucket window hash."""
    from pyspark.sql import functions as F

    from beats_spark.operators.layout import shard_plan

    df = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1)) for i in range(100)],
        "doc_id long, text string",
    )
    p = plan_of(
        shard_plan(df, F.octet_length("text"), 64, n_buckets=4, persist=False)
    )
    assert "rangepartitioning" in p.lower()
    # the broadcast of the 4-row offsets frame, never a corpus join
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # SinglePartition exchanges exist only on the bucket-totals side:
    # they must sit under the broadcast subtree, i.e. count must be
    # small and the final output partitioning must NOT be single
    assert p.count("SinglePartition") <= 2


def test_kmv_two_phase_windows_are_salt_then_group(spark):
    """The salted min-k runs two window sorts — (group, salt) then
    (group) — and nothing else heavy: no joins at all."""
    from beats_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(40)], "grp string, u string"
    )
    p = plan_of(kmv_sketch(df, "u", ["grp"], k=8, salts=4))
    assert "Join" not in p
    assert p.count("+- Window ") == 2
    # Spark's WindowGroupLimit kicks in: each rank filter prunes to k
    # rows per group PARTIALLY before its shuffle — the map-side
    # combine of order statistics, exactly the bounded-state claim
    assert "WindowGroupLimit" in p and ", Partial" in p

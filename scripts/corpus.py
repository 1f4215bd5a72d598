"""Training-corpus build CLI — the corpus-side twin of run.py.

Composes the oracle-proven operators into the standard curation
chain over a documents parquet table:

    [HTML -> text] -> quality filter -> exact dedup ->
    [temperature mixture] -> sequence pack -> manifest parquet

Every stage is an existing operator (operators/html.py, textstats.py,
dedup.py, sampling.py); this file only wires flags to them, so the
CLI inherits each stage's scale shape unchanged. Prints ONE JSON
stats line (stage counts) and writes the packed manifest to
``--out``; the per-rule reject report lands next to it.

With ``--transcripts`` the input is a TURNS table (the BASELINE
input_hint shape: conv_id, turn_idx, role, text, …) and the chain
front-loads the conversation stages (operators/chat.py):

    validate conversations -> [context truncation] ->
    render chat templates (+ loss-mask spans) -> document chain

The rendered SFT frame (with ``loss_spans``) lands at
``--out/rendered``; the per-rule conversation reject report at
``--out/conv_reject_report``. The Gopher quality rules are tuned for
prose, not chat markup — pass ``--no-quality`` for transcripts unless
you have retuned thresholds.

Examples:
    python scripts/corpus.py --input /root/testdata/sf0.001/documents.parquet \
        --out /tmp/corpus --temperature --budget 256
    python scripts/corpus.py --input crawl.parquet --out /tmp/corpus \
        --html --tokenizer bpe
    python scripts/corpus.py --input turns.parquet --out /tmp/corpus \
        --transcripts --order-cols turn_idx --context-budget 1024 --no-quality
    python scripts/corpus.py --input segments/ --input-format warc \
        --out /tmp/corpus   # WARC 200-OK responses -> html -> the chain
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--input-format", choices=["parquet", "warc"],
                   default="parquet",
                   help="warc: --input is a WARC file/dir; 200-OK response "
                        "records become HTML documents (implies --html)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--lang-col", default="lang")
    p.add_argument("--html", action="store_true",
                   help="input text column is raw HTML: extract first")
    p.add_argument("--transcripts", action="store_true",
                   help="input is a TURNS table (conv/role/order/text): "
                        "validate -> [truncate] -> render chat templates "
                        "before the document chain")
    p.add_argument("--conv-col", default="conv_id")
    p.add_argument("--role-col", default="role")
    p.add_argument("--order-cols", default="turn_idx",
                   help="comma-separated turn-order columns")
    p.add_argument("--context-budget", type=int, default=0,
                   help=">0: keep the longest suffix of whole turns per "
                        "conversation fitting this many tokens (system "
                        "turn pinned)")
    p.add_argument("--no-quality", action="store_true",
                   help="skip the Gopher quality filter")
    p.add_argument("--dedup", choices=["exact", "none"], default="exact")
    p.add_argument("--temperature", action="store_true",
                   help="mT5 T=2 language-balanced mixture resampling")
    p.add_argument("--budget", type=int, default=2048,
                   help="tokens per packed window")
    p.add_argument("--buckets", type=int, default=64,
                   help="independent packing streams")
    p.add_argument("--tokenizer", choices=["whitespace", "bpe"],
                   default="whitespace")
    p.add_argument("--split-eval-milli", type=int, default=0,
                   help="reserve N/1000 of docs as a held-out eval side "
                        "before packing (0 = off); assignment written to "
                        "<out>/split_assignment")
    p.add_argument("--split-mode", choices=["hash", "cluster"],
                   default="hash",
                   help="hash = independent per-doc coin; cluster = "
                        "near-dup clusters (MinHash-LSH + connected "
                        "components) share one coin so no near-copy "
                        "straddles train/eval")
    p.add_argument("--shard-bytes", type=int, default=0,
                   help="emit a size-balanced shard plan for the train "
                        "side at <out>/shard_plan (0 = off)")
    p.add_argument("--plan-report", action="store_true",
                   help="also emit the scale-planning report: per-"
                        "stratum skew diagnosis (salt recommendation) "
                        "and the padding audit a pad-to-cap batcher "
                        "would cost vs this packed layout")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--seed", type=int, default=17)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from beats_spark.session import get_spark
    from beats_spark.operators.dedup import exact_dedup
    from beats_spark.operators.sampling import (
        mixture_sample,
        pack_sequences,
        temperature_weights,
    )
    from beats_spark.operators.textstats import quality_filter

    parser = build_parser()
    if args.transcripts and args.html:
        parser.error("--transcripts and --html are exclusive")
    if args.transcripts and args.temperature:
        parser.error(
            "--temperature needs a per-document language column, which "
            "rendered transcripts don't carry"
        )

    if args.input_format == "warc" and args.transcripts:
        parser.error("--input-format warc and --transcripts are exclusive")
    if args.input_format == "warc" and args.temperature:
        parser.error(
            "--temperature needs a language column; WARC-derived documents "
            "don't carry one (and their string ids don't support the "
            "mixture copy-index arithmetic)"
        )

    spark = get_spark(cores=args.cores)
    stats: dict[str, object] = {}
    text_col, id_col = args.text_col, args.id_col
    if args.input_format == "warc":
        from beats_spark.sources.warc import read_warc

        # persist: the Python WARC parse (binaryFile + gzip + Arrow) is
        # the most expensive stage; without it every downstream count/
        # write re-parses the whole crawl
        recs = read_warc(spark, args.input).persist()
        stats["warc_records"] = recs.count()
        ok = recs.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & ~F.col("truncated")
        )
        df = ok.select(
            F.concat_ws(":", F.col("file"), F.col("rec_no")).alias(id_col),
            F.col("target_uri").alias("url"),
            # NOT bare decode(): one non-UTF-8 page (latin-1 bodies,
            # truncated multibyte, binary 200-OKs — routine in crawls)
            # raises MALFORMED_CHARACTER_CODING under Spark 4 and kills
            # the whole build; the lenient cast + make_valid_utf8
            # replaces invalid bytes with U+FFFD (tag-and-continue)
            F.expr("make_valid_utf8(cast(payload as string))").alias(text_col),
        )
        args.html = True
    else:
        df = spark.read.parquet(args.input)

    if args.transcripts:
        # turns -> validity gate -> [context truncation] -> rendered
        # SFT documents (with loss spans); the document chain below
        # then runs over the rendered frame unchanged.
        from beats_spark.operators.chat import (
            render_chat,
            truncate_context,
            validate_conversations,
        )

        order_cols = tuple(
            c.strip() for c in args.order_cols.split(",") if c.strip()
        )
        if not order_cols:
            parser.error("--order-cols must name at least one column")
        stats["turns_in"] = df.count()
        gate = validate_conversations(
            df,
            key_col=args.conv_col,
            role_col=args.role_col,
            text_col=text_col,
            order_cols=order_cols,
        ).persist()
        stats["convs_in"] = gate.count()
        conv_rejects = (
            gate.where(~F.col("keep"))
            .withColumn("reason", F.explode(F.split("reasons", ",")))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        conv_rejects.write.mode("overwrite").parquet(
            f"{args.out}/conv_reject_report"
        )
        valid = gate.where("keep").select(args.conv_col)
        stats["convs_valid"] = valid.count()
        df = df.join(valid, args.conv_col, "left_semi")
        if args.context_budget > 0:
            df = truncate_context(
                df,
                args.context_budget,
                key_col=args.conv_col,
                order_cols=order_cols,
                text_col=text_col,
                token_counter=args.tokenizer,
                pin_first=True,
            )
            # persisted: counted here AND consumed by render_chat —
            # without the cache the truncation window (and the BPE UDF
            # when --tokenizer bpe) executes twice
            df = (
                df.where("kept")
                .drop("tok_count", "suffix_toks", "kept")
                .persist()
            )
            stats["turns_kept"] = df.count()
        rendered = render_chat(
            df,
            key_col=args.conv_col,
            role_col=args.role_col,
            text_col=text_col,
            order_cols=order_cols,
        )
        rendered.write.mode("overwrite").parquet(f"{args.out}/rendered")
        df = spark.read.parquet(f"{args.out}/rendered")
        text_col, id_col = "rendered", args.conv_col
        stats["docs_in"] = df.count()
    else:
        stats["docs_in"] = df.count()

    if args.html:
        from beats_spark.operators.html import extract_html_text

        df = extract_html_text(df, text_col, "_extracted").drop(
            text_col
        ).withColumnRenamed("_extracted", text_col)

    if not args.no_quality:
        # persist: the annotated frame feeds the reject report, the
        # kept-count, AND the downstream chain — without it the full
        # Gopher battery re-executes per consumer (3-4 corpus passes)
        annotated = quality_filter(df, text_col, id_col).persist()
        rejects = (
            annotated.where(~F.col("keep"))
            .select(id_col, "reasons")
            .withColumn("reason", F.explode(F.split("reasons", ",")))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rejects.write.mode("overwrite").parquet(f"{args.out}/reject_report")
        df = annotated.where("keep").select(*df.columns)
        stats["docs_kept"] = df.count()

    if args.dedup == "exact":
        df = exact_dedup(df, text_col, id_col).persist()
        stats["docs_unique"] = df.count()

    if args.split_eval_milli > 0:
        # split BEFORE any upsampling: the eval side must never see
        # mixture copies, and cluster mode must group near-dups first
        if not 0 < args.split_eval_milli < 1000:
            parser.error("--split-eval-milli must be in (0, 1000)")
        frac = args.split_eval_milli / 1000.0
        if args.split_mode == "cluster":
            from beats_spark.operators.dedup import (
                connected_components,
                minhash_lsh_pairs,
            )
            from beats_spark.operators.sampling import cluster_safe_split

            pairs = minhash_lsh_pairs(df, text_col, id_col)
            comp = connected_components(pairs, "id_a", "id_b")
            split = cluster_safe_split(
                df, comp, id_col, frac, seed=args.seed
            ).drop("component")
        else:
            from beats_spark.operators.sampling import split_train_eval

            split = split_train_eval(df, id_col, frac, seed=args.seed)
        # persisted: the assignment write, the eval count, and the
        # train-side continuation all consume it (and in cluster mode
        # the upstream CC iteration must not recompute per consumer)
        split = split.persist()
        split.select(id_col, "split").write.mode("overwrite").parquet(
            f"{args.out}/split_assignment"
        )
        stats["docs_eval"] = split.where("split = 'eval'").count()
        df = split.where("split = 'train'").drop("split")
        stats["docs_train"] = df.count()

    if args.shard_bytes > 0:
        from beats_spark.operators.layout import shard_plan

        plan = shard_plan(
            df.select(id_col, text_col),
            F.octet_length(F.col(text_col)),
            shard_bytes=args.shard_bytes,
            order_col=id_col,
            n_buckets=args.buckets,
        )
        plan.select(id_col, "offset_bytes", "shard").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/shard_plan")
        stats["shards"] = (
            spark.read.parquet(f"{args.out}/shard_plan")
            .agg((F.max("shard") + 1).cast("long").alias("s"))
            .collect()[0]["s"]
        )

    if args.temperature:
        tw = temperature_weights(df, args.lang_col)
        # bounded collect: one row per language/stratum. Boost clamped
        # to [0.001, 9.999]: the packing pid below encodes the copy
        # index in one decimal digit (>10x upsampling is degenerate
        # curation), and the floor keeps an effectively-empty stratum
        # (share < 1e-12, boost quantized to 0) sampled rather than
        # silently deleted. NULL strata are skipped — mixture_sample's
        # equality can never match NULL, so those rows pass through at
        # default weight 1.0 and reporting a boost would be a lie.
        weights = {
            r["stratum"]: min(max(r["boost_milli"], 1) / 1000.0, 9.999)
            for r in tw.collect()
            if r["stratum"] is not None
        }
        stats["mixture_weights"] = weights
        df = mixture_sample(df, args.lang_col, weights, key_col=id_col,
                            seed=args.seed)
        pid = (F.col(id_col) * 10 + F.col("mix_copy")).alias("_pid")
    else:
        pid = F.col(id_col).alias("_pid")

    if args.plan_report:
        # the measurement pair behind the packing/salting choices:
        # what padding a pad-to-budget batcher would burn on these
        # docs, and which strata are hot enough to need salting
        from beats_spark.operators.sampling import padding_stats
        from beats_spark.operators.scale import key_skew_stats

        # price the audit in the SAME tokens the packer budgets with,
        # or the padding numbers are apples-to-oranges vs the manifest
        if args.tokenizer == "bpe":
            from beats_spark.functions.bpe import bpe_token_count

            tok_col = bpe_token_count(F.col(text_col))
        else:
            from beats_spark.operators.textstats import (
                token_count_whitespace,
            )

            tok_col = token_count_whitespace(F.col(text_col))
        pad = padding_stats(
            df, tok_col.cast("long"), bucket=args.budget
        ).persist()
        pad.write.mode("overwrite").parquet(f"{args.out}/padding_report")
        tot = pad.agg(
            F.sum("padding").cast("long").alias("p"),
            F.sum("token_sum").cast("long").alias("t"),
        ).collect()[0]
        stats["padding_tokens_naive"] = tot["p"]
        stats["tokens_real"] = tot["t"]
        pad.unpersist()
        # transcripts/WARC frames carry no stratum column — skip the
        # skew leg instead of crashing after padding already wrote
        if args.lang_col in df.columns:
            skew = key_skew_stats(
                df, args.lang_col, n_partitions=args.buckets
            )
            skew.write.mode("overwrite").parquet(f"{args.out}/skew_report")
            stats["skew_heavy_strata"] = (
                spark.read.parquet(f"{args.out}/skew_report").count()
            )
        else:
            stats["skew_heavy_strata"] = None

    packed = pack_sequences(
        df.select(pid, text_col),
        text_col,
        "_pid",
        budget=args.budget,
        n_buckets=args.buckets,
        token_counter=args.tokenizer,
    )
    packed.write.mode("overwrite").parquet(f"{args.out}/manifest")
    manifest = spark.read.parquet(f"{args.out}/manifest")
    stats["rows_packed"] = manifest.count()
    # window ordinals are per packing bucket: total = sum over buckets
    stats["windows"] = (
        manifest.groupBy("bucket")
        .agg(F.max("pack_last").alias("_m"))
        .agg(F.sum(F.col("_m") + 1).cast("long").alias("w"))
        .collect()[0]["w"]
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

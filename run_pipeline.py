"""spark-submit entrypoint for the full index/query pipeline.

North-rule deployment shape (BASELINE.json): the pipeline runs via

    spark-submit --py-files lshse.zip run_pipeline.py index \
        --input <docs table/parquet> --out <index dir> [--resume]

    spark-submit --py-files lshse.zip run_pipeline.py search \
        --index <index dir> --query "spark join" --top-k 10 [--wand]

    spark-submit --py-files lshse.zip run_pipeline.py verify \
        --input <docs parquet>          # per-row sha256 integrity gate

Build the zip with:  python run_pipeline.py package

On a real cluster, drop the ``--master local[N]`` default by exporting
SPARK_GRAFT_MASTER (e.g. yarn / k8s://...); every stage is
checkpoint-resumable (plans.lineage.run_stage) so a killed job rerun
with --resume skips completed stages.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(app: str):
    from large_scale_hypertextual_search_engine_spark.session import get_spark

    master = os.environ.get("SPARK_GRAFT_MASTER")
    extra = {"spark.master": master} if master else None
    return get_spark(app_name=app, extra_conf=extra)


def _fingerprint(input_path: str, ns: str) -> str:
    return hashlib.sha256(f"{ns}:{input_path}".encode()).hexdigest()[:16]


def cmd_index(args) -> None:
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, record_metrics,
    )
    from large_scale_hypertextual_search_engine_spark.sources.corpus import (
        verify_content_sha,
    )
    from pyspark.sql import functions as F

    spark = _spark("lshse-index")
    if args.input_format == "cleaned-jsonl":
        fp = _fingerprint(args.input, f"cleaned:{args.salt_buckets}")
        if not args.resume:
            fp = f"{fp}:{int(time.time())}"
        t0 = time.time()
        idx, extra = _index_from_cleaned(spark, args, fp)
        wall = time.time() - t0
        print(json.dumps({
            "n_docs": idx["docid_map"].count(),
            "n_terms": idx["lexicon"].count(),
            "wall_s": round(wall, 2), **extra,
        }))
        spark.stop()
        return
    docs = spark.read.parquet(args.input)
    if args.content_col != "content" and args.content_col in docs.columns:
        # per-field index builds (BM25F): same corpus, one field column
        docs = docs.withColumn("content", F.col(args.content_col))
    cols = set(docs.columns)
    if {"repo", "path", "commit", "content"} <= cols:
        # north-rule input shape: mint docid, enforce sha invariant
        docs = docs.withColumn(
            "docid",
            F.concat_ws("", "repo", F.lit(":"), "path", F.lit("@"), "commit"),
        )
        if "content_sha" in cols:
            bad = verify_content_sha(docs)
            if bad:
                raise SystemExit(f"content sha256 mismatch on {bad} rows — aborting")
    elif {"doc_id", "text"} <= cols:
        docs = docs.select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
    docs = docs.select("docid", "content")

    fp = _fingerprint(
        args.input,
        f"{args.mode}:{args.stem}:{args.salt_buckets}:{args.content_col}",
    )
    if not args.resume:
        fp = f"{fp}:{int(time.time())}"  # force full rebuild
    t0 = time.time()
    idx = build_and_save_index(
        docs, args.out, fp, mode=args.mode, stem=args.stem,
        salt_buckets=args.salt_buckets, block_size=args.block_size,
        strategy=args.build_strategy,
    )
    wall = time.time() - t0
    n_docs = idx["docid_map"].count()
    n_terms = idx["lexicon"].count()
    from large_scale_hypertextual_search_engine_spark.operators.metrics import (
        index_size_metrics, memory_metrics,
    )

    mem = memory_metrics(spark)
    sizes = index_size_metrics(args.out)
    record_metrics(args.out, fp, [
        {"stage": "index", "key": "n_docs", "value": n_docs},
        {"stage": "index", "key": "n_terms", "value": n_terms},
        {"stage": "index", "key": "wall_s", "value": round(wall, 2)},
        {"stage": "index", "key": "docs_per_sec", "value": round(n_docs / wall, 1)},
        *[{"stage": "index", "key": k, "value": v} for k, v in mem.items()],
        *[{"stage": "index", "key": f"size_{k}", "value": v} for k, v in sizes.items()],
    ])
    print(json.dumps({
        "n_docs": n_docs, "n_terms": n_terms,
        "wall_s": round(wall, 2), "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


def _cli_doc_filter(spark, args):
    """--filter-from/--filter-where -> a docid frame (or None)."""
    if not args.filter_from:
        return None
    from pyspark.sql import functions as F

    doc_filter = spark.read.parquet(args.filter_from)
    if args.filter_where:
        doc_filter = doc_filter.filter(args.filter_where)
    return doc_filter.select(
        F.col(args.filter_id_col).cast("string").alias("docid")
    )


def _search_matchset_consumers(spark, idx, args) -> None:
    """--collapse-from / --sort-from / --sigterms: match-set consumers
    over either a term query or (with --boolean) a boolean match set —
    the boolean_match_docs composition point."""
    import time as _time

    from pyspark.sql import functions as F

    from large_scale_hypertextual_search_engine_spark.analysis.tokenizer import (
        tokenize_compat, tokenize_simple,
    )

    t0 = _time.time()
    if args.boolean:
        from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
            boolean_match_docs,
        )

        if args.analyzer == "simple":
            analyze = tokenize_simple
        else:
            analyze = lambda w: [  # noqa: E731
                t.term for t in tokenize_compat(w, stem=args.stem)
            ]
        match = boolean_match_docs(
            idx, args.query, tf_mode=args.tf_mode, analyze=analyze
        )
    elif args.analyzer == "simple":
        match = tokenize_simple(args.query)
    else:
        match = [t.term for t in tokenize_compat(args.query, stem=args.stem)]

    n_out = 0
    if args.collapse_from:
        from large_scale_hypertextual_search_engine_spark.operators.collapse import (
            search_collapse,
        )

        rows = search_collapse(
            idx, match, spark.read.parquet(args.collapse_from),
            args.collapse_col, top_k=args.top_k,
            group_top_n=args.collapse_top_n, mode=args.mode,
            tf_mode=args.tf_mode,
        ).collect()
        for r in rows:
            print(
                f"{r['group_rank']:3d}.{r['hit_rank']:<2d} "
                f"{r['score']:12.6f}  [{r['group_value']}]  {r['docid']}"
            )
        n_out = len(rows)
    elif args.sort_from:
        from large_scale_hypertextual_search_engine_spark.operators.pagination import (
            search_sorted,
        )

        rows = search_sorted(
            idx, match, spark.read.parquet(args.sort_from), args.sort_col,
            ascending=args.sort_asc, top_k=args.top_k, mode=args.mode,
            tf_mode=args.tf_mode,
        ).collect()
        for r in rows:
            print(
                f"{r['rank']:3d}  {str(r['sort_value']):>12s}  "
                f"{r['score']:12.6f}  {r['docid']}"
            )
        n_out = len(rows)
    else:
        from large_scale_hypertextual_search_engine_spark.operators.sigterms import (
            significant_terms,
        )

        exclude = None
        if args.boolean:
            from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
                _positive_terms, parse_query,
            )

            exclude = sorted(
                _positive_terms(parse_query(args.query, analyze))
            )
        rows = significant_terms(
            idx, match, top_n=args.sigterms_n, mode=args.mode,
            tf_mode=args.tf_mode, exclude=exclude,
        ).collect()
        for r in rows:
            print(
                f"{r['term']:<24s} fg={r['fg_count']:<6d} "
                f"bg={r['bg_count']:<8d} g2={r['score']:.3f}"
            )
        n_out = len(rows)
    wall_ms = round((_time.time() - t0) * 1000, 1)
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        record_metrics,
    )

    record_metrics(args.index, "search", [{
        "stage": "query", "key": "latency_ms", "value": wall_ms,
        "query": args.query,
        "path": (
            "collapse" if args.collapse_from
            else "sorted" if args.sort_from
            else "sigterms"
        ),
        "hits": n_out,
    }])
    print(json.dumps({"latency_ms": wall_ms, "rows": n_out}))
    spark.stop()


def cmd_search(args) -> None:
    from large_scale_hypertextual_search_engine_spark.plans.lineage import load_index
    from large_scale_hypertextual_search_engine_spark.operators.query import search_text
    from large_scale_hypertextual_search_engine_spark.operators.wand import wand_search
    from large_scale_hypertextual_search_engine_spark.analysis.tokenizer import (
        tokenize_compat, tokenize_simple,
    )

    spark = _spark("lshse-search")
    idx = load_index(spark, args.index)
    if args.serve:
        _search_served(spark, idx, args)
        return
    if args.collapse_from or args.sort_from or args.sigterms:
        _search_matchset_consumers(spark, idx, args)
        return
    if args.suggest_from:
        from pyspark.sql import functions as F

        from large_scale_hypertextual_search_engine_spark.operators.lm import (
            suggest_context,
            train_bigram_lm,
        )

        t0 = time.time()
        docs = spark.read.parquet(args.suggest_from).select(
            F.col("docid").cast("string").alias("docid"),
            F.col("content"),
        )
        lm = train_bigram_lm(docs)
        terms = (
            tokenize_simple(args.query)
            if args.analyzer == "simple"
            else [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        )
        rows = suggest_context(
            idx, lm, terms, max_dist=args.suggest_dist
        ).collect()
        corrected = list(terms)
        for r in rows:
            print(
                f"  {r['word']} -> {r['suggestion']} "
                f"(dist {r['dist']}, lm {r['score']:.3f})"
            )
            corrected[r["pos"]] = r["suggestion"]
        print("did you mean: " + " ".join(corrected))
        print(json.dumps({
            "latency_ms": round((time.time() - t0) * 1000, 1),
            "corrections": len(rows),
        }))
        spark.stop()
        return
    t0 = time.time()
    if args.boolean:
        from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
            boolean_search,
        )

        if args.analyzer == "simple":
            analyze = tokenize_simple
        else:
            analyze = lambda w: [  # noqa: E731
                t.term for t in tokenize_compat(w, stem=args.stem)
            ]
        res = boolean_search(
            idx, args.query, top_k=args.top_k, tf_mode=args.tf_mode,
            analyze=analyze,
        )
    elif args.explain:
        from large_scale_hypertextual_search_engine_spark.operators.explain import (
            explain_scores,
        )

        if args.analyzer == "simple":
            terms = tokenize_simple(args.query)
        else:
            terms = [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        rows = explain_scores(
            idx, terms, top_k=args.top_k, mode=args.mode,
            tf_mode=args.tf_mode, doc_filter=_cli_doc_filter(spark, args),
        ).collect()
        wall = time.time() - t0
        last = None
        for r in rows:
            if r["rank"] != last:
                print(f"{r['rank']:3d}  {r['score']:12.6f}  {r['docid']}")
                last = r["rank"]
            print(
                f"      {r['term']:<18s} tf={r['tf']:<4d} df={r['df']:<6d} "
                f"dl={r['doc_len']:.0f} idf={r['idf']:.4f} "
                f"tf_comp={r['tf_comp']:.4f} -> {r['term_score']:.6f}"
            )
        print(json.dumps(
            {"hits": len({r['rank'] for r in rows}),
             "wall_sec": round(wall, 3)}
        ))
        return
    elif args.synonyms:
        from large_scale_hypertextual_search_engine_spark.operators.synonyms import (
            search_synonyms,
        )

        if args.analyzer == "simple":
            analyze = tokenize_simple
        else:
            analyze = lambda w: [  # noqa: E731
                t.term for t in tokenize_compat(w, stem=args.stem)
            ]
        groups = [
            [t for m in g.split("|") for t in analyze(m)]
            for g in args.query.split()
        ]
        res = search_synonyms(
            idx, groups, top_k=args.top_k, mode=args.mode,
            tf_mode=args.tf_mode, doc_filter=_cli_doc_filter(spark, args),
        )
    elif args.near is not None:
        from large_scale_hypertextual_search_engine_spark.operators.phrase import (
            proximity_search,
        )
        from large_scale_hypertextual_search_engine_spark.operators.wand import (
            wand_proximity_search,
        )

        if args.analyzer == "simple":
            terms = tokenize_simple(args.query)
        else:
            terms = [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        if len(terms) != 2:
            raise SystemExit("--near requires exactly two query terms")
        fn = wand_proximity_search if args.wand else proximity_search
        res = fn(
            idx, terms[0], terms[1], slop=args.near,
            ordered=args.near_ordered, top_k=args.top_k, tf_mode=args.tf_mode,
        )
    elif args.phrase:
        from large_scale_hypertextual_search_engine_spark.operators.phrase import (
            phrase_search,
        )
        from large_scale_hypertextual_search_engine_spark.operators.wand import (
            wand_phrase_search,
        )

        if args.analyzer == "simple":
            terms = tokenize_simple(args.query)
        else:
            terms = [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        fn = wand_phrase_search if args.wand else phrase_search
        res = fn(idx, terms, top_k=args.top_k, tf_mode=args.tf_mode)
    elif args.wand:
        if args.analyzer == "simple":
            terms = tokenize_simple(args.query)
        else:
            terms = [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        res = wand_search(
            idx, terms, top_k=args.top_k, tf_mode=args.tf_mode,
            doc_filter=_cli_doc_filter(spark, args),
        )
    else:
        doc_filter = _cli_doc_filter(spark, args)
        if args.rm3_from:
            from pyspark.sql import functions as F

            from large_scale_hypertextual_search_engine_spark.operators.feedback import (
                search_rm3,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            fb_docs = spark.read.parquet(args.rm3_from).select(
                F.col(args.snippet_id_col).cast("string").alias("docid"),
                F.col(args.snippet_text_col).alias("content"),
            )
            res, expanded = search_rm3(
                idx, fb_docs, terms, top_k=args.top_k, fb_k=args.fb_k,
                max_expansions=args.expansions, final_mode=args.mode,
            )
            print(json.dumps({"expanded_query": expanded}))
        elif args.ql:
            from large_scale_hypertextual_search_engine_spark.operators.ranking import (
                search_ql,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            res = search_ql(idx, terms, top_k=args.top_k, mu=args.mu)
        elif args.hybrid_embeddings:
            from pyspark.sql import functions as F

            from large_scale_hypertextual_search_engine_spark.operators.ranking import (
                hybrid_search,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            emb = spark.read.parquet(args.hybrid_embeddings)
            qvec = [
                float(x)
                for x in emb.filter(
                    F.col("vec_id") == args.qvec_id
                ).collect()[0]["embedding"]
            ]
            res = hybrid_search(
                idx, emb, terms, qvec, top_k=args.top_k,
                depth=args.hybrid_depth, k_rrf=args.k_rrf,
            ).withColumnRenamed("rrf", "score")
        elif args.boost_from:
            from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
                search_boosted,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            boosts = spark.read.parquet(args.boost_from)
            if "boost" not in boosts.columns:
                boosts = boosts.withColumnRenamed("rank", "boost")
            if "doc_int" not in boosts.columns and "docid" not in boosts.columns:
                # the `rank` command's output plugs in directly
                boosts = boosts.withColumnRenamed("id", "doc_int")
            res = search_boosted(
                idx, terms, boosts, top_k=args.top_k, mode=args.mode,
                tf_mode=args.tf_mode, weight=args.boost_weight,
            ).drop("bm25")
        elif args.fuzzy:
            from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
                search_fuzzy,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            res, corr = search_fuzzy(
                idx, terms, top_k=args.top_k, mode=args.mode,
                tf_mode=args.tf_mode, max_dist=args.max_dist,
            )
            if corr:
                print(json.dumps({"did_you_mean": corr}))
        elif args.also_index:
            from large_scale_hypertextual_search_engine_spark.operators.federated import (
                search_federated,
            )

            if args.analyzer == "simple":
                terms = tokenize_simple(args.query)
            else:
                terms = [
                    t.term for t in tokenize_compat(args.query, stem=args.stem)
                ]
            segs = [idx] + [load_index(spark, d) for d in args.also_index]
            if args.tiered:
                from large_scale_hypertextual_search_engine_spark.operators.tiered import (
                    tiered_search,
                )

                res, tinfo = tiered_search(
                    segs, terms, top_k=args.top_k, mode=args.mode,
                    tf_mode=args.tf_mode,
                )
                print(json.dumps(tinfo))
            else:
                res = search_federated(
                    segs, terms, top_k=args.top_k, mode=args.mode,
                    tf_mode=args.tf_mode,
                )
        else:
            res = search_text(
                idx, args.query, top_k=args.top_k, mode=args.mode,
                tf_mode=args.tf_mode, analyzer_mode=args.analyzer,
                stem=args.stem, doc_filter=doc_filter,
                min_should_match=args.min_should_match,
            )
    if args.snippets_from:
        from large_scale_hypertextual_search_engine_spark.operators.snippet import (
            best_window_snippets,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(args.snippets_from).select(
            F.col(args.snippet_id_col).cast("string").alias("docid"),
            F.col(args.snippet_text_col).alias("__text"),
        )
        res = best_window_snippets(
            F.broadcast(res).join(docs, "docid"),
            # snippet terms: the query's positive words (boolean mode
            # includes operators in --query; highlight plain words only)
            [w for w in args.query.replace('"', " ").replace("(", " ")
                 .replace(")", " ").split()
             if w.upper() not in ("AND", "OR", "NOT")],
            window=args.snippet_window, text_col="__text",
        ).drop("__text")
    rows = res.collect()
    wall = time.time() - t0
    for r in sorted(rows, key=lambda r: r["rank"]):
        line = f"{r['rank']:3d}  {r['score']:12.6f}  {r['docid']}"
        if args.snippets_from:
            line += f"  | {r['snippet']}"
        print(line)
    if args.facets_from:
        from large_scale_hypertextual_search_engine_spark.operators.facets import (
            search_facets,
        )

        if args.analyzer == "simple":
            fterms = tokenize_simple(args.query)
        else:
            fterms = [
                t.term for t in tokenize_compat(args.query, stem=args.stem)
            ]
        fac = search_facets(
            idx, fterms, spark.read.parquet(args.facets_from),
            args.facet_cols.split(","), mode=args.mode,
            tf_mode=args.tf_mode, top_n=args.facet_top_n,
        ).collect()
        for fr in sorted(fac, key=lambda r: (r["facet"], r["rank"])):
            print(f"  [{fr['facet']}] {fr['value']}: {fr['n_docs']}")
    # the reference's Perfomance-monitor records every query's latency;
    # `stats --index` reads this back (metrics_tail / latency_stats)
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        record_metrics,
    )

    record_metrics(args.index, "search", [{
        "stage": "query", "key": "latency_ms",
        "value": round(wall * 1000, 1),
        "query": args.query,
        "path": (
            "boolean" if args.boolean
            else "near" if args.near is not None
            else "phrase" if args.phrase
            else "wand" if args.wand
            else "exact"
        ),
        "hits": len(rows),
    }])
    print(json.dumps({"latency_ms": round(wall * 1000, 1), "hits": len(rows)}))
    spark.stop()


def _search_served(spark, idx, args) -> None:
    """Warm serving path (operators.serving.SearchServer): collect the
    index stats once, answer the query from the in-memory engine —
    reports both the cold (includes the one posting-fetch Spark job)
    and warm per-query latency."""
    from large_scale_hypertextual_search_engine_spark.analysis.tokenizer import (
        tokenize_compat, tokenize_simple,
    )
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    if args.analyzer == "simple":
        terms = tokenize_simple(args.query)
        analyze = tokenize_simple
    else:
        terms = [t.term for t in tokenize_compat(args.query, stem=args.stem)]
        analyze = lambda w: [  # noqa: E731
            t.term for t in tokenize_compat(w, stem=args.stem)
        ]
    srv = SearchServer(idx)
    if args.boolean:
        run = lambda: srv.search_boolean(  # noqa: E731
            args.query, top_k=args.top_k, tf_mode=args.tf_mode, analyze=analyze
        )
    elif args.phrase:
        run = lambda: srv.search_phrase(  # noqa: E731
            terms, top_k=args.top_k, tf_mode=args.tf_mode
        )
    else:
        run = lambda: srv.search(  # noqa: E731
            terms, top_k=args.top_k, mode=args.mode, tf_mode=args.tf_mode
        )
    t0 = time.time()
    rows = run()
    cold_ms = (time.time() - t0) * 1000
    t0 = time.time()
    for _ in range(10):
        rows = run()
    warm_ms = (time.time() - t0) * 1000 / 10
    for r in rows:
        print(f"{r['rank']:3d}  {r['score']:12.6f}  {r['docid']}")
    print(json.dumps({
        "cold_ms": round(cold_ms, 2), "warm_ms": round(warm_ms, 3),
        "hits": len(rows),
    }))
    spark.stop()


def cmd_export(args) -> None:
    """Emit the reference's on-disk artifact formats from a saved index
    (lexicon.txt / terms_list.txt / docid_map.txt / postings.bin
    [/ forward_index.jsonl]; per-barrel shards with --shard)."""
    from large_scale_hypertextual_search_engine_spark.plans.lineage import load_index
    from large_scale_hypertextual_search_engine_spark.sources.export import (
        export_reference_index,
    )

    spark = _spark("lshse-export")
    idx = load_index(spark, args.index)
    stats = export_reference_index(
        idx, args.out, skip_interval=args.skip_interval,
        shard_by_bucket=args.shard,
    )
    print(json.dumps(stats))
    spark.stop()


def cmd_verify(args) -> None:
    from large_scale_hypertextual_search_engine_spark.sources.corpus import (
        verify_content_sha,
    )

    spark = _spark("lshse-verify")
    docs = spark.read.parquet(args.input)
    bad = verify_content_sha(docs)
    print(json.dumps({"rows": docs.count(), "sha_mismatches": bad}))
    spark.stop()
    if bad:
        raise SystemExit(1)


def cmd_clean(args) -> None:
    """Reference-cleaner analog: extracted TSV or a CORD-19-shaped JSON
    directory -> cleaned.jsonl (the reference's mid-stream artifact;
    readable back by `index --input-format cleaned-jsonl`)."""
    from large_scale_hypertextual_search_engine_spark.sources.cleaner import (
        clean_documents, cleaned_jsonl_sink,
    )

    spark = _spark("lshse-clean")
    if args.format == "tsv":
        from large_scale_hypertextual_search_engine_spark.sources.ingest import (
            read_extracted_tsv,
        )

        extracted = read_extracted_tsv(spark, args.input)
    else:  # cord19 json dir
        from large_scale_hypertextual_search_engine_spark.sources.extractor import (
            extract_dir,
        )

        extracted = extract_dir(spark, args.input)
    cleaned = clean_documents(extracted, stem=args.stem)
    cleaned_jsonl_sink(cleaned, args.out)
    print(json.dumps({"n_docs": cleaned.count(), "out": args.out}))
    spark.stop()


def _index_from_cleaned(spark, args, fp: str):
    """index --input-format cleaned-jsonl: S5 mid-stream restart."""
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index_from_tokens,
    )
    from large_scale_hypertextual_search_engine_spark.sources.cleaner import (
        cleaned_to_tokens,
    )
    from large_scale_hypertextual_search_engine_spark.sources.ingest import (
        read_cleaned_jsonl,
    )

    cleaned, corrupt = read_cleaned_jsonl(spark, args.input)
    n_corrupt = corrupt.count()
    idx = build_and_save_index_from_tokens(
        cleaned_to_tokens(cleaned), args.out, fp,
        salt_buckets=args.salt_buckets, block_size=args.block_size,
    )
    return idx, {"corrupt_lines_skipped": n_corrupt}


def cmd_dedup(args) -> None:
    """Training-data dedup over a parquet corpus: write (or print) the
    duplicate groups / near-dup pairs for the chosen method."""
    from large_scale_hypertextual_search_engine_spark.operators import dedup as D

    spark = _spark("lshse-dedup")
    df = spark.read.parquet(args.input)
    if args.method == "exact":
        out = D.exact_duplicates(df, args.text_col, args.id_col)
    elif args.method == "minhash":
        if args.sigs_in:
            # persisted-signature path: re-dedup without re-shingling
            out = D.minhash_pairs_from_signatures(
                spark.read.parquet(args.sigs_in), args.id_col,
                threshold=args.threshold,
            )
        elif args.sigs_out:
            D.minhash_signatures(df, args.text_col, args.id_col).write.mode(
                "overwrite"
            ).parquet(args.sigs_out)
            out = D.minhash_pairs_from_signatures(
                spark.read.parquet(args.sigs_out), args.id_col,
                threshold=args.threshold,
            )
        else:
            out = D.minhash_lsh_pairs(
                df, args.text_col, args.id_col, threshold=args.threshold
            )
    elif args.method == "simhash":
        out = D.simhash_near_pairs(df, args.text_col, args.id_col)
    elif args.method == "ngram":
        out = D.ngram_jaccard_pairs(
            df, args.text_col, args.id_col, threshold=args.threshold
        )
    else:  # embedding
        out = D.embedding_cosine_pairs(
            df, args.vec_col, args.id_col, threshold=args.threshold
        )
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        rows = out.limit(20).collect()
        for r in rows:
            print(dict(r.asDict()))
        n = out.count()
    print(json.dumps({"method": args.method, "pairs": n, "out": args.out}))
    spark.stop()


def cmd_decontam(args) -> None:
    """Benchmark decontamination: flag (or drop) corpus docs sharing
    >= --min-overlap normalized n-grams with the benchmark set."""
    from large_scale_hypertextual_search_engine_spark.operators.decontam import (
        contamination_report, decontaminate,
    )

    from pyspark.sql import functions as F

    spark = _spark("lshse-decontam")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark)
    kw = dict(
        n=args.ngram, min_overlap=args.min_overlap,
        text_col=args.text_col, id_col=args.id_col,
        benchmark_text_col=args.benchmark_text_col,
    )
    if args.drop:
        out = decontaminate(docs, bench, **kw)
        label = "clean_docs"
    else:
        out = contamination_report(docs, bench, **kw).orderBy(
            F.desc("overlap_grams")
        )
        label = "contaminated_docs"
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        for r in out.limit(20).collect():
            print(dict(r.asDict()))
        n = out.count()
    print(json.dumps({label: n, "ngram": args.ngram, "out": args.out}))
    spark.stop()


def cmd_select(args) -> None:
    """Corpus selection: token-budget best-score prefix and/or
    deterministic stratified sampling over a scored corpus."""
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        sample_stratified, select_by_token_budget,
    )

    spark = _spark("lshse-select")
    df = spark.read.parquet(args.input)
    if args.rates:
        rates = {
            g: float(r)
            for g, r in (kv.split("=") for kv in args.rates.split(","))
        }
        df = sample_stratified(
            df, rates, group_col=args.group_col, id_col=args.id_col,
            default_rate=args.default_rate,
        )
    if args.budget is not None:
        df = select_by_token_budget(
            df, args.budget, score_col=args.score_col,
            token_col=args.token_col, id_col=args.id_col,
        )
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        for r in df.limit(20).collect():
            print(dict(r.asDict()))
        n = df.count()
    print(json.dumps({"selected": n, "out": args.out}))
    spark.stop()


def cmd_tier(args) -> None:
    """Split a corpus by a static prior into a hot tier-1 and a cold
    tier-2 and build+save an index per tier (operators/tiered.py).
    Query them with: search --index <out1> --also-index <out2> --tiered."""
    import math

    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        select_by_token_budget,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index,
    )
    from pyspark.sql import functions as F

    spark = _spark("lshse-tier")
    docs = spark.read.parquet(args.input)
    if {"doc_id", "text"} <= set(docs.columns) and "docid" not in docs.columns:
        docs = docs.withColumn("docid", F.col("doc_id").cast("string")) \
                   .withColumn("content", F.col("text"))
    n = docs.count()
    m = max(1, math.ceil(args.frac * n))
    tier1_ids = select_by_token_budget(
        docs.select("docid", args.prior_col).withColumn("__one", F.lit(1)),
        m, score_col=args.prior_col, token_col="__one", id_col="docid",
    ).select("docid")
    t1 = docs.join(F.broadcast(tier1_ids), "docid", "semi")
    t2 = docs.join(F.broadcast(tier1_ids), "docid", "left_anti")
    fp = _fingerprint(args.input, f"tier:{args.frac}:{args.prior_col}")
    if not args.resume:
        fp = f"{fp}:{int(time.time())}"
    build_and_save_index(t1.select("docid", "content"), args.out1, f"{fp}:1",
                         mode=args.mode, stem=args.stem)
    build_and_save_index(t2.select("docid", "content"), args.out2, f"{fp}:2",
                         mode=args.mode, stem=args.stem)
    print(json.dumps({
        "tier1_docs": t1.count(), "tier2_docs": t2.count(),
        "out1": args.out1, "out2": args.out2,
    }))
    spark.stop()


def cmd_upsert(args) -> None:
    """Upsert a batch of documents: tombstone stale copies in every
    existing segment, build the batch as a new delta segment, print
    the new segment list (operators/updates.py). Serve with:
    search --index <seg1> --also-index <seg2> [<seg3> ...]."""
    from large_scale_hypertextual_search_engine_spark.operators.updates import (
        upsert_docs,
    )
    from pyspark.sql import functions as F

    spark = _spark("lshse-upsert")
    docs = spark.read.parquet(args.input)
    if {"doc_id", "text"} <= set(docs.columns) and "docid" not in docs.columns:
        docs = docs.select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
    info = upsert_docs(
        spark, args.segments, args.delta_out, docs,
        mode=args.mode, stem=args.stem,
    )
    print(json.dumps(info))
    spark.stop()


def cmd_pack(args) -> None:
    """Pack documents into fixed-length training sequences (GPT-style
    concat-and-chunk, operators/selection.py pack_sequences): one output
    row per (doc, sequence it contributes to). Input needs doc_id plus
    either an n_tokens column or a text column (whitespace-tokenized)."""
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        token_count,
    )
    from pyspark.sql import functions as F

    spark = _spark("lshse-pack")
    docs = spark.read.parquet(args.input)
    if "n_tokens" not in docs.columns:
        docs = docs.select(
            "doc_id", token_count(F.col(args.text_col)).cast("long").alias("n_tokens")
        )
    packed = pack_sequences(docs, args.seq_len)
    if args.out:
        packed.write.mode("overwrite").parquet(args.out)
        packed = spark.read.parquet(args.out)
    n_rows = packed.count()
    agg = packed.agg(
        F.max("seq_id").alias("max_seq"), F.sum("n_tok").alias("toks")
    ).collect()[0]
    print(json.dumps({
        "rows": n_rows,
        "sequences": int(agg["max_seq"]) + 1 if agg["max_seq"] is not None else 0,
        "tokens": int(agg["toks"] or 0),
        "seq_len": args.seq_len,
    }))
    spark.stop()


def cmd_ann(args) -> None:
    """ANN over an embeddings table: build a bucket-partitioned index
    (--build, methods lsh|ivf) or query one (--query-id / --query-vec).
    Probes read only the pruned partition directories."""
    from large_scale_hypertextual_search_engine_spark.operators import (
        similarity as S,
    )

    spark = _spark("lshse-ann")
    if args.build:
        df = spark.read.parquet(args.input)
        if args.method == "ivf":
            S.write_ivf_partitioned(
                df, args.index, n_centroids=args.cells, vec_col=args.vec_col
            )
        else:
            S.write_lsh_partitioned(
                df, args.index, n_planes=args.planes, vec_col=args.vec_col
            )
        print(json.dumps({"built": args.index, "method": args.method,
                          "rows": spark.read.parquet(args.index).count()}))
        spark.stop()
        return
    if args.query_id is not None:
        from pyspark.sql import functions as F

        src = spark.read.parquet(args.input)
        qvec = [float(x) for x in src.filter(
            F.col(args.id_col) == args.query_id
        ).collect()[0][args.vec_col]]
    else:
        qvec = [float(x) for x in args.query_vec.split(",")]
    t0 = time.time()
    if args.method == "ivf":
        res = S.ivf_topk(spark, args.index, qvec, k=args.top_k,
                         nprobe=args.nprobe, vec_col=args.vec_col,
                         id_col=args.id_col)
    else:
        res = S.lsh_partitioned_topk(spark, args.index, qvec, k=args.top_k,
                                     n_planes=args.planes, vec_col=args.vec_col,
                                     id_col=args.id_col)
    rows = res.collect()
    for i, r in enumerate(rows, 1):
        print(f"{i:3d}  {r['score']:10.6f}  {r[args.id_col]}")
    print(json.dumps({"latency_ms": round((time.time() - t0) * 1000, 1),
                      "hits": len(rows)}))
    spark.stop()


def cmd_suggest(args) -> None:
    """Autocomplete over a saved index's lexicon.

    One-shot: print top suggestions for --prefix. With --interactive,
    collect the lexicon once into an AutocompleteServer and serve a
    stdin prompt loop warm (microseconds per prefix — the reference's
    <100 ms Auto-complete.hpp target, beaten driver-side)."""
    from large_scale_hypertextual_search_engine_spark.operators.autocomplete import (
        AutocompleteServer,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import load_index

    spark = _spark("lshse-suggest")
    idx = load_index(spark, args.index)
    lex = idx["lexicon"]
    if args.fuzzy:
        from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
            fuzzy_candidates,
        )

        t0 = time.time()
        hits = fuzzy_candidates(
            idx, args.prefix, max_dist=args.max_dist, top_n=args.top_k
        ).collect()
        for r in hits:
            print(f"  d={r['dist']}  {r['tf']:10d}  {r['term']}")
        print(json.dumps({
            "word": args.prefix, "hits": len(hits),
            "latency_ms": round((time.time() - t0) * 1000, 1),
        }))
        spark.stop()
        return
    srv = AutocompleteServer(lex)
    if args.interactive:
        import sys as _sys

        for line in _sys.stdin:
            prefix = line.strip()
            if not prefix:
                continue
            t0 = time.time()
            hits = srv.suggest(prefix, max_suggestions=args.top_k)
            us = (time.time() - t0) * 1e6
            for term, tf in hits:
                print(f"  {tf:10d}  {term}")
            print(json.dumps({"prefix": prefix, "latency_us": round(us, 1)}))
    else:
        t0 = time.time()
        hits = srv.suggest(args.prefix, max_suggestions=args.top_k)
        us = (time.time() - t0) * 1e6
        for term, tf in hits:
            print(f"  {tf:10d}  {term}")
        print(json.dumps({"prefix": args.prefix, "hits": len(hits),
                          "latency_us": round(us, 1)}))
    spark.stop()


def cmd_stats(args) -> None:
    """Index/runtime report: per-table on-disk size, per-stage wall
    times from the lineage metadata, driver RSS + JVM heap — the
    engine's Perfomance-monitor analog."""
    from large_scale_hypertextual_search_engine_spark.operators.metrics import (
        index_size_metrics, memory_metrics,
    )

    out = {"index_size": index_size_metrics(args.index)}
    stages = {}
    root = Path(args.index)
    for meta in sorted(root.glob("*/_stage_meta.json")):
        try:
            stages[meta.parent.name] = json.loads(meta.read_text())
        except (OSError, ValueError):
            pass
    if stages:
        out["stages"] = stages
    metrics_file = root / "metrics.jsonl"
    if metrics_file.exists():
        out["metrics_tail"] = [
            json.loads(line)
            for line in metrics_file.read_text().splitlines()[-10:]
        ]
    out["memory"] = memory_metrics()
    print(json.dumps(out, indent=2))


def cmd_analyze(args) -> None:
    """Corpus statistics: TF-IDF keywords per doc or PMI collocations."""
    from large_scale_hypertextual_search_engine_spark.operators.keywords import (
        collocations, extract_keywords,
    )

    spark = _spark("lshse-analyze")
    docs = spark.read.parquet(args.input)
    if args.what == "keywords":
        res = extract_keywords(
            docs, args.text_col, args.id_col, top_n=args.top_n,
            min_df=args.min_df,
        )
    else:
        res = collocations(
            docs, args.text_col, min_count=args.min_count, top_n=args.top_n
        )
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out, "rows": res.count()}))
    else:
        for r in res.limit(25).collect():
            print("  " + "  ".join(str(v) for v in r))


def cmd_mlt(args) -> None:
    """More-Like-This: docs most similar to --docid (top tf·idf terms
    of the source doc -> OR BM25, source excluded)."""
    from pyspark.sql import functions as F

    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        mlt_terms, more_like_this,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        load_index,
    )

    spark = _spark("lshse-mlt")
    idx = load_index(spark, args.index)
    docs = spark.read.parquet(args.corpus).select(
        F.col(args.id_col).cast("string").alias("docid"),
        F.col(args.text_col).alias("content"),
    )
    t0 = time.time()
    if args.all:
        from large_scale_hypertextual_search_engine_spark.operators.mlt import (
            related_docs,
        )

        res = related_docs(
            idx, docs, top_k=args.top_k, max_terms=args.max_terms,
            min_df=args.min_df, max_df=args.max_df, tf_mode=args.tf_mode,
        )
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
            print(json.dumps({
                "out": args.out, "rows": res.count(),
                "wall_sec": round(time.time() - t0, 3),
            }))
        else:
            for r in res.limit(25).collect():
                print(f"{r['src_docid']}  ->  {r['rank']:2d}  "
                      f"{r['score']:12.6f}  {r['docid']}")
            print(json.dumps({"wall_sec": round(time.time() - t0, 3)}))
        return
    if not args.docid:
        raise SystemExit("mlt: --docid is required (or pass --all)")
    terms = mlt_terms(
        idx, docs, args.docid, max_terms=args.max_terms, min_df=args.min_df
    )
    print(json.dumps({"mlt_terms": terms}))
    res = more_like_this(
        idx, docs, args.docid, top_k=args.top_k, tf_mode=args.tf_mode,
        terms=terms,
    )
    rows = res.collect()
    wall = time.time() - t0
    for r in rows:
        print(f"{r['rank']:3d}  {r['score']:12.6f}  {r['docid']}")
    print(json.dumps({"hits": len(rows), "wall_sec": round(wall, 3)}))


def cmd_search_bm25f(args) -> None:
    """BM25F fielded retrieval over per-field indexes.
    --field name=INDEX_DIR:WEIGHT (repeatable)."""
    from large_scale_hypertextual_search_engine_spark.operators.bm25f import (
        search_bm25f,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        load_index,
    )

    spark = _spark("lshse-bm25f")
    fidx, weights = {}, {}
    for spec in args.field:
        name, rest = spec.split("=", 1)
        d, w = rest.rsplit(":", 1)
        fidx[name] = load_index(spark, d)
        weights[name] = float(w)
    t0 = time.time()
    if args.boolean:
        from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
            fielded_boolean_search,
        )

        res = fielded_boolean_search(
            fidx, weights, args.query, top_k=args.top_k
        ).collect()
    else:
        res = search_bm25f(
            fidx, weights, args.query.lower().split(), top_k=args.top_k,
            mode=args.mode,
        ).collect()
    for r in sorted(res, key=lambda r: r["rank"]):
        print(f"{r['rank']:3d}  {r['score']:12.6f}  {r['docid']}")
    print(json.dumps({
        "latency_ms": round((time.time() - t0) * 1000, 1), "hits": len(res),
    }))
    spark.stop()


def cmd_merge(args) -> None:
    """Merge two saved indexes over disjoint corpora into --out."""
    from large_scale_hypertextual_search_engine_spark.operators.merge_index import (
        merge_indexes,
    )

    spark = _spark("lshse-merge")
    t0 = time.time()
    idx = merge_indexes(spark, args.a, args.b, args.out)
    row = idx["collection_stats"].collect()[0]
    print(
        json.dumps(
            {
                "out": args.out,
                "n_docs": int(row["n_docs"]),
                "n_terms": idx["lexicon"].count(),
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


def cmd_lm(args) -> None:
    """Bigram-LM pipeline: train counts on a corpus (optionally save),
    then score docs (CCNet-style quality filter) and/or complete a
    context — the LM artifact persists like the index."""
    from pyspark.sql import functions as F

    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        complete_next,
        load_lm,
        save_lm,
        score_docs_lm,
        train_bigram_lm,
    )

    if not args.lm and not args.train:
        raise SystemExit("lm: pass --train CORPUS or --lm SAVED_LM")
    if args.out and args.score and args.keep_frac is not None:
        # both branches would write the SAME --out path; the selection
        # write silently clobbered the scoring output (ADVICE r5)
        raise SystemExit(
            "lm: --score and --keep-frac both write --out; run them "
            "separately (or drop --out from one)"
        )
    spark = _spark("lshse-lm")
    t0 = time.time()
    if args.lm:
        lm = load_lm(spark, args.lm)
    else:
        docs = spark.read.parquet(args.train).select(
            F.col(args.id_col).cast("string").alias("docid"),
            F.col(args.text_col).alias("content"),
        )
        lm = train_bigram_lm(docs)
        if args.save:
            save_lm(lm, args.save)
            lm = load_lm(spark, args.save)
    out = {"wall_train_s": round(time.time() - t0, 2)}
    if args.score:
        target = spark.read.parquet(args.score).select(
            F.col(args.id_col).cast("string").alias("docid"),
            F.col(args.text_col).alias("content"),
        )
        scored = score_docs_lm(target, lm, k=args.smooth_k)
        if args.out:
            scored.write.mode("overwrite").parquet(args.out)
            out["out"] = args.out
        stats = scored.agg(
            F.count("*").alias("docs"),
            F.avg("avg_logprob").alias("mean_logprob"),
        ).collect()[0]
        out["scored_docs"] = int(stats["docs"])
        out["mean_logprob"] = (
            round(float(stats["mean_logprob"]), 4)
            if stats["mean_logprob"] is not None else None
        )
    if args.keep_frac is not None:
        from large_scale_hypertextual_search_engine_spark.operators.lm import (
            select_by_quality,
        )

        target = spark.read.parquet(args.score or args.train).select(
            F.col(args.id_col).cast("string").alias("docid"),
            F.col(args.text_col).alias("content"),
        )
        sel = select_by_quality(target, lm, keep_frac=args.keep_frac,
                                k=args.smooth_k)
        if args.out:
            sel.write.mode("overwrite").parquet(args.out)
            out["out"] = args.out
        kept = sel.filter("keep").count()
        out["kept_docs"] = int(kept)
        out["keep_frac"] = args.keep_frac
    if args.complete:
        for r in complete_next(lm, args.complete, top_n=args.top_n).collect():
            print(f"  {args.complete} -> {r['word']}  (c={r['c']}, p={r['prob']:.4f})")
    out["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


def cmd_rank(args) -> None:
    """PageRank over a (src, dst) parquet edge list -> parquet
    (id, rank); prints the top-5 and mass check."""
    from pyspark.sql import functions as F

    from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
        pagerank,
    )

    spark = _spark("lshse-rank")
    edges = spark.read.parquet(args.edges)
    t0 = time.time()
    r = pagerank(
        edges, n_iter=args.iters, damping=args.damping,
        src_col=args.src_col, dst_col=args.dst_col,
    )
    r.write.mode("overwrite").parquet(args.out)
    spark.catalog.refreshByPath(args.out)
    r = spark.read.parquet(args.out)
    top = r.orderBy(F.desc("rank"), F.asc("id")).limit(5).collect()
    mass = r.agg(F.sum("rank")).collect()[0][0]
    print(
        json.dumps(
            {
                "out": args.out,
                "n_nodes": r.count(),
                "mass": round(float(mass), 9),
                "top5": [
                    {"id": row["id"], "rank": round(row["rank"], 9)}
                    for row in top
                ],
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


def cmd_delete(args) -> None:
    """Tombstone documents in a saved index (no rewrite; queries hide
    them immediately). --docid may repeat; --docids-from reads a
    parquet/text file of ids."""
    from large_scale_hypertextual_search_engine_spark.operators.deletes import (
        delete_docs,
    )

    spark = _spark("lshse-delete")
    if args.docids_from:
        if args.docids_from.endswith(".parquet") or Path(
            args.docids_from
        ).is_dir():
            ids = spark.read.parquet(args.docids_from)
        else:
            ids = spark.read.text(args.docids_from).selectExpr(
                "trim(value) as docid"
            )
    else:
        if not args.docid:
            raise SystemExit("pass --docid (repeatable) or --docids-from")
        ids = args.docid
    n = delete_docs(spark, args.index, ids)
    print(json.dumps({"index": args.index, "newly_deleted": n}))


def cmd_compact(args) -> None:
    """Rewrite an index without its tombstoned docs into --out."""
    import time as _t

    from large_scale_hypertextual_search_engine_spark.operators.deletes import (
        compact_index,
    )

    spark = _spark("lshse-compact")
    t0 = _t.time()
    idx = compact_index(spark, args.index, args.out, strategy=args.strategy)
    row = idx["collection_stats"].collect()[0]
    print(
        json.dumps(
            {
                "out": args.out,
                "n_docs": int(row["n_docs"]),
                "avg_dl": round(float(row["avg_dl"]), 3),
                "n_terms": idx["lexicon"].count(),
                "wall_s": round(_t.time() - t0, 2),
            }
        )
    )


def cmd_package(args) -> None:
    """Zip the package for --py-files."""
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    pkg = "large_scale_hypertextual_search_engine_spark"
    out = os.path.join(root, "lshse.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(root, pkg)):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)


def main() -> None:
    ap = argparse.ArgumentParser(prog="run_pipeline.py")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index", help="build (or resume) the full index")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--mode", default="compat", choices=["compat", "simple"])
    p.add_argument("--stem", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--salt-buckets", type=int, default=None)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument(
        "--build-strategy", default="salted",
        choices=["salted", "spimi", "fused"],
        help="salted: single-node default; spimi: token table + narrow "
        "encode; fused: analyze+encode in one pass, no token table "
        "(the cluster-scale path)",
    )
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose checkpoint fingerprint matches")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "cleaned-jsonl"],
                   help="cleaned-jsonl: index a (reference-produced) "
                        "cleaned.jsonl without re-extraction")
    p.add_argument("--content-col", default="content",
                   help="index this column as the document text (build "
                        "one index per field for BM25F)")
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("clean", help="extracted TSV / CORD-19 JSON -> cleaned.jsonl")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="tsv", choices=["tsv", "cord19"])
    p.add_argument("--out", required=True)
    p.add_argument("--stem", action=argparse.BooleanOptionalAction, default=True)
    p.set_defaults(fn=cmd_clean)

    p = sub.add_parser("search", help="BM25 top-k over a saved index")
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--mode", default="and", choices=["and", "or"])
    p.add_argument(
        "--min-should-match", type=int, default=1, metavar="M",
        help="OR mode: require >= M distinct query terms per doc "
             "(Lucene minimumNumberShouldMatch)",
    )
    p.add_argument("--tf-mode", default="true", choices=["true", "compat"])
    p.add_argument("--analyzer", default="compat", choices=["compat", "simple"])
    p.add_argument("--stem", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--wand", action="store_true", help="Block-Max WAND path")
    p.add_argument(
        "--phrase", action="store_true",
        help="quoted-phrase query: terms must be adjacent and in order",
    )
    p.add_argument(
        "--near", type=int, default=None, metavar="SLOP",
        help="proximity query: the two terms within SLOP positions",
    )
    p.add_argument(
        "--near-ordered", action="store_true",
        help="with --near: require the terms in query order",
    )
    p.add_argument(
        "--boolean", action="store_true",
        help='treat --query as a boolean expression: AND/OR/NOT, '
             'parentheses, "quoted phrases" (operators/boolsearch.py)',
    )
    p.add_argument(
        "--tiered", action="store_true",
        help="with --also-index: treat --index as tier 1 and the rest "
             "as lower tiers; consult lower tiers only when the "
             "MaxScore certificate fails (operators/tiered.py)",
    )
    p.add_argument(
        "--serve", action="store_true",
        help="warm in-memory serving path (SearchServer)",
    )
    p.add_argument(
        "--explain", action="store_true",
        help="print the per-term BM25 breakdown (tf/df/dl, idf × "
             "tf-saturation) for each hit (operators/explain.py)",
    )
    p.add_argument(
        "--synonyms", action="store_true",
        help='treat each space-separated --query token as a synonym '
             'group, members |-separated ("spark|sprk join"): group '
             "members score as ONE term — summed tf, max member df "
             "(Lucene SynonymQuery; operators/synonyms.py)",
    )
    p.add_argument(
        "--fuzzy", action="store_true",
        help="rewrite out-of-vocabulary terms to their closest lexicon "
             'term ("did you mean", operators/fuzzy.py)',
    )
    p.add_argument(
        "--max-dist", type=int, default=1,
        help="with --fuzzy: maximum edit distance for a correction",
    )
    p.add_argument(
        "--boost-from", default=None, metavar="PARQUET",
        help="static-prior re-ranking: parquet with (doc_int|docid, "
             "boost) — e.g. the `rank` command's PageRank output "
             "(operators/linkrank.py)",
    )
    p.add_argument(
        "--boost-weight", type=float, default=1.0,
        help="with --boost-from: final = bm25 * (1 + weight * boost)",
    )
    p.add_argument(
        "--facets-from", default=None, metavar="PARQUET",
        help="print facet counts over the match set from this metadata "
             "table (doc_int|docid keyed; operators/facets.py)",
    )
    p.add_argument("--facet-cols", default="lang,source",
                   help="comma-separated facet columns")
    p.add_argument("--facet-top-n", type=int, default=5)
    p.add_argument(
        "--collapse-from", default=None,
        help="parquet with (docid, <collapse-col>): field collapse — "
             "top hits per group, groups ranked by best hit",
    )
    p.add_argument("--collapse-col", default="lang")
    p.add_argument("--collapse-top-n", type=int, default=1,
                   help="hits kept per group")
    p.add_argument(
        "--sort-from", default=None,
        help="parquet with (docid, <sort-col>): order the match set by "
             "a metadata column instead of relevance",
    )
    p.add_argument("--sort-col", default="n_chars")
    p.add_argument("--sort-asc", action="store_true")
    p.add_argument(
        "--sigterms", action="store_true",
        help="print significant terms (Dunning G2) of the match set "
             "instead of hits; composes with --boolean",
    )
    p.add_argument("--sigterms-n", type=int, default=10)
    p.add_argument(
        "--suggest-from", default=None,
        help="corpus parquet (docid, content): context-aware did-you-"
             "mean — OOV terms rescored by a corpus bigram LM",
    )
    p.add_argument("--suggest-dist", type=int, default=2)
    p.add_argument(
        "--rm3-from", default=None, metavar="PARQUET",
        help="pseudo-relevance feedback: expand the query with top "
             "tf-idf terms of the feedback top-k from this corpus table "
             "(operators/feedback.py), then search in --mode",
    )
    p.add_argument("--fb-k", type=int, default=10,
                   help="with --rm3-from: feedback depth")
    p.add_argument("--expansions", type=int, default=2,
                   help="with --rm3-from: number of expansion terms")
    p.add_argument(
        "--ql", action="store_true",
        help="rank by Dirichlet query likelihood instead of BM25",
    )
    p.add_argument("--mu", type=float, default=2000.0,
                   help="with --ql: Dirichlet smoothing mass")
    p.add_argument(
        "--hybrid-embeddings", default=None, metavar="PARQUET",
        help="hybrid retrieval: RRF-fuse BM25 with cosine top-k over "
             "this embeddings table (operators/ranking.py)",
    )
    p.add_argument("--qvec-id", type=int, default=0,
                   help="with --hybrid-embeddings: query vector's vec_id")
    p.add_argument("--hybrid-depth", type=int, default=100)
    p.add_argument("--k-rrf", type=int, default=60)
    p.add_argument(
        "--also-index", action="append", default=None, metavar="DIR",
        help="federated search: query --index PLUS these unmerged "
             "segments (disjoint corpora) as one collection — identical "
             "results to their physical merge (operators/federated.py)",
    )
    p.add_argument(
        "--filter-from", default=None, metavar="PARQUET",
        help="filtered retrieval: restrict results to docids in this "
             "table (exact path only; global stats, ranks recomputed)",
    )
    p.add_argument(
        "--filter-where", default=None, metavar="SQL",
        help="optional predicate applied to --filter-from before use",
    )
    p.add_argument("--filter-id-col", default="docid")
    p.add_argument(
        "--snippets-from", default=None, metavar="PARQUET",
        help="corpus table to pull best-window result snippets from "
             "(raw query words are highlighted; not with --serve)",
    )
    p.add_argument("--snippet-window", type=int, default=10)
    p.add_argument("--snippet-id-col", default="docid")
    p.add_argument("--snippet-text-col", default="content")
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser(
        "export", help="emit reference-format index files from a saved index"
    )
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--skip-interval", type=int, default=128)
    p.add_argument("--shard", action="store_true", help="per-barrel shards")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "mlt", help="documents most similar to one document "
                    "(More-Like-This, operators/mlt.py)",
    )
    p.add_argument("--index", required=True)
    p.add_argument("--corpus", required=True, metavar="PARQUET",
                   help="corpus table holding the source doc's text")
    p.add_argument("--docid", default=None,
                   help="source document (omit with --all)")
    p.add_argument("--all", action="store_true",
                   help="batch mode: related docs for EVERY corpus doc "
                        "in one job (operators/mlt.py related_docs)")
    p.add_argument("--max-df", type=int, default=None,
                   help="with --all: ignore terms in more docs than "
                        "this (Lucene maxDocFreq; the candidate-volume "
                        "scale knob)")
    p.add_argument("--out", default=None, metavar="PARQUET",
                   help="with --all: write results here instead of "
                        "printing a sample")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--max-terms", type=int, default=5,
                   help="number of tf·idf query terms to select")
    p.add_argument("--min-df", type=int, default=2,
                   help="ignore terms in fewer docs (df-1 terms can "
                        "never yield a non-source hit)")
    p.add_argument("--tf-mode", default="true", choices=["true", "compat"])
    p.add_argument("--id-col", default="docid")
    p.add_argument("--text-col", default="content")
    p.set_defaults(fn=cmd_mlt)

    p = sub.add_parser("suggest", help="autocomplete over a saved index")
    p.add_argument("--index", required=True)
    p.add_argument("--prefix", default="")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--interactive", action="store_true",
                   help="warm stdin prompt loop (collected-lexicon server)")
    p.add_argument("--fuzzy", action="store_true",
                   help="treat --prefix as a (possibly misspelled) word: "
                        "edit-distance candidates instead of prefix matches")
    p.add_argument("--max-dist", type=int, default=1,
                   help="with --fuzzy: maximum edit distance")
    p.set_defaults(fn=cmd_suggest)

    p = sub.add_parser("ann", help="approximate nearest neighbors (lsh|ivf)")
    p.add_argument("--input", required=True, help="embeddings parquet")
    p.add_argument("--index", required=True, help="partitioned ANN table path")
    p.add_argument("--method", default="ivf", choices=["lsh", "ivf"])
    p.add_argument("--build", action="store_true")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--cells", type=int, default=64, help="ivf centroids")
    p.add_argument("--planes", type=int, default=8, help="lsh hyperplanes")
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--query-id", type=int, default=None)
    p.add_argument("--query-vec", default=None, help="comma-separated floats")
    p.set_defaults(fn=cmd_ann)

    p = sub.add_parser("dedup", help="exact/near-dup detection over a corpus")
    p.add_argument("--input", required=True)
    p.add_argument("--method", default="minhash",
                   choices=["exact", "minhash", "simhash", "ngram", "embedding"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--out", default=None, help="parquet output (default: print)")
    p.add_argument(
        "--sigs-out", default=None,
        help="minhash: persist the signature table here (then pair from it)",
    )
    p.add_argument(
        "--sigs-in", default=None,
        help="minhash: pair from an existing signature table (skip shingling)",
    )
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser(
        "decontam",
        help="n-gram benchmark decontamination over a parquet corpus",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--benchmark", required=True, metavar="PARQUET",
                   help="eval/benchmark docs to decontaminate against")
    p.add_argument("--ngram", type=int, default=13,
                   help="gram length (Brown et al. 2020 use 13)")
    p.add_argument("--min-overlap", type=int, default=1)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--benchmark-text-col", default=None)
    p.add_argument("--drop", action="store_true",
                   help="write the CLEANED corpus instead of the report")
    p.add_argument("--out", default=None, help="parquet output (default: print)")
    p.set_defaults(fn=cmd_decontam)

    p = sub.add_parser(
        "select",
        help="token-budget / stratified corpus selection",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--budget", type=int, default=None,
                   help="token budget: keep the best-score prefix")
    p.add_argument("--score-col", default="score")
    p.add_argument("--token-col", default="n_tokens")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--rates", default=None, metavar="G=R,G=R",
                   help="stratified sampling rates per group, e.g. en=1.0,de=0.5")
    p.add_argument("--group-col", default="lang")
    p.add_argument("--default-rate", type=float, default=0.0)
    p.add_argument("--out", default=None, help="parquet output (default: print)")
    p.set_defaults(fn=cmd_select)

    p = sub.add_parser(
        "tier",
        help="split a corpus by a static prior and build tiered indexes",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--prior-col", required=True,
                   help="static-prior column (pagerank, quality score)")
    p.add_argument("--frac", type=float, default=0.1,
                   help="fraction of docs in the hot tier")
    p.add_argument("--out1", required=True, help="tier-1 index dir")
    p.add_argument("--out2", required=True, help="tier-2 index dir")
    p.add_argument("--mode", default="compat", choices=["compat", "simple"])
    p.add_argument("--stem", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_tier)

    p = sub.add_parser(
        "upsert",
        help="update/insert docs: tombstone stale copies + new delta segment",
    )
    p.add_argument("--segments", nargs="+", required=True,
                   help="existing segment index dirs (stale copies get "
                        "tombstoned in each)")
    p.add_argument("--delta-out", required=True,
                   help="directory for the new delta segment")
    p.add_argument("--input", required=True,
                   help="parquet batch: (docid, content) or (doc_id, text)")
    p.add_argument("--mode", default="compat", choices=["compat", "simple"])
    p.add_argument("--stem", action=argparse.BooleanOptionalAction, default=True)
    p.set_defaults(fn=cmd_upsert)

    p = sub.add_parser("stats", help="index size / stage wall / memory report")
    p.add_argument("--index", required=True)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("verify", help="per-row sha256 integrity check")
    p.add_argument("--input", required=True)
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser(
        "analyze", help="corpus stats: tf-idf keywords / PMI collocations"
    )
    p.add_argument("what", choices=["keywords", "collocations"])
    p.add_argument("--input", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--top-n", type=int, default=5)
    p.add_argument("--min-df", type=int, default=1)
    p.add_argument("--min-count", type=int, default=5)
    p.add_argument("--out", default=None, help="write parquet instead of print")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser(
        "search-bm25f", help="BM25F fielded retrieval over per-field indexes"
    )
    p.add_argument("--field", action="append", required=True,
                   metavar="NAME=DIR:WEIGHT")
    p.add_argument("--query", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--mode", default="and", choices=["and", "or"])
    p.add_argument(
        "--boolean", action="store_true",
        help='treat --query as a fielded boolean expression: '
        'title:foo AND body:"bar baz" NOT qux (BM25F scoring)',
    )
    p.set_defaults(fn=cmd_search_bm25f)

    p = sub.add_parser(
        "merge", help="merge two saved indexes (disjoint corpora)"
    )
    p.add_argument("--a", required=True, help="first index dir")
    p.add_argument("--b", required=True, help="second index dir")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_merge)

    p = sub.add_parser("rank", help="PageRank over a parquet edge list")
    p.add_argument("--edges", required=True, help="parquet with (src, dst)")
    p.add_argument("--out", required=True)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--src-col", default="src")
    p.add_argument("--dst-col", default="dst")
    p.set_defaults(fn=cmd_rank)

    p = sub.add_parser("delete", help="tombstone documents in a saved index")
    p.add_argument("--index", required=True)
    p.add_argument("--docid", action="append", help="external docid (repeatable)")
    p.add_argument("--docids-from", help="parquet dir or text file of docids")
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser(
        "compact", help="rewrite an index without its tombstoned docs"
    )
    p.add_argument(
        "--strategy", default="auto", choices=["auto", "closure", "cogroup"],
        help="closure = no-shuffle small-delete path; cogroup = "
        "docid-range sharded path for huge tombstone sets"
    )
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser(
        "pack", help="pack docs into fixed-length training sequences"
    )
    p.add_argument("--input", required=True, help="parquet with doc_id + text|n_tokens")
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--text-col", default="text")
    p.add_argument("--out", help="optional parquet output dir")
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser(
        "lm", help="bigram LM: train/save counts, score docs, complete"
    )
    p.add_argument("--train", help="corpus parquet to train on")
    p.add_argument("--lm", help="load a saved model instead of training")
    p.add_argument("--save", help="persist the trained model here")
    p.add_argument("--score", help="corpus parquet to quality-score")
    p.add_argument("--out", help="parquet output for scores")
    p.add_argument("--complete", help="context string for next-word top-n")
    p.add_argument("--top-n", type=int, default=10)
    p.add_argument("--smooth-k", type=float, default=1.0)
    p.add_argument("--keep-frac", type=float, default=None,
                   help="CCNet head cut: keep the best fraction by LM "
                        "score (writes keep flags to --out)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.set_defaults(fn=cmd_lm)

    p = sub.add_parser("package", help="build lshse.zip for --py-files")
    p.set_defaults(fn=cmd_package)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Production entrypoint: full training-data curation pass over a pages
corpus — the pipeline a 100-TB pretraining-data build runs, composed
from the library's scale-shaped operators:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/filter_corpus.py \\
        --input /path/to/pages_parquet --output /path/to/curated \\
        [--format parquet|iceberg] [--eval /path/to/eval_parquet] \\
        [--blocklist host1,host2,...] [--per-host-cap N] \\
        [--min-tokens 20] [--no-dedup] [--paragraph-dedup] \\
        [--length-band 0.02,0.98] [--decontam-max-frac 0.1] \\
        [--url-rules] [--split-fractions train=0.9,val=0.05,test=0.05] \\
        [--sentence-dedup] [--mirror-report 20] \\
        [--quarantine] [--max-text-len N] \\
        [--report /path/report.json]

Stage order is chosen so the cheapest filters run first and every
expensive stage sees the smallest surviving corpus:

1. **Quality filter** (zero-shuffle scan): C4/Gopher rule stack
   (textstats.quality_filter) — drops are counted per reason.
2. **PII scrub** (zero-shuffle scan): redact emails/IPs/phones in
   place (operators/redact.py) BEFORE any digest is computed, so
   dedup keys are over the redacted text.
3. **Host blocklist + per-host budget** (when a ``url`` column
   exists): broadcast anti-join + salted capped per-host sampling
   (operators/hoststats.py).
4. **Exact + MinHash-LSH near-dup dedup** (operators/dedup.py,
   cc survivor selection) unless ``--no-dedup``.
5. **Eval-set decontamination** (when ``--eval`` given): Bloom-gated
   13-gram contamination check (operators/decontaminate.py), dropping
   contaminated docs.
6. Write survivors + a one-line JSON report with per-stage counts
   (the observability a multi-day corpus build needs to audit where
   documents went).

Every stage is restartable from its parquet output; for very large
corpora run stages as separate jobs sharing this module's helpers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os
# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; spark-submit deployments supply it via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def curate(spark, pages, *, min_tokens=20, blocklist=None,
           per_host_cap=None, dedup=True, near_dedup=True, eval_df=None,
           decontam_n=13, decontam_max_frac=None, paragraph_dedup=False,
           sentence_dedup=False, length_band=None, url_rules=False,
           split_fractions=None, mirror_report=None,
           dsir_target=None, dsir_min_weight=None, dsir_buckets=10_000,
           id_col="doc_id", text_col="text", url_col="url"):
    """Run the curation pipeline; returns (survivors_df, report_dict).

    ``pages`` must carry ``id_col`` + ``text_col``; host stages apply
    only when ``url_col`` exists.  Pure function of its inputs —
    jobs and tests share it.  ``near_dedup=False`` keeps the exact
    digest dedup but skips the MinHash-LSH pass (the one stage a SQL
    oracle cannot express — the driver's ``filter_corpus_stages``
    certificate runs this configuration; the full pipeline including
    MinHash is gated by pytest).

    Optional stages (default off, keeping the certified baseline
    configuration byte-stable):

    - ``length_band=(q_lo, q_hi)``: sketch-gated token-count trim
      (``quantile_gate`` on the whitespace token count, per ``lang``
      when the column exists) right after the rule-based quality
      filter — the Gopher length cut without a per-group sort.
    - ``paragraph_dedup=True``: CCNet keep-first paragraph dedup
      (``dedup_paragraphs``) before the document-level dedups; the
      doc's text is REPLACED by its surviving paragraphs (so digests
      and MinHash run over boilerplate-free text) and docs left empty
      are dropped.
    - ``decontam_max_frac=f``: use the overlap-fraction policy
      (``decontaminate_overlap_keep``) instead of the exact
      ``min_hits=1`` rule — drop only docs whose contaminated-gram
      fraction reaches ``f``.
    - ``url_rules=True``: URL hygiene pre-filter (``filter_urls``,
      RefinedWeb-style extension/spam/IP/query/depth rules) as stage
      0 — the cheapest cut runs first, before any text is touched.
    - ``sentence_dedup=True``: C4-lineage sentence-level keep-first cut
      (``dedup.dedup_sentences``) after the paragraph stage — repeated
      disclaimers whose surrounding paragraph differs still dedup;
      emptied docs drop.
    - ``mirror_report=k``: embed the top-``k`` mirror-host pairs
      (``hoststats.mirror_host_pairs``) in the report — observability
      only, no rows dropped; runs on the post-quality corpus.
    - ``split_fractions={label: frac}``: stamp a leakage-safe
      ``split`` column on the survivors (``host_split`` keyed on the
      URL host — zero extra shuffle, pure projection), so the written
      corpus partitions into train/val/test with whole hosts intact.

    Each counted stage is persisted before its ``count()`` and the
    previous stage's cache released, so the per-stage report costs one
    pipeline execution total instead of re-running every upstream
    filter/dedup per count (at corpus scale the MinHash-LSH shuffle
    alone makes recomputation a multi-hour tax).  The final survivors
    frame is left persisted for the caller's write.
    """
    from pyspark.sql import functions as F
    from gopie_spark.operators.decontaminate import decontaminate_keep
    from gopie_spark.operators.dedup import (exact_dedup,
                                             lsh_preflight_report,
                                             minhash_lsh_dedup,
                                             minhash_signature_table)
    from gopie_spark.operators.hoststats import (filter_blocklist,
                                                 host_budget_sample)
    from gopie_spark.operators.redact import scrub
    from gopie_spark.operators.textstats import (QUALITY_FILTER_FLAGS,
                                                 quality_filter)

    prev_cached = None

    def _stage(df, key):
        # persist → count → drop the previous stage's cache; returns
        # the persisted frame so downstream stages read cached blocks
        nonlocal prev_cached
        df = df.persist()
        report[key] = df.count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = df
        return df

    report = {"input_rows": pages.count()}

    # 0. URL hygiene rules: the cheapest filter runs first (pure
    # regexp scan over the url column — no text touched, no shuffle)
    if url_rules and url_col in pages.columns:
        from gopie_spark.operators.hoststats import filter_urls
        pages = _stage(filter_urls(pages, url_col), "after_url_rules")

    # 1. quality filter (+ per-reason drop counts in one extra agg)
    flagged = quality_filter(pages, text_col, min_tokens=min_tokens)
    reason_row = flagged.agg(
        *[F.sum(F.when(F.col(f"flag_{nm}"), 1).otherwise(0))
          .alias(nm) for nm in QUALITY_FILTER_FLAGS]).collect()[0]
    report["quality_drop_reasons"] = {nm: int(reason_row[nm] or 0)
                                      for nm in QUALITY_FILTER_FLAGS}
    kept = flagged.filter(F.col("keep")).select(pages.columns)

    # 2. PII scrub (before digests, so dedup keys see redacted text);
    # counted together with stage 1 — both are zero-shuffle scans
    kept = _stage(scrub(kept, text_col), "after_quality")

    # 2b. sketch-gated token-count band (one mergeable t-digest pass +
    # a broadcast threshold join — never a per-group sort)
    if length_band is not None:
        from gopie_spark.operators.sketch_agg import quantile_gate
        from gopie_spark.operators.textstats import token_count
        q_lo, q_hi = length_band
        gate_keys = ["lang"] if "lang" in kept.columns else []
        banded = quantile_gate(
            kept.withColumn("_n_tok", token_count(text_col)),
            "_n_tok", keys=gate_keys, q_lo=q_lo, q_hi=q_hi)
        kept = _stage(banded.select(kept.columns), "after_length_band")

    # 3. host blocklist + budget
    if url_col in kept.columns:
        if blocklist:
            kept = _stage(filter_blocklist(kept, blocklist, url_col),
                          "after_blocklist")
        if per_host_cap:
            kept = _stage(host_budget_sample(kept, per_host_cap,
                                             url_col=url_col,
                                             id_col=id_col),
                          "after_host_budget")

    # 3a'. mirror observability: top-k host pairs sharing exact-dup
    # docs (digest-blocked, capped — never |hosts|^2); report-only
    if mirror_report and url_col in kept.columns:
        from gopie_spark.operators.hoststats import mirror_host_pairs
        report["mirror_pairs"] = [
            {"host_a": r["host_a"], "host_b": r["host_b"],
             "n_shared": r["n_shared"],
             "overlap": round(r["overlap"], 4)}
            for r in (mirror_host_pairs(kept, url_col=url_col,
                                        text_col=text_col,
                                        # report-only: permissive
                                        # thresholds, top-k by overlap
                                        min_shared=2, min_overlap=0.0)
                      .orderBy(F.desc("overlap"), F.desc("n_shared"),
                               "host_a", "host_b")
                      .limit(int(mirror_report)).collect())]

    # 3b. CCNet paragraph dedup: replace each doc's text with its
    # corpus-wide-first paragraphs so the document-level dedups (and
    # their digests) see boilerplate-free text; emptied docs drop
    if paragraph_dedup:
        from gopie_spark.operators.dedup import dedup_paragraphs
        pd_out = dedup_paragraphs(kept, id_col=id_col, text_col=text_col,
                                  out_col="_para_clean")
        kept = _stage(
            pd_out.filter(F.col("n_paras_kept") > 0)
            .withColumn(text_col, F.col("_para_clean"))
            .select(kept.columns),
            "after_paragraph_dedup")

    # 3c. sentence-level keep-first cut (after paragraphs: coarser
    # units first, then the finer sentence pass over what remains)
    if sentence_dedup:
        from gopie_spark.operators.dedup import dedup_sentences
        sd_out = dedup_sentences(kept, id_col=id_col, text_col=text_col,
                                 out_col="_sent_clean")
        kept = _stage(
            sd_out.filter(F.col("n_sents_kept") > 0)
            .withColumn(text_col, F.col("_sent_clean"))
            .select(kept.columns),
            "after_sentence_dedup")

    # 4. dedup: exact digest, then MinHash-LSH near-dup (cc survivors)
    if dedup:
        kept = _stage(exact_dedup(kept, text_col=text_col,
                                  id_col=id_col), "after_exact_dedup")
        if near_dedup:
            # signature table built once: the pre-flight skew report
            # (embedded in the job's accounting — shows whether the
            # default bucket cap is costing recall BEFORE the pair
            # expansion runs) and the expansion share it
            sigs = minhash_signature_table(kept, id_col=id_col,
                                           text_col=text_col)
            report["lsh_preflight"] = lsh_preflight_report(sigs)
            kept = _stage(minhash_lsh_dedup(kept, id_col=id_col,
                                            text_col=text_col,
                                            strategy="cc", sigs=sigs),
                          "after_near_dedup")
            sigs.unpersist()  # stage count materialized the pairs

    # 5. decontamination against the eval set (13-gram GPT-3-style
    # overlap by default, tunable via decontam_n)
    if eval_df is not None:
        if decontam_max_frac is not None:
            from gopie_spark.operators.decontaminate import \
                decontaminate_overlap_keep
            survivors = decontaminate_overlap_keep(
                kept, eval_df, max_frac=decontam_max_frac,
                id_col=id_col, text_col=text_col, n=decontam_n)
        else:
            survivors = decontaminate_keep(kept, eval_df, id_col=id_col,
                                           text_col=text_col,
                                           n=decontam_n)
        kept = _stage(survivors, "after_decontaminate")

    # 5b. DSIR domain selection on the survivors (last content cut:
    # score what survived cleaning, not what dedup will drop anyway).
    # ``dsir_target`` is a SQL boolean expr naming the target subset
    # (e.g. "lang = 'en'"); every survivor gets a ``dsir_logweight``
    # column (for downstream importance resampling); with
    # ``dsir_min_weight`` set the stage also cuts below-threshold docs
    # and is counted.  One partial-aggregable histogram pass + a
    # zero-shuffle scoring scan (operators/dsir.py).
    if dsir_min_weight is not None and dsir_target is None:
        raise SystemExit("--dsir-min-weight requires --dsir-target "
                         "(no weights to threshold otherwise)")
    if dsir_target is not None:
        from gopie_spark.operators.dsir import dsir_weights_within
        kept = dsir_weights_within(kept, F.expr(dsir_target),
                                   text_col=text_col,
                                   n_buckets=dsir_buckets)
        if dsir_min_weight is not None:
            kept = _stage(
                kept.filter(F.col("dsir_logweight") >= dsir_min_weight),
                "after_dsir")

    report["output_rows"] = report[
        [k for k in ("after_dsir", "after_decontaminate",
                     "after_near_dedup",
                     "after_exact_dedup", "after_sentence_dedup",
                     "after_paragraph_dedup",
                     "after_host_budget", "after_blocklist",
                     "after_length_band", "after_quality",
                     "after_url_rules")
         if k in report][0]]

    # 6. leakage-safe split stamp (pure projection on the survivors —
    # report counts per split so the build audit shows the realized mass)
    if split_fractions and url_col in kept.columns:
        from gopie_spark.operators.hoststats import extract_host
        from gopie_spark.operators.split import assign_split
        kept = _stage(
            assign_split(kept.withColumn("_host", extract_host(url_col)),
                         split_fractions, unit_col="_host")
            .drop("_host"),
            "with_split")
        report["split_rows"] = {
            r["split"]: r["count"]
            for r in kept.groupBy("split").count().collect()}
    return kept, report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--eval", default=None,
                    help="eval/benchmark parquet to decontaminate against")
    ap.add_argument("--blocklist", default=None,
                    help="comma-separated blocked hosts")
    ap.add_argument("--per-host-cap", type=int, default=None)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="CCNet keep-first paragraph dedup before the "
                         "document-level dedups")
    ap.add_argument("--length-band", default=None,
                    help="q_lo,q_hi token-count quantile band, e.g. "
                         "0.02,0.98 (sketch-gated per-lang trim)")
    ap.add_argument("--decontam-max-frac", type=float, default=None,
                    help="overlap-fraction decontamination threshold "
                         "(default: exact min-hits=1 policy)")
    ap.add_argument("--url-rules", action="store_true",
                    help="URL hygiene pre-filter (extension/spam/IP/"
                         "query/depth rules) as stage 0")
    ap.add_argument("--sentence-dedup", action="store_true",
                    help="sentence-level keep-first cut after the "
                         "paragraph stage")
    ap.add_argument("--mirror-report", type=int, default=None,
                    help="embed the top-K mirror-host pairs in the "
                         "report (observability only)")
    ap.add_argument("--split-fractions", default=None,
                    help="stamp a leakage-safe host-keyed split column, "
                         "e.g. train=0.9,val=0.05,test=0.05")
    ap.add_argument("--dsir-target", default=None,
                    help="SQL boolean expr naming the DSIR target "
                         "subset (e.g. \"lang = 'en'\"); survivors get "
                         "a dsir_logweight column")
    ap.add_argument("--dsir-min-weight", type=float, default=None,
                    help="cut survivors below this DSIR log-weight "
                         "(counted stage; requires --dsir-target)")
    ap.add_argument("--report", default=None)
    ap.add_argument("--card", default=None,
                    help="also write the survivors' corpus card "
                         "(jobs/corpus_report.py) to this JSON path")
    ap.add_argument("--quarantine", action="store_true",
                    help="split contract-violating rows (null/empty "
                         "url, null text, oversize text with "
                         "--max-text-len) off BEFORE any stage, persist "
                         "them with reasons to <output>.quarantine, and "
                         "report per-reason counts — a dirty crawl "
                         "otherwise feeds null digests and null hosts "
                         "into the stages (sources/quality.py)")
    ap.add_argument("--max-text-len", type=int, default=None,
                    help="with --quarantine: also quarantine rows whose "
                         "text exceeds this many characters")
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-filter-corpus")
    t0 = time.perf_counter()
    pages = load_table(spark, args.input, args.format)
    quarantined = None
    if args.quarantine:
        # stage -1: contract violators never reach the stages — a null
        # text would otherwise ride the quality filter's null flags and
        # a null url would hash to a null host.  Persisted once with
        # reasons; survivors proceed.  (exact_dedup is additionally
        # null-safe on its own — defense in depth, not a substitute.)
        from pyspark.sql import functions as F
        from gopie_spark.sources.quality import split_quarantine
        qurl = args.url_col if args.url_col in pages.columns else None
        pages, bad = split_quarantine(pages, url_col=qurl,
                                      text_col=args.text_col,
                                      max_text_len=args.max_text_len)
        qdir = args.output.rstrip("/") + ".quarantine"
        bad.write.mode("overwrite").parquet(qdir)
        quarantined = {
            r["_reason"]: r["n"]
            for r in spark.read.parquet(qdir).groupBy("_reason")
            .agg(F.count("*").alias("n")).collect()}
    eval_df = load_table(spark, args.eval, args.format) if args.eval \
        else None
    band = None
    if args.length_band:
        lo, hi = args.length_band.split(",")
        band = (float(lo), float(hi))
    fractions = None
    if args.split_fractions:
        fractions = {lab: float(fr) for lab, fr in
                     (part.split("=") for part in
                      args.split_fractions.split(","))}
    survivors, report = curate(
        spark, pages, min_tokens=args.min_tokens,
        blocklist=args.blocklist.split(",") if args.blocklist else None,
        per_host_cap=args.per_host_cap, dedup=not args.no_dedup,
        eval_df=eval_df, decontam_max_frac=args.decontam_max_frac,
        paragraph_dedup=args.paragraph_dedup, length_band=band,
        sentence_dedup=args.sentence_dedup,
        mirror_report=args.mirror_report,
        url_rules=args.url_rules, split_fractions=fractions,
        dsir_target=args.dsir_target,
        dsir_min_weight=args.dsir_min_weight,
        id_col=args.id_col, text_col=args.text_col,
        url_col=args.url_col)
    survivors.write.mode("overwrite").parquet(args.output)
    if args.card:
        # sibling job module (script dir is on sys.path when run as a
        # script; ensure it for spark-submit deployments too)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from corpus_report import corpus_card
        card = corpus_card(spark, survivors, text_col=args.text_col,
                           url_col=args.url_col)
        with open(args.card, "w") as fh:
            fh.write(json.dumps(card) + "\n")
    if quarantined is not None:
        report["quarantined"] = quarantined
    report["wall_sec"] = round(time.perf_counter() - t0, 2)
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

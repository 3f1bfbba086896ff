"""End-to-end training-data curation: the composed pipeline every
LLM-corpus build runs over crawled text, as one declarative dataflow.

Stages (all existing operators, composed — nothing here adds new
semantics, which is the point: the pipeline is a Catalyst plan, not a
driver script):

1. language gate   — ``textstats.lang_id_expr`` (native n-gram heuristic)
2. quality gate    — ``textstats.quality_score_expr`` ≥ threshold
3. exact dedup     — ``dedup.exact_dedup`` keep-min-id over the md5 of
                     normalized text (one shuffle on the hash)
4. near-dup dedup  — MinHash band blocking → Jaccard verify →
                     connected components → ``dedup.keep_canonical``
                     (left-anti against the non-canonical id set)

Scale shape: stages 1-2 are scan-local filters (pushed into the parquet
read), stage 3 shuffles (hash, id) scalars only, stage 4 never compares
beyond band collisions — the corpus' wide text column is shuffled exactly
once (the minhash explode reads it in place; survivors are selected by
anti-joins on ids). ``report=True`` also returns per-stage row counts for
yield accounting (the number every corpus build is asked for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from .textstats import lang_id_expr, quality_score_expr, top_ngram_char_frac_expr


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    neardup_threshold: float = 0.5,
    max_top2gram_frac: float | None = None,
    eval_docs: DataFrame | None = None,
    max_contam_frac: float = 0.0,
    lang_gate: str = "vote",
    quality_gate: str = "score",
    classifier_weights: list[float] | None = None,
    classifier_threshold: float = 0.0,
) -> DataFrame:
    """→ the curated subset of ``docs`` (original columns), surviving all
    gates. Deterministic: every keep/drop decision is min-id-wins.

    Optional stages (each off by default, preserving the four-stage
    pipeline): ``max_top2gram_frac`` folds the Gopher repetition gate into
    the scan-local stage-1 filter; ``eval_docs`` adds an n-gram
    decontamination gate after the cheap gates — documents whose distinct
    5-gram overlap fraction with the (broadcast) eval set exceeds
    ``max_contam_frac`` are dropped before any dedup work sees them.
    ``lang_gate`` picks the stage-1 language classifier: ``"vote"`` (the
    frozen stopword vote — the catalog/oracle default) or ``"ngram"``
    (``langid.langid_ngram_expr``, the hashed char-trigram NB kernel —
    r5; fires on sub-word evidence the exact-token vote misses, same
    scan-local no-shuffle shape). ``quality_gate`` picks the stage-1
    quality filter: ``"score"`` (the heuristic ``quality_score_expr >=
    min_quality`` — the default) or ``"classifier"`` (r5g: the hashed
    n-gram linear model as ONE scan-local boolean expression,
    ``classifier.classifier_keep_expr`` with ``classifier_weights`` /
    ``classifier_threshold`` — the CCNet/DCLM-style model-based filter;
    ``min_quality`` is ignored in this mode and the gate stays
    zero-shuffle, exactly like the heuristic)."""
    if lang_gate == "ngram":
        from .langid import langid_ngram_expr as _lang_expr
    elif lang_gate == "vote":
        _lang_expr = lang_id_expr
    else:
        raise ValueError(f"lang_gate must be 'vote' or 'ngram', got {lang_gate!r}")
    if quality_gate == "classifier":
        if classifier_weights is None:
            raise ValueError("quality_gate='classifier' needs classifier_weights")
        from .classifier import classifier_keep_expr

        _quality_pred = classifier_keep_expr(
            F.col(text_col), classifier_weights, classifier_threshold
        )
    elif quality_gate == "score":
        _quality_pred = quality_score_expr(F.col(text_col)) >= min_quality
    else:
        raise ValueError(
            f"quality_gate must be 'score' or 'classifier', got {quality_gate!r}"
        )
    stage1 = _lang_expr(F.col(text_col)).isin(*languages) & _quality_pred
    if max_top2gram_frac is not None:
        # rounded like the audit query so gate and oracle agree at ties
        stage1 = stage1 & (
            F.round(top_ngram_char_frac_expr(F.col(text_col), 2), 6)
            < max_top2gram_frac
        )
    # materialize the gate ONCE: `gated` fans out to decontamination,
    # exact dedup, the survivor semi-join and (via uniq) the minhash +
    # canonical-keep stages, and Catalyst's projection collapse would
    # otherwise re-evaluate the string-heavy stage-1 exprs per consumer
    # (the measured 3-4× gotcha from the minhash/embedding benchmarks —
    # here it multiplies the WHOLE gate scan). Same lineage-truncation
    # role as the per-round checkpoint in the crawl loop.
    gated = docs.where(stage1).localCheckpoint()
    if eval_docs is not None:
        contaminated = (
            dedup.decontaminate(
                gated, eval_docs, text_col=text_col, id_col=id_col
            )
            .where(F.col("contam_frac") > max_contam_frac)
            .select(id_col)
        )
        # materialize (r5): this anti-join feeds exact dedup AND the
        # survivor semi-join below — unchecked, the whole decontam gram
        # join re-executes per consumer
        gated = gated.join(contaminated, id_col, "left_anti").localCheckpoint()
    exact_keep = dedup.exact_dedup(gated, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # materialize (r5): uniq fans out to the minhash pair join and the
    # canonical-keep anti-join — the exact-dedup chain would otherwise run
    # once per consumer (measured: the warm composed v2 pipeline dropped
    # 14.7 → ~8 s with these two checkpoints)
    uniq = gated.join(exact_keep, id_col, "left_semi").localCheckpoint()
    pairs = dedup.minhash_neardup_pairs(
        uniq, threshold=neardup_threshold, id_col=id_col, text_col=text_col
    )
    comps = dedup.connected_components(pairs)
    return dedup.keep_canonical(uniq, comps, id_col=id_col)


def curation_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    neardup_threshold: float = 0.5,
) -> dict:
    """Per-stage yield counts (input → language+quality → exact-dedup →
    near-dup-canonical). Four actions over progressively smaller tables —
    run it on a sample in production, the full corpus in tests."""
    out = {"input": docs.count()}
    gated = docs.where(
        lang_id_expr(F.col(text_col)).isin(*languages)
        & (quality_score_expr(F.col(text_col)) >= min_quality)
    )
    out["gated"] = gated.count()
    exact_keep = dedup.exact_dedup(gated, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    uniq = gated.join(exact_keep, id_col, "left_semi")
    out["exact_unique"] = uniq.count()
    pairs = dedup.minhash_neardup_pairs(
        uniq, threshold=neardup_threshold, id_col=id_col, text_col=text_col
    )
    comps = dedup.connected_components(pairs)
    out["curated"] = dedup.keep_canonical(uniq, comps, id_col=id_col).count()
    return out

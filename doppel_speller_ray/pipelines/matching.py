"""Reference-compat title-matching pipeline (SURVEY.md §3.1 flagship, compat
mode): reproduces the output contract of the reference's
``generate-predictions`` (``/root/reference/doppelspeller/predict.py:256-272``)
— one row per test_index, matched ``title_id`` or −1, sorted by test_index —
as a streaming Ray Data pipeline with the truth side broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig, MatchConfig
from ..stages.matcher import MatcherActor
from ..stages.prepare import prepare_batch


def _prepare(ds, cfg: MatchConfig, id_col: str, text_col: str,
             min_blocks: int | None = None):
    # reference parity: 255-char cap + '0'-padding (settings.py:67-68)
    dcfg = DedupConfig(max_chars=cfg.max_chars, n_grams=cfg.n_grams, seed=cfg.seed)
    if min_blocks:
        # in-memory tables (from_arrow) and single CSVs arrive as ONE block
        # → one map task → one actor does all the work; split first
        ds = ds.repartition(min_blocks)
    out = ds.map_batches(
        prepare_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
        fn_kwargs={"cfg": dcfg, "id_col": id_col, "text_col": text_col},
    )
    return out


def collect_truth_table(truth_ds, cfg: MatchConfig,
                        id_col: str = "title_id", text_col: str = "title") -> pa.Table:
    """Prepare + collect the truth side into one Arrow table (broadcast
    side — the reference holds the whole truth DB in heap too; beyond a few
    GB the dedup pipeline's shuffle join is the right tool instead)."""
    import ray

    from ..util import default_task_partitions

    prepared = _prepare(truth_ds, cfg, id_col, text_col,
                        min_blocks=default_task_partitions())
    tables = ray.get(prepared.to_arrow_refs())
    tbl = pa.concat_tables(tables)
    return tbl.rename_columns(
        ["title_id" if c == "doc_id" else c for c in tbl.column_names]
    )


def match_pipeline(test_ds, truth_ds, cfg: MatchConfig = MatchConfig(), *,
                   test_id_col: str = "test_index", test_text_col: str = "title",
                   truth_id_col: str = "title_id", truth_text_col: str = "title",
                   model=None, model_top_k: int = 10,
                   emit_features: bool = False, abstainer=None):
    """Returns Dataset (test_index, title_id, prediction, lev_best, p_margin, tier)
    sorted by test_index; title_id = −1 where no match (predict.py:256-272).

    ``model``: optional tier-3 pair verifier (any object with
    predict_proba, e.g. stages.pair_model.LogisticPairModel) — broadcast
    once, loaded per actor in __init__ (the reference unpickles its
    XGBoost booster the same way, predict.py:79-82).
    """
    import ray

    truth_table = collect_truth_table(truth_ds, cfg, truth_id_col, truth_text_col)
    ref = ray.put(truth_table)
    model_ref = ray.put(model) if model is not None else None
    # learned abstainer (tools/train_abstainer.py artifact dict): broadcast
    # once like the pair model; replaces the tier-3 threshold axes
    ab_ref = ray.put(abstainer) if abstainer is not None else None

    queries = _prepare(test_ds, cfg, test_id_col, test_text_col,
                       min_blocks=cfg.concurrency * 8)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["test_index" if c == "doc_id" else c for c in t.column_names]
        )

    queries = queries.map_batches(rename, batch_format="pyarrow")
    matched = queries.map_batches(
        MatcherActor,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # autoscaling pool: a fixed-size pool reserves cfg.concurrency CPUs
        # up front, which starves the upstream repartition/sort on small
        # sessions into a scheduling deadlock (observed at num_cpus=4)
        concurrency=(1, cfg.concurrency),
        fn_constructor_kwargs={"truth_ref": ref, "cfg": cfg,
                               "model_ref": model_ref,
                               "model_top_k": model_top_k,
                               "emit_features": emit_features,
                               "abstainer_ref": ab_ref},
    )
    return matched.sort("test_index")


def match_single_title(title: str, truth_ds, cfg: MatchConfig = MatchConfig()) -> dict:
    """closest-search-single-title mode (reference cli.py:64-83): 1-row
    Dataset through the same pipeline; returns the best match row."""
    import ray.data as rd

    test = rd.from_items([{"test_index": 0, "title": title}])
    out = match_pipeline(test, truth_ds, cfg).take_all()
    return out[0]


def accuracy_report(predictions_ds, actuals_ds, cfg: MatchConfig = MatchConfig()) -> dict:
    """Confusion counts + the reference's custom error FN + 5×FP
    (cli.py:86-132, settings.py:77). Driver-side join on test_index —
    evaluation sets are small."""
    pred = {r["test_index"]: r["title_id"] for r in
            predictions_ds.select_columns(["test_index", "title_id"]).take_all()}
    act = {r["test_index"]: r["title_id"] for r in
           actuals_ds.select_columns(["test_index", "title_id"]).take_all()}
    nf = cfg.not_found_value
    correct = wrong = correct_nf = wrong_nf = 0
    for ti, a in act.items():
        p = pred.get(ti, nf)
        if a == nf:
            if p == nf:
                correct_nf += 1
            else:
                wrong += 1          # false positive (matched a non-existent)
        else:
            if p == a:
                correct += 1
            elif p == nf:
                wrong_nf += 1       # false negative (missed a real match)
            else:
                wrong += 1          # false positive (wrong title)
    error = wrong_nf + cfg.false_positive_penalty * wrong
    return {
        "correctly_matched": correct,
        "incorrectly_matched": wrong,
        "correctly_not_found": correct_nf,
        "incorrectly_not_found": wrong_nf,
        "custom_error": error,
    }

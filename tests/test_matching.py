"""Title-matching compat mode: TruthIndex scoring parity + e2e tiered
matching on reference-shaped fixtures (SURVEY.md §3.1/§3.3)."""

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.config import DedupConfig, MatchConfig
from doppel_speller_ray.functions.normalize import transform_text
from doppel_speller_ray.functions.shingles import shingle_array
from doppel_speller_ray.sources.fixtures import make_titles
from doppel_speller_ray.stages.matcher import TruthIndex, _gather_ranges


def _prepared_truth(titles, ids=None):
    norm = [transform_text(t) for t in titles]
    return pa.table({
        "title_id": pa.array(ids or list(range(1, len(titles) + 1)), pa.int64()),
        "norm_text": pa.array(norm),
        "shingles": shingle_array(norm, 3),
    })


def _ref_modified_jaccard(query, truth_titles):
    """Straight-from-the-paper reimplementation of match_maker.py:16-52 /
    135-142 semantics with Python sets, as the parity oracle."""
    import math

    def grams(t):
        return set(t[i:i + 3] for i in range(len(t) - 2))

    tsets = [grams(transform_text(t)) for t in truth_titles]
    n = len(truth_titles)
    df = {}
    for s in tsets:
        for g in s:
            df[g] = df.get(g, 0) + 1
    idf = {g: math.log(n / c) for g, c in df.items()}
    max_idf = max(idf.values())
    q = grams(transform_text(query))
    q_sum = sum(idf.get(g, max_idf) for g in q)
    out = []
    for s in tsets:
        t_sum = sum(idf[g] for g in s)
        common = sum(idf[g] for g in (q & s))
        out.append(common / (t_sum + (q_sum - common)))
    return np.array(out)


def test_gather_ranges():
    got = _gather_ranges(np.array([5, 0, 10]), np.array([2, 3, 1]))
    assert got.tolist() == [5, 6, 0, 1, 2, 10]
    assert _gather_ranges(np.array([], np.int64), np.array([], np.int64)).size == 0


def test_modified_jaccard_parity():
    truth_titles = ["Acme Holdings Inc", "Acme Holding Inc", "Zeta Motors GmbH",
                    "Beta Data Works Ltd", "Gamma Gamma Labs"]
    idx = TruthIndex(_prepared_truth(truth_titles))
    for query in ["acme holdings", "zeta motor gmbh", "completely unrelated xyz"]:
        norm = transform_text(query)
        qcodes = np.asarray(shingle_array([norm], 3)[0].values, dtype=np.uint64)
        got, _ = idx.score_all(qcodes)
        want = _ref_modified_jaccard(query, truth_titles)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_topk_orders_best_first():
    truth_titles = [f"company number {i} ltd" for i in range(50)] + ["acme global inc"]
    idx = TruthIndex(_prepared_truth(truth_titles))
    norm = transform_text("acme global incorporated")
    qcodes = np.asarray(shingle_array([norm], 3)[0].values, dtype=np.uint64)
    top = idx.topk(qcodes, 10)
    assert top[0] == 50  # the acme row wins


def test_match_pipeline_e2e(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.matching import accuracy_report, match_pipeline

    truth, test, actuals = make_titles(n_truth=300, n_test=150, seed=42)
    cfg = MatchConfig(top_k=20, concurrency=2)
    out = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth), cfg)
    rows = out.take_all()
    assert len(rows) == 150
    assert [r["test_index"] for r in rows] == sorted(r["test_index"] for r in rows)

    rep = accuracy_report(rd.from_arrow(pa.Table.from_pylist(rows)),
                          rd.from_arrow(actuals), cfg)
    total_found = rep["correctly_matched"] + rep["incorrectly_matched"] + rep["incorrectly_not_found"]
    # single-perturbation misspellings: the tiered matcher should recover
    # most, and false positives must stay rare (the 5× penalty regime)
    assert rep["correctly_matched"] >= 0.6 * total_found, rep
    assert rep["incorrectly_matched"] <= 0.05 * total_found, rep
    assert rep["correctly_not_found"] >= 1


def test_match_single_title(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.matching import match_single_title

    truth, _, _ = make_titles(n_truth=50, seed=7)
    name = truth["title"][0].as_py()
    got = match_single_title(name, rd.from_arrow(truth), MatchConfig(top_k=10))
    assert got["title_id"] == 1
    assert got["tier"] == "exact"


def test_exact_tier_duplicate_truth_rows(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.matching import match_pipeline

    truth = pa.table({"title_id": pa.array([1, 2], pa.int64()),
                      "title": pa.array(["Same Name Inc", "same name inc"])})
    test = pa.table({"test_index": pa.array([0], pa.int64()),
                     "title": pa.array(["Same Name Inc"])})
    out = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                         MatchConfig(top_k=2)).take_all()
    # exact dict: later row overwrites (dict(zip(...)), predict.py:70-77)
    assert out[0]["title_id"] == 2


def test_match_pipeline_with_model_tier(ray_session):
    import ray.data as rd

    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.pipelines.matching import accuracy_report, match_pipeline
    from doppel_speller_ray.pipelines.training import train_verifier

    from doppel_speller_ray.functions.misspell import misspell

    truth, test, actuals = make_titles(n_truth=200, n_test=120, seed=21)
    # 1-edit queries are fully handled by tier 2 (gated Levenshtein); tier 3
    # only has work where the ratio falls under 94 — append HEAVY (3-edit)
    # misspellings of known truth rows to exercise the model tier
    names = truth["title"].to_pylist()
    ids = truth["title_id"].to_pylist()
    extra_q, extra_a = [], []
    for j in range(40):
        extra_q.append({"test_index": 1000 + j,
                        "title": misspell(names[j], 777 + j, n_perturbations=3)})
        extra_a.append({"test_index": 1000 + j, "title_id": ids[j]})
    test = pa.Table.from_pylist(test.to_pylist() + extra_q)
    actuals = pa.Table.from_pylist(actuals.to_pylist() + extra_a)

    cfg = MatchConfig(top_k=20, concurrency=2, seed=21)
    model, _ = train_verifier(rd.from_arrow(truth), cfg)

    base = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth), cfg).take_all()
    with_model = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth), cfg,
                                model=model).take_all()
    assert "model" in {r["tier"] for r in with_model}

    rep_base = accuracy_report(
        rd.from_arrow(pa.Table.from_pylist(base)), rd.from_arrow(actuals), cfg)
    rep_model = accuracy_report(
        rd.from_arrow(pa.Table.from_pylist(with_model)), rd.from_arrow(actuals), cfg)
    # tier 3 must recover additional matches without exploding false
    # positives (a few FPs are the model-tier regime — the reference's own
    # eval shows FP=2, README.md:45-50); measured here: 85→103 correct,
    # 0 FPs, custom error 34→16
    assert rep_model["correctly_matched"] > rep_base["correctly_matched"]
    assert rep_model["incorrectly_matched"] <= 3, (rep_base, rep_model)
    assert rep_model["custom_error"] < rep_base["custom_error"]


def test_lev_accept_floor_hybrid_rule(ray_session):
    """MatchConfig.lev_accept_floor: with an impossible probability bar
    (threshold 1.0 rejects every tier-3 argmax) the floor alone must
    recover candidates whose gated ratio lands in [floor, lev_threshold)
    — exactly sweep_golden's offline second axis; floor 101 must behave
    as the pure-p rule (tier 3 accepts nothing)."""
    import ray.data as rd

    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.functions.misspell import misspell
    from doppel_speller_ray.pipelines.matching import match_pipeline
    from doppel_speller_ray.pipelines.training import train_verifier

    truth, _, _ = make_titles(n_truth=150, n_test=10, seed=33)
    names = truth["title"].to_pylist()
    ids = truth["title_id"].to_pylist()
    # 3-edit queries spread the gated ratio across [<85, 85-93, >=94]
    # (measured 32/14/14 at these seeds): tier 2 takes >=94, the floor
    # axis targets the [85, 94) band that the probability bar rejects
    test = pa.Table.from_pylist(
        [{"test_index": j, "title": misspell(names[j % len(names)],
                                             99 + j, n_perturbations=3)}
         for j in range(60)])

    cfg_off = MatchConfig(top_k=20, concurrency=2, seed=33,
                          prediction_threshold=1.0)
    model, _ = train_verifier(rd.from_arrow(truth), cfg_off)

    off = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                         cfg_off, model=model).take_all()
    assert not [r for r in off if r["tier"] == "model"], "p-bar leaked"

    cfg_floor = MatchConfig(top_k=20, concurrency=2, seed=33,
                            prediction_threshold=1.0, lev_accept_floor=85)
    on = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                        cfg_floor, model=model).take_all()
    accepted = [r for r in on if r["tier"] == "model"]
    assert accepted, "floor rule accepted nothing"
    # every floor-accepted row reports the ratio that cleared the floor
    # (no upper bound: the token-sort fallback inside the gated chain can
    # exceed the tier-2 bar for word-permuted pairs tier 2 skipped)
    assert all(r["lev_best"] >= 85 for r in accepted), accepted[:3]
    # and the floor-accepted assignments are the planted ones
    tid = {j: ids[j % len(ids)] for j in range(60)}
    assert all(tid[r["test_index"]] == r["title_id"] for r in accepted)


def test_emit_features_schema_and_values(ray_session):
    """emit_features=True appends the 14 decision-feature columns (abstainer
    training surface) without touching the default schema; model-tier rows
    carry the tier-3 argmax's jaccard/lev/rank stats, exact rows carry the
    tier sentinels."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.matching import match_pipeline
    from doppel_speller_ray.pipelines.training import train_verifier

    truth, _, _ = make_titles(n_truth=120, n_test=10, seed=11)
    names = truth["title"].to_pylist()
    from doppel_speller_ray.functions.misspell import misspell
    test = pa.Table.from_pylist(
        [{"test_index": 0, "title": names[0]}]          # exact tier
        + [{"test_index": j, "title": misspell(names[j % len(names)],
                                               7 + j, n_perturbations=3)}
           for j in range(1, 30)])

    cfg = MatchConfig(top_k=20, concurrency=2, seed=11,
                      prediction_threshold=0.0)
    model, _ = train_verifier(rd.from_arrow(truth), cfg)

    base = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                          cfg, model=model).take_all()
    assert sorted(base[0].keys()) == [
        "lev_best", "p_margin", "prediction", "test_index", "tier",
        "title_id"]

    rows = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                          cfg, model=model, emit_features=True).take_all()
    feat_cols = {"q_chars", "q_words", "tier2_best", "tier2_nbest",
                 "cand_count", "cscore_top", "cscore_arg", "cscore_margin",
                 "q_idf", "arg_rank", "p_second", "p_sum", "del_arg",
                 "tsr_arg"}
    assert feat_cols <= set(rows[0].keys())
    # identical decisions with and without the feature columns
    assert [(r["test_index"], r["title_id"], r["tier"]) for r in rows] == \
           [(r["test_index"], r["title_id"], r["tier"]) for r in base]
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r)
    ex = by_tier["exact"][0]
    assert (ex["tier2_best"], ex["tier2_nbest"], ex["arg_rank"]) == (100, 1, -1)
    assert ex["q_chars"] == len(transform_text(names[0]))
    for r in by_tier.get("model", []):
        assert r["cand_count"] >= 1
        assert 0 <= r["arg_rank"] < 20
        assert r["cscore_top"] >= r["cscore_arg"] >= 0
        assert r["q_idf"] > 0
        assert 0 <= r["del_arg"] <= 100 and 0 <= r["tsr_arg"] <= 100


def _const_q(logit: float):
    """Constant-q abstainer stub: a LogisticPairModel with zero weights and
    a fixed intercept (picklable by module reference, unlike a test-local
    class, so Ray workers can deserialize it)."""
    from doppel_speller_ray.stages.pair_model import LogisticPairModel

    m = LogisticPairModel()
    m.w = np.zeros(17)
    m.b = logit
    m.mu = np.zeros(17)
    m.sigma = np.ones(17)
    return m


def test_runtime_abstainer_replaces_threshold_axes(ray_session):
    """abstainer={model, q_min}: q >= q_min accepts exactly the rows the
    threshold-0 rule accepts (the argmax + ambiguity drop are unchanged);
    q < q_min abstains every tier-3 row to not_found."""
    import ray.data as rd

    from doppel_speller_ray.functions.misspell import misspell
    from doppel_speller_ray.pipelines.matching import match_pipeline
    from doppel_speller_ray.pipelines.training import train_verifier

    truth, _, _ = make_titles(n_truth=120, n_test=10, seed=21)
    names = truth["title"].to_pylist()
    test = pa.Table.from_pylist(
        [{"test_index": j, "title": misspell(names[j % len(names)],
                                             50 + j, n_perturbations=3)}
         for j in range(40)])
    cfg = MatchConfig(top_k=20, concurrency=2, seed=21,
                      prediction_threshold=0.0)
    model, _ = train_verifier(rd.from_arrow(truth), cfg)

    base = match_pipeline(rd.from_arrow(test), rd.from_arrow(truth),
                          cfg, model=model).take_all()
    acc_all = match_pipeline(
        rd.from_arrow(test), rd.from_arrow(truth), cfg, model=model,
        abstainer={"model": _const_q(50.0), "q_min": 0.5}).take_all()
    none = match_pipeline(
        rd.from_arrow(test), rd.from_arrow(truth), cfg, model=model,
        abstainer={"model": _const_q(-50.0), "q_min": 0.5}).take_all()

    assert [(r["test_index"], r["title_id"], r["tier"]) for r in acc_all] \
        == [(r["test_index"], r["title_id"], r["tier"]) for r in base]
    assert any(r["tier"] == "model" for r in base)
    for r in none:
        assert r["tier"] != "model"
        if r["tier"] == "not_found":
            assert r["title_id"] == cfg.not_found_value
    # exact/lev tiers are untouched by the abstainer
    kept = {(r["test_index"], r["tier"]) for r in base
            if r["tier"] in ("exact", "lev")}
    assert {(r["test_index"], r["tier"]) for r in none
            if r["tier"] in ("exact", "lev")} == kept


def test_abstainer_cfg_topk_guard(ray_session):
    """An abstainer artifact trained at a different cfg.top_k must fail
    loudly at actor init (cand_count/cscore_*/tier2_* decision features
    shift with the candidate-list depth), and a matching cfg_top_k must
    pass."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.matching import match_pipeline

    truth, _, _ = make_titles(n_truth=40, n_test=4, seed=3)
    test = pa.Table.from_pylist(
        [{"test_index": j, "title": truth["title"][j].as_py()}
         for j in range(4)])
    cfg = MatchConfig(top_k=20, concurrency=1, seed=3,
                      prediction_threshold=0.0)

    with pytest.raises(Exception, match="cfg.top_k"):
        match_pipeline(
            rd.from_arrow(test), rd.from_arrow(truth), cfg,
            abstainer={"model": _const_q(50.0), "q_min": 0.5,
                       "cfg_top_k": 100}).take_all()

    ok = match_pipeline(
        rd.from_arrow(test), rd.from_arrow(truth), cfg,
        abstainer={"model": _const_q(50.0), "q_min": 0.5,
                   "cfg_top_k": 20}).take_all()
    assert len(ok) == 4

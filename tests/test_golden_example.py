"""Golden end-to-end conformance on the reference's own example dataset
(30k truth / 10k test, ``/root/reference/example_dataset``): the compat
matching pipeline with the committed boosted tier-3 verifier must land at
the reference's published operating point (``README.md:62-68``: 5929
correctly matched / 114 incorrect / 3894 correctly not-found / 63
incorrectly not-found → custom error 63 + 5×114 = 633).

Our numpy-GBDT verifier trades some recall for far fewer false positives;
the asserted bounds pin that trade at a custom error ≤ the reference's 633
(measured 471 at artifact-training time; see
artifacts/pair_model_example_metrics.json)."""

import os

import pytest

EX = "/root/reference/example_dataset"
ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "pair_model_example.pickle")


@pytest.mark.slow
def test_golden_example_accuracy(ray_session):
    if not os.path.exists(ART):
        pytest.skip("pair-model artifact not trained (run tools/train_example_model)")
    from doppel_speller_ray.cli import _TEST_MAPPING, _TRUTH_MAPPING, _read_any
    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.pipelines.matching import accuracy_report, match_pipeline
    from doppel_speller_ray.stages.pair_model import BoostedPairModel

    cfg = MatchConfig()
    model = BoostedPairModel.load(ART)
    truth = _read_any(f"{EX}/example_truth.csv.gz", _TRUTH_MAPPING, "|")
    test = _read_any(f"{EX}/example_test.csv.gz", _TEST_MAPPING, "|")
    actuals = _read_any(
        f"{EX}/example_test_with_actuals.csv.gz",
        [("test_index", ("test_index", int)), ("title_id", ("company_id", int))],
        "|")
    preds = match_pipeline(test, truth, cfg, model=model)
    rep = accuracy_report(preds, actuals, cfg)

    # reference golden: 5929 / 114 / 3894 / 63 (custom error 633)
    assert rep["correctly_matched"] >= 5350, rep
    assert rep["incorrectly_matched"] <= 60, rep
    assert rep["correctly_not_found"] >= 3800, rep
    assert rep["incorrectly_not_found"] <= 700, rep
    assert rep["custom_error"] <= 633, rep  # matches-or-beats the reference

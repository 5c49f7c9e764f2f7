"""Reference-compat title matcher: broadcast truth index as an actor pool.

Reimplements the semantics of the reference's ``MatchMaker``
(``/root/reference/doppelspeller/match_maker.py:74-203``) and the tiered
``Prediction`` flow (``predict.py:97-183``) Ray-Data-style:

* the (small) truth side is prepared once, ``ray.put`` into the object
  store, and each :class:`MatcherActor` builds its in-memory index ONCE in
  ``__init__`` — the classic broadcast-join pattern for a dimension table;
* queries stream through ``map_batches(MatcherActor, concurrency=N)``.

Scoring parity (match_maker.py:16-52): modified Jaccard
``Σidf(common n-grams) / (Σidf(truth n-grams) + Σidf(query n-grams) −
Σidf(common))`` with IDF from TRUTH document frequencies only and the
max-IDF fallback for unseen n-grams (match_maker.py:151,181). The sparse
matrix scatter-add becomes an inverted-index (CSR) gather + ``np.add.at``.

Verification tier (predict.py:140-176): deletion-ratio prefilter → ratio →
token-sort fallback, threshold 94; grouped argmax with ambiguity drop
(predict.py:158-161). The reference's tier-3 XGBoost verifier is a pluggable
hook here (no xgboost in this environment); see stages/pair_model.py for the
numpy logistic stand-in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import MatchConfig
from ..functions.lev import deletion_ratio, lev_ratio, token_sort_ratio


# decision-feature order shared by emit_features columns, the abstainer
# training tool (tools/train_abstainer.FEATURES imports this) and the
# hardcoded vector built in MatcherActor.__call__
_ABSTAINER_FEATURES = [
    "prediction", "p_margin", "p_second", "p_sum", "lev_best",
    "tier2_best", "tier2_nbest", "cand_count", "cscore_top", "cscore_arg",
    "cscore_margin", "q_idf", "arg_rank", "del_arg", "tsr_arg",
    "q_chars", "q_words",
]


def _gather_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of ranges [starts[i], starts[i]+lens[i])."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(lens)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


class TruthIndex:
    """In-memory inverted index over the truth titles' shingle sets."""

    def __init__(self, truth: pa.Table):
        """truth: prepared table with title_id, norm_text, shingles."""
        from ..functions.shingles import list_column_flat

        self.title_ids = truth["title_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.norm_texts = truth["norm_text"].to_pylist()
        flat, offsets = list_column_flat(truth["shingles"])
        self.n_truth = len(self.title_ids)

        # vocabulary + document frequency (truth side only — match_maker.py:135-142)
        self.codes = np.unique(flat)
        ids = np.searchsorted(self.codes, flat)
        self.df = np.bincount(ids, minlength=len(self.codes)).astype(np.int64)
        self.idf = np.log(self.n_truth / self.df).astype(np.float64)
        self.max_idf = float(self.idf.max()) if len(self.idf) else 0.0

        # inverted index CSR: n-gram id → truth row indices
        title_per_posting = np.repeat(
            np.arange(self.n_truth, dtype=np.int64), np.diff(offsets))
        order = np.argsort(ids, kind="stable")
        self.post_titles = title_per_posting[order]
        self.post_offsets = np.concatenate(
            [[0], np.cumsum(self.df)]).astype(np.int64)

        # per-title IDF sums (match_maker.py:102,174)
        idf_per_posting = self.idf[ids]
        csum = np.concatenate([[0.0], np.cumsum(idf_per_posting)])
        self.sums_truth = (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.float64)

        # tier-1 exact lookup: normalized text → title_id; duplicates resolve
        # to the LAST occurrence, mirroring dict(zip(...)) (predict.py:70-77)
        self.exact = dict(zip(self.norm_texts, self.title_ids.tolist()))

    def score_all(self, qcodes: np.ndarray) -> tuple[np.ndarray, float]:
        """Modified-Jaccard scores of one query against every truth title.

        Per query-gram the posting list is a CONTIGUOUS slice of
        ``post_titles``, so the scatter-add runs per slice with a scalar
        weight — no per-query index/weight array construction (building
        those multi-MB temporaries dominated per-query cost on large truth
        sets with common n-grams)."""
        pos = np.searchsorted(self.codes, qcodes)
        pos_c = np.minimum(pos, max(len(self.codes) - 1, 0))
        in_vocab = (pos < len(self.codes)) & (
            self.codes[pos_c] == qcodes) if len(self.codes) else np.zeros(len(qcodes), bool)
        sel = pos[in_vocab]
        # unseen n-grams contribute max-IDF to the query sum (match_maker.py:151,181)
        q_idf_sum = float(self.idf[sel].sum()) + float((~in_vocab).sum()) * self.max_idf
        scores = np.zeros(self.n_truth, dtype=np.float64)
        for g in sel:
            s, e = self.post_offsets[g], self.post_offsets[g + 1]
            np.add.at(scores, self.post_titles[s:e], self.idf[g])
        denom = self.sums_truth + (q_idf_sum - scores)
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(denom > 0, scores / denom, 0.0)
        return jac, q_idf_sum

    def topk_scored(self, qcodes: np.ndarray, k: int
                    ) -> tuple[np.ndarray, np.ndarray, float]:
        """Top-k candidate row indices (score-descending), their
        modified-Jaccard scores, and the query's total IDF mass — the
        scores feed the extended pair-model features
        (functions/features.py); the IDF mass feeds the abstainer's
        decision features (query rarity)."""
        jac, q_idf_sum = self.score_all(qcodes)
        if self.n_truth <= k:
            idx = np.argsort(jac)[::-1]
        else:
            part = np.argpartition(jac, -k)[-k:]
            idx = part[np.argsort(jac[part])[::-1]]
        return idx, jac[idx], q_idf_sum

    def topk(self, qcodes: np.ndarray, k: int) -> np.ndarray:
        return self.topk_scored(qcodes, k)[0]


class MatcherActor:
    """map_batches actor: tier-1 exact → tier-2 top-k + gated Levenshtein.

    State (the index) is built once per actor from the broadcast truth
    table; each __call__ processes one Arrow batch of prepared queries.
    """

    def __init__(self, truth_ref, cfg: MatchConfig, model_ref=None,
                 model_top_k: int = 10, emit_features: bool = False,
                 abstainer_ref=None):
        import ray

        truth = ray.get(truth_ref)
        self.index = TruthIndex(truth)
        self.cfg = cfg
        # emit_features: append per-query DECISION features to the output
        # (abstainer training / offline accept-rule sweeps). Off by default
        # so the compat output schema stays stable for oracles and callers.
        self.emit_features = emit_features
        # learned abstainer (tools/train_abstainer.py artifact: dict with
        # "model" (predict_proba over the decision-feature vector) and
        # "q_min"): when present it REPLACES the tier-3 accept axes
        # (prediction_threshold / lev_accept_floor) with the rule
        # q = P(argmax correct | decision features) >= q_min. The argmax
        # and the ambiguity drop still precede it.
        self.ab = ray.get(abstainer_ref) if abstainer_ref is not None else None
        if self.ab is not None and self.ab.get("features") is not None:
            # the vector built in __call__ hardcodes this order; an artifact
            # trained on a different feature list must fail loudly, not
            # silently mis-map columns
            if list(self.ab["features"]) != _ABSTAINER_FEATURES:
                raise ValueError(
                    "abstainer artifact feature order "
                    f"{list(self.ab['features'])} != matcher order "
                    f"{_ABSTAINER_FEATURES}")
        if self.ab is not None and self.ab.get("model_top_k") is not None:
            # q was calibrated on a specific candidate-list depth; a
            # different depth shifts p_sum / arg_rank / p_second silently
            if int(self.ab["model_top_k"]) != int(model_top_k):
                raise ValueError(
                    f"abstainer artifact was trained at model_top_k="
                    f"{self.ab['model_top_k']}, matcher runs {model_top_k}")
        if self.ab is not None and self.ab.get("cfg_top_k") is not None:
            # cfg.top_k bounds the candidate list BEFORE the model tier and
            # feeds cand_count / cscore_* / tier2_* decision features — a
            # different depth shifts those distributions just like
            # model_top_k shifts p_sum/arg_rank
            if int(self.ab["cfg_top_k"]) != int(cfg.top_k):
                raise ValueError(
                    f"abstainer artifact was trained at cfg.top_k="
                    f"{self.ab['cfg_top_k']}, matcher runs {cfg.top_k}")
        # tier-3 model verifier (predict.py:185-254): optional; scores the
        # model_top_k best Jaccard candidates of still-unmatched queries
        self.model = ray.get(model_ref) if model_ref is not None else None
        self.model_top_k = model_top_k
        if self.model is not None:
            # extended 68-dim family (candidate IDF-Jaccard + rank appended)
            # vs the original 66-dim family — decided by the artifact itself
            from ..functions.features import EXTENDED_FEATURES_COUNT
            from .pair_model import model_n_features

            self.model_extra = (
                model_n_features(self.model) == EXTENDED_FEATURES_COUNT)
        if self.model is not None:
            from collections import Counter

            from ..functions.features import truth_word_counts

            counter: Counter = Counter()
            for norm in self.index.norm_texts:
                counter.update(set(norm.split()))
            self.word_counter = dict(counter)
            self.truth_counts = np.stack([
                truth_word_counts(t, self.word_counter)
                for t in self.index.norm_texts
            ])

    def _gated_ratio(self, a: str, b: str) -> int:
        thr = self.cfg.lev_threshold
        if deletion_ratio(a, b) < thr:
            return 0
        r = lev_ratio(a, b)
        if r <= thr:
            return token_sort_ratio(a, b)
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.shingles import list_column_flat

        idxcol = batch["test_index"].to_numpy(zero_copy_only=False)
        norms = batch["norm_text"].to_pylist()
        flat, offsets = list_column_flat(batch["shingles"])
        k = self.cfg.top_k
        nf = self.cfg.not_found_value

        out_idx = np.empty(len(batch), dtype=np.int64)
        out_tid = np.empty(len(batch), dtype=np.int64)
        out_pred = np.empty(len(batch), dtype=np.float32)
        out_lev = np.zeros(len(batch), dtype=np.int16)  # gated ratio of the
        # emitted candidate (exact=100, lev/model tiers: its chain value;
        # not_found: tier-2 best seen) — lets callers sweep HYBRID accept
        # rules (p OR strong-Levenshtein) offline from one threshold-0 run
        out_margin = np.zeros(len(batch), dtype=np.float32)  # model tier:
        # p(top1) − p(top2) — the ranker's own disambiguation confidence,
        # a third offline-sweepable axis (exact/lev tiers: 1.0)
        tiers: list[str] = []
        if self.emit_features:
            n = len(batch)
            f_qchars = np.zeros(n, np.int32)     # normalized query length
            f_qwords = np.zeros(n, np.int16)
            f_t2best = np.zeros(n, np.int16)     # tier-2 best gated ratio
            f_t2n = np.zeros(n, np.int16)        # ...and how many tied at it
            f_ccount = np.zeros(n, np.int32)     # candidates with jaccard>0
            f_cs_top = np.zeros(n, np.float32)   # best IDF-Jaccard score
            f_cs_arg = np.zeros(n, np.float32)   # ...of the tier-3 argmax
            f_cs_margin = np.zeros(n, np.float32)  # top1−top2 jaccard gap
            f_qidf = np.zeros(n, np.float32)     # query total IDF mass
            f_rank = np.full(n, -1, np.int16)    # argmax rank in jaccard order
            f_p2 = np.zeros(n, np.float32)       # second-best model p
            f_psum = np.zeros(n, np.float32)     # Σp over scored candidates
            f_del = np.zeros(n, np.float32)      # deletion_ratio(query, argmax)
            f_tsr = np.zeros(n, np.int16)        # token_sort_ratio(query, argmax)
        # abstainer mode: collect decision-feature vectors in the loop,
        # batch-predict ONCE per Arrow batch after it (167-tree GBDT eval
        # per single row would dominate the loop otherwise)
        ab_idx: list[int] = []
        ab_X: list[list[float]] = []

        for i in range(len(batch)):
            out_idx[i] = idxcol[i]
            norm = norms[i]
            if self.emit_features:
                f_qchars[i] = len(norm)
                f_qwords[i] = norm.count(" ") + 1 if norm else 0
            # tier 1: exact normalized-text hit (predict.py:97-113)
            tid = self.index.exact.get(norm)
            if tid is not None:
                out_tid[i] = tid
                out_pred[i] = 1.0
                out_lev[i] = 100
                out_margin[i] = 1.0
                if self.emit_features:
                    f_t2best[i], f_t2n[i] = 100, 1
                tiers.append("exact")
                continue
            # tier 2: IDF-Jaccard top-k + gated Levenshtein (predict.py:122-176)
            qcodes = flat[offsets[i]: offsets[i + 1]]
            cand, cscores, q_idf = self.index.topk_scored(qcodes, k)
            # grouped argmax + ambiguity drop: 2+ surviving rows at the max
            # ratio ⇒ not-found, even for equal titles (predict.py:158-176)
            best_ratio, best_tid, n_at_best = 0, nf, 0
            for t in cand:
                r = self._gated_ratio(norm, self.index.norm_texts[t])
                if r > best_ratio:
                    best_ratio, best_tid, n_at_best = r, int(self.index.title_ids[t]), 1
                elif r == best_ratio and r > 0:
                    n_at_best += 1
            out_lev[i] = best_ratio
            if self.emit_features:
                f_t2best[i], f_t2n[i] = best_ratio, n_at_best
                f_ccount[i] = int((cscores > 0).sum())
                f_qidf[i] = q_idf
                if len(cscores):
                    f_cs_top[i] = cscores[0]
                    if len(cscores) > 1:
                        f_cs_margin[i] = cscores[0] - cscores[1]
            if best_ratio > self.cfg.lev_threshold and n_at_best == 1:
                out_tid[i] = best_tid
                out_pred[i] = 1.0
                out_margin[i] = 1.0
                tiers.append("lev")
                continue
            # tier 3: model verifier over the top candidates
            # (predict.py:229-254: argmax p, threshold 0.9, ambiguity drop)
            if self.model is not None and len(cand):
                from ..functions.features import featurize_pairs

                mk = cand[: self.model_top_k]
                truths = [self.index.norm_texts[t] for t in mk]
                extras = (np.column_stack([cscores[: len(mk)],
                                           np.arange(len(mk), dtype=np.float64)])
                          if self.model_extra else None)
                X = featurize_pairs([norm] * len(mk), truths,
                                    self.truth_counts[mk], self.index.n_truth,
                                    extras=extras)
                p = self.model.predict_proba(X)
                best = int(np.argmax(p))
                unique = (p == p[best]).sum() == 1
                need_feats = self.emit_features or (
                    self.ab is not None and unique)
                if need_feats:
                    p2v = (float(np.partition(p, -2)[-2])
                           if len(p) > 1 else 0.0)
                    psumv = float(p.sum())
                    delv = float(deletion_ratio(norm, truths[best]))
                    tsrv = int(token_sort_ratio(norm, truths[best]))
                if self.emit_features:
                    f_cs_arg[i] = cscores[best]
                    f_rank[i] = best
                    f_psum[i] = psumv
                    f_p2[i] = p2v
                    f_del[i] = delv
                    f_tsr[i] = tsrv
                if self.ab is not None:
                    if unique:
                        # gated chain reusing the delv/tsrv already
                        # computed above (identical to _gated_ratio)
                        thr = self.cfg.lev_threshold
                        if delv < thr:
                            lev_arg = 0
                        else:
                            r = lev_ratio(norm, truths[best])
                            lev_arg = r if r > thr else tsrv
                        margin = float(p[best]) - p2v
                        ab_idx.append(i)
                        # EXACT order of tools/train_abstainer.FEATURES;
                        # the float32 cast before predict reproduces the
                        # emitted-column quantization the abstainer
                        # trained on
                        ab_X.append([
                            float(p[best]), margin, p2v, psumv, lev_arg,
                            best_ratio, n_at_best,
                            int((cscores > 0).sum()),
                            float(cscores[0]) if len(cscores) else 0.0,
                            float(cscores[best]),
                            (float(cscores[0] - cscores[1])
                             if len(cscores) > 1 else 0.0),
                            q_idf, best, delv, tsrv,
                            len(norm), norm.count(" ") + 1 if norm else 0,
                        ])
                        # tentative accept; flipped post-loop if q < q_min
                        out_tid[i] = int(self.index.title_ids[mk[best]])
                        out_pred[i] = float(p[best])
                        out_lev[i] = lev_arg
                        out_margin[i] = margin
                        tiers.append("model")
                        continue
                    out_tid[i] = nf
                    out_pred[i] = 0.0
                    tiers.append("not_found")
                    continue
                accept = unique and p[best] > self.cfg.prediction_threshold
                lev = None
                if (unique and not accept
                        and self.cfg.lev_accept_floor <= 100):
                    # hybrid floor: a low-p argmax whose verified ratio
                    # clears the floor is accepted anyway (identical to
                    # sweep_golden's offline rule — the argmax and the
                    # ambiguity drop precede both accept axes)
                    lev = self._gated_ratio(norm, truths[best])
                    accept = lev >= self.cfg.lev_accept_floor
                if accept:
                    out_tid[i] = int(self.index.title_ids[mk[best]])
                    out_pred[i] = float(p[best])
                    out_lev[i] = (self._gated_ratio(norm, truths[best])
                                  if lev is None else lev)
                    if len(p) > 1:
                        out_margin[i] = float(
                            p[best] - np.partition(p, -2)[-2])
                    else:
                        out_margin[i] = float(p[best])
                    tiers.append("model")
                    continue
            out_tid[i] = nf
            out_pred[i] = 0.0
            tiers.append("not_found")

        if self.ab is not None and ab_idx:
            q = self.ab["model"].predict_proba(
                np.asarray(ab_X, dtype=np.float32))
            q_min = float(self.ab["q_min"])
            for j, i in enumerate(ab_idx):
                if q[j] < q_min:
                    out_tid[i] = nf
                    out_pred[i] = 0.0
                    # restore the tier-2 best ratio the default
                    # not_found path reports (feature slot 5)
                    out_lev[i] = int(ab_X[j][5])
                    out_margin[i] = 0.0
                    tiers[i] = "not_found"

        cols = {
            "test_index": pa.array(out_idx, pa.int64()),
            "title_id": pa.array(out_tid, pa.int64()),
            "prediction": pa.array(out_pred, pa.float32()),
            "lev_best": pa.array(out_lev, pa.int16()),
            "p_margin": pa.array(out_margin, pa.float32()),
            "tier": pa.array(tiers, pa.string()),
        }
        if self.emit_features:
            cols.update({
                "q_chars": pa.array(f_qchars, pa.int32()),
                "q_words": pa.array(f_qwords, pa.int16()),
                "tier2_best": pa.array(f_t2best, pa.int16()),
                "tier2_nbest": pa.array(f_t2n, pa.int16()),
                "cand_count": pa.array(f_ccount, pa.int32()),
                "cscore_top": pa.array(f_cs_top, pa.float32()),
                "cscore_arg": pa.array(f_cs_arg, pa.float32()),
                "cscore_margin": pa.array(f_cs_margin, pa.float32()),
                "q_idf": pa.array(f_qidf, pa.float32()),
                "arg_rank": pa.array(f_rank, pa.int16()),
                "p_second": pa.array(f_p2, pa.float32()),
                "p_sum": pa.array(f_psum, pa.float32()),
                "del_arg": pa.array(f_del, pa.float32()),
                "tsr_arg": pa.array(f_tsr, pa.int16()),
            })
        return pa.table(cols)

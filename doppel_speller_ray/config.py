"""Engine configuration.

Mirrors the reference's tunables (``/root/reference/doppelspeller/settings.py``)
where semantics overlap (n-gram size 3, Levenshtein threshold 94, prediction
threshold 0.9, 255-char title cap) and adds the knobs the Ray-Data-native
dedup engine needs (MinHash permutations, LSH banding, bucket caps/salting,
checkpointing).

All randomness in the engine derives from ``seed`` (+ stable per-row hashes),
unlike the reference which uses unseeded ``random`` — determinism is required
for resumable, retry-safe distributed execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """Configuration for the near-duplicate detection + clustering pipeline."""

    # --- normalization (reference parity: settings.py:15,67-68, common.py:20-47)
    n_grams: int = 3                 # character shingle width (N_GRAMS)
    max_chars: int | None = None     # cap on normalized text; 255 = reference
    #   parity mode (MAX_CHARACTERS_ALLOWED_IN_THE_TITLE); None = full text
    #   (web pages are longer than titles, capping would merge long docs that
    #   share a prefix)

    # --- MinHash / LSH candidate generation (revives the reference's
    #     abandoned MinHash design, constants.py:16-17)
    num_perms: int = 128             # MinHash permutations
    lsh_bands: int = 16              # b bands ...
    lsh_rows: int = 8                # ... of r rows each; b*r == num_perms
    seed: int = 42

    # --- candidate prefilter: 64-bit SimHash carried through the band
    #     shuffle (8 B/doc/band); pairs whose Hamming distance exceeds this
    #     are dropped BEFORE the payload joins + exact verify. Measured on
    #     misspelling near-dups (jaccard ≥ 0.8, 1–2 perturbations): hamming
    #     ≤ 14 (p99 = 12); junk LSH collisions at jaccard 0.5–0.7: hamming
    #     15–30. 16 keeps a margin of 2 bits above the observed true-dup
    #     max while dropping most junk before the payload joins. None
    #     disables.
    simhash_max_hamming: int | None = 16

    # --- skew handling (north_rule: salt/split hot LSH buckets)
    max_bucket_size: int = 64        # buckets larger than this are chained,
    #   not all-paired: each doc pairs with its `chain_width` sorted
    #   neighbours — union-find transitivity recovers the cluster
    chain_width: int = 4

    # --- containment tier (north_star: "a substring stage catches
    #     contained-duplicate pages LSH misses"). Off by default — whole-doc
    #     near-dup recall doesn't need it and it adds one fingerprint shuffle;
    #     on, substring-CERTIFIED pairs (stages/containment.py) are unioned
    #     into the dup-pair set before connected components.
    containment: bool = False
    containment_min_candidate: float = 0.35  # winnowing-fingerprint candidate
    #   bar; low on purpose — certification (exact substring search) is the
    #   precision gate, this only bounds candidate volume
    containment_k: int = 8           # winnowing k-gram size ...
    containment_w: int = 16          # ... and window (guarantee: any shared
    #   substring of length ≥ w+k−1 shares a fingerprint)
    containment_max_df: int = 64     # stop-fingerprint cap (boilerplate)

    # --- verification tiers
    jaccard_threshold: float = 0.80  # exact shingle-set Jaccard gate (Broder-style near-dup criterion)
    lev_threshold: int = 94          # LEVENSHTEIN_RATIO_THRESHOLD (settings.py:75)
    use_levenshtein: bool = True     # gated Levenshtein chain (predict.py:140-156)
    lev_max_chars: int = 256         # cap text length fed to the O(n*m/64)
    #   kernel (prefix compare; normalized text is whitespace-collapsed so
    #   near-dup prefixes align). 256 keeps the chain ~4× cheaper than 512
    #   with no recall change on the conformance fixtures
    lev_gate_min: float = 0.50       # run the Levenshtein chain only for
    #   borderline pairs (lev_gate_min ≤ jaccard < jaccard_threshold): above
    #   the Jaccard gate the pair is already a dup; below 0.5 a ratio > 94
    #   is impossible for texts this different (ratio 94 ⇒ ≲6% edits ⇒
    #   3-gram jaccard ≳ 0.6) — skipping there is pure win

    # --- execution
    batch_size: int = 1024           # rows per map_batches call
    broadcast_payload_max_bytes: int = 1024 * 1024 * 1024
    #   verify-payload attach strategy: docs payload (shingles+text) below
    #   this size is broadcast (ray.put once, searchsorted lookup per batch)
    #   instead of hash-joined — join aggregator pools cost seconds of actor
    #   startup that dwarf small joins; beyond it, the shuffle join scales
    shuffle_partitions: int | None = None  # None = let Ray pick

    # --- output / resume
    checkpoint_dir: str | None = None  # stage Parquet checkpoints + manifests

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perms ({self.num_perms})"
            )


@dataclass(frozen=True)
class MatchConfig:
    """Configuration for the reference-compat title-matching mode.

    Reproduces the tiered matcher of ``predict.py``: exact lookup → IDF-Jaccard
    top-k candidates → gated Levenshtein verification.
    """

    n_grams: int = 3                          # settings.py:15
    max_chars: int = 255                      # settings.py:67-68
    top_k: int = 100                          # TOP_N_RESULTS_TO_FIND_FOR_PREDICTING (settings.py:56)
    top_k_train: int = 10                     # settings.py:55
    lev_threshold: int = 94                   # settings.py:75
    prediction_threshold: float = 0.9         # settings.py:76
    # hybrid accept rule (no reference analogue; tools/sweep_golden.py's
    # second sweep axis made runtime-reachable): a unique tier-3 argmax
    # whose probability fails prediction_threshold is still accepted when
    # its gated Levenshtein ratio ≥ this floor. 101 = off (pure-p rule).
    lev_accept_floor: int = 101
    false_positive_penalty: int = 5           # settings.py:77
    not_found_value: int = -1                 # TRAIN_NOT_FOUND_VALUE (settings.py:33)
    seed: int = 42
    batch_size: int = 256
    concurrency: int = 4                      # matcher actor pool size


DEFAULT_DEDUP = DedupConfig()
DEFAULT_MATCH = MatchConfig()

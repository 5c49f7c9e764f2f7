"""Deterministic synthetic `pages` fixtures with planted duplicate clusters.

Schema per BASELINE.json input_hint: (url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string), plus a sidecar truth table
(url, cluster_id) — cluster_id = -1 for singletons (FIXTURES.md §1).

Duplicate planting mirrors the reference's synthetic-positive model
(``/root/reference/doppelspeller/feature_engineering_prepare.py:165-173``):
near-dup copies get 1–2 seeded perturbations (QWERTY-adjacent replace, add/
remove letter, add/remove space, swap adjacent words). Containment pages
(base text embedded in boilerplate) are flagged with cluster_id recorded in a
separate column so LSH recall is not charged for them.

Everything is seeded; per-row perturbation seeds derive from
hash(seed, row index) so the fixture is reproducible regardless of how rows
are later partitioned.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from ..functions.misspell import misspell

_BASE_WORDS = (
    "table query scan filter join merge sort group window stream batch row column "
    "value key hash index vector spark data fast slow big small part order line "
    "customer supplier nation region page crawl web text dedup shingle signature "
    "cluster bucket verify exact near candidate pair corpus document"
).split()


def _make_vocab(seed: int = 7, n_extra: int = 600) -> list[str]:
    """Base words + seeded pseudo-words. A large vocabulary keeps the char
    3-gram space of unrelated documents from saturating (with a tiny
    vocabulary every long doc shares most 3-grams with every other — not how
    real web text behaves, and it breaks precision measurement)."""
    rng = random.Random(seed)
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r",
              "s", "t", "v", "w", "z", "br", "cl", "dr", "fl", "gr", "pl",
              "st", "tr", "sk", "sp"]
    vowels = ["a", "e", "i", "o", "u", "ai", "ea", "io", "ou"]
    codas = ["", "n", "r", "s", "t", "l", "m", "nd", "st", "rk", "nt"]
    words = set(_BASE_WORDS)
    while len(words) < len(_BASE_WORDS) + n_extra:
        n_syll = rng.randint(2, 4)
        w = "".join(rng.choice(onsets) + rng.choice(vowels) + rng.choice(codas)
                    for _ in range(n_syll))
        words.add(w)
    return sorted(words)


_WORDS = _make_vocab()

_BOILER = (
    "cookie policy accept all rights reserved terms of service privacy statement "
    "subscribe to our newsletter follow us on social media copyright"
).split()


def _base_text(rng: random.Random, min_words: int = 8, max_words: int = 300) -> str:
    n = rng.randint(min_words, max_words)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def make_pages(
    n_clusters: int = 60,
    n_singletons: int = 200,
    seed: int = 42,
    with_containment: bool = True,
) -> tuple[pa.Table, pa.Table]:
    """Returns (pages table, truth table).

    truth columns: url, cluster_id (−1 singleton), kind
    ('base'|'exact'|'near'|'containment'|'singleton').
    """
    rng = random.Random(seed)
    urls: list[str] = []
    texts: list[str] = []
    cluster_ids: list[int] = []
    kinds: list[str] = []

    def add(text: str, cid: int, kind: str) -> None:
        i = len(urls)
        urls.append(f"https://site{i % 17}.example/p/{i}")
        texts.append(text)
        cluster_ids.append(cid)
        kinds.append(kind)

    for c in range(n_clusters):
        base = _base_text(rng)
        add(base, c, "base")
        n_members = rng.randint(1, 5)
        for m in range(n_members):
            kind = rng.choice(["exact", "near", "near"])
            if kind == "exact":
                add(base, c, "exact")
            else:
                row_seed = (seed * 1_000_003 + c * 101 + m) & 0x7FFFFFFF
                add(misspell(base, row_seed), c, "near")
        if with_containment and rng.random() < 0.3:
            pre = " ".join(rng.choice(_BOILER) for _ in range(rng.randint(20, 60)))
            post = " ".join(rng.choice(_BOILER) for _ in range(rng.randint(20, 60)))
            add(f"{pre} {base} {post}", c, "containment")

    for _ in range(n_singletons):
        add(_base_text(rng), -1, "singleton")

    n = len(urls)
    order = list(range(n))
    rng.shuffle(order)  # deterministic shuffle so clusters aren't adjacent
    urls = [urls[i] for i in order]
    texts = [texts[i] for i in order]
    cluster_ids = [cluster_ids[i] for i in order]
    kinds = [kinds[i] for i in order]

    base_ts = 1_600_000_000_000_000  # µs epoch
    ts = pa.array(np.arange(n, dtype=np.int64) * 60_000_000 + base_ts,
                  type=pa.timestamp("us"))
    langs = pa.array([("en", "de", "fr")[i % 11 % 3] if i % 11 < 3 else "en"
                      for i in range(n)])
    from ..functions.html import escape_html_array, wrap_html_array

    text_arr = pa.array(texts)
    html = wrap_html_array(escape_html_array(text_arr),
                           pa.array(np.arange(n, dtype=np.int64))) \
        .cast(pa.binary())
    pages = pa.table({
        "url": pa.array(urls), "warc_ts": ts, "html": html,
        "text": text_arr, "lang": langs,
    })
    truth = pa.table({
        "url": pa.array(urls),
        "cluster_id": pa.array(cluster_ids, pa.int64()),
        "kind": pa.array(kinds),
    })
    return pages, truth


_COMPANY_PARTS = {
    "prefix": ["global", "united", "first", "north", "pacific", "alpha", "omega",
               "inter", "euro", "trans", "meta", "neo", "prime", "royal"],
    "stem": ["tech", "soft", "data", "log", "med", "agro", "chem", "bank",
             "steel", "motor", "tex", "air", "net", "build", "print", "food"],
    "suffix": ["solutions", "systems", "industries", "holdings", "partners",
               "group", "labs", "works", "dynamics", "logistics", "ventures"],
    "legal": ["inc", "llc", "gmbh", "ltd", "b.v.", "s.a.", "corp", "plc", "& co"],
}


def make_titles(n_truth: int = 400, n_test: int = 200, not_found_frac: float = 0.3,
                seed: int = 42) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Reference-compat title-matching fixtures (FIXTURES.md §2):
    (truth, test, test_with_actuals). Test rows are misspelled truth names
    (1 perturbation, seeded) plus a fraction of names absent from truth
    (actual title_id = −1)."""
    rng = random.Random(seed * 31 + 5)
    names: list[str] = []
    seen: set[str] = set()
    needed = n_truth + int(n_test * not_found_frac) + 10
    while len(names) < needed:
        nm = " ".join([
            rng.choice(_COMPANY_PARTS["prefix"]) + rng.choice(_COMPANY_PARTS["stem"]),
            rng.choice(_COMPANY_PARTS["suffix"]),
            rng.choice(_COMPANY_PARTS["legal"]),
        ])
        if rng.random() < 0.4:
            nm = nm.title()
        if nm.lower() in seen:
            # the combinatorial space is ~22k; beyond that, disambiguate
            # with a deterministic numeric division suffix
            nm = f"{nm} division {len(names)}"
        if nm.lower() not in seen:
            seen.add(nm.lower())
            names.append(nm)
    truth_names = names[:n_truth]
    unknown_names = names[n_truth:]
    truth = pa.table({
        "title_id": pa.array(range(1, n_truth + 1), pa.int64()),
        "title": pa.array(truth_names),
    })
    t_idx, t_title, t_actual = [], [], []
    for i in range(n_test):
        t_idx.append(i)
        if rng.random() < not_found_frac and unknown_names:
            nm = unknown_names[i % len(unknown_names)]
            t_title.append(nm)
            t_actual.append(-1)
        else:
            j = rng.randrange(n_truth)
            t_title.append(misspell(truth_names[j], seed * 1_000_003 + i,
                                    n_perturbations=1))
            t_actual.append(j + 1)
    test = pa.table({"test_index": pa.array(t_idx, pa.int64()),
                     "title": pa.array(t_title)})
    actuals = pa.table({"test_index": pa.array(t_idx, pa.int64()),
                        "title": pa.array(t_title),
                        "title_id": pa.array(t_actual, pa.int64())})
    return truth, test, actuals


def true_dup_pairs(truth: pa.Table, include_containment: bool = False) -> set[tuple[str, str]]:
    """Ground-truth near/exact dup url pairs derivable from the truth table
    (containment pages excluded unless asked — FIXTURES.md §1)."""
    import collections

    groups: dict[int, list[str]] = collections.defaultdict(list)
    for url, cid, kind in zip(truth["url"].to_pylist(),
                              truth["cluster_id"].to_pylist(),
                              truth["kind"].to_pylist()):
        if cid == -1:
            continue
        if kind == "containment" and not include_containment:
            continue
        groups[cid].append(url)
    pairs: set[tuple[str, str]] = set()
    for members in groups.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def make_media(n: int = 12, seed: int = 11,
               size_range: tuple[int, int] = (8, 24),
               audio_len: int = 2048,
               kinds_cycle: tuple[str, ...] = ("bmp", "ppm", "wav"),
               video_frames: int = 6) -> tuple[pa.Table, dict]:
    """Deterministic media fixture with REAL encoded payloads.

    Rows cycle through ``kinds_cycle`` (bmp / ppm / wav / y4m); image
    pixels, audio samples and video frames are seeded numpy arrays encoded
    with `functions/codecs.py`, so decode stages can be round-trip-tested
    against exact ground truth. Returns (media table:
    media_id,kind,payload, truth: media_id → source array).
    """
    from ..functions import codecs

    rng = np.random.default_rng(seed)
    kinds, payloads, truth = [], [], {}
    for i in range(n):
        kind = kinds_cycle[i % len(kinds_cycle)]
        if kind == "y4m":
            h = int(rng.integers(*size_range))
            w = int(rng.integers(*size_range))
            # gray frames round-trip exactly through full-range BT.601
            luma = rng.integers(0, 256, size=(video_frames, h, w, 1),
                                dtype=np.int64).astype(np.uint8)
            frames = np.repeat(luma, 3, axis=-1)
            payloads.append(codecs.encode_y4m(frames, (25, 1)))
            truth[i] = frames
        elif kind == "wav":
            samples = rng.integers(-20000, 20000, size=audio_len,
                                   dtype=np.int64).astype(np.int16)
            payloads.append(codecs.encode_wav_pcm16(samples, 16000))
            truth[i] = samples
        else:
            h = int(rng.integers(*size_range))
            w = int(rng.integers(*size_range))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
            enc = codecs.encode_bmp if kind == "bmp" else codecs.encode_ppm
            payloads.append(enc(img))
            truth[i] = img
        kinds.append(kind)
    table = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })
    return table, truth

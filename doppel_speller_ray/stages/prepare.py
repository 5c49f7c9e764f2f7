"""Fused normalize → tokenize → shingle → hash stage (stateless, Arrow).

One ``map_batches`` pass per input batch produces every per-document column
the dedup tiers need — the columnar analogue of the reference's
``read_and_transform_input_csv`` derived columns
(``/root/reference/doppelspeller/common.py:50-72``): ``transformed_title`` →
``norm_text``, ``words``/``number_of_words`` → ``n_words``, ``n_grams`` set →
``shingles`` (sorted unique ``list<uint64>``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..functions.hashing import hash_strings
from ..functions.normalize import normalize_array, tokenize_counts
from ..functions.shingles import shingle_array


def prepare_batch(
    batch: pa.Table,
    *,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    with_shingles: bool = True,
) -> pa.Table:
    """pages/documents batch → docs batch.

    Output schema: doc_id:int64, norm_text:string, norm_hash:uint64,
    n_words:int64, n_chars:int64 (+ passthrough ``keep_cols``); with
    ``with_shingles`` also shingles:list<uint64>, n_shingles:int64,
    simhash:uint64. The dedup pipeline runs the LIGHT form before the
    exact-dup shuffle (shingles are ~8× the text payload and the exact tier
    doesn't need them) and adds shingles to the surviving representatives
    only (:func:`add_shingles_batch`).
    """
    norm = normalize_array(batch[text_col], cfg.max_chars, cfg.n_grams)
    norm_hash = hash_strings(norm, cfg.seed)
    n_words, n_chars = tokenize_counts(norm)
    cols: dict[str, object] = {
        "doc_id": batch[id_col].cast(pa.int64()),
        "norm_text": norm,
        "norm_hash": pa.array(norm_hash, type=pa.uint64()),
        "n_words": n_words,
        "n_chars": n_chars.cast(pa.int64()),
    }
    for c in keep_cols:
        cols[c] = batch[c]
    out = pa.table(cols)
    if with_shingles:
        out = add_shingles_batch(out, cfg=cfg)
    return out


def add_shingles_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """+ shingles:list<uint64>, n_shingles:int64, simhash:uint64 (from the
    already-normalized ``norm_text`` column)."""
    from ..functions.shingles import list_column_flat
    from ..functions.simhash import simhash_flat

    shingles = shingle_array(batch["norm_text"], cfg.n_grams, cfg.seed)
    flat, offsets = list_column_flat(shingles)
    simhash = simhash_flat(flat, offsets, seed=cfg.seed)
    out = batch.append_column("shingles", shingles)
    out = out.append_column("n_shingles",
                            pc.list_value_length(shingles).cast(pa.int64()))
    return out.append_column("simhash", pa.array(simhash, type=pa.uint64()))


def url_to_doc_id(urls: pa.Array | pa.ChunkedArray, seed: int = 0) -> pa.Array:
    """Stable int64 doc_id from a url column (for pages tables without ids).

    Hash-derived ids are how a 10^12-row corpus gets ids without a global
    sequence; masked to 63 bits so the id stays a non-negative int64.

    Collision budget: the birthday bound at N=10^12 ids in a 63-bit space
    expects ~N²/2^64 ≈ 5×10⁴ colliding pairs — each silently merging two
    unrelated urls into one document before any dedup logic runs. At that
    scale run :func:`check_id_collisions` once per ingest (one groupby
    shuffle) and remap the colliding slice with a different seed, or carry
    a second independent hash column as a 126-bit effective key. Below
    ~10^8 docs the expected collision count is < 0.001 and the check is
    skippable.
    """
    h = hash_strings(urls, seed) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return pa.array(h.astype(np.int64), type=pa.int64())


def check_id_collisions(pages_ds, url_col: str = "url", seed: int = 0):
    """Count doc_ids claimed by more than one distinct url (hash-id
    collision detection, opt-in). Returns the number of colliding ids.

    One groupby shuffle over 16-byte rows: (doc_id, url-hash-with-a-
    DIFFERENT-seed); an id whose min/max secondary hash differ is claimed
    by ≥2 urls (the secondary hash colliding for the same pair as the
    primary has probability ~2^-126 — negligible)."""
    from ray.data.aggregate import Max, Min

    def project(t: pa.Table) -> pa.Table:
        ids = url_to_doc_id(t[url_col], seed)
        h2 = hash_strings(t[url_col], seed ^ 0x5DEECE66D).astype(np.int64)
        return pa.table({"doc_id": ids, "h2": pa.array(h2, pa.int64())})

    agg = pages_ds.map_batches(project, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Min("h2", alias_name="h2_min"),
                                     Max("h2", alias_name="h2_max"))

    def count_bad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = pc.sum(pc.cast(pc.not_equal(t["h2_min"], t["h2_max"]),
                             pa.int64())).as_py() or 0
        return pa.table({"n_collisions": pa.array([bad], pa.int64())})

    parts = agg.map_batches(count_bad, batch_format="pyarrow")
    return int(sum(r["n_collisions"] for r in parts.take_all()))


def prepare_pages_batch(batch: pa.Table, *, cfg: DedupConfig,
                        keep_cols: tuple[str, ...] = ("url",),
                        with_shingles: bool = True,
                        text_from_html: bool = False) -> pa.Table:
    """pages (url, warc_ts, html, text, lang — BASELINE input_hint) → docs.

    By default text extraction is the identity on the given ``text`` column
    (the input_hint provides extracted text; the html column stays opaque
    binary). With ``text_from_html=True`` the text is instead RE-extracted
    from the raw ``html`` bytes by the vectorized RE2 spec in
    :mod:`..functions.html` — for corpora that ship only raw pages. The
    extraction spec itself is oracled (CORRECTNESS `extract_text`), and for
    fixture pages (escape+wrap construction) it reproduces the ``text``
    column byte-identically up to whitespace-run collapse.
    """
    if text_from_html:
        from ..functions.html import extract_text_array

        extracted = extract_text_array(batch["html"])
        batch = batch.drop_columns(["text"]).append_column("text", extracted)
    batch = batch.append_column("doc_id", url_to_doc_id(batch["url"], cfg.seed))
    return prepare_batch(batch, cfg=cfg, id_col="doc_id", text_col="text",
                         keep_cols=keep_cols, with_shingles=with_shingles)

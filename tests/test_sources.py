import gzip

import numpy as np
import pyarrow as pa
import pytest


def test_read_mapped_csv(ray_session, tmp_path):
    from doppel_speller_ray.sources.readers import read_mapped_csv

    p = tmp_path / "truth.csv"
    p.write_text("company_id|name\n1|Acme Inc\n2|Zeta GmbH\n")
    ds = read_mapped_csv(str(p), [("title_id", ("company_id", int)),
                                  ("title", ("name", str))])
    rows = ds.take_all()
    assert rows == [{"title_id": 1, "title": "Acme Inc"},
                    {"title_id": 2, "title": "Zeta GmbH"}]


def test_read_mapped_csv_missing_column(ray_session, tmp_path):
    from doppel_speller_ray.sources.readers import read_mapped_csv

    p = tmp_path / "bad.csv"
    p.write_text("a|b\n1|2\n")
    ds = read_mapped_csv(str(p), [("title_id", ("company_id", int))])
    with pytest.raises(Exception, match="company_id"):
        ds.take_all()


def test_read_mapped_jsonl(ray_session, tmp_path):
    from doppel_speller_ray.sources.readers import read_mapped_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"id": 7, "content": "hello web", "meta": "x"}\n'
                 '{"id": 8, "content": "bye web", "meta": "y"}\n')
    ds = read_mapped_jsonl(str(p), [("doc_id", ("id", int)),
                                    ("text", ("content", str))])
    rows = ds.take_all()
    assert rows == [{"doc_id": 7, "text": "hello web"},
                    {"doc_id": 8, "text": "bye web"}]


def test_read_mapped_jsonl_missing_column(ray_session, tmp_path):
    from doppel_speller_ray.sources.readers import read_mapped_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\n')
    ds = read_mapped_jsonl(str(p), [("doc_id", ("id", int))])
    with pytest.raises(Exception, match="id"):
        ds.take_all()


def test_read_pages_pruning(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from doppel_speller_ray.sources.fixtures import make_pages
    from doppel_speller_ray.sources.readers import read_pages

    pages, _ = make_pages(n_clusters=5, n_singletons=10, seed=1)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    ds = read_pages(path, columns=["url", "text"])
    assert set(ds.schema().names) == {"url", "text"}
    en = read_pages(path, columns=["url", "lang"], lang="en")
    rows = en.take_all()
    assert rows and all(r["lang"] == "en" for r in rows)


def test_single_title_dataset(ray_session):
    from doppel_speller_ray.sources.readers import single_title_dataset

    assert single_title_dataset("Acme Inc").take_all() == [
        {"test_index": 0, "title": "Acme Inc"}]


def test_image_decode_stage(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.multimodal import (
        PIL_AVAILABLE,
        ImageFeatureStage,
        decode_images,
    )

    assert not PIL_AVAILABLE  # built-in codecs only in this container
    # unrecognised payloads → deterministic stub decode (codec="stub")
    rows = [{"media_id": i, "payload": bytes([i] * 100)} for i in range(10)]
    decoded = decode_images(rd.from_items(rows), target=(16, 16), concurrency=2)
    feats = decoded.map_batches(ImageFeatureStage, batch_format="pyarrow",
                                concurrency=2)
    out = feats.take_all()
    assert len(out) == 10
    assert len(out[0]["embedding"]) == 3 + 3 + 4 * 4 * 3
    # determinism: same payload → same pixels → same embedding
    again = decode_images(rd.from_items(rows), target=(16, 16), concurrency=2) \
        .map_batches(ImageFeatureStage, batch_format="pyarrow",
                     concurrency=2).take_all()
    e1 = {r["media_id"]: r["embedding"] for r in out}
    e2 = {r["media_id"]: r["embedding"] for r in again}
    for k in e1:
        np.testing.assert_allclose(e1[k], e2[k])


def test_image_decode_strict_raises_on_undecodable_payload():
    import pyarrow as pa

    from doppel_speller_ray.stages.multimodal import ImageDecodeStage

    batch = pa.table({"payload": pa.array([bytes(100)], pa.binary())})
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(batch)


def test_audio_frame_sample(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.multimodal import AudioFrameSampleStage

    rows = [{"media_id": i, "payload": bytes(range(i, i + 64))} for i in range(4)]
    out = rd.from_items(rows).map_batches(
        AudioFrameSampleStage, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"n_frames": 4}).take_all()
    assert len(out) == 4
    assert len(out[0]["frames"]) == 8

"""Round-4 closures: labelImg export roundtrip (K8 second half,
reference label_img.py), a REAL (pure-python PPM) codec through the
MediaDecodeStage swap point (decode -> frame sample -> near-dup,
error paths included), and the stateful-captioner swap contract
(model __init__ once per actor, not per batch — reference
captions.py:10-97 loads BLIP once per device).

Codec/model callables are defined INSIDE the tests so cloudpickle
ships them by value — test modules aren't importable in Ray workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


# ---------------------------------------------------------------- labelImg
def _annot_table() -> pa.Table:
    return pa.table({
        "url": pa.array(["http://a/x", "http://a/x", "http://b/y"]),
        "label": pa.array(["person", "ad", "person"]),
        "span_start": pa.array([10, 40, 0], pa.int64()),
        "span_len": pa.array([5, 12, 7], pa.int64()),
        "row_y": pa.array([1, 2, 0], pa.int64()),
        "height": pa.array([3, 4, 0], pa.int64()),
    })


def test_labelimg_roundtrip(ray_session, tmp_path):
    from fastdup_ray.sources.coco import export_labelimg, read_labelimg

    out = tmp_path / "voc"
    paths = export_labelimg(_annot_table(), str(out))
    assert len(paths) == 2  # one XML per url
    back = read_labelimg(str(out)).take_all()
    got = sorted(
        (r["url"], r["label"], r["span_start"], r["span_len"],
         r["row_y"], r["height"]) for r in back
    )
    want = sorted(
        (r["url"], r["label"], r["span_start"], r["span_len"],
         r["row_y"], r["height"]) for r in _annot_table().to_pylist()
    )
    assert got == want

    # the XML itself is Pascal-VOC shaped (labelImg-openable)
    import xml.etree.ElementTree as ET

    root = ET.parse(paths[0]).getroot()
    assert root.tag == "annotation"
    assert root.findtext("filename")
    assert root.find("size/width") is not None
    obj = root.find("object")
    assert obj.findtext("pose") == "Unspecified"
    assert obj.find("bndbox/xmin") is not None


# ------------------------------------------------------------- real codec
def _ppm_encode(w: int, h: int, pixels: bytes) -> bytes:
    """Minimal binary P6 PPM writer (driver-side test fixture)."""
    assert len(pixels) == w * h * 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def _make_ppm_decoder():
    """The library's REAL pure-python P6 PPM codec (promoted from this
    test in r4): exercising the import proves the shipped decoder, not
    a test-local copy, satisfies the MediaDecodeStage contract."""
    from fastdup_ray.stages.multimodal import ppm_decode

    return ppm_decode


def test_media_decode_real_codec(ray_session):
    from fastdup_ray.stages.multimodal import (
        ERR_DECODE_MEDIA,
        ERR_EMPTY_MEDIA,
        FrameSampleStage,
        MediaDecodeStage,
        media_near_dup_pairs,
    )

    ppm_decode = _make_ppm_decoder()
    rng = np.random.default_rng(7)
    imgs = [
        _ppm_encode(8, 6, rng.integers(0, 256, 8 * 6 * 3, np.uint8).tobytes())
        for _ in range(6)
    ]
    payloads = imgs + [
        imgs[0],                      # byte-identical dup of img 0
        b"P6\n8 6\n255\nshort",       # malformed raster -> decode error
        b"JUNK not a ppm at all",     # wrong magic -> decode error
        b"",                          # empty -> EMPTY_MEDIA
    ]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })).repartition(3)

    decoded = ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": ppm_decode},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).materialize()
    rows = {r["media_id"]: r for r in decoded.take_all()}
    assert len(rows) == len(payloads)
    # real dimensions parsed from the header, not fabricated
    assert rows[0]["width"] == 8 and rows[0]["height"] == 6
    assert rows[0]["is_valid"] and rows[0]["n_frames"] == 1
    # error paths: malformed payloads keep rows with typed error codes
    assert rows[7]["error_code"] == ERR_DECODE_MEDIA
    assert rows[8]["error_code"] == ERR_DECODE_MEDIA
    assert rows[9]["error_code"] == ERR_EMPTY_MEDIA
    assert not rows[7]["is_valid"]
    # feature derives from real pixels: unit-norm, matches direct decode
    direct = ppm_decode(imgs[2])["feature"]
    np.testing.assert_allclose(np.asarray(rows[2]["feature"]), direct)
    # byte-identical payload -> identical feature
    assert list(rows[6]["feature"]) == list(rows[0]["feature"])

    # frame sampling consumes the real n_frames; invalid rows emit none
    frames = decoded.map_batches(
        FrameSampleStage(max_frames=4), batch_format="pyarrow"
    ).take_all()
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f["frame_no"])
    assert by_media[0] == [0]
    assert 7 not in by_media and 9 not in by_media

    # near-dup over the real features pairs the byte-identical images
    pairs = media_near_dup_pairs(decoded).take_all()
    assert any({p["src"], p["dst"]} == {0, 6} for p in pairs)


# ---------------------------------------------------- stateful model swap
def test_caption_stateful_model_swap(ray_session):
    """The caption swap point accepts a stateful model CLASS and
    constructs it once per actor: many small batches flow through few
    actors and every row from one pid carries the same init sequence
    number (a per-batch re-init would bump it)."""

    class StatefulCaptioner:
        """Stand-in generative caption model: expensive __init__ (once
        per actor), per-batch __call__. Stamps rows with (pid, seq)."""

        def __init__(self):
            import os

            ns = type(self).__dict__.get("_ns") or {}
            if "_ns" not in type(self).__dict__:
                type(self)._ns = ns
            ns["inits"] = ns.get("inits", 0) + 1
            self.pid = os.getpid()
            self.seq = ns["inits"]
            self.vocab = {w: i for i, w in enumerate(["alpha", "beta", "gamma"])}

        def __call__(self, batch: pa.Table) -> pa.Table:
            caps = [
                " ".join(sorted(set(t.split()) & self.vocab.keys())) or "none"
                for t in (x or "" for x in batch["text"].to_pylist())
            ]
            out = batch.append_column("caption", pa.array(caps, pa.string()))
            out = out.append_column(
                "model_pid",
                pa.array([self.pid] * batch.num_rows, pa.int64()))
            return out.append_column(
                "model_init_seq",
                pa.array([self.seq] * batch.num_rows, pa.int64()))

    texts = [f"alpha doc {i} beta" if i % 2 else f"gamma doc {i}"
             for i in range(200)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(8)

    out = docs.map_batches(
        StatefulCaptioner, batch_format="pyarrow",
        batch_size=16, concurrency=2,
    ).take_all()
    assert len(out) == 200
    assert all(r["caption"] in ("alpha beta", "gamma") for r in out)
    seqs_per_pid: dict[int, set[int]] = {}
    for r in out:
        seqs_per_pid.setdefault(r["model_pid"], set()).add(r["model_init_seq"])
    # >= 13 batches flowed through <= 2 actors; each actor inited ONCE
    assert all(len(s) == 1 for s in seqs_per_pid.values())
    assert len(seqs_per_pid) <= 2

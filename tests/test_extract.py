"""Extraction byte-identity (north-rule invariant) and generator sanity — no Ray."""

import numpy as np

from fastdup_ray.sources.pages import (
    canonicalize_text,
    pages_from_documents,
    render_html,
    synthesize_pages,
)
from fastdup_ray.stages.extract import (
    ERR_DECODE,
    ERR_EMPTY,
    ERR_OK,
    HtmlExtractStage,
    extract_text,
)


def test_roundtrip_byte_identical():
    text = "alpha beta <gamma> & \"delta\" " + " ".join(f"tok{i}" for i in range(120))
    canonical = canonicalize_text(text)
    html = render_html(text, "a <title> & stuff", "site0001")
    extracted, err = extract_text(html)
    assert err == ERR_OK
    assert extracted == canonical  # byte-identical


def test_extract_corrupted_classes():
    text = " ".join(f"w{i}" for i in range(100))
    assert extract_text(b"")[1] == ERR_EMPTY
    assert extract_text(render_html(text, "t", "s", corrupted=2))[1] == ERR_DECODE
    trunc_text, trunc_err = extract_text(render_html(text, "t", "s", corrupted=1))
    # truncated html may yield partial or no text, but never crashes
    assert isinstance(trunc_text, str)


def test_synthesize_pages_classes_and_extraction():
    pages, truth = synthesize_pages(400, seed=42)
    assert pages.num_rows == truth.num_rows
    assert pages.column_names == ["url", "warc_ts", "html", "text", "lang"]
    classes = set(truth["cls"].to_pylist())
    assert {"unique", "exact_dup", "near_dup", "boilerplate", "corrupted", "tiny"} <= classes
    # determinism
    pages2, _ = synthesize_pages(400, seed=42)
    assert pages.equals(pages2)

    stage = HtmlExtractStage(min_text_len=20)
    out = stage(pages)
    assert out.num_rows == pages.num_rows
    gt = pages["text"].to_pylist()
    got = out["text"].to_pylist()
    cls = truth["cls"].to_pylist()
    valid = out["is_valid"].to_pylist()
    errs = out["error_code"].to_pylist()
    for i in range(len(gt)):
        if cls[i] == "corrupted":
            assert not valid[i] and errs[i] != ERR_OK
        elif cls[i] == "tiny":
            assert not valid[i] and errs[i] == "TOO_SHORT"
            assert got[i] == gt[i]  # still extracted byte-identically
        else:
            assert valid[i], f"row {i} cls={cls[i]} err={errs[i]}"
            assert got[i] == gt[i], f"row {i} not byte-identical"
    # doc_ids unique and deterministic
    ids = out["doc_id"].to_pylist()
    assert len(set(ids)) == len(ids)
    out2 = HtmlExtractStage(20)(pages)
    assert out2["doc_id"].to_pylist() == ids


def test_pages_from_documents_shape():
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs, replicate=2, seed=42)
    assert pages.num_rows == 2 * docs.num_rows
    stage = HtmlExtractStage(20)
    out = stage(pages)
    assert out["text"].to_pylist() == pages["text"].to_pylist()
    assert np.mean(out["is_valid"].to_pylist()) > 0.95


def test_sync_to_local_partial_and_incremental(tmp_path):
    """S5 sync source: pattern/cap filtering, tree preservation, and
    size-based skip on re-sync (pyarrow.fs-generic; local FS here)."""
    from fastdup_ray.sources.sync import list_files, sync_to_local

    src = tmp_path / "bucket"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    (src / "a" / "x1.parquet").write_bytes(b"one")
    (src / "a" / "x2.parquet").write_bytes(b"twotwo")
    (src / "b" / "y.txt").write_bytes(b"nope")

    listed = list_files(str(src), pattern=r"\.parquet$")
    assert [p.split("/")[-1] for p in listed] == ["x1.parquet", "x2.parquet"]
    assert len(list_files(str(src), pattern=r"\.parquet$", max_files=1)) == 1

    dst = tmp_path / "cache"
    got = sync_to_local(str(src), str(dst), pattern=r"\.parquet$")
    assert [p.split("/")[-1] for p in got] == ["x1.parquet", "x2.parquet"]
    assert (dst / "a" / "x1.parquet").read_bytes() == b"one"
    # incremental: same-size files are not rewritten
    m1 = (dst / "a" / "x1.parquet").stat().st_mtime_ns
    got2 = sync_to_local(str(src), str(dst), pattern=r"\.parquet$")
    assert got2 == got
    assert (dst / "a" / "x1.parquet").stat().st_mtime_ns == m1
    # changed size -> re-fetched
    (src / "a" / "x1.parquet").write_bytes(b"one-changed")
    sync_to_local(str(src), str(dst), pattern=r"\.parquet$")
    assert (dst / "a" / "x1.parquet").read_bytes() == b"one-changed"

"""Object-store sync source (SURVEY.md S5).

The reference pre-syncs remote buckets to a local scratch directory
before a run (`aws s3 sync` / `mc cp --recursive` shell-outs,
reference utils.py:33-75 `download_from_s3`, utils.py:479-516
`download_from_minio`, __init__.py:369-390), with a partial-sync mode
that copies only the first N objects for smoke runs.

Here the same capability is filesystem-generic via `pyarrow.fs`: any
URI Arrow understands (s3://, gs://, hdfs://, file://, plain paths)
syncs through one code path, so tests exercise the real logic against
a local filesystem with no network. Ray Data can read most remote URIs
directly (the preferred path at scale — no pre-copy); `sync_to_local`
exists for the reference's explicit-sync workflow and for sources that
need local-file access (e.g. external tools run on the synced tree).

Incremental: a file is skipped when the destination already has it
with the same size (the same cheap freshness test `aws s3 sync` uses
by default, minus mtime — object stores don't preserve mtimes).
"""

from __future__ import annotations

import os
import posixpath
import re

from pyarrow import fs as pafs


def list_files(src_uri: str, *, pattern: str | None = None,
               max_files: int | None = None) -> list[str]:
    """Recursively list file paths under ``src_uri`` (sorted), optionally
    filtered by a regex on the path and capped at ``max_files`` (the
    reference's partial-sync / `find_regex` listing filters, M17/M19)."""
    f, root = pafs.FileSystem.from_uri(src_uri) if "://" in src_uri else (
        pafs.LocalFileSystem(), os.path.abspath(src_uri)
    )
    infos = f.get_file_info(pafs.FileSelector(root, recursive=True))
    rx = re.compile(pattern) if pattern else None
    paths = sorted(
        i.path for i in infos
        if i.type == pafs.FileType.File and (rx is None or rx.search(i.path))
    )
    if max_files is not None:
        paths = paths[:max_files]
    return paths


def sync_to_local(src_uri: str, dst_dir: str, *, pattern: str | None = None,
                  max_files: int | None = None,
                  chunk_size: int = 8 << 20) -> list[str]:
    """Copy files under ``src_uri`` into ``dst_dir`` (flattening nothing:
    the relative tree is preserved). Returns the local paths, sorted.

    Skips files that already exist locally with the same size, so
    re-running after a partial failure only fetches what's missing —
    the same resumability contract as the stage checkpoints.
    """
    src_fs, root = pafs.FileSystem.from_uri(src_uri) if "://" in src_uri else (
        pafs.LocalFileSystem(), os.path.abspath(src_uri)
    )
    remote = list_files(src_uri, pattern=pattern, max_files=max_files)
    out: list[str] = []
    os.makedirs(dst_dir, exist_ok=True)
    for rp in remote:
        rel = posixpath.relpath(rp, root)
        lp = os.path.join(dst_dir, rel)
        out.append(lp)
        size = src_fs.get_file_info(rp).size
        if os.path.exists(lp) and os.path.getsize(lp) == size:
            continue
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        tmp = lp + ".part"
        with src_fs.open_input_stream(rp) as src, open(tmp, "wb") as dst:
            while True:
                buf = src.read(chunk_size)
                if not buf:
                    break
                dst.write(buf)
        os.replace(tmp, lp)  # atomic publish; .part never read as done
    return out

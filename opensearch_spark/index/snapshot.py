"""Snapshot / restore: the reference's `_snapshot` API re-expressed.

Reference semantics (``SnapshotShardsService.java``, repositories/fs):
a snapshot is a file-level copy of the immutable segment files plus a
manifest; restore copies them back and verifies integrity. Our index
layout is already immutable parquet directories + meta.json (segments
never rewrite), so snapshot = recursive copy + an integrity manifest
(per-file size + md5), restore = copy back + full verification. At
cluster scale the copy is `hadoop distcp`/object-store copy of the same
immutable files — the manifest logic is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


SNAP_MANIFEST = "snapshot_manifest.json"


def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out.append(os.path.relpath(p, root))
    return sorted(out)


def _safe_rel(rel: str, root: str) -> str:
    """Join a manifest-supplied relpath under ``root``, refusing absolute
    paths and any traversal outside root — a corrupt or hostile manifest
    must never name a write location outside the restore target."""
    if os.path.isabs(rel):
        raise ValueError(f"manifest path is absolute: {rel!r}")
    p = os.path.normpath(os.path.join(root, rel))
    if os.path.commonpath([os.path.abspath(p), os.path.abspath(root)]) \
            != os.path.abspath(root):
        raise ValueError(f"manifest path escapes the restore target: {rel!r}")
    return p


def snapshot_index(index_path: str, snap_dir: str) -> dict:
    """Copy the immutable index tree into ``snap_dir`` and write an
    integrity manifest (relpath → size, md5). Fails if the source has no
    meta.json (not a committed index); a mid-copy failure removes the
    partial target so a retry isn't blocked by half a snapshot."""
    if not os.path.exists(os.path.join(index_path, "meta.json")):
        raise ValueError(f"not a committed index (no meta.json): {index_path}")
    if os.path.exists(snap_dir):
        raise ValueError(f"snapshot target exists: {snap_dir}")
    try:
        shutil.copytree(index_path, snap_dir)
        files = {}
        for rel in _walk(snap_dir):
            if rel == SNAP_MANIFEST:
                continue
            p = os.path.join(snap_dir, rel)
            files[rel] = {"bytes": os.path.getsize(p), "md5": _file_md5(p)}
        from opensearch_spark.index.build import _atomic_write_json

        manifest = {"source": os.path.abspath(index_path), "files": files}
        _atomic_write_json(os.path.join(snap_dir, SNAP_MANIFEST), manifest)
    except Exception:
        shutil.rmtree(snap_dir, ignore_errors=True)
        raise
    return manifest


def verify_snapshot(snap_dir: str) -> int:
    """Return the number of corrupt/missing/UNLISTED files vs the manifest
    (0 = ok). Corruption by addition counts too: a file present on disk
    but absent from the manifest would otherwise ride into the restored
    index 'fully verified'."""
    with open(os.path.join(snap_dir, SNAP_MANIFEST)) as f:
        manifest = json.load(f)
    bad = 0
    for rel, want in manifest["files"].items():
        p = _safe_rel(rel, snap_dir)
        if (not os.path.exists(p)
                or os.path.getsize(p) != want["bytes"]
                or _file_md5(p) != want["md5"]):
            bad += 1
    listed = set(manifest["files"]) | {SNAP_MANIFEST}
    bad += sum(1 for rel in _walk(snap_dir) if rel not in listed)
    return bad


def restore_index(snap_dir: str, dest: str) -> str:
    """Restore a snapshot into ``dest`` (must not exist) after verifying
    every file against the manifest; the restored tree is byte-identical
    to the snapshotted index and immediately servable."""
    bad = verify_snapshot(snap_dir)
    if bad:
        raise ValueError(f"snapshot corrupt: {bad} files fail verification")
    if os.path.exists(dest):
        raise ValueError(f"restore target exists: {dest}")
    shutil.copytree(snap_dir, dest)
    os.remove(os.path.join(dest, SNAP_MANIFEST))
    return dest


class UrlRepository:
    """Read-only URL snapshot repository (modules/repository-url
    ``URLRepository.java``: blobs addressed by base URL, writes refused —
    ``canUpdateInPlace``/write paths throw UnsupportedOperationException).

    Restore streams each manifest-listed blob from ``<base>/<relpath>``
    and verifies size+md5 as it lands. ``file://`` is what this sandbox
    exercises; any scheme urllib can open (http/https) takes the same
    path — at cluster scale the base would be an object-store / artifact
    HTTP endpoint serving the same immutable files."""

    def __init__(self, base_url: str):
        from urllib.parse import urlparse

        p = urlparse(base_url)
        if p.scheme not in ("file", "http", "https"):
            raise ValueError(f"unsupported url repository scheme: {p.scheme}")
        self.base_url = base_url.rstrip("/")

    def _read(self, rel: str) -> bytes:
        from urllib.request import urlopen

        with urlopen(f"{self.base_url}/{rel}") as r:
            return r.read()

    def manifest(self) -> dict:
        return json.loads(self._read(SNAP_MANIFEST).decode("utf-8"))

    def snapshot(self, *_a, **_k):
        raise NotImplementedError(
            "url repository is read-only (URLRepository.java)")

    def restore(self, dest: str) -> str:
        """Fetch + verify every blob in the manifest into ``dest``,
        streamed in 1 MB chunks (constant memory per blob — a multi-GB
        parquet part never lives in RAM whole); md5/size verified
        incrementally as the blob lands."""
        from urllib.request import urlopen

        if os.path.exists(dest):
            raise ValueError(f"restore target exists: {dest}")
        man = self.manifest()
        os.makedirs(dest)
        try:
            for rel, want in man["files"].items():
                # a remote manifest is untrusted input: refuse absolute /
                # traversal paths instead of writing outside dest
                p = _safe_rel(rel, dest)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                h = hashlib.md5()
                n = 0
                with urlopen(f"{self.base_url}/{rel}") as r, \
                        open(p, "wb") as f:
                    for chunk in iter(lambda: r.read(1 << 20), b""):
                        h.update(chunk)
                        n += len(chunk)
                        f.write(chunk)
                if n != want["bytes"] or h.hexdigest() != want["md5"]:
                    raise ValueError(f"snapshot blob corrupt: {rel}")
        except Exception:
            shutil.rmtree(dest, ignore_errors=True)
            raise
        return dest

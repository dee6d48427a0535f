"""Index catalog: named aliases and snapshot/restore — the operational
layer around immutable index roots (the ES ``_aliases`` / ``_snapshot``
analogs; the reference's operational story is its ``/reindex`` +
``/index-status`` endpoints, ReindexController.java:40-155, which swap
the serving table in place — an alias flip is the zero-downtime version
of the same act).

Design, and why it scales:

* **Aliases are tiny JSON pointers** (name → ordered segment roots),
  written atomically (tmp + ``os.replace``): a reader opening the alias
  mid-flip sees either the old list or the new list, never a torn one.
  This is the blue/green reindex swap: build the new index under a new
  root, validate it, ``alias_set`` — serving flips in one rename, the
  old root stays on disk for instant rollback.
* **Snapshots exploit index immutability**: every file under an index
  root is written once and never mutated (builds/extends/compactions
  always produce NEW roots), so a snapshot hard-links files into the
  repository instead of copying where the filesystem allows — the same
  segment-reuse trick Lucene/ES snapshots use; repeated snapshots of
  overlapping segment sets share bytes.  A manifest (JSON: roots,
  relative file list, sizes) makes restores self-describing and lets
  ``snapshot_verify`` cross-check byte sizes without reading content.
  On an object store at 100 TB the hard-link degenerates to a server-
  side copy; the manifest/root layout is storage-agnostic.

Catalog state is config-sized — one JSON file per alias, one manifest
per snapshot.  No Spark jobs run here; verification of a restored
index is the existing ``index.check`` audit plus query identity
(pinned by tests).
"""

from __future__ import annotations

import json
import os
import shutil

ALIAS_DIR = "aliases"
SNAP_DIR = "snapshots"


def _alias_path(catalog: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid alias name {name!r}")
    return os.path.join(catalog, ALIAS_DIR, f"{name}.json")


def _snap_path(repo: str, name: str) -> str:
    """Resolve a snapshot directory, applying the SAME name rule as
    ``_alias_path``.  The leading-'.' rejection is load-bearing:
    ``name='..'`` would resolve to the snapshot repository itself and
    ``name='.'`` to the snapshots dir — both sit upstream of
    ``shutil.rmtree`` calls (create's remnant cleanup, delete), so a
    typo'd name must fail here, not delete the repository."""
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid snapshot name {name!r}")
    return os.path.join(repo, SNAP_DIR, name)


def alias_set(catalog: str, name: str, roots: list[str]) -> None:
    """Point ``name`` at ``roots`` (ordered, oldest first — the same
    contract as ``MultiIndex``).  Atomic: readers see old or new, never
    a torn list.  Roots must exist and look like index roots (have a
    ``meta.json``) — a typo'd flip must fail loudly, not serve nothing."""
    if not roots:
        raise ValueError("alias needs at least one root")
    for r in roots:
        if not os.path.exists(os.path.join(r, "meta.json")):
            raise ValueError(f"{r} is not an index root (no meta.json)")
    path = _alias_path(catalog, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"roots": [os.path.abspath(r) for r in roots]}, f)
    os.replace(tmp, path)


def alias_get(catalog: str, name: str) -> list[str]:
    path = _alias_path(catalog, name)
    try:
        with open(path) as f:
            return list(json.load(f)["roots"])
    except FileNotFoundError:
        raise ValueError(f"alias {name!r} not found in {catalog}") from None


def alias_delete(catalog: str, name: str) -> None:
    try:
        os.remove(_alias_path(catalog, name))
    except FileNotFoundError:
        raise ValueError(f"alias {name!r} not found in {catalog}") from None


def alias_list(catalog: str) -> dict[str, list[str]]:
    d = os.path.join(catalog, ALIAS_DIR)
    out: dict[str, list[str]] = {}
    if os.path.isdir(d):
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out[fn[:-5]] = list(json.load(f)["roots"])
    return out


def resolve_index_arg(index_arg: str) -> str:
    """CLI ``--index`` indirection: ``alias:<catalog>/<name>`` resolves
    through the catalog to its comma-joined roots; anything else passes
    through (a root, or comma-separated roots)."""
    if not index_arg.startswith("alias:"):
        return index_arg
    ref = index_arg[len("alias:"):]
    catalog, _, name = ref.rpartition("/")
    if not catalog or not name:
        raise ValueError(
            f"alias reference must be alias:<catalog>/<name>, got {index_arg!r}"
        )
    return ",".join(alias_get(catalog, name))


# -- snapshots --------------------------------------------------------

def _walk_files(root: str) -> list[tuple[str, int]]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def _link_or_copy(src: str, dst: str) -> bool:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
        return True
    except OSError:
        shutil.copy2(src, dst)
        return False


def snapshot_create(
    repo: str, name: str, roots: list[str]
) -> dict:
    """Snapshot ``roots`` into ``repo/<name>/`` — hard-links where the
    filesystem allows (immutable index files make this safe), copies
    otherwise.  Returns the manifest.  Fails loudly if the snapshot
    name exists (snapshots are immutable too)."""
    snap = _snap_path(repo, name)
    if os.path.exists(snap):
        if os.path.exists(os.path.join(snap, "_manifest.json")):
            raise ValueError(f"snapshot {name!r} already exists in {repo}")
        # a crashed earlier attempt left a manifest-less remnant that
        # list hides and delete refuses — clear it so the retry works
        shutil.rmtree(snap)
    manifest: dict = {"name": name, "roots": [], "linked": 0, "copied": 0}
    for i, root in enumerate(roots):
        if not os.path.exists(os.path.join(root, "meta.json")):
            raise ValueError(f"{root} is not an index root (no meta.json)")
        files = _walk_files(root)
        seg_dir = os.path.join(snap, f"seg{i:04d}")
        for rel, _size in files:
            if _link_or_copy(
                os.path.join(root, rel), os.path.join(seg_dir, rel)
            ):
                manifest["linked"] += 1
            else:
                manifest["copied"] += 1
        manifest["roots"].append(
            {"source": os.path.abspath(root), "dir": f"seg{i:04d}",
             "files": files}
        )
    tmp = os.path.join(snap, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap, "_manifest.json"))
    return manifest


def snapshot_list(repo: str) -> list[str]:
    d = os.path.join(repo, SNAP_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        n for n in os.listdir(d)
        if os.path.exists(os.path.join(d, n, "_manifest.json"))
    )


def snapshot_delete(repo: str, name: str) -> None:
    snap = _snap_path(repo, name)
    if not os.path.exists(os.path.join(snap, "_manifest.json")):
        raise ValueError(f"snapshot {name!r} not found in {repo}")
    shutil.rmtree(snap)


def snapshot_verify(repo: str, name: str) -> dict:
    """Cross-check every manifest entry exists with the recorded size —
    the cheap integrity tier (the deep tier is ``index.check`` on a
    restore)."""
    snap = _snap_path(repo, name)
    try:
        with open(os.path.join(snap, "_manifest.json")) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise ValueError(f"snapshot {name!r} not found in {repo}") from None
    missing, mismatched, n = [], [], 0
    for seg in manifest["roots"]:
        for rel, size in seg["files"]:
            p = os.path.join(snap, seg["dir"], rel)
            n += 1
            if not os.path.exists(p):
                missing.append(f"{seg['dir']}/{rel}")
            elif os.path.getsize(p) != size:
                mismatched.append(f"{seg['dir']}/{rel}")
    return {
        "name": name, "files": n,
        "missing": missing, "size_mismatch": mismatched,
        "ok": not missing and not mismatched,
    }


def snapshot_restore(repo: str, name: str, dest: str) -> list[str]:
    """Materialize snapshot ``name`` under ``dest/`` → list of restored
    index roots (feed to ``CompressedIndex``/``MultiIndex``/an alias).
    Hard-links back out where possible, so restore is O(metadata) on
    the same filesystem.  Refuses a non-empty destination."""
    snap = _snap_path(repo, name)
    try:
        with open(os.path.join(snap, "_manifest.json")) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise ValueError(f"snapshot {name!r} not found in {repo}") from None
    if os.path.exists(dest) and os.listdir(dest):
        raise ValueError(f"restore destination {dest} is not empty")
    roots: list[str] = []
    for seg in manifest["roots"]:
        out_root = os.path.join(dest, seg["dir"])
        for rel, _size in seg["files"]:
            _link_or_copy(
                os.path.join(snap, seg["dir"], rel),
                os.path.join(out_root, rel),
            )
        roots.append(out_root)
    return roots
